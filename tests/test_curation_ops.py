"""Semantic properties of the training-data curation operators
(operators/curation.py) — the registry oracle checks value equality vs
DuckDB; these tests pin the *contracts*: determinism, whole-keep of rare
strata, the mixing proportion math, gram-disjointness after
decontamination, and the greedy next-fit invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.operators import curation as CU


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(120):
        src = f"s{i % 4}" if i < 100 else "rare"  # 'rare' has 20 docs
        words = " ".join(f"w{(i * 7 + j) % 40}" for j in range(30))
        rows.append((i, words, "en", src, len(words)))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint").cache()


def test_hash_uniform_deterministic_and_bounded(spark):
    df = spark.range(1000).select(
        CU.hash_uniform(F.col("id")).alias("u"))
    row = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi")).first()
    assert 0.0 <= row["lo"] and row["hi"] < 1.0
    a = sorted(r["u"] for r in df.collect())
    b = sorted(r["u"] for r in df.collect())
    assert a == b  # same keys -> same draws, always


def test_stratified_sample_keeps_rare_strata_whole(docs):
    out = CU.stratified_sample(docs, target_per_stratum=25)
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # 'rare' (20 docs) is below target -> rate 1.0, kept in full
    assert by["rare"] == 20
    # populous strata (25 docs each at target 25) also fully kept
    for s in ("s0", "s1", "s2", "s3"):
        assert by[s] == 25


def test_stratified_sample_subsamples_populous_strata(docs):
    out = CU.stratified_sample(docs, target_per_stratum=5)
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert 0 < by["rare"] < 20  # 20 docs > target 5 -> subsampled too
    for s in ("s0", "s1", "s2", "s3"):
        assert 0 < by[s] < 25  # binomial around 5, never the whole stratum


def test_corpus_mix_bottleneck_kept_whole_and_unweighted_dropped(docs):
    # rare(20 docs, w=4) is the bottleneck: T=min(25/1, 20/4)=5 ->
    # rare keeps all 20, each sN targets 1*5=5 of 25 (rate 0.2).
    out = CU.corpus_mix(docs, {"rare": 4.0, "s0": 1.0, "s1": 1.0})
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["rare"] == 20
    assert set(by) <= {"rare", "s0", "s1"}  # s2/s3 unweighted -> dropped
    for s in ("s0", "s1"):
        assert by.get(s, 0) < 25


def test_decontaminate_survivors_share_no_gram(spark):
    mk = lambda i, t: (i, t, "en", "s", len(t))
    bench = spark.createDataFrame(
        [mk(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    train = spark.createDataFrame(
        [mk(1, "alpha beta gamma delta epsilon other"),   # shares 5-gram
         mk(2, "one two three four five six"),            # clean
         mk(3, "beta gamma delta epsilon zeta tail"),     # shares 5-gram
         mk(4, "short text")],                            # <5 tokens: clean
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    surv = CU.decontaminate(train, bench, n=5)
    assert {r["doc_id"] for r in surv.collect()} == {2, 4}
    rep = CU.contamination_report(train, bench, n=5)
    got = {r["doc_id"]: r["n_shared_grams"] for r in rep.collect()}
    assert got == {1: 1, 3: 1}


def test_tfidf_scores_and_topk(spark):
    # 'rare' appears only in doc 0 (tf=2) -> score 2*ln(3/1);
    # 'common' is in all docs -> idf 0, never outranks anything positive.
    data = [(0, "rare rare common shared"), (1, "common shared x"),
            (2, "common y z")]
    docs = spark.createDataFrame(
        [(i, t) for i, t in data], "doc_id bigint, text string")
    out = CU.tfidf_top_terms(docs, k=2)
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["score"])
            for r in out.collect()}
    import math
    assert rows[(0, "rare")] == (2, round(2 * math.log(3.0), 4))
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 2 for r in per_doc)
    # common has idf ln(1)=0 -> score 0; 'rare' strictly above it in doc 0
    assert rows[(0, "common")][1] == 0.0 if (0, "common") in rows else True


def test_sequence_pack_nextfit_invariants(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * n), "g")
         for i, n in enumerate([300, 300, 200, 600, 100, 50])],
        "doc_id bigint, text string, source string")
    out = CU.sequence_pack(docs, max_tokens=512, group_col="source")
    rows = sorted((r["doc_id"], r["n_tok"], r["seq_id"])
                  for r in out.collect())
    # doc3 (600 toks) clamps to 512 and must sit alone in its sequence
    assert rows[3][1] == 512
    by_seq: dict[int, int] = {}
    for _, n_tok, seq in rows:
        by_seq[seq] = by_seq.get(seq, 0) + n_tok
    assert all(v <= 512 for v in by_seq.values())
    # greedy next-fit on [300,300,200,512,100,50]:
    # seq1=[300], seq2=[300,200], seq3=[512], seq4=[100,50]
    assert [r[2] for r in rows] == [1, 2, 2, 3, 4, 4]


def test_sequence_pack_default_buckets_beat_source_fanout(spark):
    """The default pack group is a hash bucket of doc_id, NOT the
    source column: a 5-source corpus must fan out to far more than 5
    sequential packing units (the 100 TB trap the old default had),
    while still packing every doc exactly once under the fill bound."""
    docs = spark.createDataFrame(
        [(i, "tok " * (i % 40 + 1), f"src{i % 5}") for i in range(400)],
        "doc_id bigint, text string, source string")
    out = CU.sequence_pack(docs, max_tokens=128)
    groups = out.select("pack_group").distinct().count()
    assert groups > 5, groups          # chosen fan-out, not |sources|
    assert groups <= CU.PACK_BUCKETS
    assert out.count() == 400
    over = (out.groupBy("pack_group", "seq_id")
            .agg(F.sum("n_tok").alias("tot"))
            .where(F.col("tot") > 128).count())
    assert over == 0


def test_sequence_pack_partitions_are_independent(docs):
    out = CU.sequence_pack(docs, max_tokens=128)
    # every doc appears exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # fill bound holds in every group
    over = (out.groupBy("pack_group", "seq_id")
            .agg(F.sum("n_tok").alias("tot"))
            .where(F.col("tot") > 128).count())
    assert over == 0


def test_unigram_logprob_prefers_common_tokens(spark):
    # doc 0 is all 'common' (high corpus prob); doc 1 is unique tokens.
    docs = spark.createDataFrame(
        [(0, "common common common common"),
         (1, "weird tokens nobody repeats"),
         (2, "common common weird common")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r["avg_logprob"]
           for r in CU.unigram_logprob(docs).collect()}
    assert out[0] > out[1]  # all-common doc scores strictly higher
    import math
    # doc 0: every token is 'common' with ctf=7 of N=12 -> ln(7/12)
    assert out[0] == round(math.log(7 / 12), 4)


def test_pii_redact_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex.org then 10.0.0.1 and +123456789 done"),
         (2, "no pii here"),
         (3, "two mails x@y.io z@w.ai")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in CU.pii_redact(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_tel"]) == (1, 1, 1)
    assert out[1]["redacted"] == "mail <email> then <ip> and <tel> done"
    assert out[2]["n_pii"] == 0 and out[2]["redacted"] == "no pii here"
    assert out[3]["n_email"] == 2
    assert out[3]["redacted"] == "two mails <email> <email>"


def test_quantize_int8_zero_vector_and_range(spark):
    from cloud_native_mapreduce_spark.similarity.quantize import (
        quantize_int8)
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]),          # degenerate: scale 0, codes 0
         (1, [1.0, -1.0, 0.5]),         # max quantizes to exactly 127
         (2, [0.001, 0.0, -0.002])],    # small values: dead zone
        "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert (out[0]["scale"], out[0]["q_sum"], out[0]["n_zero"],
            out[0]["q_max"]) == (0.0, 0, 3, 0)
    assert out[1]["q_max"] == 127  # structural: max element -> +-127
    # 1.0 -> 127, -1.0 -> -127, 0.5 -> floor(63.5+0.5)=64
    assert out[1]["q_sum"] == 64
    assert out[2]["q_max"] == 127 and out[2]["n_zero"] == 1


def test_boilerplate_strip_removes_shared_spans_only(spark):
    footer = "this file is part of the example project all rights reserved"
    bodies = ["alpha beta gamma delta epsilon zeta eta theta",
              "one two three four five six seven eight",
              "red green blue yellow purple orange pink cyan"]
    docs = spark.createDataFrame(
        [(i, b + " " + footer) for i, b in enumerate(bodies)]
        + [(9, "totally unique text with no shared spans at all")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r
           for r in CU.boilerplate_strip(docs, k=5, min_docs=3).collect()}
    # the footer (shared by 3 docs) vanishes; unique bodies survive
    for i, b in enumerate(bodies):
        assert out[i]["cleaned"] == b
        assert out[i]["n_after"] == len(b.split())
    # doc 9 shares nothing: untouched
    assert out[9]["cleaned"] == "totally unique text with no shared spans at all"


def test_boilerplate_strip_short_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(0, "tiny doc"), (1, "also tiny"), (2, "third tiny one")],
        "doc_id bigint, text string")
    out = CU.boilerplate_strip(docs, k=5, min_docs=2).collect()
    assert all(r["n_before"] == r["n_after"] for r in out)


def test_gopher_quality_rule_edges(spark):
    """Each Gopher rule must fail for exactly the doc built to violate
    it: too short, too-long mean word, no stopwords, non-alphabetic."""
    good = "the of data " + "word " * 60       # 63 words, 2 stopwords
    short = "the of tiny"                      # < 50 words
    longw = ("the of " + "x" * 40 + " ") * 30  # mean word len > 10
    nostop = "alpha bravo charlie " * 20       # no Gopher stopwords
    numeric = "the of " + "12345 " * 60        # alpha fraction < 0.8
    docs = spark.createDataFrame(
        [(0, good), (1, short), (2, longw), (3, nostop), (4, numeric)],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in CU.gopher_quality(docs).collect()}
    assert out[0]["pass_gopher"]
    assert not out[1]["pass_word_count"] and not out[1]["pass_gopher"]
    assert not out[2]["pass_mean_word_len"] and not out[2]["pass_gopher"]
    assert not out[3]["pass_stopwords"] and not out[3]["pass_gopher"]
    assert not out[4]["pass_alpha_words"] and not out[4]["pass_gopher"]


def test_normalize_text_edges(spark):
    """Control chars stripped, whitespace runs collapsed, casefolded,
    trimmed — and `changed` is exact."""
    from cloud_native_mapreduce_spark.functions.text import normalize_text
    docs = spark.createDataFrame(
        [(0, "  Hello\tWorld\n\n"), (1, "clean text"),
         (2, "a\x00b\x07c"), (3, "UPPER"), (4, "")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert got[0]["norm_text"] == "hello world" and got[0]["changed"]
    assert got[1]["norm_text"] == "clean text" and not got[1]["changed"]
    assert got[2]["norm_text"] == "abc" and got[2]["changed"]
    assert got[3]["norm_text"] == "upper" and got[3]["changed"]
    assert got[4]["norm_text"] == "" and not got[4]["changed"]
    assert got[0]["n_chars_raw"] == 15 and got[0]["n_chars_norm"] == 11
