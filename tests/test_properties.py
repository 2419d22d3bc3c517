"""Property-based invariants (hypothesis) — the reference's golden-test
idea generalized: independently computed oracles over GENERATED inputs,
not just the fixed testdata corpus (SURVEY.md §5).

Example counts are deliberately small: each example launches real Spark
jobs; the value is in the generated edge cases (empty strings, unicode
apostrophes, whitespace-only docs), not in volume.
"""

from __future__ import annotations

import collections
import re

from hypothesis import given, settings, strategies as st

TOKEN = re.compile(r"[a-z](?:[a-z'‘’]*[a-z])?")

# text with the tokenizer's edge characters well represented
_texts = st.lists(
    st.text(alphabet="abz '‘’\t.XY9\n-", max_size=40).map(
        lambda s: s.replace("\n", " ")),
    min_size=0, max_size=8)


def _golden(lines):
    c = collections.Counter()
    for ln in lines:
        c.update(TOKEN.findall(ln.lower()))
    return dict(c)


@settings(max_examples=5, deadline=None)
@given(_texts)
def test_native_mr_wordcount_matches_python(spark, lines):
    """Native-callable MapReduce job == pure-Python word count."""
    from cloud_native_mapreduce_spark import mapreduce as MR

    if not any(ln.strip() for ln in lines):
        return  # textFile of an empty corpus: nothing to assert
    import tempfile, os
    d = tempfile.mkdtemp(prefix="prop_corpus_")
    with open(os.path.join(d, "c.txt"), "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))

    def mapper(line):
        for t in TOKEN.findall(line.lower()):
            yield t, 1

    def reducer(key, values):
        yield key, sum(int(v) for v in values)

    spec = MR.MapReduceSpec(input_paths=(d,), mapper=mapper,
                            reducer=reducer, num_map_tasks=2,
                            num_reduce_tasks=2)
    got = {r["key"]: int(r["value"])
           for r in MR.result_df(spark, spec).collect()}
    assert got == _golden(lines)


@settings(max_examples=5, deadline=None)
@given(_texts)
def test_wordcount_total_equals_token_count(spark, lines):
    """Σ cnt over word_count == total token count (SURVEY §5 invariant)."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.functions import text as T

    docs = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)] or [(0, "")],
        "doc_id long, text string")
    wc = T.word_count(docs)
    total = wc.agg(F.coalesce(F.sum("cnt"), F.lit(0))).collect()[0][0]
    assert total == sum(len(TOKEN.findall(ln.lower())) for ln in lines)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(-10_000, 10_000)),
                min_size=1, max_size=50))
def test_salted_agg_equals_direct(spark, rows):
    """Salting is a physical rewrite: results == direct aggregation."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.operators.skew import \
        salted_event_totals

    df = spark.createDataFrame(
        [(i, f"t{k}", c / 100.0) for i, (k, c) in enumerate(rows)],
        "event_id long, event_type string, value double")
    got = {(r["event_type"], r["n_events"], r["sum_value"])
           for r in salted_event_totals(df).collect()}
    direct = {(r["event_type"], r["n"], r["sv"]) for r in
              df.groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     (F.sum(F.round(F.col("value") * 100).cast("bigint"))
                      / 100.0).alias("sv"))
                .collect()}
    assert got == direct


@settings(max_examples=5, deadline=None)
@given(st.text(alphabet="abcde fgh", min_size=0, max_size=200))
def test_identical_docs_have_identical_minhash(spark, text):
    """MinHash determinism: equal text ⇒ equal signature (across rows,
    partitions, and runs)."""
    from cloud_native_mapreduce_spark.dedup.minhash import \
        minhash_signatures

    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string").repartition(2)
    sigs = {tuple(r["sig"]) for r in minhash_signatures(docs).collect()}
    assert len(sigs) == 1


def test_connected_components_handbuilt_graph(spark):
    """Path, clique, and singleton: every node's component is the min id
    reachable — including the 2-hop path end that label propagation only
    resolves after the second round."""
    from cloud_native_mapreduce_spark.dedup.components import (
        component_summary, connected_components)
    nodes = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long")
    # 0-1-2-3 path, {5,6,7} clique, 4 & 8 & 9 isolated
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (2, 3), (5, 6), (6, 7), (5, 7)],
        "doc_a long, doc_b long")
    comp = {r["doc_id"]: r["comp"]
            for r in connected_components(nodes, edges).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4,
                    5: 5, 6: 5, 7: 5, 8: 8, 9: 9}
    sizes = {r["component"]: r["size"]
             for r in component_summary(
                 connected_components(nodes, edges)).collect()}
    assert sizes == {0: 4, 4: 1, 5: 3, 8: 1, 9: 1}


def test_compaction_merges_small_files(spark, sf_dir, tmp_path):
    """Many tiny files in → few files out, same rows, no shuffle
    (coalesce is map-only)."""
    from cloud_native_mapreduce_spark.sources.tables import (
        compact_small_files, load_table)
    src = str(tmp_path / "small")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(src)  # 64 tiny files
    import glob
    assert len(glob.glob(src + "/*.parquet")) == 64
    dst = str(tmp_path / "compact")
    n_out = compact_small_files(spark, src, dst, target_mb=128)
    assert n_out == 1  # sf0.001 orders ≪ 128 MB
    assert spark.read.parquet(dst).count() == orders.count()


def test_observation_metrics_piggyback_on_action(spark, sf_dir):
    """Observation API: pipeline data-quality counters collected during
    the normal action — no second scan of the input."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.sources.tables import load_table
    obs = Observation("load_metrics")
    orders = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice") <= 0).alias("n_nonpositive"),
        F.max("o_orderdate").alias("max_date"))
    n = orders.count()
    assert obs.get["n_rows"] == n
    assert obs.get["n_nonpositive"] == 0
    assert obs.get["max_date"] is not None


def test_upsert_parquet_replaces_and_appends(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.sources.tables import (load_table,
                                                            upsert_parquet)
    d = str(tmp_path / "nation")
    load_table(spark, sf_dir, "nation").write.parquet(d)
    updates = spark.createDataFrame(
        [(0, "RENAMED_0", 0), (99, "NEW_99", 1)],
        "n_nationkey int, n_name string, n_regionkey int")
    upsert_parquet(spark, d, updates, "n_nationkey")
    got = {r["n_nationkey"]: r["n_name"]
           for r in spark.read.parquet(d).collect()}
    assert got[0] == "RENAMED_0"      # replaced
    assert got[99] == "NEW_99"        # appended
    assert len(got) == 26             # 25 originals (1 replaced in place) + 1 new
    assert got[1].startswith("NATION")  # untouched rows intact
    import os
    assert not os.path.exists(d.rstrip("/") + ".lock")  # lock released


def test_upsert_parquet_rejects_concurrent_writer(spark, sf_dir, tmp_path):
    """upsert_parquet is single-writer per table: a held lock makes a
    second upsert raise instead of silently dropping one writer's merge
    in the rename dance."""
    import os

    import pytest
    from cloud_native_mapreduce_spark.sources.tables import (load_table,
                                                             upsert_parquet)
    d = str(tmp_path / "nation2")
    load_table(spark, sf_dir, "nation").write.parquet(d)
    updates = spark.createDataFrame(
        [(0, "X", 0)], "n_nationkey int, n_name string, n_regionkey int")
    lock = d.rstrip("/") + ".lock"
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write("424242")
    with pytest.raises(RuntimeError, match="single-writer"):
        upsert_parquet(spark, d, updates, "n_nationkey")
    os.unlink(lock)  # holder done; retry now succeeds
    upsert_parquet(spark, d, updates, "n_nationkey")
    got = {r["n_nationkey"]: r["n_name"]
           for r in spark.read.parquet(d).collect()}
    assert got[0] == "X"


def test_dynamic_partition_overwrite_rewrites_only_touched(spark, sf_dir,
                                                           tmp_path):
    """partitionOverwriteMode=dynamic: an overwrite write that contains
    only event_type='click' rows must leave every other partition's data
    in place (static mode would truncate the whole table)."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.sources.tables import load_table
    d = str(tmp_path / "events")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type")
    ev.write.partitionBy("event_type").parquet(d)
    n_total = ev.count()
    n_click = ev.where(F.col("event_type") == "click").count()

    replacement = (ev.where(F.col("event_type") == "click").limit(5)
                   .withColumn("value", F.lit(0.0)))
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (replacement.write.mode("overwrite")
         .partitionBy("event_type").parquet(d))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    back = spark.read.parquet(d)
    assert back.where(F.col("event_type") == "click").count() == 5
    assert back.count() == n_total - n_click + 5


def test_curation_neardup_invariants(spark):
    """curation_pipeline_neardup contract (rows-only for the driver, so
    the guarantees live here): exactly one survivor per near-dup
    cluster, cluster sizes partition the gated corpus, survivors are
    gated docs, and the whole pipeline is deterministic under input
    repartitioning (LSH banding, components, and survivor pick all
    tie-break on ids, never on partition order)."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.functions.text import (
        curation_pipeline_neardup)
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = curation_pipeline_neardup(docs).collect()
    gated = docs.where((F.col("lang") == "en")
                       & F.col("n_chars").between(100, 500))
    gated_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}

    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)), "one row per survivor"
    assert set(ids) <= gated_ids, "survivors must pass the gates"
    assert sum(r["cluster_size"] for r in out) == len(gated_ids), \
        "cluster sizes must partition the gated corpus"
    assert all(r["cluster_size"] >= 1 for r in out)
    assert {r["split"] for r in out} <= {"train", "holdout"}
    # near-dups exist in the corpus → at least one multi-doc cluster
    assert any(r["cluster_size"] > 1 for r in out)

    # sorted compare: the trailing presentation orderBy was dropped
    # (global-sort gate), so collect() order is partition-dependent —
    # the invariant is the row MULTISET, not the arrival order
    again = curation_pipeline_neardup(docs.repartition(7)).collect()
    assert sorted(tuple(r) for r in again) == \
        sorted(tuple(r) for r in out), \
        "pipeline must be partition-invariant"


def test_audio_chunks_empty_payload_emits_no_rows(spark):
    """An empty payload is zero chunk windows, not one zero-length
    chunk — keeps the operator aligned with its oracle's
    generate_series(0, ceil(len/1024)-1), which emits no rows at
    len=0."""
    from cloud_native_mapreduce_spark.multimodal.binary import audio_chunks
    docs = spark.createDataFrame([(1, ""), (2, "x" * 2500)],
                                 "doc_id long, text string")
    rows = audio_chunks(docs).collect()
    assert all(r["doc_id"] == 2 for r in rows)
    assert [(r["chunk_idx"], r["start_byte"], r["n_bytes"])
            for r in rows] == [(0, 0, 1024), (1, 1024, 1024),
                               (2, 2048, 452)]


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """Lloyd's empty-cluster rule: a cluster receiving no points keeps
    its previous centroid rather than collapsing to the origin. Five
    identical vectors + k=3 identical seeds → argmin ties to cluster 0,
    clusters 1-2 get nothing and must stay at the seed position."""
    import numpy as np
    from cloud_native_mapreduce_spark.similarity.kmeans import (
        _assign, _update)
    vec = [1.0, 2.0, 3.0]
    emb = spark.createDataFrame(
        [(i, vec) for i in range(5)], "vec_id long, embedding array<float>")
    seed = np.array([vec, vec, vec], dtype=np.float64)
    assign = _assign(emb, seed, "vec_id", "embedding")
    new = _update(emb, assign, seed, "vec_id", "embedding")
    assert np.allclose(new, seed)
    assert not np.allclose(new[1], 0.0)


def test_pointer_jumping_converges_on_path_graph(spark):
    """Adversarial-diameter guarantee: on a 256-node path, min-label
    propagation alone needs 255 rounds (cannot finish in max_iter=20),
    while pointer jumping shortcuts L(u) <- L(L(u)) each round and
    converges in O(log n). Both must agree with plain propagation on a
    clique-ish graph (the near-dup shape)."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.dedup.components import (
        connected_components)
    n = 256
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")

    jumped = connected_components(nodes, path, max_iter=20,
                                  pointer_jumping=True).collect()
    assert all(r["comp"] == 0 for r in jumped), \
        "pointer jumping must collapse the path to one component"

    plain = connected_components(nodes, path, max_iter=20).collect()
    assert not all(r["comp"] == 0 for r in plain), \
        "without jumping a 255-diameter path cannot converge in 20 " \
        "rounds (if it did, this test stopped guarding anything)"

    # equivalence on the dense shape the default serves
    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5)],
        "doc_a long, doc_b long")
    small = spark.range(10).select(F.col("id").alias("doc_id"))
    a = {(r["doc_id"], r["comp"])
         for r in connected_components(small, tri).collect()}
    b = {(r["doc_id"], r["comp"])
         for r in connected_components(small, tri,
                                       pointer_jumping=True).collect()}
    assert a == b


def test_approx_percentiles_within_tolerance_of_exact(spark, sf_dir):
    """percentile_approx at accuracy 10000 must land within 1% relative
    error of the exact percentile per group — the quality gate that
    makes the rows-only driver check trustworthy."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.operators.advanced import (
        approx_percentiles)
    from cloud_native_mapreduce_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    approx = {r["l_returnflag"]: (r["p50_approx"], r["p90_approx"],
                                  r["p99_approx"])
              for r in approx_percentiles(li).collect()}
    exact = {r["l_returnflag"]: r["pcts"] for r in
             (li.groupBy("l_returnflag")
              .agg(F.expr("percentile(l_extendedprice, "
                          "array(0.5, 0.9, 0.99))").alias("pcts"))
              .collect())}
    assert set(approx) == set(exact)
    for flag, (a50, a90, a99) in approx.items():
        for a, e in zip((a50, a90, a99), exact[flag]):
            assert abs(a - e) / e < 0.01, (flag, a, e)


def test_freq_items_has_no_false_negatives(spark, sf_dir):
    """KPS guarantee: every event_type whose true frequency exceeds the
    support threshold must appear in the sketch output (false positives
    allowed, false negatives never)."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.operators.advanced import (
        frequent_event_types)
    from cloud_native_mapreduce_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {r["item"] for r in frequent_event_types(ev, support=0.1).collect()}
    n = ev.count()
    truly_frequent = {
        r["event_type"] for r in
        ev.groupBy("event_type").agg(F.count("*").alias("c")).collect()
        if r["c"] / n > 0.1}
    assert truly_frequent, "test corpus must have frequent event types"
    assert truly_frequent <= got, (truly_frequent, got)


BOILER = ("all rights reserved unauthorized reproduction of this document "
          "is strictly prohibited please contact the publisher for details")


def test_ngram_max_df_cap_bounds_adversarial_boilerplate(spark):
    """Cap soak, inverted-index path: a 10× corpus where EVERY doc shares
    one boilerplate passage. Uncapped, each boilerplate shingle's posting
    list is the whole corpus and join work is Σ C(df,2) ≈ C(5000,2) per
    shingle; with max_df=128 those postings are dropped and the surviving
    join work must shrink by orders of magnitude while emitted pairs stay
    bounded by the genuine replica families."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import ngram_jaccard
    from cloud_native_mapreduce_spark.dedup.minhash import doc_shingle_hashes
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    n_src = docs.count()
    corpus = (docs.select("doc_id", "text")
              .crossJoin(spark.range(10).select(F.col("id").alias("rep")))
              .select((F.col("doc_id") + F.col("rep") * 10_000_000)
                      .alias("doc_id"),
                      F.concat("text", F.lit(" " + BOILER)).alias("text")))
    n_docs = 10 * n_src

    df_tbl = (doc_shingle_hashes(corpus)
              .select(F.explode("sh_h").alias("shingle"))
              .groupBy("shingle").agg(F.count("*").alias("df"))
              .cache())
    work = df_tbl.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("raw"),
        F.sum(F.when(F.col("df") <= 128,
                     F.col("df") * (F.col("df") - 1) / 2)
               .otherwise(F.lit(0))).alias("capped"),
        F.max("df").alias("max_df")).collect()[0]
    df_tbl.unpersist()
    # the adversarial input is real: boilerplate shingles span the corpus
    assert work["max_df"] == n_docs
    # and the cap removes ≥98% of the posting-join work
    assert work["capped"] < work["raw"] / 50, (work["capped"], work["raw"])

    pairs = ngram_jaccard.near_duplicates(corpus, threshold=0.5,
                                          max_df=128)
    n_pairs = pairs.count()
    # replica families give up to C(10,2)·n_src pairs (SHORT docs fall
    # below threshold by design: Jaccard denominators keep the capped
    # boilerplate shingles, so (n−b)/(n+b) < 0.5 when boilerplate
    # dominates — capping prunes the join, never redefines similarity;
    # measured: 409/500 families clear 0.5). Natural near-dups ride on
    # top ×100 replica cross-products — but NEVER the ≥C(5000,2)
    # boilerplate blowup.
    assert 45 * (n_src // 2) <= n_pairs < 20 * n_docs, n_pairs


def test_planted_corpus_buckets_stay_under_max_bucket(spark):
    """Bounds the MAX_BUCKET assumption behind the planted-minhash
    value-level oracles (round-6 ADVICE): the dedup_minhash /
    curation_pipeline_neardup oracles are exact all-pairs Jaccard, so
    the engine may not silently DROP candidate pairs — which the
    MAX_BUCKET=64 hot-bucket cap would do if any planted-corpus LSH
    bucket exceeded it. This pins the actual bucket ceiling on both
    gate corpora (measured: max 8 at sf0.001, 6 at sf0.01 — 8×+
    headroom), so a testdata or banding change that heats a bucket
    fails HERE with a clear message instead of as a spurious oracle
    hash-mismatch."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import minhash, planted
    from cloud_native_mapreduce_spark.sources.tables import load_table

    for sf_path in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf_path, "documents")
        corpora = {
            "dedup_minhash": planted.with_appended_near_copies(docs),
            "curation_pipeline_neardup": planted.with_appended_near_copies(
                docs.where((F.col("lang") == "en")
                           & F.col("n_chars").between(100, 500))),
        }
        for entry, corpus in corpora.items():
            sigs = minhash.minhash_signatures(
                corpus.select("doc_id", "text"))
            max_sz = (minhash.band_keys(sigs).groupBy("band_key")
                      .agg(F.count("*").alias("sz"))
                      .agg(F.max("sz")).collect()[0][0])
            assert max_sz <= minhash.MAX_BUCKET, (
                f"{entry} planted corpus at {sf_path}: hottest LSH "
                f"bucket {max_sz} > MAX_BUCKET={minhash.MAX_BUCKET}; "
                "the exact-Jaccard oracle would expect pairs the cap "
                "drops — raise max_bucket for the planted entries or "
                "re-plant")


def test_minhash_max_bucket_cap_bounds_hot_buckets(spark):
    """Cap soak, MinHash-LSH path: thousands of near-identical
    boilerplate docs collapse into the same band buckets. The raw
    bucket-size distribution must show buckets far beyond MAX_BUCKET
    (the adversarial input is real), the capped candidate set must be
    orders of magnitude below the hypothetical intra-bucket pair count,
    and natural-corpus dedup must still function."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import minhash
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    boiler = spark.range(3000).select(
        (F.col("id") + 50_000_000).alias("doc_id"),
        F.concat(F.lit(BOILER + " " + BOILER + " copy number "),
                 F.col("id").cast("string")).alias("text"))
    corpus = docs.select("doc_id", "text").unionByName(boiler)

    sigs = minhash.minhash_signatures(corpus).cache()
    sizes = (minhash.band_keys(sigs).groupBy("band_key")
             .agg(F.count("*").alias("sz")))
    dist = sizes.agg(
        F.max("sz").alias("max_sz"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("raw_pairs"),
        F.sum(F.when(F.col("sz") <= minhash.MAX_BUCKET,
                     F.col("sz") * (F.col("sz") - 1) / 2)
               .otherwise(F.lit(0))).alias("capped_pairs")).collect()[0]
    assert dist["max_sz"] > minhash.MAX_BUCKET  # hot buckets exist
    assert dist["capped_pairs"] < dist["raw_pairs"] / 100

    n_cands = minhash.candidate_pairs(sigs).count()
    sigs.unpersist()
    # emitted candidates ≤ the capped intra-bucket pair total, never the
    # ~C(3000,2)·bands raw blowup
    assert n_cands <= dist["capped_pairs"], (n_cands, dist["capped_pairs"])
    assert n_cands < 100_000, n_cands


def test_bpe_tokenizer_agrees_with_duckdb_on_vertical_tab(spark):
    """The BPE pretokenizer's whitespace class is explicit (not \\s)
    precisely because Java and RE2 disagree on U+000B. Prove the Spark
    engine and the DuckDB oracle count identically on VT-bearing and
    other edge-whitespace documents."""
    import duckdb

    from cloud_native_mapreduce_spark.functions import text as T

    docs = [
        ("a\x0bb", 1),           # vertical tab — the divergent char
        ("tab\tsep", 2),
        ("it's 42 ok!", 3),
        ("\x0b\x0b", 4),         # VT-only document
        ("mixed \x0b mid", 5),
    ]
    sdf = spark.createDataFrame(
        [(i, t) for t, i in docs], "doc_id bigint, text string")
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in T.bpe_token_count(sdf).collect()}
    con = duckdb.connect()
    want = {i: con.execute(
        "SELECT len(regexp_extract_all(lower(?), ?, 0))",
        [t, T.BPE_RE]).fetchone()[0]
        for t, i in docs}
    assert got == want, (got, want)


def test_zorder_buckets_are_local_in_both_dims(spark):
    """Z-order bucketing must produce files whose per-dimension spans
    are FRACTIONS of the full range in BOTH dims (that locality is the
    entire point of the layout — a rowid/range split is tight in at
    most one dim). Uniform grid input => each of the 16 z-buckets
    covers ~1/4 of each dimension's range."""
    from cloud_native_mapreduce_spark.operators.advanced import (
        zorder_layout_stats)
    n = 64
    grid = spark.range(n * n).selectExpr(
        "CAST(id div 64 AS BIGINT) AS l_partkey",
        "CAST(id % 64 AS BIGINT) AS l_suppkey")
    out = zorder_layout_stats(grid, bits=4, files=16).collect()
    assert len(out) == 16
    assert sum(r["n_rows"] for r in out) == n * n
    for r in out:
        # each z-bucket spans at most half of each dimension (the
        # theoretical span for 16 buckets on a uniform grid is 1/4;
        # assert the loose 1/2 bound so the test pins locality, not
        # the exact Morton geometry)
        assert r["x_max"] - r["x_min"] < n / 2
        assert r["y_max"] - r["y_min"] < n / 2


def test_triangle_count_known_graph(spark):
    """Order {1,2,3} forms one triangle; order {3,4} adds a pendant
    edge. Canonical ordering must count the triangle exactly once."""
    from cloud_native_mapreduce_spark.operators.graph import triangle_count
    rows = [(100, p) for p in (1, 2, 3)] + [(200, p) for p in (3, 4)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    out = triangle_count(li).first()
    assert (out["n_nodes"], out["n_edges"], out["n_triangles"]) == (4, 4, 1)


def test_triangle_count_degree_cap_drops_hub(spark):
    """A hub vertex over the degree cap is excluded before the closure
    stage; triangles through it disappear, the rest survive."""
    from cloud_native_mapreduce_spark.operators.graph import triangle_count
    # hub part 0 co-occurs with 1..9 (deg 9); parts 1,2,3 form their own
    # triangle in a separate order
    rows = [(i, 0) for i in range(9)] + [(i, i + 1) for i in range(9)]
    rows += [(500, 1), (500, 2), (500, 3)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    out = triangle_count(li, max_degree=5).first()
    assert out["n_triangles"] == 1  # only the 1-2-3 triangle remains


def test_triangle_orientation_bounds_hub_outdegree(spark):
    """Closure-stage soak under adversarial degree skew: a power-law-ish
    co-purchase graph with one sub-cap super-hub. Degree orientation
    must point every hub edge INTO the hub (out-degree ≤ tie-break
    cases), so the per-edge adjacency work the edge-iterator does —
    Σ_e (|N⁺(src)| + |N⁺(dst)|) — stays near-linear in m instead of
    the hub's deg² wedge blow-up, and the count stays exact."""
    import pyspark.sql.functions as F
    from cloud_native_mapreduce_spark.operators.graph import (
        capped_oriented, copart_pairs, triangle_count)
    # hub part 0 pairs with parts 1..80 across 2-line orders (hub deg
    # 80, under the 256 cap — the cap must NOT save us here); parts
    # 1..80 also chain-link (i, i+1) so leaves have deg 2-3; every
    # order {i, i+1} plus {0, i} and {0, i+1} closes a triangle.
    rows = []
    for i in range(1, 81):
        rows += [(i, 0), (i, i)]          # hub-leaf orders
    for i in range(1, 80):
        rows += [(1000 + i, i), (1000 + i, i + 1)]  # leaf chain
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")

    oriented = capped_oriented(copart_pairs(li))
    outdeg = (oriented.groupBy("src").agg(F.count("*").alias("d"))
              .agg(F.max("d").alias("m")).first()["m"])
    m = oriented.count()
    # naive wedge count at the hub alone would be ~deg²/2 = 3200;
    # orientation caps every out-degree at O(√(2m))
    assert outdeg <= int((2 * m) ** 0.5) + 1, (outdeg, m)

    out = triangle_count(li).first()
    # triangles: {0, i, i+1} for i in 1..79 (hub edge to both chain
    # endpoints + the chain edge)
    assert out["n_triangles"] == 79


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.text(alphabet="the ofx 12\t\x0b\fa-Z'", max_size=60),
    min_size=1, max_size=6))
def test_gopher_quality_matches_python_model(spark, texts):
    """Differential check of the Gopher rules against a pure-Python
    model on adversarial text (explicit-whitespace-class edges, digits,
    mixed case, empty strings) — the corpus oracle can't exercise
    these."""
    import re as _re
    from cloud_native_mapreduce_spark.operators.curation import (
        GOPHER_STOPWORDS, gopher_quality)

    ws_re = _re.compile(r"[^ \t\n\x0B\f\r]+")
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    for i, t in enumerate(texts):
        toks = ws_re.findall(t.lower())
        n = len(toks)
        mean_len = round(sum(map(len, toks)) / max(n, 1), 4)
        alpha = sum(1 for w in toks if _re.search(r"[a-z]", w))
        alpha_frac = round(alpha / max(n, 1), 4)
        stop = len(set(toks) & set(GOPHER_STOPWORDS))
        r = got[i]
        assert r["n_words"] == n, (i, t)
        assert r["mean_word_len"] == mean_len, (i, t)
        assert r["alpha_word_frac"] == alpha_frac, (i, t)
        assert r["stop_distinct"] == stop, (i, t)
        assert r["pass_gopher"] == (
            50 <= n <= 100_000 and 3.0 <= mean_len <= 10.0
            and alpha_frac >= 0.8 and stop >= 2), (i, t)


def test_ngram_jaccard_canonicalization_is_result_identical(spark):
    """`dedup_identical=True` (run the Σ df² join on one representative
    per distinct text, expand member pairs afterwards) must emit the
    EXACT same (doc_a, doc_b, jaccard) multiset as the naive per-doc
    plan — duplication changes the cost, never the answer. Corpus: a
    natural slice tiled 3× as byte-identical copies (the round-7 sf1
    soak's blowup shape), plus docs made all-hot by a low cap to pin
    the 'identical pair needs a surviving shingle' edge."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import ngram_jaccard
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "text").limit(60))
    corpus = (docs
              .crossJoin(spark.range(3).select(F.col("id").alias("rep")))
              .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                      .alias("doc_id"), "text"))
    for cap in (128, 4):  # cap=4: most shingles hot -> edge paths
        fast = ngram_jaccard.near_duplicates(
            corpus, threshold=0.3, max_df=cap, dedup_identical=True)
        naive = ngram_jaccard.near_duplicates(
            corpus, threshold=0.3, max_df=cap, dedup_identical=False)
        got = {tuple(r) for r in fast.collect()}
        want = {tuple(r) for r in naive.collect()}
        assert got == want, (
            f"cap={cap}: canonicalized != naive "
            f"(only_fast={sorted(got - want)[:5]}, "
            f"only_naive={sorted(want - got)[:5]})")
        if cap == 128:
            # replica triples guarantee C(3,2)*60 identical pairs at
            # least; the hot-cap pass may legitimately go empty
            assert len(want) >= 180, len(want)


def test_minhash_canonicalization_matches_naive(spark):
    """Canonicalized minhash-LSH (signatures on one rep per distinct
    text, member expansion after) must emit the exact same
    (doc_a, doc_b, jaccard) multiset as the naive per-doc plan on a
    3x-duplicated corpus whose band buckets stay under MAX_BUCKET."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import minhash
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "text").limit(60))
    corpus = (docs
              .crossJoin(spark.range(3).select(F.col("id").alias("rep")))
              .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                      .alias("doc_id"), "text"))
    fast = minhash.near_duplicates(corpus, threshold=0.5,
                                   dedup_identical=True)
    naive = minhash.near_duplicates(corpus, threshold=0.5,
                                    dedup_identical=False)
    got = {tuple(r) for r in fast.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])
    assert len(want) >= 180  # replica triples alone give C(3,2)*60


def test_simhash_canonicalization_matches_naive(spark):
    """Canonicalized simhash (fingerprints on one rep per distinct
    text, member expansion after) must emit the exact same
    (doc_a, doc_b, hamming) multiset as the naive per-doc plan on a
    3x-duplicated corpus whose blocks stay under max_block_df."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import simhash
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "text").limit(60))
    corpus = (docs
              .crossJoin(spark.range(3).select(F.col("id").alias("rep")))
              .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                      .alias("doc_id"), "text"))
    fast = simhash.near_duplicates(corpus, dedup_identical=True)
    naive = simhash.near_duplicates(corpus, dedup_identical=False)
    got = {tuple(r) for r in fast.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])
    assert len(want) >= 180  # replica triples alone give C(3,2)*60


def test_containment_canonicalization_matches_naive(spark):
    """Canonicalized containment (reps + member expansion, intra = c/n)
    must emit the exact same ordered-pair multiset as the naive plan on
    a 3x-duplicated corpus, under a generous and a hot cap."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import ngram_jaccard
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "text").limit(60))
    corpus = (docs
              .crossJoin(spark.range(3).select(F.col("id").alias("rep")))
              .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                      .alias("doc_id"), "text"))
    for cap in (128, 4):
        fast = ngram_jaccard.containment_pairs(
            corpus, threshold=0.2, max_df=cap, dedup_identical=True)
        naive = ngram_jaccard.containment_pairs(
            corpus, threshold=0.2, max_df=cap, dedup_identical=False)
        got = {tuple(r) for r in fast.collect()}
        want = {tuple(r) for r in naive.collect()}
        assert got == want, (
            f"cap={cap}", sorted(got - want)[:5], sorted(want - got)[:5])
        if cap == 128:
            assert len(want) >= 360  # ordered replica pairs: 6*60


def test_adaptive_canonicalization_gate(spark):
    """"auto" fires only at membership-weighted duplication factor
    (sum gsz^2 / n) >= AUTO_RATIO: distinct and uniformly-2x corpora
    resolve to the naive plan (the premium-free path the round-7 bench
    showed is faster below ~3x), 3x+ corpora to the canonical one;
    explicit bool pins always pass through untouched. The weighted
    statistic (not mean n/distinct) is what fires on CONCENTRATED
    duplication — a 10x-duplicated half diluted by a distinct half —
    which the sf1 soak showed is the shape that goes quadratic."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup import canonical

    def tiled(n_reps):
        return (spark.range(50)
                .crossJoin(spark.range(n_reps)
                           .select(F.col("id").alias("rep")))
                .selectExpr("id + rep * 1000000 as doc_id",
                            "concat('document body ', id) as text"))

    distinct = tiled(1)
    assert canonical.duplication_factor(distinct, F.col("text")) == 1.0
    assert canonical.resolve(distinct, F.col("text"), "auto") is False
    doubled = tiled(2)
    assert canonical.duplication_factor(doubled, F.col("text")) == 2.0
    assert canonical.resolve(doubled, F.col("text"), "auto") is False
    tripled = tiled(3)
    assert canonical.duplication_factor(tripled, F.col("text")) == 3.0
    assert canonical.resolve(tripled, F.col("text"), "auto") is True
    # explicit pins skip the pre-aggregate decision entirely
    assert canonical.resolve(distinct, F.col("text"), True) is True
    assert canonical.resolve(tripled, F.col("text"), False) is False
    # CONCENTRATED duplication: 10 copies of 50 docs diluted by 450
    # distinct docs -> mean factor 500/950 groups ~ 1.9 would miss it,
    # weighted (50*100 + 450)/950 ~ 5.7 fires -> canonical
    diluted = tiled(10).where(F.col("doc_id") % 1000000 < 50).unionByName(
        spark.range(450).selectExpr("id + 5000 as doc_id",
                                    "concat('unique text ', id) as text"))
    assert canonical.duplication_factor(diluted, F.col("text")) > 5.0
    assert canonical.resolve(diluted, F.col("text"), "auto") is True
    # empty corpus: nothing to canonicalize
    empty = distinct.where(F.lit(False))
    assert canonical.resolve(empty, F.col("text"), "auto") is False


def test_scd2_asof_join_exactly_one_version_per_covered_event(spark):
    """Hand-built SCD2 consumer semantics: a customer's intervals
    partition [first_order, sentinel), so every event at-or-after the
    first order matches EXACTLY one version (no fan-out, no gap), an
    event before it surfaces once with NULL version columns, and a
    same-date order tie yields the higher orderkey's version (the
    zero-width [d, d) interval of the lower one matches nothing)."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.operators.relational import (
        scd2_pointintime_join)
    orders = spark.createDataFrame(
        [(1, 7, "1995-01-10"), (2, 7, "1995-03-01"),
         # same-date tie: orderkeys 3 < 4 on 1995-03-01 — 3 gets [d,d)
         (3, 9, "1995-03-01"), (4, 9, "1995-03-01"),
         (5, 9, "1995-06-01")],
        "o_orderkey long, o_custkey long, o_orderdate string") \
        .withColumn("o_orderdate",
                    F.col("o_orderdate").cast("timestamp"))
    events = spark.createDataFrame(
        [(100, 7, "1994-12-31"),   # before first version -> NULLs
         (101, 7, "1995-01-10"),   # inclusive lower bound
         (102, 7, "1995-02-28"),   # inside v1
         (103, 7, "1995-03-01"),   # exclusive upper: lands in v2
         (104, 9, "1995-03-01"),   # tie date: must match orderkey 4
         (105, 9, "1999-01-01")],  # open-ended current version
        "event_id long, user_id long, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_pointintime_join(events, orders).collect()
    assert len(out) == 6, "fan-out or dropped events"
    got = {r.event_id: (r.version_orderkey, r.is_current) for r in out}
    assert got[100] == (None, None)
    assert got[101] == (1, False)
    assert got[102] == (1, False)
    assert got[103] == (2, True)
    assert got[104] == (4, False)
    assert got[105] == (5, True)


def test_incremental_dedup_handbuilt_semantics(spark, tmp_path):
    """Hand-built incremental dedup: an exact copy of an indexed doc
    scores J=1.0, a near-copy clears the threshold, a novel doc emits
    nothing, and new-vs-new pairs are never emitted (two identical NEW
    docs each match the OLD original but not each other)."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup.incremental import (
        build_minhash_index, incremental_near_duplicates)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    corpus = spark.createDataFrame(
        [(1, base),
         (2, "completely different content about database engines "
             "and distributed query processing at large scale")],
        "doc_id long, text string")
    build_minhash_index(corpus, "cnms_mh_h", str(tmp_path / "ix"))
    try:
        newb = spark.createDataFrame(
            [(101, base),                       # exact copy of doc 1
             (102, base),                       # second exact copy
             (103, base + " with a tiny tail"),  # near copy
             (104, "entirely novel text that resembles nothing in "
                   "the index at all whatsoever believe me")],
            "doc_id long, text string")
        out = incremental_near_duplicates(spark, "cnms_mh_h", newb,
                                          threshold=0.5).collect()
        got = {(r.doc_new, r.doc_old): r.jaccard for r in out}
        assert got[(101, 1)] == 1.0
        assert got[(102, 1)] == 1.0
        assert 0.5 <= got[(103, 1)] < 1.0
        assert all(new != 104 for new, _ in got)
        assert all(old in (1, 2) for _, old in got)
        assert all(new > 100 for new, _ in got)
    finally:
        spark.sql("DROP TABLE IF EXISTS cnms_mh_h_bands")
        spark.sql("DROP TABLE IF EXISTS cnms_mh_h_shingles")


# ---------------------------------------------------------------------------
# Round-10 batch 2: property tests vs independent Python references
# ---------------------------------------------------------------------------

def _ref_bpe(word_counts: dict, n_merges: int):
    """Independent in-memory BPE trainer (dict/list, no string-replace
    trick) — validates the distributed padded-replace implementation
    against textbook tuple-sequence merging."""
    seqs = {w: tuple(w) for w in word_counts}
    out = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        out.append((rank, f"{a} {b}", a + b, c))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = tuple(merged)
    return out


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=8),
                min_size=1, max_size=30))
def test_bpe_train_matches_reference_trainer(spark, words):
    from cloud_native_mapreduce_spark.functions.bpe import bpe_train_merges
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    got = sorted((r.merge_rank, r.pair, r.merged, r.pair_count)
                 for r in bpe_train_merges(docs, n_merges=3).collect())
    wc: dict = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    assert got == _ref_bpe(wc, 3)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=4, max_size=7),
                min_size=0, max_size=25))
def test_fuzzy_join_matches_brute_force(spark, words):
    from cloud_native_mapreduce_spark.dedup.fuzzy import fuzzy_token_join
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    got = sorted((r.word_a, r.word_b)
                 for r in fuzzy_token_join(docs).collect())
    vocab = sorted({w for w in words if len(w) >= 4})
    want = sorted((a, b) for i, a in enumerate(vocab)
                  for b in vocab[i + 1:] if _ref_lev(a, b) <= 1)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 6), st.integers(1, 6),
                          st.integers(1, 9)),
                min_size=1, max_size=15))
def test_sssp_matches_bellman_ford(spark, triples):
    from cloud_native_mapreduce_spark.operators.graph import (
        SSSP_INF, sssp_weighted)
    # encode each (u, v, q) as an order with two lines of quantity q:
    # edge weight becomes min over orders of 2q
    rows = []
    for k, (u, v, q) in enumerate(triples):
        if u == v:
            continue
        rows += [(100 + k, u, float(q)), (100 + k, v, float(q))]
    if not rows:
        return
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double")
    got = {r.v: r.dist for r in sssp_weighted(li).collect()}
    # reference: 4 rounds of synchronous relaxation on the same graph
    w: dict = {}
    for k, (u, v, q) in enumerate(triples):
        if u == v:
            continue
        e = tuple(sorted((u, v)))
        w[e] = min(w.get(e, 10 ** 9), 2 * q)
    verts = sorted({x for e in w for x in e})
    src = min(verts)
    dist = {v: (0 if v == src else SSSP_INF) for v in verts}
    for _ in range(4):
        nxt = dict(dist)
        for (a, b), wt in w.items():
            nxt[b] = min(nxt[b], dist[a] + wt)
            nxt[a] = min(nxt[a], dist[b] + wt)
        dist = nxt
    assert got == dist


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)),
                min_size=1, max_size=40))
def test_salted_replicate_join_equals_plain_join(spark, rows):
    from cloud_native_mapreduce_spark.operators.skew import (
        salted_replicate_join)
    facts = spark.createDataFrame(
        [(k, v) for k, v in rows], "k long, v long")
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, name string")
    got = sorted((r.k, r.v, r.name)
                 for r in salted_replicate_join(
                     facts, dim, "k", n_salts=4, salt_src="v")
                 .collect())
    want = sorted((r.k, r.v, r.name)
                  for r in facts.join(dim, "k").collect())
    assert got == want


# ---------------------------------------------------------------------------
# Round-10 batch 3: sweep-line, HLL merge, CMS linearity properties
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 4),          # user_id
                          st.integers(0, 5000)),      # minute offset
                min_size=1, max_size=40))
def test_session_concurrency_matches_bruteforce_sweep(spark, evts):
    """Peak concurrency per day must equal a brute-force interval
    count over the same gap-sessionized intervals (closed [s, e],
    active-at-instant semantics evaluated at every session boundary
    plus each day's midnight carry-in)."""
    from collections import defaultdict
    from datetime import datetime, timedelta

    from cloud_native_mapreduce_spark.operators.events import (
        session_concurrency,
    )
    base = datetime(2024, 1, 1)
    rows = [(i, (base + timedelta(minutes=m)).strftime("%Y-%m-%d %H:%M:%S"),
             u, "view", 1.0) for i, (u, m) in enumerate(evts)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts",
                    "user_id", "event_type", "value")
    got = {r.day: (r.n_starts, r.peak_concurrent)
           for r in session_concurrency(df).collect()}

    # brute force: sessionize per user (gap >= 30 min splits), then
    # evaluate concurrency at every boundary instant.
    per_user = defaultdict(list)
    for i, (u, m) in enumerate(evts):
        per_user[u].append((base + timedelta(minutes=m), i))
    sessions = []
    for u, ts in per_user.items():
        ts.sort(key=lambda p: (p[0], p[1]))
        s = e = ts[0][0]
        for t, _ in ts[1:]:
            if (t - e) >= timedelta(minutes=30):
                sessions.append((s, e))
                s = t
            e = t
        sessions.append((s, e))
    instants = sorted({s for s, _ in sessions}
                      | {e + timedelta(seconds=1) for _, e in sessions})

    def conc_at(t):
        return sum(1 for s, e in sessions if s <= t <= e)

    days = sorted({t.date() for t in instants})
    want = {}
    for d in days:
        day_instants = [t for t in instants if t.date() == d]
        carry_ts = [t for t in instants if t.date() < d]
        carry = conc_at(carry_ts[-1]) if carry_ts else 0
        peak = max([conc_at(t) for t in day_instants] + [carry])
        starts = sum(1 for s, _ in sessions if s.date() == d)
        want[str(d)] = (starts, peak)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                min_size=1, max_size=60),
       st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                min_size=1, max_size=60))
def test_hll_registers_merge_is_exact(spark, xs, ys):
    """Mergeability: registers(A ∪ B) == element-wise max of
    registers(A) and registers(B) — EXACTLY (max is associative and
    commutative), for arbitrary overlapping sets. This is the
    algebraic fact the whole persist-and-merge path rests on."""
    from cloud_native_mapreduce_spark.operators.sketches import (
        hll_registers,
    )

    def regs(vals):
        df = spark.createDataFrame([(v,) for v in vals], "k string")
        return {r.bucket: r.m for r in hll_registers(df, "k").collect()}

    ra, rb, ru = regs(xs), regs(ys), regs(xs + ys)
    merged = {b: max(ra.get(b, 0), rb.get(b, 0))
              for b in set(ra) | set(rb)}
    assert ru == merged


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=4),
                min_size=1, max_size=50),
       st.lists(st.text(alphabet="abcde", min_size=1, max_size=4),
                min_size=1, max_size=50))
def test_cms_is_linear_and_upper_bounds(spark, xs, ys):
    """Linearity: sketch(A ⊎ B) == element-wise sum of the two
    sketches — exactly (counters are exact integer sums). And the
    point-estimate upper bound: est(q) >= true multiset count for
    every queried item."""
    from collections import Counter

    from cloud_native_mapreduce_spark.operators.sketches import (
        cms_point_estimates,
        cms_sketch,
    )

    def freq_df(vals):
        c = Counter(vals)
        return spark.createDataFrame(
            [(w, n) for w, n in c.items()], "word string, cnt long")

    def sk(vals):
        return {(r.depth, r.cell): r.counter
                for r in cms_sketch(freq_df(vals), "word",
                                    "cnt").collect()}

    sa, sb, su = sk(xs), sk(ys), sk(xs + ys)
    summed = Counter()
    for d in (sa, sb):
        for k, v in d.items():
            summed[k] += v
    assert su == dict(summed)

    queries = sorted(set(xs[:3] + ys[:3]))
    est = {r.word: (r.est_count, r.true_count)
           for r in cms_point_estimates(freq_df(xs + ys), "word",
                                        "cnt", queries).collect()}
    true = Counter(xs + ys)
    for q in queries:
        e, t = est[q]
        assert t == true[q]
        assert e >= t


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=1200),
       st.sampled_from([2, 3, 5, 8]))
def test_gif_lzw_roundtrip_hypothesis(data, mcs):
    """Adversarial LZW round-trip: hypothesis-shrunk byte strings
    (masked into the symbol alphabet) across code sizes — the
    dictionary-reset and width-bump edges the deterministic fuzz
    samples only randomly."""
    from cloud_native_mapreduce_spark.multimodal.gif import (
        _lzw_decode,
        _lzw_encode,
    )
    data = bytes(b & ((1 << mcs) - 1) for b in data)
    assert _lzw_decode(_lzw_encode(data, mcs), mcs,
                       len(data)) == data


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=1200))
def test_tiff_lzw_roundtrip_hypothesis(data):
    from cloud_native_mapreduce_spark.multimodal.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )
    assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 24), st.integers(1, 12),
       st.binary(min_size=0, max_size=288), st.booleans())
def test_bmp_roundtrip_hypothesis(w, h, noise, rle):
    """Adversarial BMP round-trip in BOTH codings: hypothesis-shrunk
    rasters (noise masked into the 16-color palette, padded/truncated
    to w*h) — RLE8 maximal-run and absolute-mode boundaries land on
    shrunk minimal cases instead of random ones."""
    from cloud_native_mapreduce_spark.multimodal.bmp import (
        decode_bmp,
        encode_bmp,
    )
    need = w * h
    px = [(b % 16) for b in (noise * (need // max(len(noise), 1) + 1)
                             if noise else b"\x00" * need)][:need]
    if len(px) < need:
        px += [0] * (need - len(px))
    got = decode_bmp(encode_bmp(w, h, px, n_colors=16, rle=rle))
    assert got == (w, h, 1 if rle else 0, 16, px)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(0, 3000), min_size=1, max_size=400),
       st.lists(st.integers(0, 3000), min_size=1, max_size=400))
def test_kmv_union_merge_is_exact(spark, xs, ys):
    """Theta-family mergeability: sketch(A ∪ B) == the k smallest of
    the two sketches' hash union — EXACTLY (k-smallest of a fixed
    hash is a pure set function), including past the k boundary when
    |A ∪ B| > KMV_K."""
    from cloud_native_mapreduce_spark.operators.sketches import (
        KMV_K,
        kmv_sketch,
    )
    rows = ([("a", x) for x in xs] + [("b", y) for y in ys]
            + [("u", v) for v in xs + ys])
    df = spark.createDataFrame(rows, "s string, item long")
    out = kmv_sketch(df, "s", "item").collect()
    by = {"a": [], "b": [], "u": []}
    for r in out:
        by[r.s].append(r.h)
    merged = sorted(set(by["a"]) | set(by["b"]))[:KMV_K]
    assert sorted(by["u"]) == merged


@settings(max_examples=2, deadline=None)
@given(st.lists(st.floats(min_value=0.01, max_value=9e6,
                          allow_nan=False, allow_infinity=False),
                min_size=4, max_size=120))
def test_hdr_quantiles_error_bound_and_merge(spark, vals):
    """The HDR sketch's two theorems, on arbitrary positive inputs:
    (1) every reported quantile is within one bucket (<= 2^-5 relative
    error + the half-cent rounding) of the true order statistic;
    (2) the 'ALL' sketch — produced by the bucket-wise-SUM merge law,
    never a rescan — reports IDENTICAL estimates to a sketch built
    over the unsplit input (counts are exact integers, so the merge
    is exact, not approximate)."""
    from cloud_native_mapreduce_spark.operators.sketches import (
        HDR_QUANTILES,
        HDR_SUB_BITS,
        hdr_quantiles,
    )

    # arbitrary 2-way split: the per-group sketches the merge combines
    rows = [(("A" if i % 2 else "B"), float(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "l_returnflag string, "
                                     "l_extendedprice double")
    got = {(r.l_returnflag, r.q_label): r
           for r in hdr_quantiles(df).collect()}

    cents = sorted(round(v * 100) for v in vals)
    n = len(cents)
    for qn, qd, label in HDR_QUANTILES:
        r = -(-qn * n // qd)  # ceil(q*n)
        true = cents[max(r, 1) - 1] / 100.0
        est = got[("ALL", label)].est_price
        tol = true * 2.0 ** -HDR_SUB_BITS + 0.01
        assert abs(est - true) <= tol, (label, est, true, tol)

    # merge exactness: rebuild with a single group; 'ALL' must agree
    one = spark.createDataFrame([("X", float(v)) for v in vals],
                                "l_returnflag string, "
                                "l_extendedprice double")
    direct = {r.q_label: r.est_price for r in hdr_quantiles(one).collect()
              if r.l_returnflag == "ALL"}
    for (g, label), row in got.items():
        if g == "ALL":
            assert row.est_price == direct[label]


def test_prefix_join_canonicalization_is_result_identical(spark):
    """jaccard_prefix_join's `dedup_identical=True` (prefix-filter on
    one representative per distinct text, expand member pairs after;
    intra-group pairs J=1.0) must emit the EXACT same (doc_a, doc_b,
    n_shared, jaccard) multiset as the direct per-doc plan — the
    natural corpora never turn the canonical path on (no exact
    duplicates), so without this differential the soak-critical path
    would be value-untested. Corpus: a natural slice tiled 3× as
    byte-identical copies (the round-7 blowup shape)."""
    from pyspark.sql import functions as F

    from cloud_native_mapreduce_spark.dedup.prefix_join import (
        jaccard_prefix_join)
    from cloud_native_mapreduce_spark.sources.tables import load_table

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "text").limit(40))
    corpus = (docs
              .crossJoin(spark.range(3).select(F.col("id").alias("rep")))
              .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                      .alias("doc_id"), "text"))
    fast = jaccard_prefix_join(corpus, dedup_identical=True)
    naive = jaccard_prefix_join(corpus, dedup_identical=False)
    got = {tuple(r) for r in fast.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want, (
        f"canonicalized != naive (only_fast={sorted(got - want)[:5]}, "
        f"only_naive={sorted(want - got)[:5]})")
    # the tiled corpus must actually exercise both legs: intra-group
    # twins (J exactly 1.0) and cross-group expanded pairs
    assert any(j == 1.0 for *_, j in got)
    assert len(got) > 3 * len(
        {tuple(r) for r in jaccard_prefix_join(
            docs, dedup_identical=False).collect()})


# --- round-12 extension wave: generated-input differentials -------------

_cents_series = st.lists(
    st.integers(min_value=0, max_value=50_000), min_size=1, max_size=12)


def _events_from_cents(spark, cents, event_type="click"):
    import datetime
    rows = [(i, datetime.datetime(2024, 1, 1 + i), 1, event_type,
             c / 100.0)
            for i, c in enumerate(cents)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


@settings(max_examples=5, deadline=None)
@given(_cents_series)
def test_max_drawdown_matches_bruteforce(spark, cents):
    """Spark drawdown == the obvious O(n^2) Python scan."""
    from cloud_native_mapreduce_spark.operators.events import (
        max_drawdown_daily)
    r = max_drawdown_daily(_events_from_cents(spark, cents)).collect()[0]
    best = (0, None, None)   # (dd, peak_day, trough_day)
    peak, peak_i = cents[0], 0
    for i, v in enumerate(cents):
        if v > peak:
            peak, peak_i = v, i
        dd = peak - v
        if dd > best[0] or best[1] is None:
            # earliest trough; peak day = earliest day achieving the
            # trough's running peak
            pk = next(j for j in range(i + 1) if cents[j] == peak)
            best = (dd, pk, i)
    assert round(r.max_drawdown * 100) == best[0]
    assert r.peak_day == f"2024-01-{best[1] + 1:02d}"
    assert r.trough_day == f"2024-01-{best[2] + 1:02d}"


@settings(max_examples=5, deadline=None)
@given(_cents_series)
def test_hodges_lehmann_matches_bruteforce(spark, cents):
    """Spark HL == sorted Walsh-average lower median in Python."""
    from cloud_native_mapreduce_spark.operators.events import (
        hodges_lehmann_daily)
    r = hodges_lehmann_daily(
        _events_from_cents(spark, cents)).collect()[0]
    walsh = sorted((cents[i] + cents[j], i, j)
                   for i in range(len(cents))
                   for j in range(i, len(cents)))
    k = (len(walsh) + 1) // 2
    assert r.n_pairs == len(walsh)
    assert r.hl_dollars == round(walsh[k - 1][0] / 200.0, 6)


@settings(max_examples=4, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 8), st.integers(1, 8)),
                min_size=1, max_size=12))
def test_luby_mis_always_maximal_independent(spark, pairs):
    """On ANY generated graph the result is an independent set and
    maximal (every non-member has a member neighbor)."""
    from cloud_native_mapreduce_spark.operators.graph import luby_mis
    rows = [(i, a, 1.0) for i, (a, b) in enumerate(pairs)] + \
           [(i, b, 1.0) for i, (a, b) in enumerate(pairs)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double")
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    if not edges:
        return
    mis = {r.partkey for r in luby_mis(li).collect()}
    nb = {}
    for a, b in edges:
        nb.setdefault(a, set()).add(b)
        nb.setdefault(b, set()).add(a)
    assert not any(a in mis and b in mis for a, b in edges)
    assert all(v in mis or nb[v] & mis for v in nb)


@settings(max_examples=4, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=1, max_size=14))
def test_dbscan_matches_naive_python(spark, pts):
    """Blocked grid DBSCAN == a from-scratch naive DBSCAN with the
    same deterministic pins (min-core-id labels, min-label borders)
    on arbitrary generated point sets (duplicates included)."""
    from cloud_native_mapreduce_spark.operators.spatial import (
        dbscan_grid)
    eps, min_pts = 2, 3
    rows = [(256 * i + y, float(x) / 100.0)
            for i, (x, y) in enumerate(pts)]
    keys = [256 * i + y for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_acctbal double")
    got = {r.custkey: (r.role, r.cluster)
           for r in dbscan_grid(df, eps=eps, min_pts=min_pts)
           .collect()}

    def cheb(i, j):
        return max(abs(pts[i][0] - pts[j][0]),
                   abs(pts[i][1] - pts[j][1]))
    n = len(pts)
    nbrs = {i: [j for j in range(n) if j != i and cheb(i, j) <= eps]
            for i in range(n)}
    cores = {i for i in range(n) if len(nbrs[i]) + 1 >= min_pts}
    # components over cores (union-find), label = min core key
    parent = {i: i for i in cores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for i in cores:
        for j in nbrs[i]:
            if j in cores:
                parent[find(i)] = find(j)
    comp_label = {}
    for i in cores:
        r = find(i)
        comp_label[r] = min(keys[i], comp_label.get(r, keys[i]))
    want = {}
    for i in range(n):
        if i in cores:
            want[keys[i]] = ("core", comp_label[find(i)])
        else:
            adj_cores = [j for j in nbrs[i] if j in cores]
            if adj_cores:
                want[keys[i]] = ("border", min(
                    comp_label[find(j)] for j in adj_cores))
            else:
                want[keys[i]] = ("noise", -1)
    assert got == want


@settings(max_examples=4, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=4, max_size=10))
def test_kruskal_wallis_matches_midrank_replica(spark, cents):
    """Spark KW == an exact Python replica of the quantized-term
    formula (midranks, per-group integer DIV terms)."""
    from cloud_native_mapreduce_spark.operators.events import (
        kruskal_wallis_dow, KW_SCALE)
    df = _events_from_cents(spark, cents)
    r = kruskal_wallis_dow(df).collect()[0]
    n = len(cents)
    # dow of 2024-01-(1+i): 2024-01-01 is a Monday -> dow = i % 7
    groups = {}
    svals = sorted(cents)
    for i, v in enumerate(cents):
        rk = svals.index(v) + 1          # rank() semantics
        tie = svals.count(v)
        groups.setdefault(i % 7, []).append(2 * rk + tie - 1)
    srr_q = sum((sum(g) ** 2) * KW_SCALE // len(g)
                for g in groups.values())
    h = 3.0 * (srr_q / KW_SCALE) / (n * (n + 1)) - 3.0 * (n + 1)
    assert r.n == n
    assert r.h == round(round(h, 6) + 0.0, 6)


def _ref_copart(rows):
    """Pure-Python co-purchase edge replica of graph.copart_edges for
    small generated baskets (cap never bites at these degrees)."""
    baskets: dict = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    edges = set()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                edges.add((x, y))
    return edges


def _li(spark, rows):
    return spark.createDataFrame(
        [(o, p, 1.0) for o, p in rows] or [(1, 1, 1.0)],
        "l_orderkey long, l_partkey long, l_quantity double")


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 8), st.integers(1, 10)),
                min_size=2, max_size=30))
def test_wl_fingerprints_matches_python_refinement(spark, rows):
    """wl_fingerprints == a pure-Python 1-WL refinement replica
    (round-12 verdict item 9): same md5 label function, same sorted
    neighbor-multiset join, same Σ hash·count fingerprint — computed
    networkx-free from the generated baskets."""
    import hashlib

    from cloud_native_mapreduce_spark.operators.graph import (
        wl_fingerprints)

    edges = _ref_copart(rows)
    if not edges:
        return  # refinement over an empty graph: nothing to assert
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {v: "1" for v in adj}
    want = []
    for r in (1, 2, 3):
        lbl = {v: hashlib.md5(
            "{}|{}".format(
                lbl[v], ",".join(sorted(lbl[w] for w in adj[v])))
            .encode()).hexdigest()[:8] for v in adj}
        classes = collections.Counter(lbl.values())
        want.append((r, len(classes), max(classes.values()),
                     sum(int(h, 16) * c for h, c in classes.items())))
    got = sorted((r.round, r.n_distinct_labels, r.max_class,
                  r.fingerprint)
                 for r in wl_fingerprints(_li(spark, rows)).collect())
    assert got == want


def _ref_components(verts, edges):
    """Union-find over a small vertex/edge set → component sizes."""
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    sizes = collections.Counter(find(v) for v in verts)
    return len(sizes), max(sizes.values())


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 8), st.integers(1, 10)),
                min_size=2, max_size=30))
def test_hub_removal_matches_python_replica(spark, rows):
    """hub_removal_impact == an exact small-graph replica
    (round-12 verdict item 9): top-k hubs under (degree DESC, vertex),
    removal, then union-find component counts before/after."""
    from cloud_native_mapreduce_spark.operators.graph import (
        HUB_REMOVAL_K, hub_removal_impact)

    edges = _ref_copart(rows)
    if not edges:
        return
    verts = {v for e in edges for v in e}
    deg = collections.Counter(v for e in edges for v in e)
    hubs = set(sorted(verts, key=lambda v: (-deg[v], v))
               [:HUB_REMOVAL_K])
    n_before, g_before = _ref_components(verts, edges)
    verts_a = verts - hubs
    edges_a = {(a, b) for a, b in edges
               if a not in hubs and b not in hubs}
    if verts_a:
        n_after, g_after = _ref_components(verts_a, edges_a)
    else:
        n_after, g_after = 0, None

    got = hub_removal_impact(_li(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_vertices, r.n_edges) == (len(verts), len(edges))
    assert (r.n_comp_before, r.giant_before) == (n_before, g_before)
    assert (r.n_comp_after, r.giant_after) == (n_after, g_after)


# --- round-14 wave: replicas for the newest hard operators ---------------

_mp_series = st.lists(
    st.integers(min_value=0, max_value=50_000), min_size=1, max_size=26)


@settings(max_examples=5, deadline=None)
@given(_mp_series)
def test_matrix_profile_matches_numpy_replica(spark, cents):
    """matrix_profile_daily == a sliding-window brute-force replica
    (round-13 verdict #6): exact integer Σ(Δcents)² distances, the
    |i−j| ≥ m exclusion zone, argmin ties toward the lower partner
    index. Series shorter than 2m produce NO rows (no admissible
    pair) — the replica asserts that too."""
    from cloud_native_mapreduce_spark.operators.events import (
        MP_WINDOW, matrix_profile_daily)
    m = MP_WINDOW
    n_win = len(cents) - m + 1
    want = {}
    for i in range(max(0, n_win)):
        best = None
        for j in range(n_win):
            if abs(i - j) < m:
                continue
            d2 = sum((cents[i + o] - cents[j + o]) ** 2
                     for o in range(m))
            if best is None or d2 < best[0] or (d2 == best[0]
                                                and j < best[1]):
                best = (d2, j)
        if best is not None:
            want[i] = (best[1], best[0])
    got = {r.pos: (r.nn_pos, r.d2)
           for r in matrix_profile_daily(
               _events_from_cents(spark, cents)).collect()}
    assert got == want


_journey_rows = st.lists(
    st.tuples(st.integers(0, 3),      # user_id
              st.integers(0, 4)),     # event-type index
    min_size=0, max_size=40)

_ATTR_ET = ("click", "error", "signup", "view", "purchase")


def _attr_replica(rows):
    """Pure-Python absorbing-chain replica of
    removal_effect_attribution: journey segmentation, exact
    count/total transition probabilities, then ATTR_ROUNDS Jacobi
    rounds in the SAME pinned term order as removal_round_exprs —
    the unrolled expression stack is exactly where a term-order bug
    would hide, so the replica re-adds left-to-right over
    ATTR_CHANNELS like the SQL text does."""
    from cloud_native_mapreduce_spark.operators.events import (
        ATTR_CHANNELS, ATTR_ROUNDS)
    by_user = collections.defaultdict(list)
    for seqno, (u, et) in enumerate(rows):
        by_user[u].append(_ATTR_ET[et])
    counts = collections.Counter()
    for evs in by_user.values():
        journeys = collections.defaultdict(list)
        j = 0
        for et in evs:
            journeys[j].append("conv" if et == "purchase" else et)
            if et == "purchase":
                j += 1
        for sts in journeys.values():
            counts[("start", sts[0])] += 1
            for i, s in enumerate(sts):
                if s == "conv":
                    continue
                counts[(s, sts[i + 1] if i + 1 < len(sts)
                        else "null")] += 1
    tot = collections.Counter()
    for (f, _), n in counts.items():
        tot[f] += n
    P = {(s, t): (counts[(s, t)] / tot[s] if counts[(s, t)] else 0.0)
         for s in ("start",) + ATTR_CHANNELS
         for t in ATTR_CHANNELS + ("conv",)}

    def chain_sum(vals, t, skip=None):
        acc = None
        for u in ATTR_CHANNELS:
            if u == skip:
                continue
            x = vals[u] * P[(t, u)]
            acc = x if acc is None else acc + x
        return P[(t, "conv")] + acc if acc is not None else P[(t, "conv")]

    v_full = {t: 0.0 for t in ATTR_CHANNELS}
    v_rm = {c: {t: 0.0 for t in ATTR_CHANNELS} for c in ATTR_CHANNELS}
    for _ in range(ATTR_ROUNDS):
        v_full = {t: chain_sum(v_full, t) for t in ATTR_CHANNELS}
        v_rm = {c: {t: (0.0 if t == c
                        else chain_sum(v_rm[c], t, skip=c))
                    for t in ATTR_CHANNELS} for c in ATTR_CHANNELS}

    def start_sum(vals, skip=None):
        acc = None
        for u in ATTR_CHANNELS:
            if u == skip:
                continue
            x = vals[u] * P[("start", u)]
            acc = x if acc is None else acc + x
        base = P[("start", "conv")]
        return base + acc if acc is not None else base

    p_full = start_sum(v_full)
    p_rm = {c: start_sum(v_rm[c], skip=c) for c in ATTR_CHANNELS}
    re_ = {c: (p_full - p_rm[c]) / p_full for c in ATTR_CHANNELS}
    re_total = None
    for c in ATTR_CHANNELS:
        re_total = re_[c] if re_total is None else re_total + re_[c]
    return {c: (round(p_full, 6), round(p_rm[c], 6), round(re_[c], 6),
                round(re_[c] / re_total, 6))
            for c in ATTR_CHANNELS}


@settings(max_examples=5, deadline=None)
@given(_journey_rows)
def test_removal_effect_matches_python_replica(spark, rows):
    """removal_effect_attribution == the pure-Python absorbing-chain
    replica on generated journeys (round-13 verdict #6). Two pinned
    users guarantee p_full > 0 and re_total > 0 (a direct conversion
    and a click→purchase journey), so the shares are always
    well-defined while hypothesis varies everything else."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import (
        removal_effect_attribution)
    rows = [(90, 4), (91, 0), (91, 4), *rows]
    data = [(i, datetime.datetime(2024, 1, 1, 0, 0, i % 60, i),
             u, _ATTR_ET[et], 1.0)
            for i, (u, et) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    want = _attr_replica(rows)
    got = {r.channel: (r.p_full, r.p_removed, r.removal_effect,
                       r.attribution_share)
           for r in removal_effect_attribution(df).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Round-14 extension differentials: JT vs brute force, chain-ladder vs
# a pure-Python triangle replica (the generated-input program that
# caught defects in rounds 12-14)
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 3), st.integers(1, 5)),
                min_size=4, max_size=24))
def test_jonckheere_matches_bruteforce(spark, pairs):
    """2J from the cell-table join must equal the brute-force pair
    count 2·#{x<y} + #{x=y} over ordered group pairs, and the
    variance must match the tie-corrected formula computed directly
    from the generated sample."""
    import math

    from cloud_native_mapreduce_spark.operators.stats import (
        jonckheere_terpstra)
    names = {1: "1-URGENT", 2: "2-HIGH", 3: "3-MEDIUM"}
    orders = spark.createDataFrame(
        [(i, names[w]) for i, (w, _) in enumerate(pairs)],
        "o_orderkey long, o_orderpriority string")
    lineitem = spark.createDataFrame(
        [(i, float(q)) for i, (_, q) in enumerate(pairs)],
        "l_orderkey long, l_quantity double")
    r = jonckheere_terpstra(lineitem, orders).collect()[0]
    j2 = 0
    for wi, qi in pairs:
        for wj, qj in pairs:
            if wi < wj:
                if qi < qj:
                    j2 += 2
                elif qi == qj:
                    j2 += 1
    assert r.j_stat == j2 / 2.0
    n = len(pairs)
    sizes = collections.Counter(w for w, _ in pairs)
    ties = collections.Counter(q for _, q in pairs)
    mean2 = (n * n - sum(g * g for g in sizes.values())) / 2.0
    assert r.j_expected == round(mean2 / 2.0, 2)
    a = (n * (n - 1) * (2 * n + 5)
         - sum(g * (g - 1) * (2 * g + 5) for g in sizes.values())
         - sum(t * (t - 1) * (2 * t + 5)
               for t in ties.values())) / 72.0
    b = (sum(g * (g - 1) * (g - 2) for g in sizes.values())
         * sum(t * (t - 1) * (t - 2) for t in ties.values())
         / (36.0 * n * (n - 1) * (n - 2))) if n > 2 else 0.0
    c = (sum(g * (g - 1) for g in sizes.values())
         * sum(t * (t - 1) for t in ties.values())
         / (8.0 * n * (n - 1)))
    var = a + b + c
    if n > 2 and var > 0:
        assert r.z_stat == round((j2 - mean2) / (2 * math.sqrt(var)),
                                 6)
    else:
        assert r.z_stat is None


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 4), st.integers(0, 27),
                          st.booleans()),
                min_size=2, max_size=30))
def test_chain_ladder_matches_python_triangle(spark, evs):
    """Ultimates from the Spark grid/factor pipeline must equal a
    pure-Python chain-ladder on the same generated (user, day,
    is_purchase) events — including the dense-zero-cell and
    factor-eligibility rules."""
    import datetime as dt
    import math

    from cloud_native_mapreduce_spark.operators.events import (
        chain_ladder_forecast)
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, base + dt.timedelta(days=day), user,
             "purchase" if p else "click", 1.0, "{}")
            for i, (user, day, p) in enumerate(evs)]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r.cohort_week: (r.latest_age, r.observed_cum, r.ultimate)
           for r in chain_ladder_forecast(events).collect()}
    # pure-Python replica
    day0 = min(d for _, d, _ in evs)
    weeks = sorted({(d - day0) // 7 for _, d, _ in evs})
    cohort = {}
    for u, d, _ in evs:
        w = (d - day0) // 7
        cohort[u] = min(cohort.get(u, w), w)
    max_w = max(weeks)
    cohorts = sorted(set(cohort.values()))
    inc = collections.Counter()
    for u, d, p in evs:
        if p:
            w = (d - day0) // 7
            inc[(cohort[u], w - cohort[u])] += 1
    cum = {}
    for c in cohorts:
        run = 0
        for w in weeks:
            if w < c:
                continue
            age = w - c
            run += inc.get((c, age), 0)
            cum[(c, age)] = run
    factors = {}
    for age in range(0, max_w):
        den = sum(v for (c, a), v in cum.items()
                  if a == age and (c, age + 1) in cum)
        num = sum(v for (c, a), v in cum.items()
                  if a == age + 1 and (c, age) in cum)
        if den > 0:
            factors[age] = round(math.log(num / den) * 1e9)
    want = {}
    for c in cohorts:
        latest = max_w - c
        obs = cum[(c, latest)]
        s = sum(v for a, v in factors.items() if a >= latest)
        want[c] = (latest, obs, round(obs * math.exp(s / 1e9), 2) + 0.0)
    assert got == want
