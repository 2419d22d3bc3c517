

def test_bm25_ranks_term_heavy_docs_first(spark, sf_dir):
    """A doc stuffed with a query term must outrank one without it, and
    absent query terms contribute nothing (score from present terms
    only)."""
    from cloud_native_mapreduce_spark.operators import retrieval as RV
    docs = spark.createDataFrame(
        [(1, "hash hash hash hash join"),
         (2, "scan merge line value"),
         (3, "the a of and or but")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"]
           for r in RV.bm25_topk(docs, ["hash", "join"], k=3).collect()}
    assert 3 not in got  # no query term -> no score row
    assert got[1] > got.get(2, float("-inf")) or 2 not in got


def test_dsir_weights_favor_target_like_docs(spark):
    """Raw docs sharing the target split's vocabulary must score higher
    than raw docs with disjoint vocabulary."""
    from cloud_native_mapreduce_spark.operators import retrieval as RV
    rows = []
    for i in range(0, 28, 7):  # doc_id % 7 == 0 -> target split
        rows.append((i, "spark shuffle partition broadcast join"))
    rows.append((1, "spark shuffle partition broadcast join"))  # target-like
    rows.append((2, "banana apple cherry mango papaya"))        # off-domain
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["logw"] for r in RV.dsir_weights(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1] > got[2]


def test_source_quality_filter_drops_stopword_poor_sources(spark):
    from cloud_native_mapreduce_spark.operators import curation as CU
    docs = spark.createDataFrame(
        [(1, "the and of in to for with this that from", "good"),
         (2, "the of to in and was were been has have", "good"),
         (3, "zx qv wk jn px lm rs tv bw cd", "gibberish"),
         (4, "qq ww ee rr tt yy uu ii oo pp", "gibberish")],
        "doc_id long, text string, source string")
    got = CU.source_quality_filter(docs, min_stopword_ratio=0.5)
    assert {r["source"] for r in got.collect()} == {"good"}


def test_token_budget_sample_respects_budget_per_source(spark):
    from cloud_native_mapreduce_spark.operators import curation as CU
    docs = spark.createDataFrame(
        [(i, "tok " * 10, f"s{i % 2}") for i in range(20)],
        "doc_id long, text string, source string")
    got = CU.token_budget_sample(docs, budget_tokens=35).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        tot = sum(r["n_tokens"] for r in rows)
        # every admitted doc starts under budget; the one that crosses
        # the line is kept, so 35 <= total < 35 + max_doc_tokens
        assert 35 <= tot < 35 + 10, (src, tot)
        # running totals are consistent
        assert max(r["cum_tokens"] for r in rows) == tot


def test_bigram_logprob_scores_formulaic_docs_higher(spark):
    """A doc made of the corpus's dominant bigram pattern must outscore
    a doc of unique bigrams; docs under 2 tokens emit no row."""
    from cloud_native_mapreduce_spark.operators import curation as CU
    rows = [(i, "spark shuffle spark shuffle spark shuffle")
            for i in range(5)]
    rows.append((10, "qq ww ee rr tt yy"))
    rows.append((11, "one"))  # single token -> no bigrams
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in CU.bigram_logprob(docs).collect()}
    assert 11 not in got
    assert got[0]["avg_logprob"] > got[10]["avg_logprob"]
    assert got[0]["n_bigrams"] == 5


def test_containment_detects_subdocument_quotation(spark):
    """A short doc quoted wholesale inside a long one: containment
    short->long ~ 1.0 while the reverse stays low."""
    from cloud_native_mapreduce_spark.dedup import ngram_jaccard
    short = "alpha beta gamma delta epsilon"
    # letter-only fillers: the word tokenizer drops digits, so "tok0"
    # would collapse to one repeated token
    long = short + " " + " ".join(
        "w" + "abcdefghijklmnopqrstuvwxyz"[i % 26] * 2 + "zz"[:i // 26 + 1]
        for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string")
    got = {(r["doc_src"], r["doc_tgt"]): r["containment"]
           for r in ngram_jaccard.containment_pairs(
               docs, threshold=0.0).collect()}
    assert got[(1, 2)] == 1.0       # every shingle of short is in long
    assert got[(2, 1)] < 0.2        # long is mostly NOT in short


def test_kneser_ney_matches_python_model(spark):
    """The engine's interpolated-KN score must equal a from-scratch
    Python reference model (counts, discount, continuation weights)
    on a small corpus — semantics pinned independently of the SQL
    oracle. Also exercises the KN normalization on the side: with
    d = 0.75, sum_w P(w|v) over the continuation vocabulary is 1."""
    import math
    import re
    from collections import Counter

    from cloud_native_mapreduce_spark.functions.text import WORD_RE
    from cloud_native_mapreduce_spark.operators.curation import (
        kneser_ney_logprob)

    texts = {1: "the cat sat on the mat",
             2: "the dog sat on the log and the dog barked",
             3: "a cat and a dog and a mat"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")

    toks = {d: re.findall(WORD_RE, t.lower()) for d, t in texts.items()}
    bg_doc = {d: Counter(zip(ts, ts[1:])) for d, ts in toks.items()}
    cbg = Counter()
    for c in bg_doc.values():
        cbg.update(c)
    cctx, n1pv, n1pw = Counter(), Counter(), Counter()
    for (v, w), c in cbg.items():
        cctx[v] += c
        n1pv[v] += 1
        n1pw[w] += 1
    b, d_ = len(cbg), 0.75

    def p(v, w):
        return ((max(cbg[(v, w)] - d_, 0.0)
                 + d_ * n1pv[v] * (n1pw[w] / b)) / cctx[v])

    # normalization: for each context, summing over the continuation
    # vocabulary gives exactly 1 (the interpolated-KN mass theorem)
    for v in cctx:
        assert abs(sum(p(v, w) for w in n1pw) - 1.0) < 1e-9

    want = {d: round(sum(n * math.log(p(*bgm)) for bgm, n in c.items())
                     / sum(c.values()), 4) + 0.0
            for d, c in bg_doc.items()}
    got = {r.doc_id: r.kn_logprob
           for r in kneser_ney_logprob(docs).collect()}
    assert got == want


def test_exact_stratified_split_counts_are_largest_remainder(spark):
    """Per-stratum split counts must equal the Hamilton allocation
    EXACTLY for awkward stratum sizes (where floor quotas leave 1-2
    bonus rows), and the assignment must be deterministic."""
    from cloud_native_mapreduce_spark.operators.curation import (
        exact_stratified_split)

    sizes = {"a": 7, "b": 10, "c": 23, "d": 1, "e": 2}
    rows, did = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((did, "t", "en", src, 1))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")

    def hamilton(n):
        base = {s: n * p // 1000 for s, p in
                (("train", 800), ("val", 100), ("test", 100))}
        rem = {s: (n * p % 1000, e) for (s, p), e in
               zip((("train", 800), ("val", 100), ("test", 100)),
                   (2, 1, 0))}
        k = n - sum(base.values())
        for s in sorted(rem, key=lambda s: rem[s], reverse=True)[:k]:
            base[s] += 1
        return base

    out = exact_stratified_split(docs).collect()
    for src, n in sizes.items():
        got = {s: sum(1 for r in out
                      if r.source == src and r.split == s)
               for s in ("train", "val", "test")}
        assert got == hamilton(n), (src, n, got)
    # determinism: a second run assigns identical splits
    again = {(r.doc_id): r.split
             for r in exact_stratified_split(docs).collect()}
    assert again == {r.doc_id: r.split for r in out}


def test_greedy_coverage_picks_marginal_not_topical(spark):
    """Designed overlap: doc 1 covers {a..f} (6 tokens); doc 2 covers
    {a..e, g} (6 tokens, 5 shared); doc 3 covers {x, y} (2 tokens,
    disjoint). Greedy must pick 1 first (ties to smallest id), then
    3 (marginal 2 beats 2's marginal 1), then 2 — and STOP at full
    coverage (no 4th round even with k=5)."""
    from cloud_native_mapreduce_spark.operators.curation import (
        greedy_coverage_select)

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"),
         (2, "aa bb cc dd ee gg"),
         (3, "xx yy"),
         (4, "aa bb")],
        "doc_id long, text string")
    got = [(r.pick_rank, r.doc_id, r.gain, r.covered_total)
           for r in greedy_coverage_select(docs).collect()]
    got.sort()
    assert got == [(1, 1, 6, 6), (2, 3, 2, 8), (3, 2, 1, 9)]
