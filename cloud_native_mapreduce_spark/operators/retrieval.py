"""Corpus retrieval / data-selection operators: BM25 and DSIR.

Both are classic public-literature algorithms re-expressed as Spark
plans over the `documents` table:

- `bm25_topk` — Okapi BM25 (Robertson & Zaragoza 2009), the Lucene
  `ln(1 + (N-df+.5)/(df+.5))` idf variant that stays positive.
- `dsir_weights` — hashed n-gram importance weights from "Data
  Selection for Language Models via Importance Resampling"
  (Xie et al. 2023): score raw-pool docs by how much more likely their
  features are under a target-domain unigram/bigram model than under
  the raw-pool model.

Scale shape shared by both: the corpus is tokenized ONCE into a
(doc, term) aggregate; every derived statistic (doc length, df, bucket
count tables) is vocabulary- or bucket-bounded and broadcasts back
against that aggregate, so the only full-corpus shuffle is the initial
(doc_id, term) combine — map-side-partial, linear in corpus size, and
the 100 TB text payload itself never moves twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.text import tokens

#: DSIR feature-hash width in md5 hex chars: 3 → 16^3 = 4096 buckets.
#: md5 is the cross-engine hash (Spark and DuckDB agree byte-for-byte),
#: so the oracle can reproduce bucketing exactly. At 100 TB raise to 4
#: (65 536 buckets) — the count tables stay broadcast-size either way.
DSIR_HASH_CHARS = 3


def _term_freq(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term, tf) — the single full-corpus tokenize+combine."""
    return (docs.select("doc_id",
                        F.explode(tokens(F.col(text_col))).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf")))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text") -> DataFrame:
    """Top-k documents by BM25 score against a bag of query terms.

    Plan: one tokenize feeds a (doc, term, tf) aggregate; doc length and
    corpus stats (N, avgdl) derive from THAT aggregate, not a second
    scan. The query-term filter is a broadcast semi-join, so df/score
    work touches only rows whose term is in the query. N and avgdl ride
    as a broadcast 1-row frame; the final top-k is TakeOrdered (per-
    partition heaps), never a global sort. Scores round to 4 places for
    cross-engine hash stability; ties break on doc_id.

    100 TB note: the scoring join against the per-doc length table is
    the one doc-keyed shuffle here, and it is the honest cost of exact
    BM25 from raw text — `build_bm25_index` + `bm25_topk_indexed`
    precompute (doc_id, term, tf) and (doc_id, dl) bucketed by doc_id
    so every query's scoring join runs exchange-free instead.
    avgdl/N/df are corpus-bounded aggregates either way.
    """
    tf = _term_freq(docs, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return _bm25_scores(tf, dl, query_terms, k, k1, b)


def _bm25_scores(tf: DataFrame, dl: DataFrame, query_terms: list[str],
                 k: int, k1: float, b: float,
                 merge_dl: bool = False) -> DataFrame:
    """Shared BM25 scoring plan over a (doc_id, term, tf) aggregate and a
    (doc_id, dl) length table — expression-identical for the raw-text
    and indexed paths so both hash-match the same oracle.
    `merge_dl` hints the dl scoring join to sort-merge: with both index
    tables bucketed+sorted on doc_id it runs with zero exchanges (the
    plan-audit test pins this); without the layout Spark would fall
    back to a normal shuffle merge join, so only the indexed path sets
    it."""
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    qt = (tf.sparkSession
          .createDataFrame([(t,) for t in sorted(set(query_terms))],
                           "term string"))
    tfq = tf.join(F.broadcast(qt), "term", "left_semi")
    df_ = tfq.groupBy("term").agg(F.count("*").alias("df_term"))
    dl_side = dl.hint("merge") if merge_dl else dl
    scored = (tfq.join(F.broadcast(df_), "term")
              .join(dl_side, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select(
                  "doc_id",
                  (F.log(F.lit(1.0)
                         + (F.col("n_docs") - F.col("df_term") + 0.5)
                         / (F.col("df_term") + 0.5))
                   * (F.col("tf") * (k1 + 1))
                   / (F.col("tf")
                      + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
                  .alias("part")))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum("part"), 4).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
            .limit(k))


def build_bm25_index(docs: DataFrame, table_prefix: str, path: str,
                     n_buckets: int = 8,
                     text_col: str = "text") -> None:
    """Materialize the BM25 doc-stats index: `{table_prefix}_tf` =
    (doc_id, term, tf) and `{table_prefix}_dl` = (doc_id, dl), BOTH
    bucketed and sorted on doc_id with the same bucket count.

    This is the production shape the `bm25_topk` docstring promises:
    tokenization and the corpus shuffle are paid ONCE at index-build
    time; after that every query's scoring join (tf ⋈ dl on doc_id) is
    co-located — two bucketed scans merge-join with zero exchanges, and
    the final per-doc score aggregate reuses the same bucketing, so a
    query's only shuffles are the two broadcast-sized stat aggregates
    (query-term df and the 1-row N/avgdl frame). Bucket count scales
    with corpus size (~100-500 MB per bucket at target SF); dl is
    derived from the WRITTEN tf table, not a second tokenize.
    """
    from cloud_native_mapreduce_spark.sources.tables import write_bucketed

    tf = _term_freq(docs, text_col)
    write_bucketed(tf, f"{table_prefix}_tf", f"{path}/tf",
                   "doc_id", n_buckets)
    spark = docs.sparkSession
    dl = (spark.table(f"{table_prefix}_tf")
          .groupBy("doc_id").agg(F.sum("tf").alias("dl")))
    write_bucketed(dl, f"{table_prefix}_dl", f"{path}/dl",
                   "doc_id", n_buckets)


def bm25_topk_indexed(spark, table_prefix: str, query_terms: list[str],
                      k: int = 20, k1: float = 1.2,
                      b: float = 0.75) -> DataFrame:
    """Top-k BM25 over a `build_bm25_index` layout — byte-identical
    scores to `bm25_topk` (same expression tree via `_bm25_scores`),
    but the corpus-sized scoring join runs exchange-free on the
    bucketed (doc_id) layout. See tests/test_plan_audit.py for the
    pinned plan shape."""
    tf = spark.table(f"{table_prefix}_tf")
    dl = spark.table(f"{table_prefix}_dl")
    return _bm25_scores(tf, dl, query_terms, k, k1, b, merge_dl=True)


def _rank_bounded(leg: DataFrame, score_col: str,
                  id_col: str) -> DataFrame:
    """(id, rank) for a BOUNDED top-N leg frame, rank 1 = best by
    (score DESC, id ASC), ranked WITHOUT a window: rank = 1 + count of
    strictly-better rows via a broadcast theta self-join. An
    unpartitioned `row_number` window would serialize its input through
    one task — harmless on N rows, but the registry-wide plan audit
    bans the node shape outright (tests/test_plan_audit.py), and on a
    ≤N-row frame the N² self-join is constant work."""
    a = leg.select(F.col(id_col).alias("_ra_id"),
                   F.col(score_col).alias("_ra_s"))
    b = leg.select(F.col(id_col).alias("_rb_id"),
                   F.col(score_col).alias("_rb_s"))
    better = (F.col("_rb_s") > F.col("_ra_s")) | \
        ((F.col("_rb_s") == F.col("_ra_s"))
         & (F.col("_rb_id") < F.col("_ra_id")))
    return (a.join(F.broadcast(b), better, "left")
            .groupBy("_ra_id")
            .agg((F.count("_rb_id") + 1).alias("rank"))
            .select(F.col("_ra_id").alias(id_col), "rank"))


def hybrid_topk_rrf(docs: DataFrame, embeddings: DataFrame,
                    query_terms: list[str], query_vec_id: int,
                    k: int = 20, n_leg: int = 100, rrf_k: int = 60,
                    text_col: str = "text") -> DataFrame:
    """Top-k documents by reciprocal-rank fusion of a lexical BM25 leg
    and an exact-cosine embedding leg (Cormack et al. 2009's RRF, the
    standard hybrid-retrieval combiner): rrf(d) = Σ_legs 1/(rrf_k +
    rank_leg(d)) over the legs that retrieved d in their top-`n_leg`.

    Plan shape: each leg is the existing top-N operator (BM25's
    broadcast-stats scoring / the broadcast-query brute-force cosine),
    both ending in TakeOrdered — so the corpus-sized work is exactly
    the two legs' own scale-safe plans. Ranks are then derived on the
    two ≤n_leg-row frames with a broadcast theta join (`_rank_bounded`)
    and fused with one full-outer join of two tiny frames; a missing
    leg contributes 0. The two-term score sum is FP-order-safe, so the
    DuckDB oracle reproduces it bit-for-bit from the same rounded leg
    scores. Returns (doc_id, rrf) — rrf rounded to 6, ties on doc_id.
    """
    from pyspark import StorageLevel

    from cloud_native_mapreduce_spark.similarity import bruteforce

    # persist the leg frames: each feeds BOTH sides of its rank
    # self-join, and Spark never dedups common subplans — without the
    # barrier the corpus-sized BM25 pipeline and the cosine scan would
    # each execute twice (the minhash/simhash persist lesson)
    bm = (bm25_topk(docs, query_terms, k=n_leg, text_col=text_col)
          .persist(StorageLevel.MEMORY_AND_DISK))
    ann = (bruteforce.top_k_similar(embeddings, query_vec_id, k=n_leg)
           .select(F.col("vec_id").alias("doc_id"), "cosine")
           .persist(StorageLevel.MEMORY_AND_DISK))
    r_bm = _rank_bounded(bm, "bm25", "doc_id") \
        .select("doc_id", F.col("rank").alias("r_bm"))
    r_ann = _rank_bounded(ann, "cosine", "doc_id") \
        .select("doc_id", F.col("rank").alias("r_ann"))
    fused = (r_bm.join(r_ann, "doc_id", "full_outer")
             .select(
                 "doc_id",
                 F.round(
                     F.coalesce(1.0 / (rrf_k + F.col("r_bm")), F.lit(0.0))
                     + F.coalesce(1.0 / (rrf_k + F.col("r_ann")),
                                  F.lit(0.0)), 6).alias("rrf")))
    return (fused
            .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
            .limit(k))


def _dsir_grams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, bucket, n) hashed uni+bigram features per doc.

    Bucket = first DSIR_HASH_CHARS hex chars of md5(gram) — identical
    in Spark and DuckDB, so the oracle rebuilds the exact buckets.
    """
    toks = docs.select("doc_id", tokens(F.col(text_col)).alias("toks"))
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: F.concat_ws(" ",
                                  F.get(F.col("toks"), i),
                                  F.get(F.col("toks"), i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(
        "doc_id", F.explode(F.concat("toks", bigrams)).alias("gram"))
    return (grams
            .select("doc_id",
                    F.substring(F.md5(F.col("gram")), 1,
                                DSIR_HASH_CHARS).alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").alias("n")))


def dsir_weights(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc DSIR log importance weight of the raw pool vs the target.

    Target domain = docs with doc_id % 7 == 0 (the same held-out-split
    convention `decontaminate` uses); the raw pool is everything else.
    Features are hashed uni+bigrams (`_dsir_grams`); both bucket-count
    tables are ≤ 16^DSIR_HASH_CHARS rows with add-one smoothing, so they
    BROADCAST against the raw pool's per-doc bucket counts — one
    broadcast join + one per-doc aggregate after the shared tokenize.
    Returns (doc_id, n_feats, logw): logw > 0 ⇒ the doc looks more like
    the target domain than the pool average; DSIR resamples raw docs
    with probability proportional to exp(logw) (logw is a LOG ratio and
    goes negative for off-domain docs — it is not itself a weight).
    """
    n_buckets = 16 ** DSIR_HASH_CHARS
    feats = _dsir_grams(docs, text_col)
    target = feats.where(F.col("doc_id") % 7 == 0)
    raw = feats.where(F.col("doc_id") % 7 != 0)
    tgt_counts = target.groupBy("bucket").agg(
        F.sum("n").alias("t_n"))
    raw_counts = raw.groupBy("bucket").agg(
        F.sum("n").alias("r_n"))
    tgt_tot = target.agg(F.sum("n").alias("t_tot"))
    raw_tot = raw.agg(F.sum("n").alias("r_tot"))
    # full outer over observed buckets; unseen-side counts smooth to +1
    rates = (tgt_counts.join(raw_counts, "bucket", "full_outer")
             .crossJoin(F.broadcast(tgt_tot))
             .crossJoin(F.broadcast(raw_tot))
             .select(
                 "bucket",
                 (F.log((F.coalesce(F.col("t_n"), F.lit(0)) + 1.0)
                        / (F.col("t_tot") + n_buckets))
                  - F.log((F.coalesce(F.col("r_n"), F.lit(0)) + 1.0)
                          / (F.col("r_tot") + n_buckets)))
                 .alias("llr")))
    return (raw.join(F.broadcast(rates), "bucket")
            .groupBy("doc_id")
            .agg(F.sum("n").cast("bigint").alias("n_feats"),
                 F.round(F.sum(F.col("n") * F.col("llr")), 4)
                 .alias("logw")))


def mmr_rerank(emb: DataFrame, query_vec_id: int = 0, k: int = 10,
               n_candidates: int = 30, lam_x10: int = 7) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR '98) — the diversity-aware top-k every RAG retrieval stack
    ships: greedily pick the candidate maximizing
        λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s).

    Exactness: relevance and pairwise similarity are integer quantized
    dots (`similarity.graph_ann.quantized` — embeddings are unit-norm,
    so dot IS cosine), and λ=0.7 is applied as integer decimals
    (score×10 = 7·rel − 3·maxsim), so every argmax is exact int64 with
    a vec_id tie-break — zero float drift across engines.

    Scale shape: ONE corpus-wide top-N relevance cut (TakeOrdered)
    bounds everything after it; the N×N similarity matrix and the k
    greedy rounds run on parameter-sized frames (N=30, k=10 — the
    ONLY all-pairs here is 30×30, a constant). Each round is an
    orderBy+limit(1) argmax — TakeOrdered, never a global sort.
    Output: (rank, vec_id, rel_q, mmr_x10) for the k selections.
    """
    from cloud_native_mapreduce_spark.similarity.graph_ann import (
        _int_dot, quantized)
    q = emb.select(F.col("vec_id"),
                   quantized(F.col("embedding")).alias("q"))
    qvec = (q.where(F.col("vec_id") == query_vec_id)
            .select(F.col("q").alias("qq")))
    cand = (q.where(F.col("vec_id") != query_vec_id)
            .crossJoin(F.broadcast(qvec))
            .select("vec_id", "q",
                    _int_dot(F.col("q"), F.col("qq")).alias("rel_q"))
            .orderBy(F.col("rel_q").desc(), F.col("vec_id").asc())
            .limit(n_candidates)
            .localCheckpoint(eager=False))
    sim = (cand.select(F.col("vec_id").alias("a"), F.col("q").alias("qa"))
           .join(cand.select(F.col("vec_id").alias("b"),
                             F.col("q").alias("qb")),
                 F.col("a") != F.col("b"))
           .select("a", "b", _int_dot(F.col("qa"), F.col("qb"))
                   .alias("sim_q"))
           .localCheckpoint(eager=False))
    pool = cand.select("vec_id", "rel_q")
    # round 1: pure relevance argmax
    selected = (pool.orderBy(F.col("rel_q").desc(),
                             F.col("vec_id").asc()).limit(1)
                .select("vec_id", "rel_q",
                        (F.col("rel_q") * lam_x10).alias("mmr_x10"),
                        F.lit(1).cast("bigint").alias("rank")))
    for r in range(2, k + 1):
        remaining = pool.join(selected.select("vec_id"), "vec_id",
                              "left_anti")
        maxsim = (sim.join(selected.select(F.col("vec_id").alias("b")),
                           "b")
                  .groupBy(F.col("a").alias("vec_id"))
                  .agg(F.max("sim_q").alias("max_sim")))
        pick = (remaining.join(maxsim, "vec_id")
                .select("vec_id", "rel_q",
                        (F.col("rel_q") * lam_x10
                         - F.col("max_sim") * (10 - lam_x10))
                        .alias("mmr_x10"))
                .orderBy(F.col("mmr_x10").desc(), F.col("vec_id").asc())
                .limit(1)
                .select("vec_id", "rel_q", "mmr_x10",
                        F.lit(r).cast("bigint").alias("rank")))
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected.select("rank", "vec_id", "rel_q", "mmr_x10")


def phrase_search(docs: DataFrame, phrase: tuple[str, ...] =
                  ("big", "order", "scan"),
                  text_col: str = "text") -> DataFrame:
    """Exact phrase search over positional postings — the IR operator
    BM25's bag-of-words scoring cannot express: the terms must be
    ADJACENT in order. (doc_id, n_matches, first_pos) per matching doc.

    Postings are (doc_id, pos, word) from one posexplode; the filter
    to the query's terms happens BEFORE any shuffle, so the join
    input is |postings-of-query-terms|, not the corpus (with a
    persisted word-bucketed index this is the classic index probe;
    the pruning principle is identical). A k-word phrase is k-1
    keyed equi-joins on (doc_id, pos+offset) — never a cartesian,
    and each join's build side is one term's postings."""
    pos = (docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col)))
        .alias("pos0", "w"))
        .where(F.col("w").isin(*phrase))
        # 1-based positions (posexplode is 0-based; the oracle's
        # generate_series subscripting is 1-based)
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "w"))
    first = (pos.where(F.col("w") == phrase[0])
             .select("doc_id", F.col("pos").alias("p0")))
    matched = first
    for i, term in enumerate(phrase[1:], start=1):
        nxt = (pos.where(F.col("w") == term)
               .select("doc_id", (F.col("pos") - i).alias("p0")))
        matched = matched.join(nxt, ["doc_id", "p0"])
    return (matched.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_matches"),
                 F.min("p0").cast("bigint").alias("first_pos")))


def proximity_search(docs: DataFrame, term_a: str = "data",
                     term_b: str = "query", k: int = 5,
                     text_col: str = "text") -> DataFrame:
    """NEAR/k proximity search (the second positional-index operator
    after `phrase_search`'s exact adjacency): docs where `term_a`
    and `term_b` occur within k token positions of each other, in
    either order — (doc_id, n_pairs, min_dist).

    The scalable shape is POSITION BANDING, not a per-doc position
    cross join: postings carry band = pos div k; the a-side is
    replicated to its 3 adjacent bands via a broadcast offset frame,
    the join is keyed equi on (doc_id, band), and |pa − pb| <= k
    implies the bands differ by at most one — so every qualifying
    pair is found by EXACTLY ONE replica (replica bands are
    distinct) and join fan-out is bounded by positions-per-band,
    never a term's document frequency squared. Same blocking
    contract as spatial_grid_join, pytest-pinned there."""
    spark = docs.sparkSession
    pos = (docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col)))
        .alias("pos0", "w"))
        .where(F.col("w").isin(term_a, term_b))
        .select("doc_id", "w", (F.col("pos0") + 1).alias("pos"),
                F.expr(f"pos0 DIV {k}").alias("band")))
    offs = spark.createDataFrame([(-1,), (0,), (1,)], "off int")
    a = (pos.where(F.col("w") == term_a)
         .crossJoin(F.broadcast(offs))
         .select("doc_id", (F.col("band") + F.col("off")).alias("band"),
                 F.col("pos").alias("pa")))
    b = (pos.where(F.col("w") == term_b)
         .select("doc_id", "band", F.col("pos").alias("pb")))
    pairs = (a.join(b, ["doc_id", "band"])
             .where(F.abs(F.col("pa") - F.col("pb")) <= k))
    return (pairs.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.min(F.abs(F.col("pa") - F.col("pb")))
                 .cast("bigint").alias("min_dist")))


#: Quantization scale for tf-idf weights (micro-weights): ln(N/df)
#: < 30 and tf < 1e4 keep w_mn < 3e11; squares/sums ride decimal(38).
TFIDF_SCALE = 1_000_000
#: Cosine threshold for reported pairs.
TFIDF_COS_MIN = 0.5
#: Absolute posting-list cap (documents per term). The relative band
#: ``df*2 <= n_docs`` alone is NOT scale-safe: a term in a constant
#: FRACTION of the corpus yields Θ(N²) posting pairs under Zipf. The
#: absolute cap bounds per-term fan-out at TFIDF_MAX_DF² regardless of
#: corpus size (the same defense as ``ngram_jaccard``'s ``max_df``;
#: Elsayed/Lin/Oard prune df-hot terms for the identical reason). 256
#: is the smallest power of two that is a no-op on every test corpus
#: INCLUDING the sf0.1 bench (whose single in-band term has df in
#: (128, 256]), so local results are unchanged while 100 TB fan-out is
#: bounded. Mirrored verbatim in the DuckDB oracle.
TFIDF_MAX_DF = 256


def tfidf_weight_expr() -> str:
    """Quantized tf-idf weight as SQL text over integer columns tf,
    df, n_docs (shared verbatim with the oracle): one ln per
    vocabulary-bounded (doc, term) cell, rounded to an exact BIGINT
    micro-weight — all similarity arithmetic downstream is integer."""
    return (f"CAST(round((tf * ln(CAST(n_docs AS DOUBLE) / df)) "
            f"* {TFIDF_SCALE}, 0) AS BIGINT)")


def tfidf_cosine_pairs(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """All-pairs document similarity by tf-idf cosine over the
    inverted index (Elsayed/Lin/Oard, ACL 2008 — the canonical
    MapReduce pairwise-similarity algorithm): candidate pairs come
    from per-TERM posting joins (never a doc×doc product), weights
    are idf-damped term frequencies, and a pair is reported when
    cosine >= TFIDF_COS_MIN — the lexical near-dup signal that
    catches reworded overlap MinHash's exact-shingle model misses.

    Determinism: weights quantize to BIGINT micro-weights at the
    (doc, term) frame (`tfidf_weight_expr` — one ln per cell, the
    micronat playbook); dots and squared norms are then EXACT
    decimal(38) integer sums, so the only floats are the final
    fixed-form dot/(sqrt·sqrt) — IEEE sqrt is correctly rounded,
    hence portable — rounded 4dp.

    Scale: the posting-join fan-out is bounded by the df band
    (2 <= df <= min(N/2, TFIDF_MAX_DF)): corpus-hot terms drop
    BEFORE the join (the Σ df² law all shingle operators share), and
    the ABSOLUTE cap bounds every term's pair fan-out at
    TFIDF_MAX_DF² independent of corpus size — the relative band
    alone leaves a constant-fraction term producing Θ(N²) pairs.
    One tokenize; term-keyed shuffles only."""
    tf = (docs.select("doc_id",
                      F.explode(tokens(F.col(text_col))).alias("term"))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (tf.join(df_t, "term").crossJoin(F.broadcast(nd))
         .where((F.col("df") >= 2)
                & (F.col("df") * 2 <= F.col("n_docs"))
                & (F.col("df") <= TFIDF_MAX_DF))
         .select("doc_id", "term",
                 F.expr(tfidf_weight_expr()).alias("w"))
         .localCheckpoint(eager=False))
    d = "decimal(38,0)"
    norms = (w.groupBy("doc_id")
             .agg(F.sum(F.expr(f"CAST(w AS {d}) * w")).alias("n2")))
    a = w.select(F.col("doc_id").alias("doc_a"), "term",
                 F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "term",
                 F.col("w").alias("wb"))
    dots = (a.join(b, "term")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.expr(f"CAST(wa AS {d}) * wb")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("doc_a"),
                      F.col("n2").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"),
                      F.col("n2").alias("nb"))
    cos = ("(CAST(dot AS DOUBLE) "
           "/ (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))")
    return (dots.join(na, "doc_a").join(nb, "doc_b")
            .select("doc_a", "doc_b",
                    (F.round(F.expr(cos), 4) + F.lit(0.0))
                    .alias("cosine"))
            .where(F.col("cosine") >= TFIDF_COS_MIN))


#: nDCG discount quantization: 1/log2(pos+1) in 1e-8 units.
NDCG_SCALE = 100_000_000


def ndcg_discount_expr() -> str:
    """Rank discount as SQL text over an integer column pos, shared
    verbatim with the oracle: w(pos) = 1/log2(pos+1) quantized to
    BIGINT 1e-8 units — one ln pair per BOUNDED rank, so DCG sums
    are exact integers."""
    return (f"CAST(round({NDCG_SCALE}.0 "
            f"/ (ln(CAST(pos + 1 AS DOUBLE)) "
            f"/ ln(CAST(2 AS DOUBLE))), 0) AS BIGINT)")


def ndcg_retrieval_eval(docs: DataFrame, query_terms: list[str],
                        k: int = 20,
                        text_col: str = "text") -> DataFrame:
    """Ranked-retrieval quality evaluation: nDCG@k and MRR of the
    BM25 ranking against PLANTED graded relevance (Järvelin &
    Kekäläinen 2002) — the measurement a training-data pipeline runs
    on its retriever before trusting retrieval-filtered data: rel 2
    for documents containing ≥2 distinct query terms, rel 1 for
    exactly one, gain = 2^rel − 1 ∈ {0, 1, 3} (exact integers
    derivable on both engines, no human labels needed).

    Exactness: rank discounts quantize to BIGINT 1e-8 units at the
    BOUNDED rank frame (`ndcg_discount_expr`, one ln pair per rank
    position, never per row); DCG and ideal DCG are exact integer
    sums; nDCG and MRR are one fixed-form division each, 6dp. Ranks
    within the k-row result come from a broadcast triangular
    self-join (no global window). The ideal ranking needs only the
    corpus GAIN HISTOGRAM (n docs at gain 3 / gain 1) joined to the
    k-row rank frame — never a corpus sort.

    Scale: BM25's plan (one tokenize, broadcast query semi-join,
    TakeOrdered) plus one distinct-match aggregate for gains;
    everything downstream is k-row frames. Output: the top-k rows
    (pos, doc_id, gain) each carrying ndcg@k and mrr."""
    spark = docs.sparkSession
    # ONE corpus tokenize feeds both the BM25 ranking and the planted
    # relevance gains (the retrieval-module convention) — the tf
    # aggregate is lineage-truncated because the two consumers would
    # otherwise re-run the scan+explode+combine pipeline each
    tf = _term_freq(docs, text_col).localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    topk = _bm25_scores(tf, dl, query_terms, k, 1.2, 0.75) \
        .localCheckpoint(eager=False)
    qt = spark.createDataFrame([(t,) for t in sorted(set(query_terms))],
                               "term string")
    matched = (tf.join(F.broadcast(qt), "term")
               .groupBy("doc_id")
               .agg(F.count_distinct("term").alias("nq")))
    gains = matched.select(
        "doc_id",
        F.when(F.col("nq") >= 2, 3).when(F.col("nq") == 1, 1)
        .otherwise(0).cast("bigint").alias("gain")) \
        .localCheckpoint(eager=False)
    # rank within the k-row result: broadcast triangular position
    other = topk.select(F.col("doc_id").alias("d2"),
                        F.col("bm25").alias("s2"))
    ranked = (topk.join(F.broadcast(other),
                        (F.col("s2") > F.col("bm25"))
                        | ((F.col("s2") == F.col("bm25"))
                           & (F.col("d2") < F.col("doc_id"))), "left")
              .groupBy("doc_id", "bm25")
              .agg((F.count("d2") + 1).cast("bigint").alias("pos")))
    scored = (ranked.join(gains, "doc_id", "left")
              .select("doc_id", "pos",
                      F.coalesce(F.col("gain"), F.lit(0)).cast("bigint")
                      .alias("gain"),
                      F.expr(ndcg_discount_expr()).alias("w"))
              .localCheckpoint(eager=False))
    dcg = scored.agg(F.sum(F.expr("gain * w")).cast("bigint")
                     .alias("dcg_q"))
    first_hit = (scored.where(F.col("gain") > 0)
                 .agg(F.min("pos").alias("fpos")))
    hist = gains.agg(
        F.sum(F.when(F.col("gain") == 3, 1).otherwise(0))
        .cast("bigint").alias("n3"),
        F.sum(F.when(F.col("gain") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1"))
    rank_frame = spark.createDataFrame([(i,) for i in range(1, k + 1)],
                                       "pos long")
    ideal = (rank_frame.crossJoin(F.broadcast(hist))
             .select(F.expr("CASE WHEN pos <= least(n3, "
                            f"{k}) THEN 3 "
                            "WHEN pos <= least(n3 + n1, "
                            f"{k}) THEN 1 ELSE 0 END").alias("gain"),
                     F.expr(ndcg_discount_expr()).alias("w"))
             .agg(F.sum(F.expr("gain * w")).cast("bigint")
                  .alias("idcg_q")))
    summary = (dcg.crossJoin(F.broadcast(ideal))
               .crossJoin(F.broadcast(first_hit))
               .select(
                   (F.round(F.expr(
                       "CAST(dcg_q AS DOUBLE) / idcg_q"), 6)
                    + F.lit(0.0)).alias("ndcg"),
                   F.coalesce(
                       F.round(F.expr("1.0 / fpos"), 6) + F.lit(0.0),
                       F.lit(0.0)).alias("mrr")))
    return (scored.select("pos", "doc_id", "gain")
            .crossJoin(F.broadcast(summary)))


#: Fixed needle set for the registered trigram-search query (each
#: >= 3 chars; a two-word phrase exercises cross-word trigrams).
TRIGRAM_NEEDLES = ("fast merge", "slow filter", "window spark")


def _needle_trigrams(needle: str) -> "list[str]":
    return sorted({needle[i:i + 3] for i in range(len(needle) - 2)})


def trigram_index_search(docs: DataFrame,
                         needles: "tuple[str, ...]" = TRIGRAM_NEEDLES
                         ) -> DataFrame:
    """Trigram-postings-accelerated substring search — the pg_trgm /
    Google Code Search architecture (Cox, "Regular Expression
    Matching with a Trigram Index", 2012): a substring can only occur
    in documents containing ALL of its character trigrams, so the
    scan-everything `contains()` becomes (1) an intersection of
    bounded posting lists and (2) an exact verification of the
    surviving candidates only. The candidate set is a strict
    superset of the answer (trigrams can co-occur without being
    contiguous — "fast … sort merge" has every trigram of
    "fast merge"), which is exactly why the verify step exists; the
    result is BYTE-IDENTICAL to the brute scan, and the oracle IS
    the brute scan (a fully independent implementation).

    Scale: the postings build is one tokenize-shaped pass (Σ doc
    length trigram rows, `array_distinct` per doc before the
    explode caps per-doc postings at distinct-trigram count); the
    needle side is a broadcast ≤|needles|×|needle| frame, so
    candidate generation is a broadcast semi-join + one
    (needle, doc_id) count aggregate — no corpus self-join. Only
    candidate docs are re-read for verification. In a production
    deployment the postings frame is written ONCE as a bucketed
    table (the dedup_incremental persisted-index pattern) and
    query time touches only the needles' posting lists."""
    from cloud_native_mapreduce_spark.sources.tables import fan_out
    spark = docs.sparkSession
    # fan_out: the Σ doc-length trigram explode runs BEFORE the first
    # exchange and would otherwise sit on the single-row-group scan's
    # one core (guide §2.5; no-op once the scan parallelizes)
    posts = (fan_out(docs.where(F.length("text") >= 3)
                     .select("doc_id", F.lower("text").alias("lt")),
                     "doc_id")
             .select("doc_id", F.explode(F.expr(
                 "array_distinct(transform("
                 "  sequence(1, length(lt) - 2),"
                 "  i -> substr(lt, i, 3)))")).alias("g")))
    ng = spark.createDataFrame(
        [(nd, g) for nd in needles for g in _needle_trigrams(nd)],
        "needle string, g string")
    nk = spark.createDataFrame(
        [(nd, len(_needle_trigrams(nd))) for nd in needles],
        "needle string, k int")
    cand = (posts.join(F.broadcast(ng), "g")
            .groupBy("needle", "doc_id")
            .agg(F.count(F.lit(1)).alias("hit"))
            .join(F.broadcast(nk), "needle")
            .where(F.col("hit") == F.col("k"))
            .select("needle", "doc_id"))
    return (docs.join(cand, "doc_id")
            .where(F.expr("contains(lower(text), needle)"))
            .select("needle", "doc_id"))


#: PMI pair mining: minimum within-document co-occurrence count for
#: a pair to be reported (rare pairs have huge, meaningless PMI —
#: the standard Church & Hanks guard) and the report size.
PMI_MIN_PAIR = 5
PMI_TOP_K = 20


def pmi_pairs(docs: DataFrame, min_pair: int = PMI_MIN_PAIR,
              k: int = PMI_TOP_K) -> DataFrame:
    """Top-k word associations by pointwise mutual information over
    within-document co-occurrence (Church & Hanks 1990) — the
    association-strength view `ngram_counts` (adjacency) and
    `cooccurrence_topk` (baskets) don't give: PMI(a,b) =
    ln(N·c_ab/(c_a·c_b)) rewards pairs that appear together far
    more than their marginals predict, which is how collocation
    dictionaries and phrase-merge candidates get mined from a
    corpus.

    Exactness: all counts are distinct-document integers from one
    tokenize pass; PMI is quantized to BIGINT micronats (one ln per
    surviving pair — the NB playbook), ranked under the total order
    (pmi_mn DESC, tok_a, tok_b) via TakeOrdered.

    Scale: per-doc pairs come from the sorted distinct-token array
    (posexplode × suffix-slice — the copart_pairs shape, Σ_d t_d²
    work bounded by the doc-length cap, never a corpus self-join);
    the pair aggregate map-side combines; marginal join-backs are
    |vocab|-row; min_pair prunes before the ln. Output: (tok_a,
    tok_b, n_pair, df_a, df_b, pmi_mn)."""
    grouped = (docs.select(
        "doc_id",
        F.array_distinct(tokens(F.col("text"))).alias("ts"))
        .select("doc_id", F.sort_array("ts").alias("ts"))
        .where(F.size("ts") >= 1)
        .localCheckpoint(eager=False))
    nd = grouped.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    df = (grouped.select(F.explode("ts").alias("t"))
          .groupBy("t").agg(F.count(F.lit(1)).cast("bigint")
                            .alias("c")))
    pairs = (grouped
             .select(F.posexplode("ts").alias("i", "ta"), F.col("ts"))
             .select("ta", F.explode(
                 F.slice("ts", F.col("i") + F.lit(2), F.size("ts")))
                 .alias("tb"))
             .groupBy("ta", "tb")
             .agg(F.count(F.lit(1)).cast("bigint").alias("cab"))
             .where(F.col("cab") >= min_pair))
    pmi = ("CAST(round(ln((CAST(nd AS DOUBLE) * cab) "
           "/ (CAST(ca AS DOUBLE) * cb)) * 1000000, 0) AS BIGINT)")
    return (pairs
            .join(df.select(F.col("t").alias("ta"),
                            F.col("c").alias("ca")), "ta")
            .join(df.select(F.col("t").alias("tb"),
                            F.col("c").alias("cb")), "tb")
            .crossJoin(F.broadcast(nd))
            .select(F.col("ta").alias("tok_a"),
                    F.col("tb").alias("tok_b"),
                    F.col("cab").alias("n_pair"),
                    F.col("ca").alias("df_a"),
                    F.col("cb").alias("df_b"),
                    F.expr(pmi).alias("pmi_mn"))
            .orderBy(F.col("pmi_mn").desc(), "tok_a", "tok_b")
            .limit(k))


# --- rank-biased overlap (round-14 wave) ----------------------------------

RBO_DEPTH = 20
RBO_P_NUM, RBO_P_DEN = 9, 10  # persistence p = 0.9 as an exact rational

#: lcm(1..20) — clears every 1/i denominator in the RBO sum.
_RBO_L = 232792560

#: Integer suffix weights: SUFFIX[m] = Σ_{i=m..d} (L/i)·9^(i−1)·10^(d−i),
#: so that Σ_i (A_i/i)·p^(i−1)·(1−p) = Σ_matched SUFFIX[max(ra,rb)]
#: / (L·10^d) EXACTLY — each matched word enters every prefix overlap
#: A_i from i = max(ra, rb) onward, so the double sum collapses to one
#: literal lookup per matched word. Magnitudes stay < 1e29 (decimal(38)
#: / HUGEINT safe); the ONE float op is the final division.
_RBO_SUFFIX = [
    sum((_RBO_L // i) * RBO_P_NUM ** (i - 1)
        * RBO_P_DEN ** (RBO_DEPTH - i)
        for i in range(m, RBO_DEPTH + 1))
    for m in range(1, RBO_DEPTH + 1)
]
_RBO_DENOM = _RBO_L * RBO_P_DEN ** RBO_DEPTH


def rbo_vocab_agreement(docs: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """Truncated rank-biased overlap (Webber, Moffat & Zobel, TOIS
    2010) at depth 20 / p = 0.9 between every source pair's
    frequency-ranked top-20 vocabularies — "do these sources lead
    with the same words?", the rank-aware complement of
    `jensen_shannon_sources`' mass view. RBO top-weights agreement
    (rank-1 matches count ~10× rank-20 ones), which is what vocab
    drift actually looks like.

    Exact integers end-to-end: the prefix-overlap double sum
    collapses per matched word to SUFFIX[max(rank_a, rank_b)] (see
    _RBO_SUFFIX), summed in decimal(38) and divided ONCE. Per-source
    ranks are source-partitioned windows (bounded by |vocabulary of
    one source|, never global); the pair join carries only top-20
    rows per source. Pairs sharing no top-20 word are absent by
    construction (RBO_trunc = 0). Output: (src_a, src_b, n_shared,
    rbo 6dp)."""
    from pyspark.sql.window import Window

    wc = (docs.select("source",
                      F.explode(tokens(F.col(text_col))).alias("word"))
          .groupBy("source", "word").agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("word").asc())
    top = (wc.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= RBO_DEPTH)
           .select("source", "word", "rank"))
    a = top.select(F.col("source").alias("src_a"), "word",
                   F.col("rank").alias("ra"))
    b = top.select(F.col("source").alias("src_b"), "word",
                   F.col("rank").alias("rb"))
    suffix = F.array(*[
        F.expr(f"CAST('{v}' AS DECIMAL(38,0))") for v in _RBO_SUFFIX])
    denom = F.expr(f"CAST('{_RBO_DENOM}' AS DECIMAL(38,0))")
    return (a.join(b, "word")
            .where(F.col("src_a") < F.col("src_b"))
            .select("src_a", "src_b",
                    F.element_at(suffix,
                                 F.greatest("ra", "rb").cast("int"))
                    .alias("wgt"))
            .groupBy("src_a", "src_b")
            .agg(F.count("*").cast("bigint").alias("n_shared"),
                 F.sum("wgt").alias("num"))
            .select("src_a", "src_b", "n_shared",
                    (F.round(F.col("num").cast("double")
                             / denom.cast("double"), 6) + F.lit(0.0))
                    .alias("rbo")))


#: Dirichlet smoothing pseudo-count (Zhai & Lafferty 2001 report
#: µ ≈ 2000 as the robust default across TREC collections).
QL_MU = 2000.0


def query_likelihood_topk(docs: DataFrame, query_terms: list[str],
                          k: int = 20, mu: float = QL_MU,
                          text_col: str = "text") -> DataFrame:
    """Top-k documents by Dirichlet-smoothed query-likelihood score
    (Zhai & Lafferty 2001): score(d) = Σ_t ln((tf + µ·cf_t/|C|) /
    (dl + µ)) — the language-modeling alternative to `bm25_topk`'s
    probabilistic ranking; the two disagree exactly where smoothing
    matters (short docs, rare terms), which is why both belong in a
    retrieval stack (and why `combsum_fusion` fuses them).

    Candidates are docs matching ≥1 query term (the standard OR
    gate); each candidate then scores ALL query terms — zero-tf terms
    contribute the background ln(µ·cf/|C| / (dl+µ)), which is what
    distinguishes QL from a tf-only sum. Query terms absent from the
    corpus (cf = 0) are dropped: their contribution is −∞ for every
    document equally and the published convention is to ignore OOV
    terms. The ≤|q|-term float sum per doc rides the bm25 acceptance
    (bounded-width sum, 4dp round); the final top-k is TakeOrdered
    with doc_id tie-break.

    Scale: one tokenize; cf/|C| are corpus-bounded broadcast scalars;
    the candidate×query-term grid is |candidates|·|q| — query-bounded
    fan-out, and the dl join is the one doc-keyed shuffle (same cost
    center as bm25_topk, same indexed-path remedy)."""
    tf = _term_freq(docs, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    qt = (tf.sparkSession
          .createDataFrame([(t,) for t in sorted(set(query_terms))],
                           "term string"))
    tfq = tf.join(F.broadcast(qt), "term")
    cf = (tfq.groupBy("term")
          .agg(F.sum("tf").cast("bigint").alias("cf"))
          .where(F.col("cf") > 0))
    clen = dl.agg(F.sum("dl").cast("bigint").alias("clen"))
    grid = (tfq.select("doc_id").distinct()
            .crossJoin(F.broadcast(cf)))
    scored = (grid
              .join(tfq.withColumnRenamed("tf", "tf_d"),
                    ["doc_id", "term"], "left")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(clen))
              .select("doc_id", F.expr(
                  f"ln((coalesce(tf_d, 0) + {mu} * cf / clen) "
                  f"/ (dl + {mu}))").alias("part")))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum("part"), 4).alias("ql"))
            .orderBy(F.col("ql").desc(), F.col("doc_id").asc())
            .limit(k))


#: Fusion leg depth: each leg contributes its top-FUSION_POOL docs.
FUSION_POOL = 100


def combsum_fusion(docs: DataFrame, query_terms: list[str],
                   k: int = 20, pool: int = FUSION_POOL,
                   text_col: str = "text") -> DataFrame:
    """CombSUM / CombMNZ rank fusion (Fox & Shaw 1994) of the BM25
    and query-likelihood legs for the same query: each leg's
    top-`pool` scores are min-max normalized to [0,1] and summed;
    CombMNZ additionally multiplies by the number of legs that
    retrieved the doc — the score-level sibling of
    `hybrid_topk_rrf`'s rank-level fusion.

    Exactness: each leg's scores are already 4dp-rounded by its
    operator (the published plans, reused verbatim); leg min/max are
    exact aggregates of those rounded doubles, broadcast back; the
    fused score is ONE fixed-form expression (coalesce(·,0) + — never
    a float aggregation), 6dp. A leg with max = min contributes its
    presence (MNZ count) but 0 normalized score — the degenerate-leg
    convention. Ties break on doc_id.

    Scale: two query-bounded legs (each ends in TakeOrdered(pool)),
    then constant-size (≤2·pool rows) fusion arithmetic."""
    a = (bm25_topk(docs, query_terms, k=pool, text_col=text_col)
         .select("doc_id", F.col("bm25").alias("s_a")))
    b = (query_likelihood_topk(docs, query_terms, k=pool,
                               text_col=text_col)
         .select("doc_id", F.col("ql").alias("s_b")))
    sa = a.agg(F.min("s_a").alias("mn_a"), F.max("s_a").alias("mx_a"))
    sb = b.agg(F.min("s_b").alias("mn_b"), F.max("s_b").alias("mx_b"))
    j = (a.join(b, "doc_id", "full_outer")
         .crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb)))
    na = ("CASE WHEN s_a IS NULL THEN 0.0 WHEN mx_a = mn_a THEN 0.0 "
          "ELSE (s_a - mn_a) / (mx_a - mn_a) END")
    nb = ("CASE WHEN s_b IS NULL THEN 0.0 WHEN mx_b = mn_b THEN 0.0 "
          "ELSE (s_b - mn_b) / (mx_b - mn_b) END")
    mnz = ("(CASE WHEN s_a IS NULL THEN 0 ELSE 1 END "
           "+ CASE WHEN s_b IS NULL THEN 0 ELSE 1 END)")
    return (j.select(
        "doc_id",
        (F.round(F.expr(f"({na}) + ({nb})"), 6) + F.lit(0.0))
        .alias("combsum"),
        (F.round(F.expr(f"({mnz}) * (({na}) + ({nb}))"), 6)
         + F.lit(0.0)).alias("combmnz"),
        F.expr(mnz).cast("bigint").alias("n_legs"))
        .orderBy(F.col("combsum").desc(), F.col("doc_id").asc())
        .limit(k))
