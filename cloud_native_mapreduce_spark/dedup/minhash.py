"""MinHash + LSH near-duplicate detection, pure DataFrame ops.

Pipeline (all deterministic — seeded xxhash64, no RNG state):
  1. shingle: k-word shingles from the reference-parity tokenizer;
  2. signature: per doc, NUM_PERM minhash values — one shuffle
     (explode shingles → groupBy doc → NUM_PERM min() aggregates, with
     map-side partial min so the shuffle carries signatures, not shingles);
  3. band: split the signature into BANDS bands of ROWS_PER_BAND values,
     hash each band → (band_key, doc_id);
  4. bucket-join: docs sharing any band key become candidate pairs
     (groupBy band key, emit intra-bucket pairs — never a cross join);
  5. verify: exact Jaccard over distinct shingle sets for candidates only.

Scale posture: the only data-proportional shuffles are keyed on shingle
hash and band key; candidate verification touches |candidates| pairs, not
|docs|^2. Hot buckets (boilerplate text) are capped at MAX_BUCKET to bound
the pair blowup — the standard guardrail in web-scale dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.text import tokens

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_K = 3
MAX_BUCKET = 64  # ignore hot LSH buckets larger than this (pair-blowup cap)


def shingles_from_tokens(toks, k: int = SHINGLE_K):
    """array<string> of k-word shingles (distinct) from a token-array
    COLUMN. Pass a real column reference, not the tokenizer expression:
    the regex extract would otherwise be re-evaluated for every
    element_at reference (observed 7× slowdown at sf0.1)."""
    # slice+array_join, not per-element element_at concat: generators
    # (explode) re-evaluate the collection expression per emitted row, so
    # construction cost multiplies — the slice form measured 3.7× faster
    # at sf0.1 under explode.
    return F.array_distinct(F.when(
        F.size(toks) < k,
        # short docs: fall back to the whole token string as one shingle
        F.array(F.concat_ws(" ", toks)),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )))


def doc_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # two-step projection: tokenize once into a column, then shingle from
    # the column. CollapseProject keeps the split because the token array
    # is non-cheap and referenced multiple times.
    toks = docs.select("doc_id", tokens(F.col(text_col)).alias("toks"))
    return toks.select(
        "doc_id", shingles_from_tokens(F.col("toks")).alias("shingles"))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       num_perm: int = NUM_PERM) -> DataFrame:
    """doc_id → array<bigint> signature of length num_perm.

    Projection-only formulation: per doc, num_perm × array_min(transform)
    over the shingle array — a narrow map with ZERO shuffle. The obvious
    alternative (explode shingles → groupBy doc → num_perm min() aggs)
    shuffles one row per shingle and ran 3.5× slower at sf0.1; at cluster
    scale the shuffle-free version wins by far more."""
    sh = doc_shingles(docs, text_col)
    # one nested-transform expression, not num_perm separate column trees:
    # 64 independent array_min(transform(...)) columns ballooned codegen
    # compile time to ~30 s on a cold session; the nested form is one
    # small codegen unit with identical semantics.
    return sh.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda i: F.array_min(
                F.transform(F.col("shingles"),
                            lambda x: F.xxhash64(i, x))),
        ).alias("sig"))


def candidate_pairs(signatures: DataFrame, bands: int = BANDS,
                    rows_per_band: int = ROWS_PER_BAND,
                    max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(doc_a < doc_b) candidate pairs sharing at least one LSH band."""
    band_rows = signatures.select(
        "doc_id",
        F.explode(F.array(*[
            F.xxhash64(F.lit(b), *[F.col("sig")[b * rows_per_band + r]
                                   for r in range(rows_per_band)])
            for b in range(bands)
        ])).alias("band_key"))
    buckets = (band_rows.groupBy("band_key")
               .agg(F.collect_list("doc_id").alias("ids"))
               .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket)))
    # intra-bucket pairs via self-product of the (small, capped) id list
    pairs = buckets.select(
        F.explode(F.filter(
            F.flatten(F.transform(
                F.col("ids"),
                lambda a: F.transform(F.col("ids"),
                                      lambda b: F.struct(a.alias("doc_a"),
                                                         b.alias("doc_b"))))),
            lambda p: p["doc_a"] < p["doc_b"])).alias("p"))
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def near_duplicates(docs: DataFrame, text_col: str = "text",
                    threshold: float = 0.8) -> DataFrame:
    """Verified near-dup pairs: candidates whose exact shingle-set Jaccard
    >= threshold. Columns: doc_a, doc_b, jaccard (rounded 4)."""
    sigs = minhash_signatures(docs, text_col)
    cands = candidate_pairs(sigs)
    sh = doc_shingles(docs, text_col)
    a = sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"),
                  F.col("shingles").alias("sh_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (joined.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
