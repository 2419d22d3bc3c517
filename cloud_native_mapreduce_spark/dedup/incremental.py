"""Persisted MinHash/LSH index + incremental near-dup detection.

The dedup-side sibling of `similarity/ivf_index.py` (round 10's
persisted-index theme): a production corpus is deduplicated ONCE, and
every subsequent ingest batch must be checked against the existing
corpus WITHOUT re-tokenizing, re-hashing, or re-shuffling it — the
shape every continuously-crawled training-data pipeline runs (new crawl
vs. historical corpus). Every prior dedup entry here recomputes the
full corpus pipeline per run; this module materializes it.

Index layout (two tables under one prefix):
  * `{prefix}_bands` — (band_key, doc_id): the LSH posting lists,
    bucketed AND sorted on band_key. Hot buckets (> MAX_BUCKET docs)
    are dropped AT BUILD TIME — the same pair-blowup cap
    `candidate_pairs` applies per query, paid once here. Bucketing on
    band_key means the candidate join against a new batch shuffles
    ONLY the batch: the index side merge-joins in place.
  * `{prefix}_shingles` — (doc_id, sh_h): hashed shingle sets for the
    exact-Jaccard verify, bucketed on doc_id so the verify fetch is a
    keyed join against a layout, not a recompute of the corpus
    tokenize+shingle+hash pipeline.

Query (`incremental_near_duplicates`): the new batch runs the normal
narrow signature map (tokenize → shingle-hash → Arrow minhash →
band keys — all O(|batch|)), candidates come from one band_key join
against the persisted posting lists, and verification is exact hashed
Jaccard with the new side's arrays in hand and the old side's fetched
from the shingle table. Work is O(|batch| + |candidates|); the
historical corpus contributes only the index rows the batch's band
keys actually touch.

Same determinism contract as `dedup/minhash.py` (seeded splitmix64
permutations, xxhash64 shingles, no RNG), so the registry entry earns
the same full value-level oracle via the planted-pair argument: at
J >= 0.9 the 16-band/4-row banding miss probability is
(1-J^4)^16 <= 4e-8, so the exact all-pairs new-vs-old Jaccard in
DuckDB IS the expected output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.dedup.minhash import (MAX_BUCKET,
                                                        NUM_PERM,
                                                        _sig_udf_for,
                                                        band_keys,
                                                        doc_shingle_hashes)

N_BUCKETS = 8


def build_minhash_index(docs: DataFrame, table_prefix: str, path: str,
                        n_buckets: int = N_BUCKETS,
                        max_bucket: int = MAX_BUCKET,
                        text_col: str = "text") -> None:
    """Materialize the corpus-side dedup index: LSH band postings
    (hot buckets dropped) and hashed shingle sets, each bucketed on
    its query-time join key. One corpus pass computes both (the hash
    frame is persisted across the two writes); the hot-bucket filter
    is a keyed semi-join against the band-size aggregate."""
    from pyspark import StorageLevel

    from cloud_native_mapreduce_spark.sources.tables import write_bucketed

    hashes = (doc_shingle_hashes(docs, text_col)
              .persist(StorageLevel.MEMORY_AND_DISK))
    sigs = hashes.select(
        "doc_id", _sig_udf_for(NUM_PERM)(F.col("sh_h")).alias("sig"))
    bands = band_keys(sigs)
    cold = (bands.groupBy("band_key").agg(F.count("*").alias("bsz"))
            .where(F.col("bsz") <= max_bucket)
            .select("band_key"))
    kept = bands.join(cold, "band_key", "left_semi")
    write_bucketed(kept, f"{table_prefix}_bands", f"{path}/bands",
                   "band_key", n_buckets)
    write_bucketed(hashes, f"{table_prefix}_shingles",
                   f"{path}/shingles", "doc_id", n_buckets)
    hashes.unpersist()


def incremental_near_duplicates(spark: SparkSession, table_prefix: str,
                                new_docs: DataFrame,
                                threshold: float = 0.8,
                                text_col: str = "text") -> DataFrame:
    """(doc_new, doc_old, jaccard) pairs: documents of `new_docs` that
    near-duplicate an INDEXED corpus document at exact hashed-shingle
    Jaccard >= threshold, candidates restricted to shared LSH bands —
    `dedup/minhash.near_duplicates` semantics with the corpus side
    read from a `build_minhash_index` layout instead of recomputed.

    Only new-vs-old pairs are emitted (new-vs-new dedup within a batch
    is the existing `near_duplicates` operator; run both for a full
    ingest). The new batch's shingle-hash frame is persisted — it
    feeds the signature map and the verify join (the module's standing
    fan-out rule)."""
    from pyspark import StorageLevel

    nh = (doc_shingle_hashes(new_docs, text_col)
          .persist(StorageLevel.MEMORY_AND_DISK))
    nsig = nh.select(
        "doc_id", _sig_udf_for(NUM_PERM)(F.col("sh_h")).alias("sig"))
    nbands = band_keys(nsig).select(F.col("doc_id").alias("doc_new"),
                                    "band_key")
    ibands = (spark.table(f"{table_prefix}_bands")
              .select("band_key", F.col("doc_id").alias("doc_old")))
    cand = (nbands.join(ibands, "band_key")
            .select("doc_new", "doc_old").distinct())
    ish = (spark.table(f"{table_prefix}_shingles")
           .select(F.col("doc_id").alias("doc_old"),
                   F.col("sh_h").alias("sh_old")))
    joined = (cand
              .join(nh.select(F.col("doc_id").alias("doc_new"),
                              F.col("sh_h").alias("sh_new")), "doc_new")
              .join(ish, "doc_old"))
    jac = (F.size(F.array_intersect("sh_new", "sh_old"))
           / F.size(F.array_union("sh_new", "sh_old")))
    return (joined.select("doc_new", "doc_old",
                          F.round(jac, 4).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
