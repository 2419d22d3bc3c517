"""Persisted PQ (product-quantization) ANN index: encode once, ADC
queries over the durable code table.

The last ANN family member still rebuilding per query (round-13
verdict #5): `pq.top_k_adc` re-derives the codebook and re-encodes the
corpus on every call — the right demo shape, the wrong production
shape. At 100 TB the encode pass (one Arrow-batched map over 25 TB of
float32 vectors) is an ingest-time cost you pay ONCE; what queries
need is the ~0.8 TB code table. This module is `ivf_index.py`'s
build/query split applied to the PQ surface, and the Spark-native
rendering of the reference's durable-intermediate idea (blob storage
as the fabric between stages, cmd/azure/azure_util.go:46-99): the
index IS a pair of tables, and a query is a plan over them.

Index layout (two tables under one prefix):
  * ``{prefix}_postings`` — (vec_id, codes array<int>, embedding),
    bucketed AND sorted by vec_id. Parquet column pruning keeps the
    corpus-wide ADC scan on (vec_id, codes) — the 32x-compressed
    representation — while the float vectors are touched only by the
    query's OWN 1-row lookup, which vec_id bucketing prunes to a
    single bucket.
  * ``{prefix}_codebook`` — (cj, cemb): 16 rows; read with a bounded
    collect at query time (the ivf centroid-table convention).

Query plan (pinned in tests/test_plan_audit.py): one bucket-pruned
1-row lookup for the query vector, then ONE codes-only scan whose
distance expression is 8 literal-array ``element_at`` lookups + adds
inside whole-stage codegen, ending in TakeOrderedAndProject(k) —
ZERO shuffle exchanges, no join, no Python at query time. Unlike the
IVF layout there is deliberately no list pruning: plain PQ's scale
win is compression (scan 1/32nd the bytes), and the composition with
coarse pruning already exists as `ann_ivf_pq` / the IVF+SQ8 index.

Quantizer parity: the default stride codebook and the sequential
per-dim distance rule are byte-identical to `pq.top_k_adc`'s, so the
registry entry shares ``ann_pq_adc``'s full value-level DuckDB oracle
verbatim — build+query round-trips to the same top-k, proving the
persisted layout changes WHERE the work happens, never the answer.
Pass ``trained_codebook(...)`` at build time for a real corpus; the
layout and query plan are identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.similarity.pq import (CODE_K, SUBSPACES,
                                                        _query_lut, adc_rank,
                                                        codebook, encode)

N_BUCKETS = 8


def build_pq_index(embeddings: DataFrame, table_prefix: str, path: str,
                   subspaces: int = SUBSPACES, n_codes: int = CODE_K,
                   n_buckets: int = N_BUCKETS,
                   cb: "np.ndarray | None" = None,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> None:
    """Materialize the PQ index for a corpus: ONE Arrow-batched encode
    pass writes (vec_id, codes, embedding) bucketed+sorted on vec_id;
    the only other build-time job is the bounded codebook collect
    (n_codes rows — never the corpus). Bucket count scales with corpus
    volume (~100-500 MB per bucket at target SF)."""
    from cloud_native_mapreduce_spark.sources.tables import write_bucketed

    emb = embeddings.select(id_col, vec_col)
    if cb is None:
        cb = codebook(emb, n_codes, id_col, vec_col)
    coded = encode(emb, cb, subspaces, id_col, vec_col, keep_vec=True)
    write_bucketed(coded, f"{table_prefix}_postings",
                   f"{path}/postings", id_col, n_buckets)
    spark = embeddings.sparkSession
    cb_rows = [(int(j), [float(v) for v in cb[j]])
               for j in range(cb.shape[0])]
    (spark.createDataFrame(cb_rows, "cj int, cemb array<double>")
     .coalesce(1)
     .write.mode("overwrite").option("path", f"{path}/codebook")
     .saveAsTable(f"{table_prefix}_codebook"))


def ann_pq_indexed(spark: SparkSession, table_prefix: str,
                   query_vec_id: int, k: int = 10,
                   subspaces: int = SUBSPACES) -> DataFrame:
    """Approximate top-k by ADC over a `build_pq_index` layout:
    returns (vec_id, adc_dist) exactly like `pq.top_k_adc`, but the
    corpus work at query time is ONE codes-only column-pruned scan —
    the 8x16 distance lookup table is computed driver-side from the
    bounded codebook table + the query's own bucket-pruned posting
    row, then baked into the scan expression as literal arrays."""
    # without a bucket-keyed join/agg Spark falls back to a plain file
    # scan and silently forfeits the vec_id bucket pruning on the
    # query-row lookup (the ivf_index.py finding); read-side only
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

    cb_rows = (spark.table(f"{table_prefix}_codebook")
               .orderBy("cj").collect())             # n_codes-bounded
    cb = np.array([r["cemb"] for r in cb_rows], dtype=np.float64)
    posts = spark.table(f"{table_prefix}_postings")
    qrow = (posts.where(F.col("vec_id") == query_vec_id)
            .select("embedding").first())            # 1-row, bucket-pruned
    q = np.array(qrow["embedding"], dtype=np.float64)
    return adc_rank(posts.select("vec_id", "codes"),
                    _query_lut(q, cb, subspaces), k)
