"""Random-hyperplane LSH (SRP) bucketed approximate nearest neighbors.

Scale path for similarity search: sign-random-projection hashes each
embedding to an n-bit bucket; candidates are scored only within the query's
bucket (optionally multi-probe: buckets at Hamming distance 1). Planes are
generated from a fixed seed and shipped as literal arrays — deterministic,
no fitted model state, no driver-side collect of data.

At 100 TB: bucketing is a narrow map (no shuffle); the candidate scan reads
only matching buckets if the table is written partitioned/bucketed by
`bucket` — the registry query demonstrates the operator; the write-side
layout note lives in sources/tables.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.vectors import cosine, dot

SEED = 42
N_PLANES = 8  # 256 buckets


def _planes(dim: int, n_planes: int = N_PLANES, seed: int = SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def bucket_col(vec_col, dim: int, n_planes: int = N_PLANES,
               seed: int = SEED):
    """Integer SRP bucket id for an embedding column."""
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, plane) > 0,
                     F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def bucketed(embeddings: DataFrame, dim: int,
             vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn(
        "bucket", bucket_col(F.col(vec_col), dim))


def top_k_similar(embeddings: DataFrame, query_vec_id: int, dim: int,
                  k: int = 10, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: score only rows in the query's bucket (plus
    Hamming-1 neighbor buckets when multiprobe)."""
    b = bucketed(embeddings, dim, vec_col)
    q = (b.where(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("query_vec"),
                 F.col("bucket").alias("q_bucket")))
    cand = b.crossJoin(F.broadcast(q))
    if multiprobe:
        probe = F.bit_count(F.col("bucket").bitwiseXOR(F.col("q_bucket"))) <= 1
    else:
        probe = F.col("bucket") == F.col("q_bucket")
    return (cand.where(probe)
            .select(id_col,
                    F.round(cosine(F.col(vec_col), F.col("query_vec")), 4)
                     .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))
