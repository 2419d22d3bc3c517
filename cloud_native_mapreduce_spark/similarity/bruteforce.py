"""Brute-force cosine similarity search over an embedding column.

The correctness baseline for ANN: score every row against the query vector
with JVM-side higher-order functions (no Python), then TakeOrderedAndProject
for top-k — a per-partition heap + k-row driver merge, never a full sort.

Scale posture: one scan, no shuffle. At 100 TB the scan parallelizes over
partitions and each partition contributes at most k candidates to the
merge; this is exactly how you want exact search to look. The LSH variant
(`similarity.lsh`) trades recall for scanning only a bucket subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.vectors import cosine


def top_k_similar(embeddings: DataFrame, query_vec_id: int, k: int = 10,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Top-k rows by cosine similarity to the row with id == query_vec_id.

    The single query vector is extracted as a 1-row DataFrame and
    broadcast-cross-joined (1×N — no data movement of the big side).
    Ordering is by 4-dp-rounded cosine with id tiebreak, fully
    deterministic.
    """
    q = (embeddings.where(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("query_vec")))
    scored = (embeddings.crossJoin(F.broadcast(q))
              .select(id_col,
                      F.round(cosine(F.col(vec_col), F.col("query_vec")), 4)
                       .alias("cosine")))
    return (scored
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))


def pairwise_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-space
    near-dup detection. Exact O(N²/2) formulation for oracle-checkable
    correctness; the LSH variant is the scale path."""
    a = embeddings.select(F.col(id_col).alias("vec_a"),
                          F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("vec_b"),
                          F.col(vec_col).alias("vb"))
    pairs = (a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
             .select("vec_a", "vec_b",
                     F.round(cosine(F.col("va"), F.col("vb")), 4)
                      .alias("cosine")))
    return pairs.where(F.col("cosine") >= threshold)
