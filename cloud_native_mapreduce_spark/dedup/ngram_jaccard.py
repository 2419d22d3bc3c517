"""Exhaustive n-gram Jaccard near-dup pairs via an inverted index.

Unlike MinHash (probabilistic recall) this computes the EXACT set of pairs
with shingle-Jaccard >= threshold, using the standard inverted-index join:
explode shingles → group by shingle (posting lists) → count shared shingles
per pair → Jaccard from |A∩B| and |A|+|B|. Deterministic and
SQL-expressible, so it gets a DuckDB oracle.

Scale posture: cost is Σ |posting list|², dominated by common shingles —
at corpus scale you drop shingles with document frequency above a cap
(they cannot define near-dup identity anyway). The cap is a parameter;
the registry query keeps it high enough to be exact on the test corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.dedup.minhash import doc_shingles


def near_duplicates(docs: DataFrame, text_col: str = "text",
                    threshold: float = 0.5,
                    max_df: int | None = None) -> DataFrame:
    """Pairs (doc_a < doc_b, jaccard) with exact Jaccard >= threshold
    among pairs sharing >= 1 (non-capped) shingle."""
    sh = doc_shingles(docs, text_col)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    posting = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_df is not None:
        hot = (posting.groupBy("shingle").agg(F.count("*").alias("df"))
               .where(F.col("df") > max_df).select("shingle"))
        posting = posting.join(hot, "shingle", "left_anti")
    a = posting.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = posting.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (a.join(b, "shingle")
              .where(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b")
              .agg(F.count("*").alias("n_shared")))
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"),
                        F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"),
                        F.col("n_sh").alias("n_b"))
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (shared.join(sz_a, "doc_a").join(sz_b, "doc_b")
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
