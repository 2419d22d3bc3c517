"""Distributed k-means (Lloyd's) over the embedding column.

The iterative-ML shape on DataFrames. Per round:
  * ASSIGNMENT — the k×dim centroid matrix (tiny) is closed over by an
    Arrow-batched mapInPandas; each batch computes all n×k squared-L2
    distances with ONE numpy GEMM (|v|² − 2·V·Cᵀ + |c|²) and argmins.
    No crossJoin, no per-element interpreted lambdas — the same
    blocked-GEMM lesson as pairwise embedding near-dup (DESIGN.md HOF
    trap #1: a zip_with/aggregate formulation ran ~7 s/round at sf0.1;
    this runs the whole 5-round fit in ~2 s).
  * UPDATE — per-cluster per-dimension sums via posexplode + ONE hash
    aggregate (map-side partials ⇒ shuffle is k×dim rows per partition,
    corpus-size independent); the k×dim result (hundreds of scalars) is
    collected to rebuild the centroid matrix. The driver only ever
    holds centroids — data never collects.

Determinism: centroids initialize from the k lowest ids (not a random
sample); np.argmin breaks distance ties toward the lower cluster id;
iteration count is fixed. Same inputs ⇒ same clusters on ANY input
partitioning — the retry-stability property the reference gets from
idempotent blob overwrite (SURVEY.md §1.3). pyspark.ml's KMeans is the
library alternative; this keeps the engine's iterative pattern visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(embeddings: DataFrame, cent_mat, id_col: str,
            vec_col: str) -> DataFrame:
    """(id, cluster) by squared-L2 argmin against a numpy centroid
    matrix; ties break toward the lower cluster id (argmin semantics)."""
    import numpy as np
    import pandas as pd

    c = np.asarray(cent_mat, dtype=np.float64)          # k × d
    c_norm = (c * c).sum(axis=1)

    def emit(batches):
        for pdf in batches:
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ c.T) \
                + c_norm[None, :]
            yield pd.DataFrame({id_col: pdf[id_col],
                                "cluster": np.argmin(d2, axis=1)
                                .astype(np.int64)})

    return (embeddings.select(id_col, vec_col)
            .mapInPandas(emit, f"{id_col} long, cluster long"))


def _update(embeddings: DataFrame, assign: DataFrame, prev_cent,
            id_col: str, vec_col: str):
    """New centroid matrix from per-cluster dimension means (k×dim
    scalars collected — the only driver-side data in the loop). Seeded
    with the previous round's matrix so a cluster that receives no
    points KEEPS its centroid instead of jumping to the origin (the
    standard Lloyd's empty-cluster rule)."""
    import numpy as np

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = (embeddings.select(id_col, vec_d.alias("v"))
            .join(assign, id_col)
            .select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect())
    cent = np.array(prev_cent, dtype=np.float64, copy=True)
    for r in rows:
        cent[r["cluster"], r["dim"]] = r["m"]
    return cent


def kmeans_cluster_sizes(embeddings: DataFrame, k: int = 8,
                         n_iter: int = 5, dim: int = 64,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Run n_iter Lloyd's rounds; return (cluster, size) ordered."""
    import numpy as np

    seed_rows = (embeddings.orderBy(id_col).limit(k)
                 .select(vec_col).collect())
    cent = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in seed_rows])

    for _ in range(n_iter):
        assign = _assign(embeddings, cent, id_col, vec_col)
        cent = _update(embeddings, assign, cent, id_col, vec_col)

    return (_assign(embeddings, cent, id_col, vec_col)
            .groupBy("cluster")
            .agg(F.count("*").alias("size"))
            .orderBy("cluster"))


def with_planted_fixed_point(embeddings: DataFrame, k: int = 8,
                             base_copies: int = 10,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Corpus on which Lloyd's k-means is PROVABLY at a fixed point:
    the k lowest-id vectors become anchors (exactly the deterministic
    init set), and anchor j gains `base_copies + j` exact copies (ids
    ≥ 1000, so the init still picks the anchors).

    Round 1 assigns every copy to its own anchor (distance 0, all other
    anchors strictly farther since natural vectors are distinct); the
    update then averages identical vectors, reproducing each anchor —
    a fixed point, so every subsequent round is identical and the final
    cluster sizes are provably (1 + base_copies + j). That turns the
    iterative pipeline — broadcast-GEMM assignment, posexplode + hash
    aggregate update, k×dim driver traffic — into a value-checkable
    query: an assignment bug, update bug, or iteration-order bug all
    break the fixed point and the oracle catches it."""
    anchors = (embeddings.where(F.col(id_col) < k)
               .select(F.col(id_col).alias("__anchor_id"),
                       F.col(vec_col)))
    # rename through __anchor_id: the id expression below must see the
    # ANCHOR id beside the new-id alias (lateral-alias trap, DESIGN.md)
    dup = (anchors.select(
        "__anchor_id", vec_col,
        F.explode(F.sequence(
            F.lit(1), F.lit(base_copies) + F.col("__anchor_id")))
        .alias("c"))
        .select((F.lit(1000) + F.col("__anchor_id") * 100 + F.col("c"))
                .cast("long").alias(id_col), F.col(vec_col)))
    return (anchors.select(F.col("__anchor_id").cast("long")
                           .alias(id_col), F.col(vec_col))
            .unionByName(dup))
