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
    """Run n_iter Lloyd's rounds; return (cluster, size) ordered.

    Round-15 NEGATIVE experiment: fan_out(embeddings) before the loop
    (to parallelize the 1-row-group scan feeding each round's GEMM
    assignment) measured 3.4/2.4 → 4.9/4.5 s on
    kmeans_fixed_point/kmeans_clusters — the loop re-executes the
    uncached input lineage every round, so the "one" exchange replays
    ~12×. Recorded so round 16 doesn't retry it without persisting.
    """
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


#: Seed-partition silhouette parameters (shared with the oracle):
#: cluster count and the micro-unit quantization of per-point scores.
SIL_K = 8
SIL_SCALE = 1_000_000


def silhouette_seed_partition(embeddings: DataFrame, k: int = SIL_K,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Simplified (centroid-based) silhouette audit (Hruschka et al.
    2004; the O(N·k) variant of Rousseeuw 1987) of the deterministic
    SEED Voronoi partition — clusters are "nearest of the k lowest-id
    vectors", the exact seeding rule `kmeans_cluster_sizes` starts
    from, so this scores the geometry Lloyd's iterations begin with:
    per cluster, how separated its members are (s ≈ 1) vs straddling
    a boundary (s ≈ 0).

    Exactness (what makes an oracle possible where float-centroid
    silhouettes drift): embeddings quantize to the 1e-4 integer grid
    (`graph_ann.Q_SCALE`), so every squared L2 distance is an EXACT
    int64; a = d²(x, own seed), b = d²(x, runner-up seed) via one
    per-row sort of the k (distance, seed) pairs (ties toward the
    lower seed index — argmin semantics); s = (b−a)/max(a,b) is ONE
    double division of exact integers, quantized to integer
    micro-units per point, then integer-summed. Duplicate-of-seed
    points (a = b = 0) score 0 by convention.

    Scale: the k seed vectors are a bounded collect (the kmeans seed
    read); scoring is one narrow map over the corpus (k baked literal
    arrays, whole-stage codegen, no join); the report is one k-row
    aggregate. Output: (cluster, n_members, mean_s_micro,
    min_s_micro)."""
    from cloud_native_mapreduce_spark.similarity.graph_ann import (
        quantized)

    seed_rows = (embeddings.orderBy(id_col).limit(k)
                 .select(vec_col).collect())          # k-row collect
    seeds = [[int(round(float(x) * 10_000)) for x in r[vec_col]]
             for r in seed_rows]
    q = embeddings.select(F.col(id_col),
                          quantized(F.col(vec_col)).alias("q"))

    # ONE constant-folded k×dim seed tensor + an aggregate over the
    # seed index instead of k separate 64-literal zip_with/aggregate
    # trees (round-15 — the graph_ann._bucket planning fix: the k deep
    # lambda trees cost ~3.9 s of Catalyst time per query, profiled
    # driver gap of a 5.7 s wall). Same exact int64 distances, same
    # struct sort with the same (d, j) tie order.
    seeds_sql = "array(" + ",".join(
        "array(" + ",".join(f"{v}L" for v in s) + ")"
        for s in seeds) + ")"
    ranked = F.expr(
        f"array_sort(transform(sequence(0, {len(seeds) - 1}), j -> "
        f"named_struct('d', aggregate(zip_with(q, {seeds_sql}[j], "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
        f"(acc, v) -> acc + v), 'j', CAST(j AS INT))))")
    scored = q.select(
        ranked[0]["j"].alias("cluster"),
        ranked[0]["d"].alias("a"),
        ranked[1]["d"].alias("b"))
    s_micro = (f"CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT) "
               f"ELSE CAST(round((b - a) * {SIL_SCALE} "
               f"/ CAST(greatest(a, b) AS DOUBLE), 0) AS BIGINT) END")
    return (scored.select("cluster",
                          F.expr(s_micro).alias("s"))
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"),
                 F.expr("sum(s) DIV count(1)").cast("bigint")
                 .alias("mean_s_micro"),
                 F.min("s").cast("bigint").alias("min_s_micro"))
            .orderBy("cluster"))
