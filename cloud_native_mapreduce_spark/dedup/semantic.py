"""SemDeDup-style semantic deduplication over an embedding column.

The embedding-space sibling of the text near-dup operators (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" — public literature): cluster the corpus with
a coarse quantizer, compare vectors ONLY within a cluster, and drop
every vector that has a smaller-id neighbor above the cosine threshold
in its cluster. Near-dups that land in different clusters are missed —
that is the documented approximation the clustering buys; it turns the
O(N²) all-pairs comparison into Σ |cluster|², bounded by the cluster
granularity, which is exactly the paper's trick for running semantic
dedup at web scale.

Spark shape: the quantizer is `ivf.centroids` (deterministic stride —
the oracle-reconstructible convention shared with ann_ivf/pq; pass
`cents=ivf.trained_centroids(...)` on a real corpus — the trained
path is recall-gated vs stride in tests/test_similarity.py, mirroring
the ann_ivf recall gate), assignment is the same
broadcast-centroid Arrow UDF ann_ivf uses (narrow map, no shuffle),
the pair stage is a keyed self-join on the cluster id with an
einsum-batched exact-cosine verify, and the survivor rule is one
left-anti-style join back. No collects beyond the n_clusters-row
centroid matrix; hot clusters above `max_cluster` are excluded from
pair enumeration (their members stay kept=true) — the same Σ df²
guardrail every pair operator here carries.

Scale sizing: n_clusters must grow with the corpus — expected cluster
size N/n_clusters drives the quadratic pair stage — so the default
DERIVES it: `auto_clusters(N)` keeps the expected cluster at
TARGET_CLUSTER vectors (the paper runs 50k clusters at web scale for
the same reason; a fixed 16 went quadratic the moment the sf1 soak
ran 40k vectors through it: 87 s → 11 s after auto-sizing). The count
is capped at MAX_CLUSTERS because centroids broadcast to every
executor (65 536 × dim f64 ≈ 32 MB at dim 64); past that, swap the
broadcast assignment for a partitioned centroid join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_CLUSTERS = 16          # floor — also the fixed count the oracle sees
                         # at driver scale factors
TARGET_CLUSTER = 256     # expected vectors per cluster under auto-sizing
MAX_CLUSTERS = 65536     # broadcast-size ceiling for the centroid matrix
MAX_CLUSTER = 4096       # hot-cluster pair-enumeration drop cap


def auto_clusters(n_vectors: int,
                  target_cluster: int = TARGET_CLUSTER) -> int:
    """Corpus-scaled cluster count: max(N_CLUSTERS, N // target),
    capped at MAX_CLUSTERS. Mirrored verbatim in the registry oracle
    (greatest(16, n // 256)) so assignments stay SQL-reconstructible
    at any corpus size."""
    return max(N_CLUSTERS, min(MAX_CLUSTERS, n_vectors // target_cluster))


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.95,
                   n_clusters: int | None = None,
                   max_cluster: int = MAX_CLUSTER,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   cents: "np.ndarray | None" = None,
                   n_vectors: int | None = None) -> DataFrame:
    """(vec_id, cluster, kept): kept=false iff the vector has a
    SMALLER-id neighbor at cosine >= threshold within its cluster —
    the deterministic drop rule (the paper keeps one random member per
    semantic group; min-id is the reproducible equivalent, matching
    exact dedup's min-doc_id survivor convention).

    Returns the full decision table rather than just survivors so the
    value-level oracle checks every assignment and every verdict;
    `corpus.join(out.where("kept"), id_col, "left_semi")` is the
    survivor corpus.

    ``cents`` swaps the coarse quantizer — pass
    ``ivf.trained_centroids(embeddings, auto_clusters(N))`` on a real
    corpus for trained clustering (tests/test_similarity.py gates the
    trained path at >= stride dedup recall on a planted semantic-dup
    corpus); the default stride quantizer stays the
    oracle-reconstructible path. ``n_vectors`` skips the sizing count
    when the caller knows N. Auto-sizing needs ONE count job; the
    projected input is persisted first so that job doubles as the
    cache materialization the assignment/centroid scans reuse — the
    corpus is scanned once, counted once.
    """
    from pyspark import StorageLevel

    from cloud_native_mapreduce_spark.similarity import ivf

    emb = (embeddings.select(id_col, vec_col)
           .persist(StorageLevel.MEMORY_AND_DISK))
    if n_clusters is None:
        if n_vectors is None:
            n_vectors = emb.count()
        n_clusters = auto_clusters(n_vectors)
    if cents is None:
        cents = ivf.centroids(emb, n_clusters, id_col, vec_col,
                              n_vectors=n_vectors)
    asg = (ivf.assigned(emb, cents, vec_col)
           .withColumnRenamed("list_id", "cluster"))
    # assignment feeds both pair-join legs and the output — persist or
    # the Arrow assignment UDF runs three times
    asg = asg.persist(StorageLevel.MEMORY_AND_DISK)

    hot = (asg.groupBy("cluster").agg(F.count("*").alias("csz"))
           .where(F.col("csz") > max_cluster).select("cluster"))
    cold = asg.join(F.broadcast(hot), "cluster", "left_anti")
    a = cold.select("cluster", F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("va"))
    b = cold.select("cluster", F.col(id_col).alias("id_b"),
                    F.col(vec_col).alias("vb"))

    @F.pandas_udf("double")
    def cos_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
        # Two-pass verify: einsum computes the bulk (BLAS-vectorized
        # over rows AND dims), then only rows whose cosine lies within
        # BAND of a round(.,4) half-point boundary are recomputed with
        # the dim-by-dim IEEE-sequential accumulation that matches the
        # oracle's per-dim row sum bit-for-bit (the ivf._assign_udf
        # rule). Correctness argument: the decision is
        # round(cos, 4) >= threshold, which can only differ between
        # the einsum and sequential values when they straddle a
        # (k + 0.5)·1e-4 boundary; |einsum − sequential| is bounded by
        # ~3·dim·eps ≈ 4e-14 at dim 64 (Cauchy-Schwarz caps the
        # abs-sums at na·nb), and BAND = 1e-8 is six orders of
        # magnitude wider — so every row outside the band provably
        # rounds identically under either summation, and every row
        # inside it gets the oracle-exact form. Replaces the r9
        # all-rows Python dim loop (the 1.51× bench regression).
        if len(va) == 0:
            return pd.Series([], dtype=float)
        ma = np.array(va.tolist(), dtype=np.float64)
        mb = np.array(vb.tolist(), dtype=np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
        nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        cos = dots / (na * nb)
        # distance (in cosine units) to the nearest x.xxx5e-4 boundary
        frac = np.abs(np.mod(cos * 1e4, 1.0) - 0.5) * 1e-4
        band = np.nonzero(frac < 1e-8)[0]
        if len(band):
            sa2 = ma[band]
            sb2 = mb[band]
            d = np.zeros(len(band), dtype=np.float64)
            qa = np.zeros(len(band), dtype=np.float64)
            qb = np.zeros(len(band), dtype=np.float64)
            for i in range(sa2.shape[1]):
                d += sa2[:, i] * sb2[:, i]
                qa += sa2[:, i] * sa2[:, i]
                qb += sb2[:, i] * sb2[:, i]
            n1 = np.sqrt(qa)
            n2 = np.sqrt(qb)
            n1[n1 == 0.0] = 1.0
            n2[n2 == 0.0] = 1.0
            cos[band] = d / (n1 * n2)
        return pd.Series(cos)

    dropped = (a.join(b, "cluster")
               .where(F.col("id_a") < F.col("id_b"))
               .where(F.round(cos_udf(F.col("va"), F.col("vb")), 4)
                      >= threshold)
               .select(F.col("id_b").alias(id_col))
               .distinct()
               .withColumn("_dropped", F.lit(True)))
    return (asg.join(dropped, id_col, "left")
            .select(id_col, "cluster",
                    F.coalesce(~F.col("_dropped"), F.lit(True))
                    .alias("kept")))
