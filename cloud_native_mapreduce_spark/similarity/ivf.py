"""IVF (inverted-file) approximate nearest neighbors.

The second scale path for similarity search (complementing SRP-LSH):
partition the vector space by a coarse quantizer (nearest of n_list
centroids), store an inverted list per centroid, and at query time scan
only the `n_probe` lists whose centroids are closest to the query.

Centroid selection here is deterministic reservoir-free sampling — every
vec_id divisible by ⌈N/n_list⌉ — instead of trained k-means: no fitted
state, no iterative jobs, identical across runs/executors. On a real
corpus you'd train centroids once (pyspark.ml KMeans, seeded) and ship
them the same way: as a broadcast literal table.

At 100 TB: assignment is a narrow map over one broadcast (n_list × dim
floats); writing the corpus `partitionBy("list_id")` makes the query
read only n_probe/n_list of the data — the registry query demonstrates
the operator end to end in one plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_LIST = 16
N_PROBE = 4


def _assign_udf(cents: "np.ndarray"):
    """pandas UDF: embedding → index of nearest centroid (L2).

    Distances accumulate dim-by-dim in index order (vectorized over
    rows×centroids, scalar-sequential over dims) — IEEE-identical to
    the per-dim Σ(x−c)² rule the DuckDB oracles replay — so argmin
    ties cannot resolve differently engine-side vs oracle-side. The
    GEMM −2x·c+‖x‖² form is faster but rounds differently."""
    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        d = np.zeros((len(mat), cents.shape[0]), dtype=np.float64)
        for i in range(cents.shape[1]):
            diff = mat[:, i][:, None] - cents[None, :, i]
            d += diff * diff
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))
    return assign


def centroids(embeddings: DataFrame, n_list: int = N_LIST,
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              n_vectors: int | None = None) -> "np.ndarray":
    """Deterministic coarse quantizer: every ⌈N/n_list⌉-th vector by id.
    One tiny driver-side collect of n_list rows — NOT the corpus.
    ``n_vectors`` skips the count job when the caller already knows the
    corpus size (semantic_dedup threads its single persisted-frame
    count through here so the corpus is counted exactly once)."""
    n = embeddings.count() if n_vectors is None else n_vectors
    stride = max(1, (n + n_list - 1) // n_list)
    rows = (embeddings
            .where(F.col(id_col) % stride == 0)
            .orderBy(id_col)
            .limit(n_list)
            .select(vec_col)
            .collect())
    return np.array([r[0] for r in rows], dtype=np.float64)


def trained_centroids(embeddings: DataFrame, n_list: int = N_LIST,
                      sample_size: int = 4096, n_iter: int = 10,
                      seed: int = 7, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> "np.ndarray":
    """(n_list × dim) coarse quantizer from full-dim Lloyd's k-means on a
    bounded sample — the trained path the stride `centroids` docstring
    promises, with the same scale posture as `pq.trained_codebook`
    (Faiss trains IVF coarse quantizers the same way): the ONLY
    corpus-wide work is a deterministic hash-ordered top-`sample_size`
    (per-partition top-k + driver merge, ~2 MB at the defaults
    regardless of corpus size); the seeded Lloyd rounds run driver-side
    in numpy, empty clusters keep their previous centroid. The k-means
    geometry is not SQL-expressible, so this path is gated by the
    recall-vs-stride pytest (tests/test_similarity.py) while the
    registry's value-level oracle entries keep the stride quantizer the
    oracle can reconstruct."""
    rows = (embeddings.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string")),
                     F.col(id_col))
            .limit(sample_size)
            .select(vec_col)
            .collect())
    x = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    init_idx = rng.choice(len(x), size=n_list, replace=len(x) < n_list)
    cents = x[init_idx].copy()
    for _ in range(n_iter):
        # GEMM is fine here: no oracle replays training, only the
        # recall gate; ties just pick a cluster
        d2 = (-2.0 * (x @ cents.T)
              + (cents * cents).sum(axis=1)[None, :])
        lbl = np.argmin(d2, axis=1)
        for j in range(n_list):
            members = x[lbl == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def assigned(embeddings: DataFrame, cents: "np.ndarray",
             vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn("list_id",
                                 _assign_udf(cents)(F.col(vec_col)))


def top_k_similar(embeddings: DataFrame, query_vec_id: int,
                  k: int = 10, n_list: int = N_LIST,
                  n_probe: int = N_PROBE, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  cents: "np.ndarray | None" = None) -> DataFrame:
    """Approximate top-k by cosine: scan only the n_probe inverted lists
    nearest to the query vector. ``cents`` overrides the coarse
    quantizer (e.g. `trained_centroids`); the default stride quantizer
    stays the oracle-reconstructible path."""
    if cents is None:
        cents = centroids(embeddings, n_list, id_col, vec_col)
    asg = assigned(embeddings, cents, vec_col)
    q = (asg.where(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("query_vec")))

    # the probe set is computed once from the (tiny) centroid matrix on
    # the driver-free path: a broadcast 1-row cross join + pandas UDF
    @F.pandas_udf("array<int>")
    def probe_lists(qv: pd.Series) -> pd.Series:
        out = []
        for v in qv:
            x = np.asarray(v, dtype=np.float64)
            # same sequential per-dim rule as _assign_udf (oracle parity)
            d = np.zeros(cents.shape[0], dtype=np.float64)
            for i in range(cents.shape[1]):
                diff = cents[:, i] - x[i]
                d += diff * diff
            out.append(np.argsort(d, kind="stable")[:n_probe]
                       .astype(np.int32))
        return pd.Series(out)

    qp = q.select("query_vec", probe_lists(F.col("query_vec"))
                  .alias("probes"))
    from cloud_native_mapreduce_spark.functions.vectors import cosine
    cand = (asg.join(F.broadcast(qp),
                     F.array_contains(F.col("probes"), F.col("list_id"))))
    return (cand.select(id_col,
                        F.round(cosine(F.col(vec_col),
                                       F.col("query_vec")), 4)
                         .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))
