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

import pandas as pd
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
                             vec_col: str = "embedding",
                             n_blocks: int = 8) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-space
    near-dup detection, exact, via blocked matrix multiplication.

    Why not a row-wise crossJoin + zip_with/aggregate? Spark's higher-order
    functions are interpreted (not codegen'd): N²/2 pairs × dim lambda
    evals ran ~48 s at sf0.1. Here vectors are grouped into n_blocks
    buckets, the B(B+1)/2 block pairs are joined, and each task multiplies
    two ~(N/B)×dim float64 matrices with numpy (Arrow-batched, vectorized).
    Same exact result, ~20× faster locally.

    Scale posture: no collect, no full broadcast — block lists flow
    through the shuffle, each task holds only two blocks. At 100 TB you
    raise n_blocks so a block (~N/B × dim × 8 bytes) fits comfortably in
    executor memory; work parallelism is B(B+1)/2 independent tasks.
    """
    blocks = (embeddings
              .select((F.col(id_col) % n_blocks).alias("block_id"),
                      F.struct(F.col(id_col).alias("vid"),
                               F.col(vec_col).alias("vec")).alias("item"))
              .groupBy("block_id")
              .agg(F.collect_list("item").alias("items")))
    pairs = (blocks.select(F.col("block_id").alias("bid_a"),
                           F.col("items").alias("items_a"))
             .join(blocks.select(F.col("block_id").alias("bid_b"),
                                 F.col("items").alias("items_b")),
                   F.col("bid_a") <= F.col("bid_b")))

    def block_multiply(batches):
        import numpy as _np
        import pandas as _pd

        def unpack(items):
            ids = _np.array([it["vid"] for it in items], dtype=_np.int64)
            mat = _np.array([it["vec"] for it in items], dtype=_np.float64)
            norms = _np.linalg.norm(mat, axis=1)
            norms[norms == 0.0] = 1.0
            return ids, mat / norms[:, None]

        for pdf in batches:
            for _, row in pdf.iterrows():
                same_block = row["bid_a"] == row["bid_b"]
                ids_a, mat_a = unpack(row["items_a"])
                ids_b, mat_b = unpack(row["items_b"])
                sim = _np.round(mat_a @ mat_b.T, 4)
                ia, ib = _np.nonzero(sim >= threshold)
                va, vb = ids_a[ia], ids_b[ib]
                if same_block:
                    # symmetric matrix: each pair appears as (i,j) and
                    # (j,i) — keep one orientation
                    keep = va < vb
                    va, vb, cs = va[keep], vb[keep], sim[ia, ib][keep]
                else:
                    # cross-block: each pair appears exactly once, but the
                    # larger id may sit on the a side — normalize, don't drop
                    cs = sim[ia, ib]
                    va, vb = _np.minimum(va, vb), _np.maximum(va, vb)
                yield _pd.DataFrame({"vec_a": va, "vec_b": vb, "cosine": cs})

    return pairs.mapInPandas(
        block_multiply, schema="vec_a bigint, vec_b bigint, cosine double")


def top_k_batch(embeddings: DataFrame, query_ids: list[int], k: int = 3,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors for a BATCH of query vectors in one pass.

    The realistic serving shape: Q queries scored against the corpus
    together. The Q-row query side broadcasts (BroadcastNestedLoopJoin —
    the corpus never moves); ranking is a window partitioned by query id,
    so each partition contributes at most k rows per query to the
    shuffle. Scoring cost is one corpus scan for ALL queries, not Q
    scans. Rank key is the 4-dp-rounded cosine + id tiebreak —
    deterministic, and identical to the oracle's ordering.
    """
    from pyspark.sql.window import Window
    q = (embeddings.where(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("qid"),
                 F.col(vec_col).alias("query_vec")))
    scored = (embeddings.crossJoin(F.broadcast(q))
              .where(F.col(id_col) != F.col("qid"))
              .select("qid", id_col,
                      F.round(cosine(F.col(vec_col), F.col("query_vec")), 4)
                       .alias("cosine")))
    w = (Window.partitionBy("qid")
         .orderBy(F.col("cosine").desc(), F.col(id_col).asc()))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", id_col, "cosine")
            .orderBy("qid", F.col("cosine").desc(), F.col(id_col).asc()))


def label_centroids(embeddings: DataFrame, dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label centroid of the embedding column — the cluster-summary
    op of a curation pipeline (and the update step of k-means).

    posexplode to (label, dim, value) then ONE hash aggregate: Spark's
    map-side partial combine collapses each partition to at most
    n_labels × dim partial rows before the shuffle, so network cost is
    independent of corpus size. (A collect_list-then-fold formulation
    would materialize every vector of a label in one buffer — exactly
    the unbounded-group memory shape to avoid at 100 TB.) Mean of
    float32 inputs accumulated in float64, rounded 4dp."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    expl = embeddings.select(F.col(label_col).alias("label"),
                             F.posexplode(vec_d).alias("dim", "v"))
    # "+ 0.0" collapses IEEE negative zero: round() can yield -0.0 from a
    # tiny negative mean, and -0.0 vs 0.0 have different reprs in the
    # driver's value-hash even though they compare equal numerically
    return (expl.groupBy("label", "dim")
            .agg((F.round(F.avg("v"), 4) + F.lit(0.0)).alias("centroid"),
                 F.count("*").alias("n_vectors"))
            .select("label", F.col("dim").cast("bigint").alias("dim"),
                    "centroid", "n_vectors")
            .orderBy("label", "dim"))


def filtered_top_k(embeddings: DataFrame, query_vec_id: int,
                   label: int, k: int = 10, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Filtered vector search — top-k by cosine among rows matching a
    metadata predicate (the vector-database pattern: "nearest neighbors
    WHERE label = X"). Spark-first: the predicate is a plain column
    filter, so it PUSHES DOWN to the parquet scan and the cosine pass
    reads only the matching fraction — at 100 TB with the corpus
    partitioned/clustered by the filter column this is partition
    pruning, not a post-scan filter (tests/test_plan_audit.py pins the
    pushdown + TakeOrderedAndProject shape). The query vector itself is
    looked up UNFILTERED (its label need not match)."""
    q = (embeddings.where(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("query_vec")))
    cand = embeddings.where(F.col(label_col) == label)
    scored = (cand.crossJoin(F.broadcast(q))
              .select(id_col, label_col,
                      F.round(cosine(F.col(vec_col), F.col("query_vec")), 4)
                       .alias("cosine")))
    return (scored
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))


def project_jl(embeddings: DataFrame, out_dim: int = 16,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Johnson–Lindenstrauss random projection to `out_dim` dims with a
    Rademacher (±1/√out_dim) matrix — the classic distance-preserving
    sketch (Achlioptas 2003): at 100 TB it shrinks the vector payload
    4× before ANN prefiltering while preserving pairwise cosines to
    O(1/√out_dim) distortion.

    Engine-portable determinism: sign(i→j) = +1 iff the first hex char
    of md5("i-j") has its high bit set — md5 agrees byte-for-byte
    between Spark/Python and DuckDB, so the oracle rebuilds the exact
    matrix in SQL. The projection accumulates PER INPUT DIM in index
    order (vectorized over rows × out_dims, scalar-sequential over i) —
    IEEE-identical to the oracle, which folds a list(… ORDER BY i)
    with list_reduce, an explicitly sequential left fold; a GEMM (or a
    bare SQL sum()) would pairwise-accumulate and could drift at ULP
    level (the pq.py encode lesson). Output long-form (vec_id, j, v) so the value hash covers
    every coordinate.
    """
    import hashlib

    import numpy as np

    def _make(dim_in: int):
        s = np.empty((dim_in, out_dim), dtype=np.float64)
        for i in range(dim_in):
            for j in range(out_dim):
                hx = hashlib.md5(f"{i}-{j}".encode()).hexdigest()[0]
                s[i, j] = 1.0 if hx in "89abcdef" else -1.0
        return s

    @F.pandas_udf("array<double>")
    def proj_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(vecs.tolist(), dtype=np.float64)
        sgn = _make(mat.shape[1])
        acc = np.zeros((len(mat), out_dim), dtype=np.float64)
        for i in range(mat.shape[1]):  # sequential in i: oracle parity
            acc += mat[:, i][:, None] * sgn[i][None, :]
        return pd.Series(list(acc / np.sqrt(float(out_dim))))

    return (embeddings
            .select(id_col, proj_udf(F.col(vec_col)).alias("p"))
            .select(id_col, F.posexplode("p").alias("j", "v_raw"))
            .select(id_col, F.col("j").cast("bigint").alias("j"),
                    F.round("v_raw", 4).alias("v")))


def hard_negative_mining(embeddings: DataFrame, n_queries: int = 5,
                         k: int = 5, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training (the batch-mining
    shape of Xiong et al. 2021, ANCE): for each of the first
    `n_queries` vectors by id, the top-k most-similar vectors whose
    LABEL DIFFERS — the negatives that actually move a contrastive
    loss, as opposed to random negatives a dataloader would sample.

    Plan: the n_queries query rows broadcast against one corpus scan
    (BroadcastNestedLoopJoin on the label-mismatch predicate — the
    big side never moves); per-query top-k via a q-partitioned window
    (never a global sort). Ordering by 4dp-rounded cosine with id
    tiebreak, fully deterministic. Output: (q_vec_id, vec_id, label,
    cosine) — n_queries x k rows."""
    from pyspark.sql.window import Window

    q = (embeddings.where(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("q_vec_id"),
                 F.col(label_col).alias("q_label"),
                 F.col(vec_col).alias("query_vec")))
    scored = (embeddings.crossJoin(F.broadcast(q))
              .where(F.col(label_col) != F.col("q_label"))
              .select("q_vec_id", id_col, label_col,
                      F.round(cosine(F.col(vec_col),
                                     F.col("query_vec")), 4)
                      .alias("cosine")))
    w = Window.partitionBy("q_vec_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select("q_vec_id", id_col, label_col, "cosine"))
