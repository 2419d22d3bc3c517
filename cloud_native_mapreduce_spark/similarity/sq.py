"""Scalar-quantized (int8) ANN: compressed-domain scan + exact re-rank.

The third compression family beside PQ (`similarity/pq.py`) and the
bucketed families (LSH/IVF): per-dimension affine quantization to an
int8 code (Faiss's SQ8 / the standard "scalar quantizer" from Gray &
Neuhoff's quantization literature). The corpus scan ranks candidates
by INTEGER squared distance between code vectors — 1 byte/dim instead
of 4, and integer arithmetic whose sum is aggregation-order exact —
then a bounded candidate set is re-ranked with the exact cosine, the
two-stage retrieve-then-rerank shape production ANN always ships.

Spark shape: the per-dim (min, max) bounds are ONE aggregate job
returning 2·dim scalars (the bounded-collect codebook convention
shared with pq.codebook / ivf.centroids); quantization and the code
distance are pure JVM higher-order functions (zip_with/aggregate, no
Python); the candidate cut is orderBy+limit → TakeOrderedAndProject
(no global sort materialization); the re-rank joins only `n_cand`
rows back to their float vectors. Everything is deterministic —
(distance, vec_id) and (cosine, vec_id) total orders — so the DuckDB
oracle replays bounds, codes, scan, and re-rank value-for-value.

At 100 TB: the scan reads codes, not vectors (4× less I/O; write the
code column once at ingest), the integer distance keeps SIMD-friendly
whole-stage codegen, and only the tiny candidate set ever touches the
float vectors again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.vectors import cosine

DIM = 64
N_CAND = 50


def quantization_bounds(embeddings: DataFrame, dim: int = DIM,
                        vec_col: str = "embedding"):
    """Per-dimension (min, max) over the corpus — one aggregate job,
    2·dim scalars to the driver (bounded collect, NOT the corpus)."""
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.col(vec_col)[i].cast("double"))
                    .alias(f"mn{i}"))
        aggs.append(F.max(F.col(vec_col)[i].cast("double"))
                    .alias(f"mx{i}"))
    row = embeddings.agg(*aggs).first()
    mn = [float(row[f"mn{i}"]) for i in range(dim)]
    mx = [float(row[f"mx{i}"]) for i in range(dim)]
    return mn, mx


def _codes_col(vec_col: str, mn: list, mx: list):
    """int8-range code array: round((x−mn)·254/(mx−mn)) − 127 per dim,
    i.e. codes in [−127, 127]. The scale is computed driver-side in
    IEEE double — bitwise the division the oracle's SQL performs — and
    (x−mn)·s is non-negative, so round() (half-away-from-zero in both
    engines for positives) cannot disagree. Degenerate dims (mx == mn)
    get scale 0 → constant code −127 in both engines."""
    mnl = F.array(*[F.lit(v) for v in mn])
    sl = F.array(*[F.lit(254.0 / (b - a) if b > a else 0.0)
                   for a, b in zip(mn, mx)])
    shifted = F.zip_with(F.col(vec_col), mnl,
                         lambda x, m: x.cast("double") - m)
    return F.zip_with(shifted, sl,
                      lambda d, s: F.round(d * s).cast("int") - 127)


def top_k_sq_rerank(embeddings: DataFrame, query_vec_id: int,
                    k: int = 10, n_cand: int = N_CAND, dim: int = DIM,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact-rerank top-k by cosine over an int8 compressed-domain
    candidate scan: rank the corpus by integer squared code distance
    to the query's codes, keep the best `n_cand` (ties by id), re-rank
    those exactly. Returns (vec_id, cosine) like ann_bruteforce —
    recall < 1 only when a true neighbor's code distance falls outside
    the candidate cut."""
    from pyspark import StorageLevel

    mn, mx = quantization_bounds(embeddings, dim, vec_col)
    # the coded frame feeds the query-row filter AND the corpus scan;
    # persist so the (interpreted — Spark never codegens higher-order
    # functions) quantization expression runs once per row, not twice
    coded = (embeddings
             .select(id_col, vec_col,
                     _codes_col(vec_col, mn, mx).alias("code"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    q = (coded.where(F.col(id_col) == query_vec_id)
         .select(F.col("code").alias("qcode"),
                 F.col(vec_col).alias("qvec")))
    d2 = F.aggregate(
        F.zip_with(F.col("code"), F.col("qcode"),
                   lambda x, y: ((x - y) * (x - y)).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    cand = (coded.join(F.broadcast(q))
            .select(id_col, vec_col, "qvec", d2.alias("d2"))
            .orderBy(F.col("d2").asc(), F.col(id_col).asc())
            .limit(n_cand))
    return (cand
            .select(id_col,
                    F.round(cosine(F.col(vec_col), F.col("qvec")), 4)
                    .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))
