"""Persisted k-NN-graph ANN index: build once, beam-search with
zero-exchange bucket-pruned scans.

The durable-index upgrade of `similarity/graph_ann.py` (round-12
verdict item 7): `knn_graph`/`ann_graph_search` rebuild the graph per
query — the right demo shape but the wrong production shape. At 100 TB
the SRP bucketing, candidate scoring, and per-node top-k are
ingest-time costs paid ONCE; a query should touch only the ≤beam rows
of graph and vector data it actually walks. This is the engine's
`ivf_index.py` pattern applied to the graph family — the one ANN
family member that lacked a persisted form — and, like it, the
Spark-native rendering of the reference's durable-intermediate idea
(blob storage as the fabric between build and use stages,
cmd/azure/azure_util.go:46-99): the index IS a pair of bucketed
tables, and a query is a handful of bucket-pruned point plans over
them.

Index layout (three tables under one prefix):
  * `{prefix}_graph` — (src, dst, dot_q), bucketed AND sorted by src:
    the directed k-NN adjacency from `knn_graph` (SRP-bucketed
    candidates, exact integer dots, per-src top-k). Bucketing gives
    bucket PRUNING for the literal IN-filters the beam expansion
    issues.
  * `{prefix}_vectors` — (vec_id, q), bucketed by vec_id: the 1e-4
    quantized integer vectors, so query-time rescoring is the same
    EXACT int64 arithmetic as the build (`graph_ann.Q_SCALE`).
  * `{prefix}_entries` — the 8 smallest graph sources: the
    deterministic entry pool (`ann_graph_search`'s seed rule),
    persisted so query time never runs a distinct over the graph.

Query plan: every per-round job is ONE bucket-pruned scan — the
frontier expansion filters `graph` on ≤beam literal src ids, the
rescore filters `vectors` on ≤beam·(graph_k+1) literal vec_ids and
ends in TakeOrderedAndProject(beam) — ZERO shuffle exchanges anywhere
(plan-pinned in tests/test_plan_audit.py). Driver state is bounded by
PARAMETERS, never data: ≤8 entry rows, ≤beam scored rows, and
≤beam·graph_k neighbor ids per round — the ivf_index bounded-lookup
convention (its n_list centroid collect), not a corpus collect.

Exactness: identical algorithm, parameters, quantization, and
tie-breaks as `ann_graph_search`, so its value-level DuckDB oracle
(unrolled beam-round CTEs) carries over verbatim — the index changes
WHERE the work happens (ingest vs query), never the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.similarity.graph_ann import (
    BEAM, GRAPH_K, GRAPH_TABLES, N_ENTRIES, Q_SCALE, ROUNDS, knn_graph,
    quantized)

N_BUCKETS = 8
#: Entry-pool size persisted at build time: the seed rule takes the
#: n_entries smallest sources EXCLUDING the query, so the pool holds
#: a few spares beyond N_ENTRIES.
N_ENTRIES_STORED = 8


def build_knn_graph_index(embeddings: DataFrame, table_prefix: str,
                          path: str, dim: int = 64,
                          graph_k: int = GRAPH_K,
                          n_planes: int | None = None,
                          n_tables: int = GRAPH_TABLES,
                          n_buckets: int = N_BUCKETS) -> None:
    """Materialize the graph-ANN index: one `knn_graph` build (the
    only corpus-scale work — SRP buckets, keyed self-join, per-src
    top-k) written bucketed on src, the quantized vectors bucketed on
    vec_id, and the 8-row entry pool. Everything a query needs, laid
    out for point access."""
    from cloud_native_mapreduce_spark.sources.tables import write_bucketed

    spark = embeddings.sparkSession
    graph = knn_graph(embeddings, dim=dim, k=graph_k,
                      n_planes=n_planes, n_tables=n_tables)
    write_bucketed(graph.select("src", "dst", "dot_q"),
                   f"{table_prefix}_graph", f"{path}/graph",
                   "src", n_buckets)
    vecs = embeddings.select(
        F.col("vec_id"), quantized(F.col("embedding")).alias("q"))
    write_bucketed(vecs, f"{table_prefix}_vectors", f"{path}/vectors",
                   "vec_id", n_buckets)
    (spark.table(f"{table_prefix}_graph")
     .select("src").distinct().orderBy("src").limit(N_ENTRIES_STORED)
     .coalesce(1)
     .write.mode("overwrite").option("path", f"{path}/entries")
     .saveAsTable(f"{table_prefix}_entries"))


def _dot_lit(q_lit: Column) -> Column:
    """EXACT int64 dot of the stored quantized vector against the
    query's baked literal array."""
    return F.aggregate(
        F.zip_with(F.col("q"), q_lit, lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def ann_graph_indexed(spark: SparkSession, table_prefix: str,
                      query_vec_id: int = 0, k: int = 10,
                      beam: int = BEAM, rounds: int = ROUNDS,
                      n_entries: int = N_ENTRIES) -> DataFrame:
    """Beam search over a `build_knn_graph_index` layout — identical
    result to `ann_graph_search` at the same parameters, but the
    graph is never rebuilt and every job is a bucket-pruned point
    scan: (vec_id, dot_q, cosine) for the query's top-k.

    Frontier ids become LITERAL IN-filters (not joins) precisely so
    Spark's bucket pruning fires on the bucketed layout — the same
    reason ann_ivf_indexed's probes are literals. Per round: one
    pruned `graph` scan (neighbor expansion, ≤beam src literals) and
    one pruned `vectors` scan ending in TakeOrdered(beam) (exact
    rescore of beam ∪ neighbors, minus the query). Driver state is
    parameter-bounded throughout."""
    # bucketed-scan toggle: same rationale as ann_ivf_indexed — with
    # no bucket-keyed join in the plan, the planner falls back to a
    # plain file scan and silently forfeits pruning
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

    vecs = spark.table(f"{table_prefix}_vectors")
    graph = spark.table(f"{table_prefix}_graph")
    qrow = (vecs.where(F.col("vec_id") == query_vec_id)
            .select("q").first())                    # 1-row lookup
    q_lit = F.array(*[F.lit(int(c)).cast("bigint") for c in qrow["q"]])

    def rescore(ids: list[int], limit: int) -> DataFrame:
        return (vecs.where(F.col("vec_id").isin(ids))
                .select("vec_id", _dot_lit(q_lit).alias("dot_q"))
                .orderBy(F.col("dot_q").desc(), F.col("vec_id").asc())
                .limit(limit))

    pool = (spark.table(f"{table_prefix}_entries")
            .orderBy("src").collect())               # ≤8 rows
    frontier = [int(r.src) for r in pool
                if int(r.src) != query_vec_id][:n_entries]
    beam_rows = rescore(frontier, beam).collect()    # ≤beam rows
    for _ in range(rounds):
        ids = [int(r.vec_id) for r in beam_rows]
        nbrs = (graph.where(F.col("src").isin(ids))
                .select("dst").collect())            # ≤beam·graph_k
        cand = {int(r.dst) for r in nbrs} | set(ids)
        cand.discard(query_vec_id)
        beam_rows = rescore(sorted(cand), beam).collect()
    top_ids = [int(r.vec_id) for r in beam_rows[:k]]
    return (rescore(top_ids, k)
            .select("vec_id", "dot_q",
                    (F.round(F.col("dot_q") / (Q_SCALE * Q_SCALE), 4)
                     + F.lit(0.0)).alias("cosine")))
