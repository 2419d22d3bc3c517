"""Graph analytics over derived graphs: distributed triangle counting.

North-star scope (the reference has no graph surface): triangle counting
is the canonical "joins as graph compute" workload — the same
edge-list-join pattern MapReduce graph papers use (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW'11), executed
here as two shuffle joins that Catalyst plans like any other equi-join.

Scale posture at 100 TB:
  * the edge list is canonicalized (a < b) and distinct — half the raw
    pairs, one shuffle;
  * the wedge join (E ⋈ E on the middle vertex) is the quadratic
    danger: its size is Σ_v deg(v)². The `max_degree` cap drops
    super-node vertices BEFORE the join (documented, mirrored in the
    oracle) — exactly the last-reducer fix from the paper: real graphs
    have power-law hubs and the hub wedges dominate cost while
    contributing mostly-open triangles;
  * the closure check is a semi-join of wedges against edges — keyed,
    broadcast-free, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Drop vertices with more co-occurrence partners than this before the
#: wedge join (bounds Σ deg² — the WWW'11 "last reducer" guard).
MAX_DEGREE = 256


def copart_edges(lineitem: DataFrame,
                 max_degree: int = MAX_DEGREE) -> DataFrame:
    """Canonical distinct edge list of the co-purchase graph: parts are
    adjacent when they appear in the same order. Per-order pair
    enumeration is bounded by lines-per-order (TPC-H: <= 7), so the
    pair explosion is a constant factor, not quadratic."""
    a = lineitem.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = lineitem.select("l_orderkey", F.col("l_partkey").alias("b"))
    edges = (a.join(b, "l_orderkey")
             .where(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    deg = (edges.select(F.col("a").alias("v"))
           .unionAll(edges.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("deg"))
           .where(F.col("deg") <= max_degree))
    keep = deg.select("v")
    return (edges
            .join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b"))


def triangle_count(lineitem: DataFrame,
                   max_degree: int = MAX_DEGREE) -> DataFrame:
    """Count triangles in the co-purchase part graph (single summary
    row: vertices, edges, triangles). Wedges (a<b<c via edges (a,b),
    (b,c)) semi-join the edge list on (a,c) for closure; with canonical
    ordering every triangle is counted exactly once."""
    edges = copart_edges(lineitem, max_degree).localCheckpoint(eager=False)
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = edges.join(e2, "b").select("a", "b", "c")
    closed = wedges.join(
        edges.select(F.col("a"), F.col("b").alias("c")),
        ["a", "c"], "left_semi")
    nodes = (edges.select(F.col("a").alias("v"))
             .unionAll(edges.select(F.col("b").alias("v")))
             .agg(F.count_distinct("v").alias("n_nodes")))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    tri = closed.agg(F.count("*").alias("n_triangles"))
    # three 1-row frames — the crossJoins are trivially broadcast
    return (nodes.crossJoin(F.broadcast(n_edges))
            .crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles"))
