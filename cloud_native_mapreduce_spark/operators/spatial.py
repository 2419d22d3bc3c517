"""2-D spatial proximity join via grid-cell blocking.

North-star scope: the reference has no geospatial surface, but
"find all pairs within distance r" is the canonical scale trap — the
naive form is an O(n²) cartesian that no cluster survives at 100 TB.
The standard fix (the same blocking idea PostGIS/Sedona/ST_DWithin
partitioned joins use) is to hash points into grid cells of side r:
any pair within Chebyshev distance r lies in the same or an adjacent
cell, so the candidate set is a keyed equi-join of each point against
its 3×3 cell neighborhood — shuffle-partitionable, broadcast-free,
and exact after a cheap residual distance filter. The oracle is the
NAIVE pairwise form (fine at oracle scale), which proves the blocked
plan finds exactly the same pairs — completeness, not just
plausibility.

Coordinates are exact integer transforms of customer attributes
(acctbal cents and custkey mod GRID) so every distance is integer
arithmetic and the value oracle is exact. Cell side = radius is the
textbook choice (9 candidate cells); at much higher point density
you shrink cells relative to r (more, smaller cells trade candidate
count against fan-out) — the blocking SHAPE is the scale story, the
resolution is a tunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Grid extent per axis (coordinates are taken mod GRID).
GRID = 256
#: Chebyshev radius — also the blocking cell side.
RADIUS = 4


def spatial_grid_join(customer: DataFrame,
                      grid: int = GRID,
                      radius: int = RADIUS) -> DataFrame:
    """All unordered customer pairs within Chebyshev distance
    `radius` on the (acctbal-cents mod grid, custkey mod grid)
    plane, profiled as pair counts per exact distance — the
    blocked spatial self-join.

    Plan shape: points get a (x//radius, y//radius) cell; the probe
    side fans out over the 9 neighbor-cell offsets via a BROADCAST
    9-row frame (not explode(array(...)), which Catalyst rewrites
    into an input-rescanning union) and equi-joins the build side on
    the shifted cell key — a plain shuffled hash/SMJ on cell ids, no
    cartesian anywhere (pytest pins the plan). A pair at distance
    ≤ radius differs by ≤ 1 in each cell coordinate, so exactly one
    offset row matches it: counted once under the k_a < k_b cut,
    no dedup pass needed."""
    def pts(df):
        x = F.pmod(F.round(F.col("c_acctbal") * 100).cast("bigint"),
                   F.lit(grid)).cast("int")
        y = F.pmod(F.col("c_custkey"), F.lit(grid)).cast("int")
        return df.select(F.col("c_custkey").alias("k"),
                         x.alias("x"), y.alias("y"))

    spark = customer.sparkSession
    a = (pts(customer)
         .withColumn("cx", (F.col("x") / radius).cast("int"))
         .withColumn("cy", (F.col("y") / radius).cast("int")))
    offs = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("int").alias("dx"),
        (F.col("id") / 3).cast("int").alias("dy")).select(
            "dx", (F.col("dy") - 1).alias("dy"))
    b = a.select(F.col("k").alias("bk"), F.col("x").alias("bx"),
                 F.col("y").alias("by"), F.col("cx").alias("bcx"),
                 F.col("cy").alias("bcy"))
    cand = (a.crossJoin(F.broadcast(offs))
            .join(b, (F.col("bcx") == F.col("cx") + F.col("dx"))
                  & (F.col("bcy") == F.col("cy") + F.col("dy"))))
    cheb = F.greatest(F.abs(F.col("bx") - F.col("x")),
                      F.abs(F.col("by") - F.col("y")))
    pairs = cand.where((F.col("k") < F.col("bk"))
                       & (cheb <= radius))
    return (pairs.select(cheb.cast("int").alias("cheb_d"))
            .groupBy("cheb_d")
            .agg(F.count("*").cast("bigint").alias("n_pairs"))
            .orderBy("cheb_d"))
