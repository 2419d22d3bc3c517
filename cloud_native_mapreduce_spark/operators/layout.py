"""Multi-dimensional data layout: Z-order (Morton) curve clustering.

North-star scope (the reference has no layout surface, but its blob
tables are append-only heaps): at 100 TB, scan cost is dominated by
how much data file-level min/max statistics let the reader SKIP. A
sort on one column gives perfect pruning on that column and none on
any other; interleaving the bits of two (or more) columns — the
Z-order curve (Morton 1966; the technique behind Delta/Iceberg
OPTIMIZE ZORDER) — gives near-rectangular locality in BOTH, so a
selective predicate on either column prunes ~√ of the files instead
of none. The curve value is pure integer bit arithmetic, so both the
clustering key and the per-bucket locality statistics carry exact
value-level oracles.

Relation to `operators/advanced.zorder_layout_stats` (registry
`zorder_stats`): that entry is the clustering-effectiveness REPORT
(range-bucketed 4-bit codes over lineitem). This module is the
layout's operational side — a reusable interleave expression with an
identical-SQL twin, the real parquet WRITE path, and the quantified
pruning benefit for a box query (`zorder_pruning`); the span-stats
report itself stays with `zorder_stats` (the registry keeps one
entry per capability).

The write path (`write_zordered`) is range-partition-by-zvalue +
sort-within-partitions: each output file covers a compact Z-range,
which is what makes its per-column min/max tight. The pytest pins
exactly that: per-file spans of BOTH dimensions shrink ~√-fold vs a
single-column sort layout's unsorted dimension.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the interleave (values must be < 2^ZBITS).
ZBITS = 10


def zvalue(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of two non-negative ints: bit i of x lands
    at position 2i, bit i of y at 2i+1. Pure JVM bit arithmetic
    (whole-stage codegen'd); disjoint target bits make the combine a
    plain sum."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zvalue_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical interleave as a SQL expression (DuckDB oracle
    side) — same term order, same pure-integer ops."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_locality(orders: DataFrame,
                    bucket_bits: int = 10) -> DataFrame:
    """Per-Z-bucket locality statistics over orders clustered on
    (customer mod 2^ZBITS, order-day mod 2^ZBITS): bucket = zvalue
    >> bucket_bits (so 2^(2·ZBITS−bucket_bits) buckets), with row
    count and the min/max box of both dimensions — the file-level
    statistics a zone-map reader prunes on; tight boxes in BOTH
    dimensions are the property that distinguishes Z-order from a
    1-D sort. All-integer, full value oracle."""
    x = F.pmod(F.col("o_custkey"), F.lit(1 << ZBITS)).cast("int")
    y = F.pmod(F.datediff(F.col("o_orderdate").cast("date"),
                          F.lit("1990-01-01").cast("date")),
               F.lit(1 << ZBITS)).cast("int")
    z = zvalue(x, y)
    d = orders.select(x.alias("x"), y.alias("y"),
                      F.shiftright(z, bucket_bits).alias("bucket"))
    return (d.groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.min("x").cast("bigint").alias("x_min"),
                 F.max("x").cast("bigint").alias("x_max"),
                 F.min("y").cast("bigint").alias("y_min"),
                 F.max("y").cast("bigint").alias("y_max"))
            .orderBy("bucket"))


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   n_files: int = 32, bits: int = ZBITS) -> None:
    """Write `df` parquet clustered by the Z-order of (x, y):
    range-partition on zvalue then sort within partitions, so each
    output file covers a compact Z-range and its per-column min/max
    stats are tight in BOTH dimensions — the layout a zone-map /
    parquet-footer reader skips on. The zvalue is a transient column
    (dropped before write)."""
    z = zvalue(F.col(x), F.col(y), bits)
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def zorder_pruning(orders: DataFrame,
                   x_lo: int = 100, x_hi: int = 160,
                   y_lo: int = 400, y_hi: int = 480,
                   bucket_bits: int = 10) -> DataFrame:
    """Quantified pruning benefit of the Z-order layout for a box
    query [x_lo, x_hi] × [y_lo, y_hi]: one summary row with the
    total bucket/row counts, the buckets whose min/max box intersects
    the query (the ones a zone-map reader must scan), the rows inside
    them, and the rows actually matching — scanned/matching is the
    read amplification, buckets_hit/buckets_total the skip rate.
    All-integer (full value oracle); the same numbers a file-level
    reader gets from parquet footers after `write_zordered`, computed
    here over the bucket statistics so the demonstration is engine-
    checkable rather than filesystem-dependent."""
    stats = zorder_locality(orders, bucket_bits)
    hit = ((F.col("x_max") >= x_lo) & (F.col("x_min") <= x_hi)
           & (F.col("y_max") >= y_lo) & (F.col("y_min") <= y_hi))
    x = F.pmod(F.col("o_custkey"), F.lit(1 << ZBITS)).cast("int")
    y = F.pmod(F.datediff(F.col("o_orderdate").cast("date"),
                          F.lit("1990-01-01").cast("date")),
               F.lit(1 << ZBITS)).cast("int")
    match = orders.select(x.alias("x"), y.alias("y")).where(
        (F.col("x").between(x_lo, x_hi))
        & (F.col("y").between(y_lo, y_hi))).agg(
        F.count("*").cast("bigint").alias("n_rows_matching"))
    agg = stats.agg(
        F.count("*").cast("bigint").alias("n_buckets_total"),
        F.sum(hit.cast("int")).cast("bigint").alias("n_buckets_hit"),
        F.sum("n_rows").cast("bigint").alias("n_rows_total"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("bigint")
        .alias("n_rows_scanned"))
    return agg.crossJoin(F.broadcast(match))


#: Hilbert inline-expression order: the unrolled xy2d walk re-inlines
#: (x, y) into each level, so the JVM expression tree grows ~4^bits —
#: 6 bits (a 64x64 grid) is the inline sweet spot; larger orders
#: belong in an Arrow-vectorized UDF, not a bigger tree.
HILBERT_BITS = 6


def hilbert_value(x: Column, y: Column,
                  bits: int = HILBERT_BITS) -> Column:
    """Hilbert curve index of (x, y) — the classic xy2d bit-level
    walk (rx/ry quadrant extraction, quadrant-local rotation, d +=
    s²·(3rx XOR ry)), unrolled over `bits` levels into one pure-
    integer JVM expression tree. Hilbert visits every cell of each
    quadrant before leaving it (Morton jumps between quadrant
    halves), which is why its buckets have tighter min/max boxes —
    `hilbert_vs_zorder` measures exactly that."""
    d = F.lit(0).cast("bigint")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        d = d + F.lit(s) * F.lit(s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)).cast("bigint")
        flip = (ry == 0) & (rx == 1)
        x1 = F.when(flip, F.lit(s - 1) - x).otherwise(x)
        y1 = F.when(flip, F.lit(s - 1) - y).otherwise(y)
        nx = F.when(ry == 0, y1).otherwise(x1)
        ny = F.when(ry == 0, x1).otherwise(y1)
        x, y = nx, ny
    return d


def hilbert_sql(x: str, y: str, bits: int = HILBERT_BITS) -> str:
    """The identical xy2d walk as chained SQL CTE bodies (DuckDB
    oracle side): returns the text of `bits` SELECT stages to splice
    after a seed CTE exposing (x, y, hd) — same per-level transform,
    same pure-integer ops (xor() — DuckDB's ^ is exponentiation).
    Stages are AS MATERIALIZED: DuckDB inlines plain CTEs, which
    re-creates the exponential expression tree the chaining exists
    to avoid (measured 215 s -> sub-second at sf0.01)."""
    stages = []
    prev = "hseed"
    for k, level in enumerate(range(bits - 1, -1, -1)):
        s = 1 << level
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        flip = f"({ry} = 0 AND {rx} = 1)"
        x1 = f"(CASE WHEN {flip} THEN {s - 1} - {x} ELSE {x} END)"
        y1 = f"(CASE WHEN {flip} THEN {s - 1} - {y} ELSE {y} END)"
        stages.append(f"""
    h{k + 1} AS MATERIALIZED (
      SELECT * REPLACE (
        hd + {s} * {s} * xor(3 * {rx}, {ry}) AS hd,
        CASE WHEN {ry} = 0 THEN {y1} ELSE {x1} END AS {x},
        CASE WHEN {ry} = 0 THEN {x1} ELSE {y1} END AS {y})
      FROM {prev})""")
        prev = f"h{k + 1}"
    return ",".join(stages)


def hilbert_values_udf(bits: int = ZBITS):
    """Arrow-vectorized Hilbert index (pandas_udf): the same xy2d
    walk as `hilbert_value`, but as a numpy loop over LEVELS with
    whole-column bit ops per level — O(bits) vectorized passes
    instead of a 4^bits inline expression tree (Catalyst spends
    minutes just ANALYZING the 10-bit inline form; this is the
    production shape the `hilbert_value` docstring promises).
    Integer-exact, so the oracle equivalence is unaffected."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def h(xs, ys):
        x = xs.to_numpy().astype(np.int64).copy()
        y = ys.to_numpy().astype(np.int64).copy()
        d = np.zeros_like(x)
        s = 1 << (bits - 1)
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            flip = (ry == 0) & (rx == 1)
            x_f = np.where(flip, s - 1 - x, x)
            y_f = np.where(flip, s - 1 - y, y)
            swap = ry == 0
            x, y = (np.where(swap, y_f, x_f),
                    np.where(swap, x_f, y_f))
            s >>= 1
        import pandas as pd
        return pd.Series(d)
    return h


#: Cells per comparison bucket — deliberately NOT a power of 4: on
#: power-of-4-aligned segments both curves produce perfect quadrant
#: squares and the comparison is degenerate (measured: identical
#: 448/448 spans at 64-cell buckets). Misaligned segments are where
#: Morton's quadrant jumps cost and Hilbert's no-jump property wins.
CURVE_BUCKET_CELLS = 768


def hilbert_vs_zorder(orders: DataFrame,
                      bucket_cells: int = CURVE_BUCKET_CELLS
                      ) -> DataFrame:
    """Quantified locality comparison of the two space-filling
    curves over the same (customer, order-day) points: per curve,
    the bucket count and the SUMMED per-bucket x/y spans (the
    zone-map box perimeters a pruning reader pays for). Hilbert's
    no-jump property yields strictly tighter boxes than Morton's
    quadrant hops — this entry states the advantage as exact
    integers instead of citing it. Full 10-bit grid — Morton inline
    JVM, Hilbert Arrow-vectorized (see `hilbert_values_udf`);
    buckets are CURVE_BUCKET_CELLS consecutive curve positions
    (non-power-of-4, see note above); one scan, two aggregates over
    (curve, bucket)."""
    x = F.pmod(F.col("o_custkey"), F.lit(1 << ZBITS)).cast("int")
    y = F.pmod(F.datediff(F.col("o_orderdate").cast("date"),
                          F.lit("1990-01-01").cast("date")),
               F.lit(1 << ZBITS)).cast("int")
    pts = orders.select(x.alias("x"), y.alias("y"))
    hud = hilbert_values_udf(ZBITS)
    both = (pts.select(
        "x", "y", F.lit("morton").alias("curve"),
        F.floor(zvalue(F.col("x"), F.col("y")) / F.lit(bucket_cells))
        .cast("bigint").alias("bucket"))
        .unionAll(pts.select(
            "x", "y", F.lit("hilbert").alias("curve"),
            F.floor(hud(F.col("x"), F.col("y"))
                    / F.lit(bucket_cells)).cast("bigint")
            .alias("bucket"))))
    boxes = (both.groupBy("curve", "bucket")
             .agg(F.count("*").cast("bigint").alias("n"),
                  (F.max("x") - F.min("x")).alias("sx"),
                  (F.max("y") - F.min("y")).alias("sy")))
    return (boxes.groupBy("curve")
            .agg(F.count("*").cast("bigint").alias("n_buckets"),
                 F.sum("sx").cast("bigint").alias("sum_span_x"),
                 F.sum("sy").cast("bigint").alias("sum_span_y"))
            .orderBy("curve"))
