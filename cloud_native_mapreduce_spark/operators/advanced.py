"""Advanced relational operators: as-of join, pivot/unpivot, statistical
aggregates, grouped-map Python transforms.

North-star scope (the reference has no relational surface at all —
SURVEY.md §2 note): these are the operators a warehouse user expects on
top of the core joins/aggregates, each expressed Spark-first and
oracle-checked against DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: closed set of event types in the driver's events table (pivot requires
#: an explicit value list for a deterministic schema — never let pivot
#: scan for distinct values at 100 TB; that's an extra full pass).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def asof_join_last_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """For each event: the user's most recent order at-or-before the
    event timestamp (classic as-of/point-in-time join).

    Spark-first implementation — union + windowed last_value carry-
    forward, ONE shuffle/sort on (user, time), linear in rows:
      1. collapse orders to one row per (custkey, orderdate) with a
         deterministic representative (max orderkey) so ties are
         well-defined in both engines;
      2. union tagged order/event rows; sort within user by
         (time, order-before-event); last(ignorenulls) carries the most
         recent order key/date onto every subsequent event row.
    A join-based alternative (range join per user) is quadratic per key;
    the merge-scan shape is how production as-of joins (kdb, QuestDB,
    Flink temporal join) are implemented. At 100 TB the partitionBy(user)
    window parallelizes per user; no skew beyond a user's own history.
    """
    orders_1 = (orders.groupBy("o_custkey", "o_orderdate")
                .agg(F.max("o_orderkey").alias("o_orderkey")))
    o = orders_1.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"))
    e = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id",
        "event_type")
    u = o.unionByName(e)
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("t").asc(), F.col("is_order").desc(),
                  F.col("o_orderkey").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (u
               .withColumn("last_orderkey",
                           F.last("o_orderkey", ignorenulls=True).over(w))
               .withColumn("last_orderdate",
                           F.last(F.when(F.col("is_order") == 1,
                                         F.col("t")),
                                  ignorenulls=True).over(w)))
    return (carried.where(F.col("event_id").isNotNull())
            .select("event_id", "user_id",
                    F.col("t").alias("ts"), "event_type",
                    "last_orderkey", "last_orderdate"))


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """user_id × event_type count matrix via pivot (explicit value list
    → single-pass partial-aggregated pivot, no distinct-scan)."""
    out = (events.groupBy("user_id")
           .pivot("event_type", list(EVENT_TYPES))
           .agg(F.count(F.lit(1))))
    for t in EVENT_TYPES:
        out = out.withColumn(f"n_{t}", F.coalesce(F.col(t), F.lit(0)))
    return out.select("user_id", *[f"n_{t}" for t in EVENT_TYPES])


def unpivot_pricing(lineitem: DataFrame) -> DataFrame:
    """Wide → long: per returnflag, the three price aggregates as
    (metric, amount) rows via unpivot/stack — the inverse of pivot,
    shuffle-free after the aggregate."""
    wide = (lineitem.groupBy("l_returnflag")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("gross"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("discounted"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))
                               * (1 + F.col("l_tax"))), 2)
                  .alias("charged")))
    return wide.unpivot("l_returnflag", ["gross", "discounted", "charged"],
                        "metric", "amount")


def stats_summary(lineitem: DataFrame) -> DataFrame:
    """Statistical aggregate surface: exact percentiles (median/p90),
    sample stddev/variance, Pearson correlation — per returnflag."""
    # ONE array-form percentile aggregate: exact percentile buffers the
    # group's values (ObjectHashAggregate) — N separate calls buffer the
    # column N times; the array form shares a single buffer.
    return (lineitem.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9))")
                  .alias("pcts"),
                 F.round(F.stddev_samp("l_extendedprice"), 4)
                  .alias("sd_price"),
                 F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
                 F.round(F.corr("l_quantity", "l_extendedprice"), 4)
                  .alias("corr_qty_price"))
            .select("l_returnflag",
                    F.round(F.col("pcts").getItem(0), 4).alias("median_price"),
                    F.round(F.col("pcts").getItem(1), 4).alias("p90_price"),
                    "sd_price", "var_qty", "corr_qty_price")
            .orderBy("l_returnflag"))


def approx_percentiles(lineitem: DataFrame) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch via
    `percentile_approx`) next to the group row count — the 100 TB
    percentile path: the sketch is bounded-memory and MERGEABLE, so
    map-side partials combine like any hash aggregate, where the exact
    `percentile` (see `stats_summary`) must buffer every group value in
    an ObjectHashAggregate. Rank error <= 1/accuracy; values are
    engine-specific -> rows-only for the driver, tolerance-gated against
    the exact answer in tests/test_properties.py."""
    pcts = F.expr("percentile_approx(l_extendedprice, "
                  "array(0.5, 0.9, 0.99), 10000)")
    return (lineitem.groupBy("l_returnflag")
            .agg(pcts.alias("pcts"), F.count("*").alias("n_rows"))
            .select("l_returnflag",
                    F.round(F.col("pcts")[0], 4).alias("p50_approx"),
                    F.round(F.col("pcts")[1], 4).alias("p90_approx"),
                    F.round(F.col("pcts")[2], 4).alias("p99_approx"),
                    "n_rows")
            .orderBy("l_returnflag"))


#: (column, kind) profiled by `table_profile` — kind picks the min/max slot.
_PROFILE_COLS = (("o_orderkey", "num"), ("o_custkey", "num"),
                 ("o_totalprice", "num"), ("o_orderstatus", "str"),
                 ("o_orderdate", "date"))


def table_profile(orders: DataFrame) -> DataFrame:
    """Single-pass data-profiling operator: per column, row count,
    null count, exact distinct count, and min/max (numeric columns in
    double slots, strings/dates in string slots — dates formatted
    yyyy-MM-dd so both engines agree on the rendering).

    ONE scan feeds every statistic: all per-column aggregates live in a
    single .agg (the multi-countDistinct Expand multiplies rows by the
    profiled-column count before the shuffle — the standard price of
    exact distincts in one pass; swap countDistinct for
    approx_count_distinct when profiling hundreds of columns), then the
    1-row result pivots to one output row per column. The profile is
    the first step of any ingest QA gate at 100 TB."""
    aggs, rows = [], []
    for c, kind in _PROFILE_COLS:
        col = F.col(c)
        aggs += [F.count(F.lit(1)).alias(f"{c}__n"),
                 F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
                 F.countDistinct(col).alias(f"{c}__nd")]
        if kind == "num":
            aggs += [F.round(F.min(col).cast("double"), 4)
                     .alias(f"{c}__min"),
                     F.round(F.max(col).cast("double"), 4)
                     .alias(f"{c}__max")]
        elif kind == "date":
            aggs += [F.date_format(F.min(col), "yyyy-MM-dd")
                     .alias(f"{c}__min"),
                     F.date_format(F.max(col), "yyyy-MM-dd")
                     .alias(f"{c}__max")]
        else:
            aggs += [F.min(col).alias(f"{c}__min"),
                     F.max(col).alias(f"{c}__max")]
    # fan_out before the Expand (round-15, guide §2.5): the orders
    # parquet is one row group, so the multi-countDistinct Expand
    # (rows x profiled columns) ran its partial aggregate on ONE core
    # (profiled 1.9 s single-task); a no-op whenever the scan already
    # parallelizes. A/B at sf0.1: 4.7 -> 2.5 s.
    from cloud_native_mapreduce_spark.sources.tables import fan_out
    one = fan_out(orders).agg(*aggs)
    for c, kind in _PROFILE_COLS:
        num = kind == "num"
        rows.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nulls").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__min") if num else F.lit(None).cast("double"))
            .alias("min_num"),
            (F.col(f"{c}__max") if num else F.lit(None).cast("double"))
            .alias("max_num"),
            (F.lit(None).cast("string") if num else F.col(f"{c}__min"))
            .alias("min_str"),
            (F.lit(None).cast("string") if num else F.col(f"{c}__max"))
            .alias("max_str")))
    return (one.select(F.explode(F.array(*rows)).alias("p"))
            .select("p.*").orderBy("col_name"))


def frequent_event_types(events: DataFrame,
                         support: float = 0.1) -> DataFrame:
    """Heavy hitters via `DataFrame.freqItems` (Karp-Papadimitriou-
    Shenker single-pass counting): every item with frequency > support
    is GUARANTEED present (possible false positives, never false
    negatives), in one scan with O(1/support) memory per partition —
    the 100 TB alternative to a full groupBy count when only the heavy
    tail matters. Result is a sketch → rows-only for the driver; the
    no-false-negative guarantee is pinned in tests/test_properties.py.

    Output: one row per frequent item (exploded from freqItems' single
    array row, sorted) so the driver sees a stable row-per-item shape.
    """
    freq = events.freqItems(["event_type"], support=support)
    return (freq.select(F.explode("event_type_freqItems").alias("item"))
            .orderBy("item"))


def approx_distinct(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """HyperLogLog++ cardinality sketches next to exact counts — the
    single-pass low-memory path for 100 TB distinct counting. Approx
    values are engine-specific → rows-only check (no oracle)."""
    o = orders.agg(
        F.lit("orders.o_custkey").alias("col_name"),
        F.approx_count_distinct("o_custkey").alias("approx_nd"),
        F.count_distinct("o_custkey").alias("exact_nd"))
    l = lineitem.agg(
        F.lit("lineitem.l_partkey").alias("col_name"),
        F.approx_count_distinct("l_partkey").alias("approx_nd"),
        F.count_distinct("l_partkey").alias("exact_nd"))
    return o.unionByName(l)


def premium_parts(part: DataFrame) -> DataFrame:
    """Scalar + correlated subqueries: parts priced above their brand's
    average (correlated) AND above the global average (scalar). Catalyst
    decorrelates both into joins — written subquery-style via SQL to
    exercise that path end-to-end."""
    spark = part.sparkSession
    part.createOrReplaceTempView("cnms_part_sq")
    return spark.sql("""
        SELECT p_partkey, p_brand, round(p_retailprice, 2) AS p_retailprice
        FROM cnms_part_sq p
        WHERE p_retailprice > (SELECT avg(p_retailprice)
                               FROM cnms_part_sq)
          AND p_retailprice > (SELECT avg(p2.p_retailprice)
                               FROM cnms_part_sq p2
                               WHERE p2.p_brand = p.p_brand)
    """)


def topk_users_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group WITHOUT a window: aggregate each group to a
    sorted struct array and slice. One shuffle, no per-partition global
    sort — the agg-based top-k beats rank() when groups are few and
    wide (the window variant sorts every row; this keeps k per group).
    Ties broken by user_id for determinism."""
    per_user = (events.groupBy("event_type", "user_id")
                .agg(F.count("*").alias("n")))
    packed = F.slice(
        F.sort_array(
            F.collect_list(F.struct(
                (-F.col("n")).alias("neg_n"),
                F.col("user_id").alias("user_id")))),
        1, k)
    return (per_user.groupBy("event_type").agg(packed.alias("top"))
            .select("event_type",
                    F.posexplode("top").alias("rnk0", "t"))
            .select("event_type",
                    (F.col("rnk0") + 1).cast("bigint").alias("rnk"),
                    F.col("t.user_id").alias("user_id"),
                    (-F.col("t.neg_n")).alias("n_events")))


def grouped_demean(orders: DataFrame) -> DataFrame:
    """Per-customer demeaned order totals via applyInPandas (grouped-map
    Python UDF) — the native-Python analogue of the reference's reducer
    contract: the framework hands each group to user code whole
    (SURVEY.md §2.1), here as an Arrow-backed pandas DataFrame.

    Scale note: one shuffle on the grouping key; each group must fit in
    one Python worker's memory — the same contract as a reference reduce
    partition, minus its 2 GiB in-memory-sort ceiling for the framework
    side (Spark's shuffle sort spills).
    """
    def demean_partition(batches):
        import numpy as np
        # whole-partition processing: Arrow batches can split a group,
        # so concatenate the partition (bounded by the repartition width)
        # and compute ALL groups vectorized with pandas groupby.transform
        # — one UDF call per partition instead of one per group.
        # applyInPandas would make |customers| tiny per-group calls:
        # measured 17 s vs 1.4 s at sf0.1 for identical semantics.
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        # exact integer-cents arithmetic end to end: the group mean is
        # rounded half-up to whole cents with the integer identity
        # floor((2Σ+n)/2n), and the deviation stays an exact multiple of
        # 0.01. Any float mean differs between engines at ULP level
        # (pairwise vs sequential summation) and float round() ties
        # resolve differently in Spark vs DuckDB — integers cannot
        # disagree.
        cents = pd.Series(
            np.round(pdf["o_totalprice"].to_numpy() * 100).astype(np.int64))
        g = cents.groupby(pdf["o_custkey"].to_numpy())
        total = g.transform("sum")
        n = g.transform("size")
        mean_cents = (2 * total + n) // (2 * n)
        yield pd.DataFrame({
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "price_dev": (cents - mean_cents) / 100.0,
        })

    # repartition on the grouping key = the grouped-map contract (every
    # group whole within one partition), while keeping UDF invocations
    # at O(partitions); at 100 TB, size partitions via
    # spark.sql.shuffle.partitions so a partition fits a Python worker.
    return (orders.select("o_custkey", "o_orderkey", "o_totalprice")
            .repartition("o_custkey")
            .mapInPandas(demean_partition,
                         "o_custkey bigint, o_orderkey bigint, "
                         "price_dev double"))


def zorder_layout_stats(lineitem: DataFrame, bits: int = 4,
                        files: int = 16) -> DataFrame:
    """Z-order (Morton) clustering effectiveness report — the layout
    pass behind multi-dimensional data skipping (Delta/Iceberg
    OPTIMIZE ZORDER): interleaving the bits of two join/filter columns
    and range-splitting on the interleaved code yields files whose
    min/max spans are tight in BOTH dimensions, so a predicate on
    either column prunes most files at scan time.

    Everything is exact integer arithmetic so the oracle matches
    bit-for-bit: per-dimension codes come from min/max range bucketing
    (`(x - lo) * 2^bits div (hi - lo + 1)` — never float), the Morton
    code is explicit shift/mask interleaving, and rows land in
    `files` buckets by code range. Output: one row per file bucket
    with its row count and per-dimension min/max spans — the spans ARE
    the data-skipping index a writer would persist as file-footer
    stats. One scan + one tiny broadcast (global bounds) + one hash
    aggregate; the real write path would `repartitionByRange(z)` with
    the same code and stream to parquet."""
    side = 1 << bits
    bounds = lineitem.agg(
        F.min("l_partkey").alias("x_lo"), F.max("l_partkey").alias("x_hi"),
        F.min("l_suppkey").alias("y_lo"), F.max("l_suppkey").alias("y_hi"))
    coded = (lineitem.select("l_partkey", "l_suppkey")
             .join(F.broadcast(bounds))
             .select(
                 "l_partkey", "l_suppkey",
                 (F.col("l_partkey") - F.col("x_lo")) .alias("dx"),
                 (F.col("l_suppkey") - F.col("y_lo")).alias("dy"),
                 (F.col("x_hi") - F.col("x_lo") + 1).alias("wx"),
                 (F.col("y_hi") - F.col("y_lo") + 1).alias("wy"))
             .select(
                 "l_partkey", "l_suppkey",
                 F.expr(f"CAST(dx * {side} div wx AS BIGINT)").alias("cx"),
                 F.expr(f"CAST(dy * {side} div wy AS BIGINT)").alias("cy")))
    z = " + ".join(
        f"(((cx >> {i}) & 1) << {2 * i + 1}) + (((cy >> {i}) & 1) << {2 * i})"
        for i in range(bits))
    return (coded
            .select("l_partkey", "l_suppkey",
                    F.expr(f"CAST({z} AS BIGINT)").alias("zcode"))
            .select("l_partkey", "l_suppkey",
                    F.expr(f"CAST(zcode * {files} div {side * side} "
                           "AS BIGINT)").alias("file_id"))
            .groupBy("file_id")
            .agg(F.count("*").alias("n_rows"),
                 F.min("l_partkey").alias("x_min"),
                 F.max("l_partkey").alias("x_max"),
                 F.min("l_suppkey").alias("y_min"),
                 F.max("l_suppkey").alias("y_max"))
            .orderBy("file_id"))


def approx_distinct_bounded(orders: DataFrame,
                            lineitem: DataFrame) -> DataFrame:
    """The value-checkable CONTRACT twin of `approx_distinct`: the HLL++
    estimate itself is engine-specific, but its accuracy contract —
    within 10% (2× the default 5% rsd) of the exact count — is not.
    Emitting (exact_nd, within_10pct) lets the DuckDB oracle
    value-check the sketch: the oracle computes the exact counts and
    asserts TRUE, so any sketch regression past the bound hash-fails
    the gate instead of hiding behind a rows-only check."""
    def one(df: DataFrame, name: str, col: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("col_name"),
            F.count_distinct(col).alias("exact_nd"),
            (F.abs(F.approx_count_distinct(col) - F.count_distinct(col))
             <= 0.10 * F.count_distinct(col)).alias("within_10pct"))
    return one(orders, "orders.o_custkey", "o_custkey").unionByName(
        one(lineitem, "lineitem.l_partkey", "l_partkey"))


def udaf_median_by_type(events: DataFrame) -> DataFrame:
    """Per-event-type median of `value` via a GROUPED_AGG pandas UDAF —
    the third leg of the Python aggregation surface beside the scalar
    pandas UDF (udf_token_counts) and the grouped-map applyInPandas
    (grouped_demean): user code receives a whole group's column as one
    pandas Series per Arrow batch group and returns one scalar, the
    Arrow-era UDAF-registration story (SURVEY.md §2 lists UDAF
    registration as engine scope the reference lacks).

    Scale note: a grouped-agg UDAF has NO partial aggregation — every
    row of a group crosses the shuffle to one reducer (exact medians
    are holistic; that is the honest cost). Spark's own builtin median
    behaves the same way; for a sketched alternative with map-side
    combine see approx_percentiles. Median of an even group is the
    midpoint average in both pandas and DuckDB, so the oracle is
    exact.
    """
    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return (events.groupBy("event_type")
            .agg(F.round(median_udaf("value"), 4).alias("median_value"))
            .orderBy("event_type"))


def bloom_semi_join_stats(orders: DataFrame, customer: DataFrame,
                          acctbal_min: float = 9000.0,
                          m_bits: int = 1024) -> DataFrame:
    """Bloom-filter semi-join pruning, made value-checkable: build an
    m-bit / 2-hash Bloom filter over the rich-customer key set, probe
    every order through it, and report (n_probe, n_bloom_pass,
    n_exact_match, n_false_positive) — the exact pruning telemetry a
    100 TB scan-side filter ships (Spark's own runtime bloom pruning
    is this shape; here the filter is explicit so the oracle can
    replay every bit).

    Determinism end to end: the two hash functions are the first and
    second 8 md5 hex digits of the key (the hash_sample convention —
    DuckDB parses the same digits via '0x' CAST), the bitmap is 32-bit
    positions packed into bigint words with a bit_or aggregate (bits
    stay < 2^32 because DuckDB rejects 1<<63), and the probe is two
    broadcast joins against the <= m/32-row word table — the filter
    costs two tiny lookups per row, never a shuffle of the fact
    table. Bloom guarantees no false negatives, so n_bloom_pass >=
    n_exact_match and the difference IS the false-positive count."""
    def _pos(key, off):
        return (F.conv(F.substring(F.md5(key.cast("string")),
                                   off, 8), 16, 10)
                .cast("bigint") % m_bits)

    keys = (customer.where(F.col("c_acctbal") > acctbal_min)
            .select("c_custkey"))
    pos = keys.select(F.explode(F.array(
        _pos(F.col("c_custkey"), 1),
        _pos(F.col("c_custkey"), 9))).alias("p"))
    bitmap = (pos.select(F.expr("p DIV 32").alias("w"),
                         (F.col("p") % 32).cast("int").alias("b"))
              .groupBy("w")
              .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))")
                   .alias("bits")))
    probe = orders.select(
        "o_custkey",
        _pos(F.col("o_custkey"), 1).alias("p1"),
        _pos(F.col("o_custkey"), 9).alias("p2"))
    b1 = bitmap.select(F.col("w").alias("w1"),
                       F.col("bits").alias("bits1"))
    b2 = bitmap.select(F.col("w").alias("w2"),
                       F.col("bits").alias("bits2"))
    hit = ((F.expr("(shiftright(bits1, CAST(p1 % 32 AS INT)) & 1) = 1"))
           & (F.expr("(shiftright(bits2, CAST(p2 % 32 AS INT)) & 1) = 1")))
    passed = (probe
              .join(F.broadcast(b1), F.expr("p1 DIV 32 = w1"), "left")
              .join(F.broadcast(b2), F.expr("p2 DIV 32 = w2"), "left")
              .where(F.coalesce(hit, F.lit(False))))
    n_probe = orders.agg(F.count("*").alias("n_probe"))
    n_pass = passed.agg(F.count("*").alias("n_bloom_pass"))
    n_exact = (orders.join(F.broadcast(keys),
                           F.col("o_custkey") == F.col("c_custkey"),
                           "left_semi")
               .agg(F.count("*").alias("n_exact_match")))
    return (n_probe.crossJoin(F.broadcast(n_pass))
            .crossJoin(F.broadcast(n_exact))
            .select("n_probe", "n_bloom_pass", "n_exact_match",
                    (F.col("n_bloom_pass") - F.col("n_exact_match"))
                    .alias("n_false_positive")))


def dq_expectations(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Declarative data-quality EXPECTATION suite over orders — the
    dbt-test / Great-Expectations-style validation gate a pipeline
    runs before promoting a drop (`table_profile` DESCRIBES the
    table; this ASSERTS against a declared contract): one row per
    rule with checked/violation counts and a pass flag. Rules cover
    the canonical classes — not_null, unique, accepted_values,
    numeric range, date bounds, and the cross-table referential
    integrity check (o_custkey -> customer).

    Shape: every ROW-LEVEL rule is a conditional sum inside ONE
    aggregate over a single scan (then stacked to rows — the stack
    runs on the 1-row aggregate, so it is not the
    explode-that-rescans-input trap); the FK rule is the only join —
    a keyed left-anti count against the dim's key column (bucket or
    broadcast at scale). Exact integer counts; full value oracle."""
    d = F.to_date("o_orderdate")
    agg = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("int")).cast("bigint")
        .alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint").alias("v_dup"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P"))
              .cast("int")).cast("bigint").alias("v_status"),
        F.sum((F.col("o_totalprice") <= 0).cast("int")).cast("bigint")
        .alias("v_price"),
        F.sum(((d < F.lit("1992-01-01").cast("date"))
               | (d > F.lit("1998-12-31").cast("date"))).cast("int"))
        .cast("bigint").alias("v_date"))
    row_rules = agg.selectExpr(
        "stack(5, "
        "'not_null(o_custkey)', n, v_null, "
        "'unique(o_orderkey)', n, v_dup, "
        "'accepted_values(o_orderstatus)', n, v_status, "
        "'range(o_totalprice>0)', n, v_price, "
        "'date_bounds(o_orderdate)', n, v_date) "
        "AS (rule, n_checked, n_violations)")
    keyed = orders.where(F.col("o_custkey").isNotNull())
    fk = (keyed.agg(F.count(F.lit(1)).cast("bigint")
                    .alias("n_checked"))
          .crossJoin(F.broadcast(
              keyed.join(customer.select("c_custkey"),
                         F.col("o_custkey") == F.col("c_custkey"),
                         "left_anti")
              .agg(F.count(F.lit(1)).cast("bigint")
                   .alias("n_violations"))))
          .select(F.lit("fk(o_custkey->customer)").alias("rule"),
                  "n_checked", "n_violations"))
    return (row_rules.unionAll(fk)
            .select("rule", "n_checked", "n_violations",
                    (F.col("n_violations") == 0).alias("passed"))
            .orderBy("rule"))


def pareto_frontier(part: DataFrame) -> DataFrame:
    """Skyline (Pareto-frontier) query over parts on (size,
    retail-price): the parts for which no other part is both at most
    as small AND at most as cheap (strictly better in one dim) — the
    classic multi-criteria shortlist operator (Börzsönyi et al.,
    ICDE'01 'The Skyline Operator').

    Scale decision: the naive skyline is an O(n²) NOT-EXISTS
    self-join over the fact table. But dominance on (size, price)
    only ever keeps the MIN price per size, so the fact stream first
    collapses to the |distinct sizes| frame (one map-side-combined
    aggregate — sizes are a bounded attribute domain, ~50 values, a
    calendar-like dimension that does NOT grow with data volume);
    the dominance test is then a broadcast triangular self-join on
    that tiny frame (no window — the repo-wide plan gate forbids
    unpartitioned windows). Exact integer cents; the oracle states
    the same semantics as a plain NOT EXISTS over the collapsed
    frame."""
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    per_size = (part.groupBy(F.col("p_size").alias("size"))
                .agg(F.min(cents).alias("min_cents")))
    other = per_size.select(F.col("size").alias("s2"),
                            F.col("min_cents").alias("c2"))
    dominated = (per_size.join(
        F.broadcast(other),
        (F.col("s2") <= F.col("size")) & (F.col("c2") <= F.col("min_cents"))
        & ((F.col("s2") < F.col("size"))
           | (F.col("c2") < F.col("min_cents"))),
        "left_semi"))
    return (per_size.join(dominated.select("size"), "size",
                          "left_anti")
            .select(F.col("size").cast("int").alias("size"),
                    "min_cents")
            .orderBy("size"))


def ols3_exprs() -> dict:
    """Cramer's-rule solution of the 3×3 normal equations (intercept
    + two features) as SQL-syntax expression TEXT over the moment
    columns n, s1, s2, s11, s12, s22, sy, s1y, s2y (all already cast
    to double). The SAME strings are parsed by Spark (`F.expr`) and
    DuckDB, so both engines execute the identical IEEE op tree —
    the bit-portability trick `hilbert_sql` uses, applied to linear
    algebra. Moments themselves are exact integers upstream, so the
    only float arithmetic anywhere is this shared tree."""
    det = ("(n * (s11 * s22 - s12 * s12) "
           "- s1 * (s1 * s22 - s12 * s2) "
           "+ s2 * (s1 * s12 - s11 * s2))")
    d0 = ("(sy * (s11 * s22 - s12 * s12) "
          "- s1 * (s1y * s22 - s12 * s2y) "
          "+ s2 * (s1y * s12 - s11 * s2y))")
    d1 = ("(n * (s1y * s22 - s12 * s2y) "
          "- sy * (s1 * s22 - s12 * s2) "
          "+ s2 * (s1 * s2y - s1y * s2))")
    d2 = ("(n * (s11 * s2y - s1y * s12) "
          "- s1 * (s1 * s2y - s1y * s2) "
          "+ sy * (s1 * s12 - s11 * s2))")
    b0, b1, b2 = (f"({d0} / {det})", f"({d1} / {det})",
                  f"({d2} / {det})")
    sse = f"(syy - ({b0} * sy + {b1} * s1y + {b2} * s2y))"
    sst = "(syy - sy * sy / n)"
    return {"det": det, "beta0": b0, "beta1": b1, "beta2": b2,
            "r2": f"(1.0 - {sse} / {sst})"}


def ols_normal_equations(lineitem: DataFrame) -> DataFrame:
    """Closed-form multivariate OLS by normal equations — predict
    extended price (cents) from quantity and discount (cents) with
    an intercept: the multi-feature member next to `linear_trend`'s
    single-slope regr_* aggregates, and the shape distributed ML
    preprocessing actually uses (one pass of exact moment sums, a
    driver-free constant-size solve).

    Exactness: the nine moment sums accumulate in decimal(38,0)
    (x·y products summed corpus-wide pass bigint at scale) and cast
    to double ONCE; the Cramer solve + R² is a single expression
    tree whose TEXT is shared verbatim with the oracle
    (`ols3_exprs`), so both engines run the same IEEE ops — betas
    and R² round 6dp in-query on both sides. Shape: one map-side-
    combined aggregate over the scan; the solve runs on a 1-row
    frame. Degenerate (det = 0) guarded to NULL."""
    q = F.round(F.col("l_quantity")).cast("bigint")
    d = F.round(F.col("l_discount") * 100).cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")

    def dd(c):
        return c.cast("decimal(38,0)")

    sums = lineitem.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dd(q)).cast("double").alias("s1"),
        F.sum(dd(d)).cast("double").alias("s2"),
        F.sum(dd(q) * dd(q)).cast("double").alias("s11"),
        F.sum(dd(q) * dd(d)).cast("double").alias("s12"),
        F.sum(dd(d) * dd(d)).cast("double").alias("s22"),
        F.sum(dd(y)).cast("double").alias("sy"),
        F.sum(dd(q) * dd(y)).cast("double").alias("s1y"),
        F.sum(dd(d) * dd(y)).cast("double").alias("s2y"),
        F.sum(dd(y) * dd(y)).cast("double").alias("syy"))
    e = ols3_exprs()
    guard = F.expr(e["det"]) != 0
    return sums.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.when(guard, F.round(F.expr(e["beta0"]), 6) + F.lit(0.0))
        .alias("beta0"),
        F.when(guard, F.round(F.expr(e["beta1"]), 6) + F.lit(0.0))
        .alias("beta1"),
        F.when(guard, F.round(F.expr(e["beta2"]), 6) + F.lit(0.0))
        .alias("beta2"),
        F.when(guard, F.round(F.expr(e["r2"]), 6) + F.lit(0.0))
        .alias("r2"))


#: Ridge penalty ladder (applied to the raw normal-equation diagonal;
#: diagonals at sf0.01 are ~1e5..1e12, so the rungs sweep from
#: negligible to dominating).
RIDGE_LAMBDAS = (0.0, 1e6, 1e9, 1e12)


def ridge_path(lineitem: DataFrame) -> DataFrame:
    """Ridge regression path by the regularized normal equations
    (Hoerl & Kennard 1970): solve (XᵀX + λI)β = Xᵀy for each λ in
    RIDGE_LAMBDAS over the same features as `ols_normal_equations`
    (intercept penalized too — the raw-moment form, stated plainly).

    The trick: ridge IS the OLS Cramer solve with n→n+λ, s11→s11+λ,
    s22→s22+λ — so the SAME shared expression text (`ols3_exprs`)
    runs against an adjusted 1-row moment frame per λ, and the λ=0
    rung reproduces OLS exactly. Moments are computed ONCE (exact
    decimal(38,0) sums, one map-side-combined pass); the 4-rung
    ladder is a broadcast crossJoin against the 1-row frame. Betas
    shrink monotonically toward zero as λ grows — the path a model
    tuner inspects."""
    q = F.round(F.col("l_quantity")).cast("bigint")
    d = F.round(F.col("l_discount") * 100).cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")

    def dd(c):
        return c.cast("decimal(38,0)")

    sums = lineitem.agg(
        F.count(F.lit(1)).cast("double").alias("n0"),
        F.sum(dd(q)).cast("double").alias("s1"),
        F.sum(dd(d)).cast("double").alias("s2"),
        F.sum(dd(q) * dd(q)).cast("double").alias("s11_0"),
        F.sum(dd(q) * dd(d)).cast("double").alias("s12"),
        F.sum(dd(d) * dd(d)).cast("double").alias("s22_0"),
        F.sum(dd(y)).cast("double").alias("sy"),
        F.sum(dd(q) * dd(y)).cast("double").alias("s1y"),
        F.sum(dd(d) * dd(y)).cast("double").alias("s2y"),
        F.sum(dd(y) * dd(y)).cast("double").alias("syy"))
    spark = lineitem.sparkSession
    lams = spark.createDataFrame([(l,) for l in RIDGE_LAMBDAS],
                                 "lam double")
    adj = (sums.crossJoin(F.broadcast(lams))
           .select("lam",
                   (F.col("n0") + F.col("lam")).alias("n"),
                   "s1", "s2",
                   (F.col("s11_0") + F.col("lam")).alias("s11"),
                   "s12",
                   (F.col("s22_0") + F.col("lam")).alias("s22"),
                   "sy", "s1y", "s2y", "syy"))
    e = ols3_exprs()
    guard = F.expr(e["det"]) != 0
    return adj.select(
        F.col("lam").alias("lambda"),
        F.when(guard, F.round(F.expr(e["beta0"]), 6) + F.lit(0.0))
        .alias("beta0"),
        F.when(guard, F.round(F.expr(e["beta1"]), 6) + F.lit(0.0))
        .alias("beta1"),
        F.when(guard, F.round(F.expr(e["beta2"]), 6) + F.lit(0.0))
        .alias("beta2"))
