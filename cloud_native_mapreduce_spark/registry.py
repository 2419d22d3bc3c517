"""Query registry: the driver-facing surface of the engine.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent DuckDB ANSI-SQL oracle (or None for ops that are not
SQL-expressible — the driver then records a weaker rows-only check).

Alignment rules (the driver compares row-count + schema + order-insensitive
value-hash, sorting columns by name — __spark_entry__ docstring):
  * every computed column is aliased identically on both sides;
  * integer aggregates are BIGINT on both sides (DuckDB promotes SUM(BIGINT)
    to HUGEINT — always cast back);
  * double aggregates are rounded in-query on both sides (sum order across
    partitions is nondeterministic; rounding makes the hash stable);
  * every LIMIT is preceded by a fully deterministic ORDER BY (unique
    tiebreaker) so both engines select the same rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions import text as T
from cloud_native_mapreduce_spark.operators import relational as R
from cloud_native_mapreduce_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, description: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(name, fn, oracle, description)
        return fn
    return deco


# regex literal for DuckDB (single-quoted; apostrophe doubled)
_WORD_RE_SQL = T.WORD_RE.replace("'", "''")


# ---------------------------------------------------------------------------
# Word count — the reference's flagship workload (SURVEY.md §7.1)
# ---------------------------------------------------------------------------

@_register(
    "word_count",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_extract_all(lower(text), '{_WORD_RE_SQL}', 0))
                 AS word
          FROM documents)
    GROUP BY word
    """,
    description="Reference flagship: tokenizer-parity word count "
                "(client/scripts/mapper.py:13, reducer.py:14-27)")
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.word_count(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Relational: aggregations
# ---------------------------------------------------------------------------

@_register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: wide hash aggregate w/ map-side combine")
def q_pricing_summary(spark, sf_dir):
    return R.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@_register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="two-phase distinct aggregate")
def q_agg_distinct(spark, sf_dir):
    return R.agg_distinct(load_table(spark, sf_dir, "orders"))


@_register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="ROLLUP grouping sets")
def q_rollup_revenue(spark, sf_dir):
    return R.rollup_revenue(load_table(spark, sf_dir, "lineitem"))


@_register(
    "cube_quantity",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="CUBE grouping sets")
def q_cube_quantity(spark, sf_dir):
    return R.cube_quantity(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# Relational: filters / projections
# ---------------------------------------------------------------------------

@_register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_discount > 0.05
    """,
    description="predicate pushdown + column pruning showcase")
def q_filter_project(spark, sf_dir):
    return R.filter_project(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# Relational: joins
# ---------------------------------------------------------------------------

@_register(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spent
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, c_mktsegment
    """,
    description="broadcast-hash fact⋈dim join")
def q_join_broadcast(spark, sf_dir):
    return R.customer_order_totals(load_table(spark, sf_dir, "orders"),
                                   load_table(spark, sf_dir, "customer"))


@_register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    description="TPC-H Q3 shape: 3-way join + agg + deterministic top-10")
def q_shipping_priority(spark, sf_dir):
    return R.shipping_priority(load_table(spark, sf_dir, "customer"),
                               load_table(spark, sf_dir, "orders"),
                               load_table(spark, sf_dir, "lineitem"))


@_register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation   ON r_regionkey = n_regionkey
    JOIN customer ON n_nationkey = c_nationkey
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    description="TPC-H Q5 shape: 6-way join, dim chain broadcasts")
def q_local_supplier_volume(spark, sf_dir):
    return R.local_supplier_volume(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"))


@_register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="LEFT SEMI join (EXISTS)")
def q_semi_join(spark, sf_dir):
    return R.customers_with_orders(load_table(spark, sf_dir, "customer"),
                                   load_table(spark, sf_dir, "orders"))


@_register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    description="LEFT ANTI join (NOT EXISTS on filtered fact)")
def q_anti_join(spark, sf_dir):
    return R.customers_without_orders(load_table(spark, sf_dir, "customer"),
                                      load_table(spark, sf_dir, "orders"))


@_register(
    "fact_fact_join",
    oracle="""
    SELECT o_orderstatus, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus, l_linestatus
    ORDER BY o_orderstatus, l_linestatus
    """,
    description="fact⋈fact shuffle join (bucketing target at scale)")
def q_fact_fact_join(spark, sf_dir):
    return R.order_lineitem_join(load_table(spark, sf_dir, "orders"),
                                 load_table(spark, sf_dir, "lineitem"))


@_register(
    "range_join",
    oracle="""
    SELECT p_brand,
           count(*) AS n_in_band,
           round(avg(l_extendedprice / p_retailprice), 4) AS avg_price_ratio
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
             AND l_extendedprice >= p_retailprice * 0.5
             AND l_extendedprice <= p_retailprice * 2.0
    GROUP BY p_brand ORDER BY p_brand
    """,
    description="equi+range (theta) join on price band")
def q_range_join(spark, sf_dir):
    return R.range_join_price_band(load_table(spark, sf_dir, "part"),
                                   load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# Relational: windows
# ---------------------------------------------------------------------------

@_register(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rnk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 rank() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
    description="RANK window, top-3 orders per customer")
def q_window_rank(spark, sf_dir):
    return R.top_orders_per_customer(load_table(spark, sf_dir, "orders"))


@_register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS order_seq,
           CAST(date_diff('day',
                lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
                AS days_since_prev,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="LAG/LEAD/ROW_NUMBER per-customer order sequence")
def q_window_lag_lead(spark, sf_dir):
    return R.order_gaps(load_table(spark, sf_dir, "orders"))


@_register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders
    """,
    description="running-sum frame")
def q_window_running_sum(spark, sf_dir):
    return R.running_revenue(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Relational: sort/limit, set ops, scalar functions
# ---------------------------------------------------------------------------

@_register(
    "sort_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM (SELECT * FROM lineitem
          ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
          LIMIT 20)
    """,
    description="global top-k (TakeOrderedAndProject, no full sort)")
def q_sort_topk(spark, sf_dir):
    return R.top_lineitems(load_table(spark, sf_dir, "lineitem"))


@_register(
    "set_ops",
    oracle="""
    WITH building AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    urgent AS (
        SELECT DISTINCT o_custkey AS c_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT')
    SELECT c_custkey, 'both' AS tag
      FROM (SELECT c_custkey FROM building INTERSECT
            SELECT c_custkey FROM urgent)
    UNION ALL
    SELECT c_custkey, 'building_only' AS tag
      FROM (SELECT c_custkey FROM building EXCEPT
            SELECT c_custkey FROM urgent)
    UNION ALL
    SELECT c_custkey, 'urgent_only' AS tag
      FROM (SELECT c_custkey FROM urgent EXCEPT
            SELECT c_custkey FROM building)
    """,
    description="UNION/INTERSECT/EXCEPT set algebra")
def q_set_ops(spark, sf_dir):
    return R.segment_set_ops(load_table(spark, sf_dir, "customer"),
                             load_table(spark, sf_dir, "orders"))


@_register(
    "scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                AS name_upper,
           CAST(length(p_name) AS BIGINT)               AS name_len,
           substring(p_type, 1, 5)                      AS type_prefix,
           concat_ws('|', p_brand, p_type)              AS brand_type,
           round(sqrt(p_retailprice), 4)                AS price_sqrt,
           round(ln(p_retailprice + 1), 4)              AS price_log,
           CAST(p_size % 7 AS BIGINT)                   AS size_mod7,
           CASE WHEN p_retailprice > 1500 THEN 'premium'
                WHEN p_retailprice > 900  THEN 'standard'
                ELSE 'budget' END                       AS price_tier
    FROM part
    """,
    description="string/math scalar function surface")
def q_scalar_functions(spark, sf_dir):
    return R.scalar_functions(load_table(spark, sf_dir, "part"))


@_register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)       AS order_year,
           CAST(month(o_orderdate) AS BIGINT)      AS order_month,
           CAST(day(o_orderdate) AS BIGINT)        AS order_day,
           date_trunc('month', o_orderdate)        AS month_start,
           strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS due_date,
           strftime(o_orderdate, '%Y-%m')          AS ym
    FROM orders
    """,
    description="date/time scalar function surface")
def q_date_functions(spark, sf_dir):
    return R.date_functions(load_table(spark, sf_dir, "orders"))
