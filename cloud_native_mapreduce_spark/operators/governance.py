"""Data-governance audits: k-anonymity risk and the generalization
ladder (Sweeney 2002; Samarati's generalization model) — the
re-identification checks a privacy review runs before a table ships.

A record is k-anonymous when at least k records share its
quasi-identifier (QI) combination; groups below k are re-identification
risks. The QI here is (nation, market segment, account-balance bucket)
on the customer table — the classic "demographics + coarse numeric"
shape. ``k_anonymity_audit`` reports the risk at several k thresholds;
``generalization_ladder`` shows how coarsening the balance bucket (the
generalization operation an anonymizer would apply) trades resolution
for safety.

Exactness: balance buckets are integer arithmetic on cents with a
+10^7 shift so the floor division is over positives (Spark's ``div``
truncates toward zero while DuckDB's ``//`` floors — they agree only
for non-negative operands; balances go to -$999.85). Risk percentages
are one rounded division of exact counts.

At 100 TB: each audit is one groupBy on the QI (map-side combined)
plus a tiny threshold frame crossJoined broadcast — nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Cent shift making every balance positive before bucketing
#: (|min| = $999.85 << $100,000).
BAL_SHIFT_CENTS = 10_000_000
#: k thresholds the audit reports.
K_LEVELS = (2, 5, 10)
#: Bucket widths (cents) for the generalization ladder.
LADDER = (50_000, 100_000, 200_000, 500_000)


def _qi(bucket_cents: int):
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    bucket = F.expr(
        f"div(CAST(round(c_acctbal * 100) AS BIGINT) + {BAL_SHIFT_CENTS},"
        f" {bucket_cents})")
    return [F.col("c_nationkey").cast("int").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            bucket.cast("bigint").alias("bal_bucket")]


def k_anonymity_audit(customer: DataFrame,
                      bucket_cents: int = 50_000) -> DataFrame:
    """(k, n_groups, n_violating_groups, n_at_risk_records, risk_pct)
    for each k in K_LEVELS under the (nation, seg, $500-bucket) QI."""
    groups = (customer.groupBy(*_qi(bucket_cents))
              .agg(F.count("*").cast("bigint").alias("sz")))
    spark = customer.sparkSession
    ks = spark.createDataFrame([(k,) for k in K_LEVELS], "k int")
    per_k = (groups.crossJoin(F.broadcast(ks))
             .groupBy("k")
             .agg(F.count("*").cast("bigint").alias("n_groups"),
                  F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
                  .cast("bigint").alias("n_violating_groups"),
                  F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz"))
                        .otherwise(0)).cast("bigint")
                  .alias("n_at_risk_records"),
                  F.sum("sz").cast("bigint").alias("n_records")))
    return per_k.select(
        F.col("k").cast("bigint").alias("k"),
        "n_groups", "n_violating_groups", "n_at_risk_records",
        (F.round(F.col("n_at_risk_records") * 100.0 / F.col("n_records"),
                 4) + F.lit(0.0)).alias("risk_pct"))


def generalization_ladder(customer: DataFrame, k: int = 5) -> DataFrame:
    """(bucket_cents, n_groups, min_group_size, n_at_risk_records):
    the same audit at each rung of the balance-bucket generalization
    ladder — the resolution/safety trade an anonymizer walks."""
    spark = customer.sparkSession
    out = None
    for width in LADDER:
        groups = (customer.groupBy(*_qi(width))
                  .agg(F.count("*").cast("bigint").alias("sz")))
        row = groups.agg(
            F.lit(width).cast("bigint").alias("bucket_cents"),
            F.count("*").cast("bigint").alias("n_groups"),
            F.min("sz").alias("min_group_size"),
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
            .cast("bigint").alias("n_at_risk_records"))
        out = row if out is None else out.unionByName(row)
    return out
