"""Holt double-exponential smoother (`operators/events.holt_by_user`):
hand-built recursion check plus bit-exact parity with the DuckDB
recursive CTE that becomes its registry oracle in round 11 (the
round-10 driver window is full at 50)."""

from __future__ import annotations

from cloud_native_mapreduce_spark.operators.events import holt_by_user

HOLT_SQL = """
WITH RECURSIVE ordered AS (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events),
r AS (
    SELECT user_id, event_id, rn,
           value AS level, CAST(0.0 AS DOUBLE) AS trend
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.user_id, o.event_id, o.rn,
           (o.value + (r.level + r.trend)) / 2,
           (r.trend + (((o.value + (r.level + r.trend)) / 2)
                       - r.level)) / 2
    FROM ordered o JOIN r ON o.user_id = r.user_id
                          AND o.rn = r.rn + 1)
SELECT user_id, event_id, level, trend FROM r
"""


def test_holt_handbuilt_linear_ramp(spark):
    # values 0,2,4,6 on one user: the trend estimate should settle
    # toward the true slope 2 and the recursion must match the paper
    # formulas exactly.
    rows = [(i, f"2024-01-0{i + 1} 00:00:00", 1, float(2 * i))
            for i in range(4)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts",
                    "user_id", "value")
    got = {r.event_id: (r.level, r.trend)
           for r in holt_by_user(ev).collect()}
    lev, tr = 0.0, 0.0
    want = {0: (0.0, 0.0)}
    for i in range(1, 4):
        prev = lev
        lev = (2.0 * i + (lev + tr)) / 2.0
        tr = (tr + (lev - prev)) / 2.0
        want[i] = (lev, tr)
    assert got == want


def test_holt_matches_duckdb_recursive_cte_bitwise(spark, duck):
    from cloud_native_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    got = sorted((r.user_id, r.event_id, r.level, r.trend)
                 for r in holt_by_user(
                     load_table(spark, SF_DIR, "events")).collect())
    want = sorted((int(u), int(e), lv, t) for u, e, lv, t in
                  duck.execute(HOLT_SQL).fetchall())
    # bit-exact: tuple equality on raw doubles, no tolerance
    assert got == want
