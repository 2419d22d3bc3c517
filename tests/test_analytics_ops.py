"""Hand-built semantic pins for the round-10 analytics batch: label
propagation, HITS, rolling z-score, HyperLogLog, Count-Min, and
Z-order layout. Registry oracles prove
cross-engine equality; these tests pin the SEMANTICS on inputs small
enough to verify by hand (the round-9 convention)."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F
import pytest

from cloud_native_mapreduce_spark.operators import sketches as SK
from cloud_native_mapreduce_spark.operators.events import anomaly_zscore
from cloud_native_mapreduce_spark.operators.layout import (
    write_zordered,
    zorder_locality,
    zvalue,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
                    "event_type", "value")


# ---------------------------------------------------------------------------
# rolling z-score
# ---------------------------------------------------------------------------

def test_anomaly_flags_planted_outlier(spark):
    # 12 calm values 10.00 +/- 0.02, then a 50.00 spike: only the
    # spike is flagged, and only after ZSCORE_MIN_N history exists.
    rows = []
    for i in range(12):
        rows.append((i, f"2024-01-01 {i:02d}:00:00", 1, "view",
                     10.0 + 0.02 * (i % 2)))
    rows.append((99, "2024-01-01 23:00:00", 1, "view", 50.0))
    out = anomaly_zscore(_events(spark, rows)).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].zscore > 3


def test_anomaly_zero_variance_unflaggable(spark):
    # constant history has den = 0: a jump over flat history is NOT
    # flagged (pinned edge — no divide-by-zero, no NULL ordering).
    rows = [(i, f"2024-01-01 {i:02d}:00:00", 1, "view", 10.0)
            for i in range(12)]
    rows.append((99, "2024-01-01 23:00:00", 1, "view", 50.0))
    assert anomaly_zscore(_events(spark, rows)).count() == 0


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------

def test_hll_registers_merge_is_elementwise_max(spark, sf_dir):
    from cloud_native_mapreduce_spark.sources.tables import load_table
    li = load_table(spark, sf_dir, "lineitem")
    half_a = li.where(F.col("l_orderkey") % 2 == 0)
    half_b = li.where(F.col("l_orderkey") % 2 == 1)
    whole = {r.bucket: r.m
             for r in SK.hll_registers(li, "l_partkey").collect()}
    ra = {r.bucket: r.m
          for r in SK.hll_registers(half_a, "l_partkey").collect()}
    rb = {r.bucket: r.m
          for r in SK.hll_registers(half_b, "l_partkey").collect()}
    merged = {b: max(ra.get(b, 0), rb.get(b, 0))
              for b in set(ra) | set(rb)}
    assert merged == whole


def test_hll_estimate_within_published_error(spark, sf_dir):
    # sketched key must sit ABOVE the 2.5m small-range threshold for
    # the raw estimator's published error to apply (the registry
    # entry's line-uid choice; l_partkey at sf0.001 is n=200 << 2.5m
    # and the raw estimate is biased 4x there, by design of HLL).
    from cloud_native_mapreduce_spark.sources.tables import load_table
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("bigint").alias("line_uid"))
    row = SK.hll_estimate(li, "line_uid").collect()[0]
    assert row.true_distinct > 2.5 * 1024
    # m=1024 -> rel std error ~1.04/sqrt(m) = 3.25%; allow 4 sigma.
    assert abs(row.rel_err) < 0.13


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------

def test_cms_estimate_upper_bounds_truth(spark):
    items = spark.createDataFrame(
        [(f"w{i}", i + 1) for i in range(200)], "word string, cnt long")
    out = SK.cms_point_estimates(items, "word", "cnt",
                                 ["w0", "w5", "w199", "absent"])
    for r in out.collect():
        assert r.est_count >= r.true_count
    got = {r.word: r for r in out.collect()}
    assert got["absent"].true_count == 0


def test_cms_sketch_merge_is_elementwise_sum(spark):
    items = spark.createDataFrame(
        [(f"w{i}", i + 1) for i in range(100)], "word string, cnt long")
    a = items.where(F.col("cnt") % 2 == 0)
    b = items.where(F.col("cnt") % 2 == 1)
    whole = {(r.depth, r.cell): r.counter
             for r in SK.cms_sketch(items, "word", "cnt").collect()}
    sa = {(r.depth, r.cell): r.counter
          for r in SK.cms_sketch(a, "word", "cnt").collect()}
    sb = {(r.depth, r.cell): r.counter
          for r in SK.cms_sketch(b, "word", "cnt").collect()}
    merged = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
    assert merged == whole


# ---------------------------------------------------------------------------
# Z-order
# ---------------------------------------------------------------------------

def test_zvalue_interleave_known_bits(spark):
    # x=0b101 (bits at 0,2 -> z bits 0,4 = 17), y=0b11 (bits at 0,1
    # -> z bits 1,3 = 10): z = 27.
    row = (spark.range(1)
           .select(zvalue(F.lit(5), F.lit(3)).alias("z")).collect()[0])
    assert row.z == 27


def test_zorder_buckets_bound_both_dims(spark, sf_dir):
    from cloud_native_mapreduce_spark.sources.tables import load_table
    out = zorder_locality(load_table(spark, sf_dir, "orders")).collect()
    assert len(out) > 1
    for r in out:
        # bucket = z >> 10 fixes the top 5 bits of each dim's 10:
        # each box spans at most 2^5 = 32 in BOTH dimensions.
        assert r.x_max - r.x_min < 32
        assert r.y_max - r.y_min < 32


def test_write_zordered_files_are_tight_in_both_dims(spark, tmp_path):
    # vs a 1-D sort: z-ordered files must be narrow in BOTH x and y.
    n = 1 << 12
    df = (spark.range(n)
          .select((F.col("id") % 64).alias("x"),
                  F.floor(F.col("id") / 64).cast("int").alias("y")))
    path = str(tmp_path / "zord")
    write_zordered(df, path, "x", "y", n_files=16, bits=6)
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        pdf = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")).collect()[0]
        spans.append((pdf[1] - pdf[0], pdf[3] - pdf[2]))
    assert len(spans) >= 8
    # a 1-D sort on x would leave y spanning the full 64 in most
    # files; the curve bounds BOTH dims' average span well below it.
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert avg_x < 48 and avg_y < 48


# ---------------------------------------------------------------------------
# LPA / HITS
# ---------------------------------------------------------------------------

def _li_from_orders(spark, orders):
    """lineitem-shaped frame from {order: [parts]} (the graph tests'
    co-purchase builder)."""
    rows = [(o, p) for o, ps in orders.items() for p in ps]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_lpa_two_cliques_converge_to_min_labels(spark):
    from cloud_native_mapreduce_spark.operators.graph import (
        label_propagation,
    )
    # two disjoint triangles {1,2,3} and {10,11,12}: with neighbor-
    # majority + min tie-break every vertex adopts the clique minimum
    # within rounds (labels can't cross components).
    li = _li_from_orders(spark, {100: [1, 2, 3], 200: [10, 11, 12]})
    got = {r.v: r.label for r in label_propagation(li).collect()}
    assert set(got) == {1, 2, 3, 10, 11, 12}
    assert all(lbl in (1, 2, 3) for v, lbl in got.items() if v < 10)
    assert all(lbl in (10, 11, 12) for v, lbl in got.items() if v >= 10)
    # no label leaked across the component boundary
    assert {got[1], got[2], got[3]}.isdisjoint(
        {got[10], got[11], got[12]})


def test_hits_star_center_is_top_authority(spark):
    from cloud_native_mapreduce_spark.operators.graph import hits_scores
    # star: center 99 co-purchased with leaves 1..6 (pairwise orders).
    li = _li_from_orders(
        spark, {i: [i, 99] for i in range(1, 7)})
    top = hits_scores(li, top_k=3).collect()
    # the center has the highest degree, so every edge orients
    # leaf -> center and the center is the unique authority.
    assert top[0].v == 99
    assert top[0].indegree == 6
    assert top[0].authority > top[1].authority if len(top) > 1 else True


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------

def test_kmv_sketch_of_union_is_union_of_sketches(spark):
    rows_a = [("s", i) for i in range(500)]
    rows_b = [("s", i) for i in range(300, 900)]
    fa = spark.createDataFrame(rows_a, "grp string, item long")
    fb = spark.createDataFrame(rows_b, "grp string, item long")
    whole = [r.h for r in SK.kmv_sketch(fa.unionAll(fb), "grp", "item")
             .collect()]
    ha = [r.h for r in SK.kmv_sketch(fa, "grp", "item").collect()]
    hb = [r.h for r in SK.kmv_sketch(fb, "grp", "item").collect()]
    merged = sorted(set(ha) | set(hb))[:SK.KMV_K]
    assert whole == merged


def test_kmv_intersection_exact_mode_degenerates(spark):
    # both sets smaller than k: theta = 1 and the estimate IS the
    # exact overlap by construction.
    rows = ([(i, f"2024-01-01 00:00:{i % 60:02d}", i, "click", 1.0)
             for i in range(40)]
            + [(100 + i, f"2024-01-01 01:00:{i % 60:02d}", i + 25,
                "purchase", 1.0) for i in range(40)])
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
                    "event_type", "value")
    row = SK.kmv_intersection(ev).collect()[0]
    # click users 0..39, purchase users 25..64 -> overlap 25..39 = 15
    assert row.true_overlap == 15
    assert row.est_overlap == 15.0
    assert row.n_sample == 15


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_classifies_null_transitions_as_update(spark):
    from cloud_native_mapreduce_spark.operators.relational import (
        snapshot_diff,
    )
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (3, 30.0, "C"),
         (4, 40.0, "D")],
        "k long, price double, status string")
    new = spark.createDataFrame(
        [(1, 10.0, "A"),        # unchanged
         (2, 20.0, "B"),        # NULL -> value must be UPDATE
         (3, None, "C"),        # value -> NULL must be UPDATE
         (5, 50.0, "E")],       # insert; key 4 deleted
        "k long, price double, status string")
    got = {r.change_type: r.n_keys
           for r in snapshot_diff(old, new, "k",
                                  ["price", "status"]).collect()}
    assert got == {"delete": 1, "insert": 1, "unchanged": 1,
                   "update": 2}


# ---------------------------------------------------------------------------
# Hilbert curve
# ---------------------------------------------------------------------------

def _xy2d_ref(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_inline_matches_reference_and_bijective(spark):
    from cloud_native_mapreduce_spark.operators.layout import (
        hilbert_value,
    )
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int")
    got = {(r.x, r.y): r.h
           for r in df.select("x", "y",
                              hilbert_value(F.col("x"), F.col("y"), 4)
                              .alias("h")).collect()}
    assert got == {(x, y): _xy2d_ref(16, x, y)
                   for x in range(16) for y in range(16)}
    assert sorted(got.values()) == list(range(256))


def test_hilbert_udf_matches_inline(spark):
    # exhaustive at order 4 (the unit-step test's order): both forms
    # loop the identical per-level transform, so equality at one order
    # proves the vectorized walk — order 6 only multiplied the inline
    # form's 4^bits Catalyst-analysis tree (141 s of the 50-minute
    # suite that timed out the round-14 driver gate) for no extra
    # algorithmic coverage
    from cloud_native_mapreduce_spark.operators.layout import (
        hilbert_value,
        hilbert_values_udf,
    )
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int")
    h = hilbert_values_udf(4)
    out = df.select(
        hilbert_value(F.col("x"), F.col("y"), 4).alias("a"),
        h(F.col("x"), F.col("y")).alias("b")).collect()
    assert all(r.a == r.b for r in out)


def test_hilbert_curve_is_unit_step(spark):
    # consecutive curve positions must be grid neighbors (|dx|+|dy|
    # = 1) — the no-jump property Morton lacks; checked exhaustively
    # at order 4 via the inline form.
    from cloud_native_mapreduce_spark.operators.layout import (
        hilbert_value,
    )
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int")
    pos = {r.h: (r.x, r.y)
           for r in df.select("x", "y",
                              hilbert_value(F.col("x"), F.col("y"), 4)
                              .alias("h")).collect()}
    for d in range(255):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


# ---------------------------------------------------------------------------
# daily ACF
# ---------------------------------------------------------------------------

def test_acf_matches_numpy_pearson(spark):
    # 14-day planted series with a strong period-2 alternation: ACF
    # must equal numpy's Pearson r over the (x_t, x_{t+k}) pairs,
    # negative at odd lags and positive at even lags.
    import numpy as np
    vals = [10.0, 50.0, 11.0, 52.0, 9.0, 49.0, 12.0,
            51.0, 10.5, 50.5, 11.5, 48.0, 9.5, 52.5]
    rows = [(i, f"2024-01-{i + 1:02d} 12:00:00", 1, "view", v)
            for i, v in enumerate(vals)]
    got = {r.lag: (r.n_pairs, r.acf)
           for r in __import__(
               "cloud_native_mapreduce_spark.operators.events",
               fromlist=["acf_daily"]).acf_daily(
                   _events(spark, rows), max_lag=3).collect()}
    cents = np.array([round(v * 100) for v in vals], dtype=float)
    for k in (1, 2, 3):
        x, y = cents[:-k], cents[k:]
        r = np.corrcoef(x, y)[0, 1]
        n, acf = got[k]
        assert n == len(vals) - k
        assert acf == pytest.approx(round(r, 6), abs=2e-6)
    assert got[1][1] < -0.9 < 0.9 < got[2][1]


def test_acf_skips_pairs_across_calendar_gaps(spark):
    # days 1,2,3,5,6 — lag-1 pairs are (1,2),(2,3),(5,6): the 3->5
    # hole must NOT pair (lead-over-rows would); lag-2 pairs are
    # (1,3) and a constant-variance guard case.
    rows = [(i, f"2024-01-{d:02d} 12:00:00", 1, "view", float(v))
            for i, (d, v) in enumerate(
                [(1, 10), (2, 20), (3, 10), (5, 20), (6, 10)])]
    got = {r.lag: r.n_pairs
           for r in __import__(
               "cloud_native_mapreduce_spark.operators.events",
               fromlist=["acf_daily"]).acf_daily(
                   _events(spark, rows), max_lag=2).collect()}
    assert got == {1: 3, 2: 2}


def test_acf_constant_series_yields_null_not_nan(spark):
    rows = [(i, f"2024-01-{i + 1:02d} 12:00:00", 1, "view", 7.0)
            for i in range(6)]
    out = __import__(
        "cloud_native_mapreduce_spark.operators.events",
        fromlist=["acf_daily"]).acf_daily(
            _events(spark, rows), max_lag=2).collect()
    assert all(r.acf is None for r in out)


# ---------------------------------------------------------------------------
# session concurrency (sweep-line)
# ---------------------------------------------------------------------------

def _conc(spark, rows, **kw):
    from cloud_native_mapreduce_spark.operators.events import (
        session_concurrency,
    )
    return {r.day: (r.n_starts, r.peak_concurrent)
            for r in session_concurrency(_events(spark, rows),
                                         **kw).collect()}


def test_concurrency_counts_overlap_and_single_event_sessions(spark):
    # user 1: 10:00-10:10; user 2: single event 10:05 (must count);
    # user 3: 11:00 (no overlap) -> peak 2, three sessions started.
    rows = [(1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 10:10:00", 1, "view", 1.0),
            (3, "2024-01-01 10:05:00", 2, "view", 1.0),
            (4, "2024-01-01 11:00:00", 3, "view", 1.0)]
    assert _conc(spark, rows) == {"2024-01-01": (3, 2)}


def test_concurrency_closed_interval_boundary_touch(spark):
    # A ends 12:00:00, B starts 12:00:00: closed intervals -> both
    # active at that instant, peak 2.
    rows = [(1, "2024-01-01 11:50:00", 1, "view", 1.0),
            (2, "2024-01-01 12:00:00", 1, "view", 1.0),
            (3, "2024-01-01 12:00:00", 2, "view", 1.0)]
    # user 1's two events are 10 min apart -> one session [11:50,12:00]
    assert _conc(spark, rows) == {"2024-01-01": (2, 2)}


def test_concurrency_gap_splits_sessions_at_threshold(spark):
    # exactly 30 minutes apart -> NEW session (merge is strict-<);
    # 29:59 apart -> same session.
    rows = [(1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 10:30:00", 1, "view", 1.0),
            (3, "2024-01-02 10:00:00", 2, "view", 1.0),
            (4, "2024-01-02 10:29:59", 2, "view", 1.0)]
    got = _conc(spark, rows)
    assert got["2024-01-01"] == (2, 1)   # split: 2 starts, never overlap
    assert got["2024-01-02"] == (1, 1)   # merged: 1 start


def test_concurrency_midnight_carry_in(spark):
    # user 1 session 23:50 - 00:10 (events 23:50, 00:05 next day,
    # 15 min gap < 30 -> one session spanning midnight); day 2 peak
    # must include the carried-over active session even though its
    # only day-2 boundary is the end.
    rows = [(1, "2024-01-01 23:50:00", 1, "view", 1.0),
            (2, "2024-01-02 00:05:00", 1, "view", 1.0),
            (3, "2024-01-02 12:00:00", 2, "view", 1.0)]
    got = _conc(spark, rows)
    assert got["2024-01-01"] == (1, 1)
    assert got["2024-01-02"] == (1, 1)
    # and with a second day-2 session DURING the carry (00:01):
    rows.append((4, "2024-01-02 00:01:00", 3, "view", 1.0))
    got = _conc(spark, rows)
    assert got["2024-01-02"] == (2, 2)   # carried + new overlap


# ---------------------------------------------------------------------------
# blocked spatial grid join
# ---------------------------------------------------------------------------

def _customers(spark, pts):
    # build (custkey, acctbal) so that x = cents mod 256, y = key
    # mod 256 land exactly on the requested coordinates.
    rows = [(256 * i + y, float(x) / 100.0)
            for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(
        rows, "c_custkey long, c_acctbal double")


def test_spatial_grid_join_matches_bruteforce_across_cells(spark):
    # points deliberately straddling cell boundaries (cell side = 4):
    # (3,3)-(4,4) are in different cells but distance 1 — the pair a
    # naive same-cell-only join would MISS.
    from cloud_native_mapreduce_spark.operators.spatial import (
        spatial_grid_join,
    )
    pts = [(3, 3), (4, 4), (0, 0), (7, 3), (8, 8), (100, 100),
           (104, 100), (105, 100), (3, 3)]
    got = {r.cheb_d: r.n_pairs
           for r in spatial_grid_join(_customers(spark, pts)).collect()}
    brute: dict = {}
    keys = [256 * i + y for i, (x, y) in enumerate(pts)]
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d = max(abs(pts[i][0] - pts[j][0]),
                    abs(pts[i][1] - pts[j][1]))
            if d <= 4 and keys[i] != keys[j]:
                brute[d] = brute.get(d, 0) + 1
    assert got == brute
    assert 0 in got            # the duplicate (3,3) pair
    assert got[1] >= 1         # the cross-cell (3,3)-(4,4) pair
    assert 4 in got            # exact-radius pair (100,·)-(104,·)
    assert 5 not in got        # (100,·)-(105,·) excluded


def test_spatial_grid_join_plan_is_keyed_not_cartesian(spark, sf_dir):
    from cloud_native_mapreduce_spark.plans import audit as PA
    from cloud_native_mapreduce_spark.registry import QUERIES
    import re
    a = PA.audit(QUERIES["spatial_grid_join"].builder(spark, sf_dir))
    assert "CartesianProduct" not in a.text
    # exactly one nested-loop join is allowed: the broadcast 9-row
    # offset fan-out; the cell join itself must be a keyed join.
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", a.text)
    assert len(nlj) <= 1, nlj
    assert (a.has_sort_merge_join or a.has_shuffled_hash_join
            or a.has_broadcast_hash_join)


# ---------------------------------------------------------------------------
# decayed popularity
# ---------------------------------------------------------------------------

def test_decayed_popularity_exact_dyadic_and_cutoff(spark):
    from cloud_native_mapreduce_spark.operators.events import (
        decayed_popularity,
    )
    # 'view': 2 events today + 1 yesterday + 1 two days ago
    #   -> 2*1 + 0.5 + 0.25 = 2.75 exactly (dyadic, no tolerance);
    # 'old': 1 event 41 days before ref -> outside the 40-day window,
    #   score NULL-sum -> None and n_in_window 0.
    rows = [(1, "2024-02-20 10:00:00", 1, "view", 1.0),
            (2, "2024-02-20 11:00:00", 1, "view", 1.0),
            (3, "2024-02-19 10:00:00", 2, "view", 1.0),
            (4, "2024-02-18 10:00:00", 2, "view", 1.0),
            (5, "2024-01-10 10:00:00", 3, "old", 1.0)]
    got = {r.event_type: (r.n_in_window, r.decayed_score)
           for r in decayed_popularity(_events(spark, rows)).collect()}
    assert got["view"] == (4, 2.75)
    assert got["old"] == (0, None)


# ---------------------------------------------------------------------------
# CMS self-join size (F2)
# ---------------------------------------------------------------------------

def test_cms_selfjoin_size_bounds_exact_f2(spark):
    from cloud_native_mapreduce_spark.operators.sketches import (
        cms_selfjoin_size,
    )
    # frequencies: key 1 x5, key 2 x3, key 3 x1 -> F2 = 25+9+1 = 35
    rows = [(k,) for k in [1] * 5 + [2] * 3 + [3]]
    df = spark.createDataFrame(rows, "l_partkey long")
    out = cms_selfjoin_size(df).collect()[0]
    assert out.true_f2 == 35
    # CMS inner product is an UPPER bound (collisions only add)
    assert out.est_f2 >= 35
    # 3 keys in a 256-cell row: no collision expected -> exact
    assert out.est_f2 == 35 and out.rel_err == 0.0


# ---------------------------------------------------------------------------
# CDC apply (latest-wins merge)
# ---------------------------------------------------------------------------

def test_cdc_apply_latest_wins_conflict_resolution(spark):
    from cloud_native_mapreduce_spark.operators.relational import (
        cdc_apply,
    )
    # keys: 1 untouched, 7 double-updated (seq3 wins: +200), 11
    # deleted, 13 noop itself but spawns an insert, 77 carries the
    # update(1)/delete(2)/update(3) conflict -> the seq-3 update must
    # win and the row SURVIVES at +200.
    part = spark.createDataFrame(
        [(k, 1.00) for k in (1, 7, 11, 13, 77)],
        "p_partkey long, p_retailprice double")
    out = cdc_apply(part).collect()[0]
    assert (out.n_inserts, out.n_updates, out.n_deletes) == (1, 2, 1)
    # finals: 100 (k1) + 300 (k7) + 100 (k13) + 300 (k77) + 1 (ins)
    assert out.n_rows_final == 5
    assert out.sum_cents_final == 801


# ---------------------------------------------------------------------------
# data-quality expectations
# ---------------------------------------------------------------------------

def test_dq_expectations_catches_each_planted_violation(spark):
    from cloud_native_mapreduce_spark.operators.advanced import (
        dq_expectations,
    )
    orders = spark.createDataFrame(
        [(1, 10, "O", 5.0, "1995-06-01"),
         (1, 10, "O", 5.0, "1995-06-01"),      # dup orderkey
         (2, 99, "O", 5.0, "1995-06-01"),      # dangling FK (99)
         (3, 10, "X", 5.0, "1995-06-01"),      # bad status
         (4, 10, "F", -1.0, "1995-06-01"),     # non-positive price
         (5, 10, "P", 5.0, "1985-01-01"),      # date out of bounds
         (6, None, "O", 5.0, "1995-06-01")],   # null custkey
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string") \
        .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice",
                    "CAST(o_orderdate AS TIMESTAMP) o_orderdate")
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    got = {r.rule: (r.n_checked, r.n_violations, r.passed)
           for r in dq_expectations(orders, customer).collect()}
    assert got["not_null(o_custkey)"] == (7, 1, False)
    assert got["unique(o_orderkey)"] == (7, 1, False)
    assert got["accepted_values(o_orderstatus)"] == (7, 1, False)
    assert got["range(o_totalprice>0)"] == (7, 1, False)
    assert got["date_bounds(o_orderdate)"] == (7, 1, False)
    assert got["fk(o_custkey->customer)"] == (6, 1, False)


# ---------------------------------------------------------------------------
# replica reconciliation
# ---------------------------------------------------------------------------

def test_replica_reconcile_localizes_planted_divergence(spark):
    from cloud_native_mapreduce_spark.operators.relational import (
        replica_reconcile,
    )
    # keys 1..500 (none % 97 or % 131 == 0 except 97*k, 131*k):
    # corruption lands in bucket 97%64=33 and 194%64=2 and 291%64=35
    # and 388%64=4 and 485%64=37; the missing rows in 131%64=3,
    # 262%64=6, 393%64=9; every other bucket must be ABSENT.
    orders = spark.createDataFrame(
        [(k, 10.00) for k in range(1, 501)],
        "o_orderkey long, o_totalprice double")
    got = {r.bucket: (r.n_a, r.n_b) for r in
           replica_reconcile(orders).collect()}
    corrupt = {(97 * i) % 64 for i in range(1, 6)}
    missing = {(131 * i) % 64 for i in range(1, 4)}
    assert set(got) == corrupt | missing
    for bkt in missing - corrupt:
        na, nb = got[bkt]
        assert na == nb + 1          # one lost row
    for bkt in corrupt - missing:
        na, nb = got[bkt]
        assert na == nb              # same count, digest differs


# ---------------------------------------------------------------------------
# Holt-Winters
# ---------------------------------------------------------------------------

def _hw(spark, days_vals, etype="view"):
    from cloud_native_mapreduce_spark.operators.events import (
        holt_winters_values,
    )
    rows = [(i, f"2024-{1 + d // 31:02d}-{1 + d % 31:02d} 12:00:00",
             1, etype, v) for i, (d, v) in enumerate(days_vals)]
    out = holt_winters_values(_events(spark, rows)).collect()
    return sorted(out, key=lambda r: r.day)


def test_holt_winters_tracks_linear_trend(spark):
    # y = 100 + 10*i (cents 10000 + 1000*i): trend must converge
    # toward 1000 cents/day and seasonal stay near 0... the zero-
    # seeded slots absorb early transients, so check the LAST row.
    out = _hw(spark, [(i, 100.0 + 10.0 * i) for i in range(28)])
    last = out[-1]
    assert abs(last.trend - 1000.0) < 80.0
    assert abs(last.level - (10000.0 + 1000.0 * 27)) < 2000.0


def test_holt_winters_learns_weekly_pattern(spark):
    # flat base 100 with a +50 spike every 7th day: after 4 cycles
    # the spike day's seasonal must be clearly positive and larger
    # than every non-spike day's seasonal in the final cycle.
    vals = [(i, 100.0 + (50.0 if i % 7 == 0 else 0.0))
            for i in range(28)]
    out = _hw(spark, vals)
    final_cycle = out[-7:]
    spike = [r for r in final_cycle
             if r.day.endswith(("-01", "-08", "-15", "-22", "-29"))]
    # day index 21 (i%7==0) is 2024-01-22
    s_spike = [r.seasonal for r in final_cycle if r.day == "2024-01-22"]
    others = [r.seasonal for r in final_cycle if r.day != "2024-01-22"]
    assert len(s_spike) == 1
    assert s_spike[0] > max(others) + 1000.0   # +50.0 = 5000 cents


def test_holt_winters_base_row_is_pinned(spark):
    out = _hw(spark, [(0, 7.0), (1, 8.0)])
    assert (out[0].level, out[0].trend, out[0].seasonal) == (700.0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# Pareto frontier (skyline)
# ---------------------------------------------------------------------------

def test_pareto_frontier_hand_built(spark):
    from cloud_native_mapreduce_spark.operators.advanced import (
        pareto_frontier,
    )
    # (size, price): frontier is (1, 5.00) and (3, 2.00) and (7, 1.00);
    # (2, 6.00) dominated by (1, 5.00); (3, 9.00) collapses to the
    # per-size min 2.00; equal-price larger size (5, 2.00) dominated
    # by (3, 2.00); duplicate point (7, 1.00) handled by the min.
    part = spark.createDataFrame(
        [(1, 5.00), (2, 6.00), (3, 9.00), (3, 2.00), (5, 2.00),
         (7, 1.00), (7, 1.00)],
        "p_size int, p_retailprice double")
    got = [(r.size, r.min_cents)
           for r in pareto_frontier(part).collect()]
    assert got == [(1, 500), (3, 200), (7, 100)]


# ---------------------------------------------------------------------------
# incremental join-view maintenance
# ---------------------------------------------------------------------------

def test_ivm_join_delta_three_terms_reconstruct_full_view(spark):
    from cloud_native_mapreduce_spark.operators.relational import (
        ivm_join_delta,
    )
    # customers: 13 is a NEW customer (key%13==0); orders: 101 and
    # 202 are NEW orders. Cross cases: new order -> old customer
    # (d1), old order -> new customer (d2), new order -> new
    # customer (d3) must each be counted exactly once.
    customer = spark.createDataFrame(
        [(1, 0), (13, 1), (2, 0)],
        "c_custkey long, c_nationkey long")
    orders = spark.createDataFrame(
        [(5, 1, 10.0),        # old order, old cust -> base
         (101, 1, 20.0),      # new order, old cust -> d1
         (6, 13, 30.0),       # old order, new cust -> d2
         (202, 13, 40.0),     # new order, new cust -> d3
         (7, 2, 50.0)],       # old order, old cust -> base
        "o_orderkey long, o_custkey long, o_totalprice double")
    got = {r.nation: r for r in
           ivm_join_delta(orders, customer).collect()}
    assert (got[0].n_base, got[0].n_delta, got[0].n_total,
            got[0].n_full) == (2, 1, 3, 3)
    assert (got[1].n_base, got[1].n_delta, got[1].n_total,
            got[1].n_full) == (0, 2, 2, 2)
    for r in got.values():
        assert r.n_total == r.n_full
        assert r.cents_total == r.cents_full


# ---------------------------------------------------------------------------
# OLS normal equations
# ---------------------------------------------------------------------------

def test_ols_recovers_exact_planted_coefficients(spark):
    from cloud_native_mapreduce_spark.operators.advanced import (
        ols_normal_equations,
    )
    # plant y = 500 + 30*q + 2*d (cents) exactly: betas must come
    # back exact (6dp) and r2 == 1.
    rows = []
    for q in range(1, 9):
        for d in (0, 5, 10):
            y_cents = 500 + 30 * q + 2 * d
            rows.append((float(q), d / 100.0, y_cents / 100.0))
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, "
              "l_extendedprice double")
    out = ols_normal_equations(df).collect()[0]
    assert out.n_rows == 24
    assert (out.beta0, out.beta1, out.beta2) == (500.0, 30.0, 2.0)
    assert out.r2 == 1.0


def test_ols_degenerate_design_yields_null(spark):
    from cloud_native_mapreduce_spark.operators.advanced import (
        ols_normal_equations,
    )
    # constant quantity AND discount -> singular normal matrix.
    df = spark.createDataFrame(
        [(2.0, 0.05, 10.0)] * 5,
        "l_quantity double, l_discount double, "
        "l_extendedprice double")
    out = ols_normal_equations(df).collect()[0]
    assert out.beta0 is None and out.r2 is None


# ---------------------------------------------------------------------------
# one-way ANOVA
# ---------------------------------------------------------------------------

def test_anova_matches_scipy_style_reference(spark):
    from cloud_native_mapreduce_spark.operators.events import (
        anova_oneway,
    )
    # three groups with clearly different means; F computed by an
    # independent python reference over the same cents.
    groups = {"a": [1.00, 1.10, 0.90, 1.05],
              "b": [2.00, 2.20, 1.80],
              "c": [1.00, 1.00, 1.00, 1.00, 1.00]}
    rows, i = [], 0
    for g, vals in groups.items():
        for v in vals:
            rows.append((i, f"2024-01-01 10:{i:02d}:00", 1, g, v))
            i += 1
    out = {r.event_type: r
           for r in anova_oneway(_events(spark, rows)).collect()}

    cents = {g: [round(v * 100) for v in vs]
             for g, vs in groups.items()}
    all_v = [v for vs in cents.values() for v in vs]
    n, k = len(all_v), len(cents)
    grand = sum(all_v) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2
              for vs in cents.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2
              for vs in cents.values() for v in vs)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    got = out["a"]
    assert got.n_groups == 3
    assert got.f_stat == pytest.approx(f_ref, rel=1e-4)
    assert out["b"].mean_cents == pytest.approx(200.0, abs=0.01)
    # all rows carry the same corpus-wide F
    assert len({r.f_stat for r in out.values()}) == 1


def test_anova_identical_groups_f_near_zero(spark):
    from cloud_native_mapreduce_spark.operators.events import (
        anova_oneway,
    )
    rows = [(i, f"2024-01-01 10:{i:02d}:00", 1, "ab"[i % 2],
             [1.0, 2.0][i // 2 % 2]) for i in range(8)]
    out = anova_oneway(_events(spark, rows)).collect()
    assert all(abs(r.f_stat) < 1e-6 for r in out)


# ---------------------------------------------------------------------------
# point-in-polygon geofence
# ---------------------------------------------------------------------------

def _pip_ref(px, py, poly):
    # independent float ray-caster (matplotlib-style even-odd) with
    # an explicit on-segment check — different formulation from the
    # operator's integer cross-product expression.
    n = len(poly)
    on = False
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        if (cross == 0 and min(x1, x2) <= px <= max(x1, x2)
                and min(y1, y2) <= py <= max(y1, y2)):
            on = True
    if on:
        return "boundary"
    inside = False
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return "inside" if inside else "outside"


def test_point_in_polygon_matches_float_raycaster_on_grid(spark):
    from cloud_native_mapreduce_spark.operators.spatial import (
        GEOFENCE,
        point_in_polygon,
    )
    # coarse exhaustive sweep of the plane (step 7 hits edges at
    # y=32/128 and x=32/128 via multiples of 7? no — add explicit
    # on-edge points), plus notch and vertex probes.
    pts = [(x, y) for x in range(0, 256, 7) for y in range(0, 256, 7)]
    pts += [(100, 32), (224, 100), (150, 128), (128, 200),  # edges
            (32, 32), (128, 128),                           # vertices
            (96, 200), (96, 161), (64, 210)]                # notch area
    rows = [(256 * i + y, x / 100.0) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows,
                               "c_custkey long, c_acctbal double")
    got = {r.region: r.n_points
           for r in point_in_polygon(df).collect()}
    from collections import Counter
    want = Counter(_pip_ref(x, y, GEOFENCE) for x, y in pts)
    assert got == dict(want)
    assert all(k in got for k in ("inside", "outside", "boundary"))


# ---------------------------------------------------------------------------
# fixed-width representability guard
# ---------------------------------------------------------------------------

def test_fixed_width_rejects_unrepresentable_values(spark, tmp_path):
    # a priority with a trailing space would round-trip to a
    # DIFFERENT string under trim; the encoder must refuse loudly
    # rather than write a silently-corrupting file. (Spark lpad/rpad
    # truncate overlong values in place, so this cannot be caught by
    # a record-length check.)
    import pytest as _pytest
    from cloud_native_mapreduce_spark.sources.formats import (
        fixed_width_ingest,
    )
    bad = spark.createDataFrame(
        [(1, 10, "O", 5.0, "1995-06-01 00:00:00", "1-URGENT ")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, "
        "o_orderpriority string") \
        .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice",
                    "CAST(o_orderdate AS TIMESTAMP) o_orderdate",
                    "o_orderpriority")
    d = str(tmp_path / "orders.parquet")
    bad.write.parquet(d)
    with _pytest.raises(ValueError, match="does not fit"):
        fixed_width_ingest(spark, str(tmp_path))


def test_seasonal_decompose_identity_and_gap_guard(spark):
    """Two pins on the classical decomposition: (1) the additive
    identity obs = trend + seasonal + residual holds on every output
    row (up to the independent 2dp/4dp roundings); (2) a calendar gap
    TRUNCATES output — every day whose centered 7-day window crosses
    the hole (or the series edge) is dropped, never averaged over
    fewer days."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import (
        seasonal_decompose)

    base = datetime.datetime(2024, 3, 4)  # a Monday
    rows = []
    eid = 0
    for d in range(20):
        if d == 9:
            continue  # calendar hole
        day = base + datetime.timedelta(days=d)
        rows.append((eid, day, 1, "click", 100.0 + 7.0 * (d % 7) + d))
        eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = seasonal_decompose(events).collect()
    got_days = sorted(r.day for r in out)
    # days 0..2 and 17..19 fall off the edge; days 6..12 cross the hole
    want = sorted((base + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
                  for d in [3, 4, 5, 13, 14, 15, 16])
    assert got_days == want
    for r in out:
        assert abs(r.obs - (r.trend + r.seasonal + r.residual)) < 6e-3, r


def test_bitmap_retention_hand_graph(spark):
    """Hand-built activity: u1 active weeks {0,1}, u2 weeks {0,1},
    u3 week {2} only, u4's day-70 event is outside the 63-day word
    and must be DROPPED (u4 keeps a week-0 bit only)."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import (
        bitmap_retention)

    base = datetime.datetime(2024, 1, 1)
    acts = [(1, 0), (1, 8),           # weeks 0 and 1
            (2, 0), (2, 1), (2, 7),   # weeks 0 and 1
            (3, 20),                  # week 2 only
            (4, 0), (4, 70)]          # week 0; day 70 dropped
    rows = [(i, base + datetime.timedelta(days=d), u, "click", 1.0)
            for i, (u, d) in enumerate(acts)]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = {r.week: (r.n_active, r.n_retained_next)
           for r in bitmap_retention(events).collect()}
    assert got[0] == (3, 2)   # u1,u2,u4 active; u1,u2 retained
    assert got[1] == (2, 0)   # u1,u2; none active week 2
    assert got[2] == (1, 0)   # u3
    assert set(got) == {0, 1, 2}


def test_burst_detect_labels_planted_burst(spark):
    """A planted 5-day 10x spike inside a flat series must come out
    labelled as a burst interval; a flat series must stay all-quiet
    (the ln(T+1) entry cost suppresses state flapping)."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import burst_detect

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for d in range(25):
        n = 10 if 10 <= d < 15 else 1
        for j in range(n):
            rows.append((eid, base + datetime.timedelta(days=d,
                                                        minutes=j),
                         j, "spiky", 1.0))
            eid += 1
        rows.append((eid, base + datetime.timedelta(days=d), 0,
                     "flat", 1.0))
        eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = {r.event_type: r for r in burst_detect(events).collect()}
    assert got["flat"].burst_path == "0" * 25
    assert got["spiky"].n_days == 25
    spiky = got["spiky"].burst_path
    assert spiky[10:15] == "11111"
    assert got["spiky"].n_burst_days == spiky.count("1") <= 7


def test_rolling_median_ignores_planted_spike(spark):
    """A single 100x ingest-spike day must leave the neighboring
    days' rolling MEDIAN untouched (the robustness the MA trend
    lacks), and each median must equal numpy's on the same window."""
    import datetime
    import statistics

    from cloud_native_mapreduce_spark.operators.events import (
        rolling_median_daily)

    base = datetime.datetime(2024, 2, 5)
    vals = [10.0] * 15
    vals[7] = 1000.0  # the spike
    rows = [(i, base + datetime.timedelta(days=i), 1, "t", v)
            for i, v in enumerate(vals)]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = {r.day: r.rolling_median
           for r in rolling_median_daily(events).collect()}
    assert len(got) == 15 - 6
    for i in range(3, 12):
        day = (base + datetime.timedelta(days=i)).strftime("%Y-%m-%d")
        assert got[day] == statistics.median(vals[i - 3:i + 4])
    # every full window containing the spike still reports 10.0
    assert set(got.values()) == {10.0}


def test_tfidf_cosine_extremes(spark):
    """Identical docs (after the df band) must score cosine 1.0;
    docs sharing no bandable term must produce no pair."""
    from cloud_native_mapreduce_spark.operators.retrieval import (
        tfidf_cosine_pairs)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma delta"),
         (3, "epsilon zeta eta theta"),      # theta df=1 -> banded out
         (4, "epsilon zeta eta psi"),
         (5, "omega psi chi phi")],          # only psi survives the band
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.cosine
           for r in tfidf_cosine_pairs(docs).collect()}
    assert got[(1, 2)] == 1.0
    # 3 of doc4's 4 surviving terms overlap doc3: 3/(sqrt(3)*2)
    assert (3, 4) in got and 0.86 <= got[(3, 4)] <= 0.87
    # doc5 shares exactly psi with doc4: w^2/(w*2w) = 0.5, boundary-in
    assert got[(4, 5)] == 0.5
    assert not any((a in (1, 2)) != (b in (1, 2)) for a, b in got)


def test_tfidf_absolute_df_cap_drops_hot_terms_pre_join(
        spark, monkeypatch):
    """Scale pin for the round-11 verdict's one `weak`: a term whose
    df exceeds TFIDF_MAX_DF must be dropped BEFORE the posting
    self-join even when it passes the relative df*2<=N band — pairs
    whose only shared term is the hot one must vanish, pairs with
    other shared terms keep scoring (without the hot term's weight)."""
    from cloud_native_mapreduce_spark.operators import retrieval

    monkeypatch.setattr(retrieval, "TFIDF_MAX_DF", 3)
    # "hot" df=4 <= N/2=5: passes the relative band, exceeds the cap.
    # "warm" df=2: in band and under cap.
    docs = spark.createDataFrame(
        [(1, "hot warm alpha beta"),
         (2, "hot warm gamma delta"),
         (3, "hot epsilon zeta eta"),
         (4, "hot theta iota kappa"),
         (5, "lam mu nu xi"),
         (6, "lam omicron pi rho"),
         (7, "filler one two three"),
         (8, "filler four five six"),
         (9, "pad seven eight nine"),
         (10, "pad ten eleven twelve")],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.cosine
           for r in retrieval.tfidf_cosine_pairs(docs).collect()}
    # (1,2) share hot+warm -> survives via warm alone at cosine 1.0
    # (each doc's sole surviving term)
    assert got.get((1, 2)) == 1.0
    # (3,4), (1,3), (2,4)... share ONLY the capped hot term -> no pair
    assert not any({a, b} <= {1, 2, 3, 4} and (a, b) != (1, 2)
                   for a, b in got)
    # sanity: an under-cap shared term still pairs
    assert got.get((5, 6)) == 1.0


def test_sax_word_matches_python_model(spark):
    """The SAX word must equal a from-scratch Python SAX (z-norm →
    PAA → Gaussian-quartile alphabet) on a hand series with segments
    landing in all four letters."""
    import datetime
    import math

    from cloud_native_mapreduce_spark.operators.events import sax_daily

    base = datetime.datetime(2024, 1, 1)
    series = [10, 10, 10, 10, 10,      # low
              50, 50, 50, 50, 50,      # high
              30, 30, 30, 30, 30,      # middle
              12, 12, 12, 12, 12]      # low-ish
    rows = [(i, base + datetime.timedelta(days=i), 1, "t", float(v))
            for i, v in enumerate(series)]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = sax_daily(events).collect()[0]

    cents = [v * 100 for v in series]
    n = len(cents)
    mean = sum(cents) / n
    std = math.sqrt(sum(c * c for c in cents) / n - mean * mean)
    word = ""
    for k in range(0, n, 5):
        seg = cents[k:k + 5]
        z = (sum(seg) / len(seg) - mean) / std
        word += ("a" if z < -0.6745 else "b" if z < 0.0
                 else "c" if z < 0.6745 else "d")
    assert got.sax_word == word
    assert got.n_segments == 4
    assert len(set(word)) >= 3  # the fixture spreads across letters


def test_dtw_matches_reference_and_tolerates_shift(spark):
    """DTW must equal a textbook O(n·m) reference implementation on
    hand series; identical series give 0; a phase-shifted copy of a
    spike scores far below the aligned-Euclidean cost."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import (
        dtw_daily_pairs)

    base = datetime.datetime(2024, 1, 1)
    series = {"s_base":  [1, 1, 9, 1, 1, 1],
              "s_shift": [1, 1, 1, 9, 1, 1],
              "s_same":  [1, 1, 9, 1, 1, 1]}
    rows, eid = [], 0
    for t, vs in series.items():
        for d, v in enumerate(vs):
            rows.append((eid, base + datetime.timedelta(days=d), 1, t,
                         float(v)))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = {(r.t1, r.t2): r.dtw_cents
           for r in dtw_daily_pairs(events).collect()}

    def ref_dtw(a, b):
        import math
        n, m = len(a), len(b)
        d = [[math.inf] * (m + 1) for _ in range(n + 1)]
        d[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                d[i][j] = (abs(a[i - 1] - b[j - 1])
                           + min(d[i - 1][j], d[i][j - 1],
                                 d[i - 1][j - 1]))
        return d[n][m]

    cents = {t: [v * 100 for v in vs] for t, vs in series.items()}
    for (t1, t2), dist in got.items():
        assert dist == ref_dtw(cents[t1], cents[t2]), (t1, t2)
    assert got[("s_base", "s_same")] == 0
    eucl = sum(abs(x - y) for x, y in
               zip(cents["s_base"], cents["s_shift"]))
    assert got[("s_base", "s_shift")] < eucl / 2


def test_theil_sen_and_mad_resist_planted_outliers(spark):
    """A clean slope-2 series with two wild outlier days: Theil-Sen
    must still report slope 2.0 and MAD must stay at the clean
    series' scale, while the outliers would wreck OLS/stddev."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import (
        mad_daily,
        theil_sen_trend,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(15):
        v = 100.0 + 2.0 * d
        if d in (5, 11):
            v = 10000.0  # contamination
        rows.append((d, base + datetime.timedelta(days=d), 1, "t", v))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    ts = theil_sen_trend(events).collect()[0]
    assert ts.slope_dollars_per_day == 2.0
    mad = mad_daily(events).collect()[0]
    # clean medians: median value ~ the middle clean day; MAD is the
    # middle absolute deviation of the clean ramp (a few dollars),
    # far below the 9000-dollar outlier deviations
    assert mad.mad_revenue < 50


def test_cms_heavy_change_upper_bounds_and_finds_mover(spark, sf_dir):
    """Each half's estimate must upper-bound its true count (CMS
    collisions only ADD), and at sf0.001 the reported top movers'
    estimated change must agree in SIGN with the true change
    wherever the true change is larger than the possible collision
    noise of both halves combined."""
    from cloud_native_mapreduce_spark.operators.sketches import (
        cms_heavy_change)
    from cloud_native_mapreduce_spark.sources.tables import load_table

    rows = cms_heavy_change(load_table(spark, sf_dir, "orders"),
                            load_table(spark, sf_dir, "lineitem")).collect()
    assert rows
    for r in rows:
        assert r.est_a >= r.true_a
        assert r.est_b >= r.true_b
        noise = (r.est_a - r.true_a) + (r.est_b - r.true_b)
        true_change = r.true_b - r.true_a
        if abs(true_change) > noise:
            assert (r.est_change > 0) == (true_change > 0)


def test_robust_anomaly_flags_only_planted_day(spark):
    """A flat series with one 100x day: at the classic 3.5 threshold
    exactly the planted day is flagged — the stddev-based detector's
    masking failure mode cannot happen because median/MAD ignore the
    outlier's own magnitude."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import (
        robust_anomaly_days)

    base = datetime.datetime(2024, 1, 1)
    rows = [(d, base + datetime.timedelta(days=d), 1, "t",
             1000.0 if d == 7 else 10.0 + (d % 3) * 0.5)
            for d in range(15)]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = robust_anomaly_days(events, z10=35).collect()
    assert [r.day for r in got] == ["2024-01-08"]
    assert got[0].modified_z > 100
