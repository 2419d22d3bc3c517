"""Dedicated value + plan tests for the nine round-11 late-wave
operators that shipped with registry-oracle coverage only (round-11
verdict "What's missing" #2): conversion_lag_quantiles,
eb_shrunk_rates, encoding_advisor, erasure_cascade_audit,
holdout_bigram_logprob, join_skew_profile, l_diversity_audit,
ltv_cohort_curves, psi_drift. Each gets a hand-computable synthetic
value check; the plan pins (CartesianProduct ban + bounded broadcast
fan-out) run against the registry builders at sf0.001.
"""

from __future__ import annotations

import datetime
import math
import re

import pytest
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.plans import audit as PA
from cloud_native_mapreduce_spark.registry import QUERIES

TS = datetime.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


# ---------------------------------------------------------------------------
# conversion_lag_quantiles
# ---------------------------------------------------------------------------

def test_conversion_lag_quantiles_hand_case(spark):
    """Lags {0, 2, 5} days over 3 converters; exact ceil(q·n) order
    statistics; non-converters and purchase-before-signup excluded."""
    from cloud_native_mapreduce_spark.operators.events import (
        conversion_lag_quantiles)
    rows = [
        (1, TS(1995, 1, 1), 1, "signup", 0.0),
        (2, TS(1995, 1, 3), 1, "purchase", 1.0),     # lag 2
        (3, TS(1995, 1, 9), 1, "purchase", 1.0),     # later buy ignored
        (4, TS(1995, 1, 1), 2, "signup", 0.0),
        (5, TS(1995, 1, 6), 2, "purchase", 1.0),     # lag 5
        (6, TS(1995, 1, 1), 3, "signup", 0.0),
        (7, TS(1995, 1, 1, 12), 3, "purchase", 1.0),  # floor(.5) = 0
        (8, TS(1995, 1, 1), 4, "signup", 0.0),        # never converts
        (9, TS(1995, 1, 1), 5, "purchase", 1.0),      # buys BEFORE
        (10, TS(1995, 1, 2), 5, "signup", 0.0),       # signup: excluded
    ]
    got = {r.q_label: (r.n_converted, r.lag_days)
           for r in conversion_lag_quantiles(_events(spark, rows))
           .collect()}
    # n=3: rank(p25)=ceil(.75)=1, p50=2, p75=ceil(2.25)=3, p90=3
    assert got == {"p25": (3, 0), "p50": (3, 2),
                   "p75": (3, 5), "p90": (3, 5)}


# ---------------------------------------------------------------------------
# eb_shrunk_rates
# ---------------------------------------------------------------------------

def test_eb_shrunk_rates_matches_python_model(spark):
    """Exact replication of the method-of-moments Beta shrinkage over
    integer-scaled rates; small-n extremes pulled toward the prior
    mean harder than large-n evidence."""
    from cloud_native_mapreduce_spark.operators.stats import (
        eb_shrunk_rates)
    parts = {1: (300, 120), 2: (3, 2), 3: (100, 10), 4: (50, 0)}
    rows = [(p, "R" if i < x else "N")
            for p, (n, x) in parts.items() for i in range(n)]
    li = spark.createDataFrame(rows, "l_partkey long, l_returnflag string")
    got = {r.part: r for r in eb_shrunk_rates(li).collect()}

    rs = {p: (x * 1_000_000) // n for p, (n, x) in parts.items()}
    k = len(parts)
    s1, s2 = sum(rs.values()), sum(v * v for v in rs.values())
    m = s1 / k / 1e6
    v = s2 / k / 1e12 - m * m
    c = m * (1 - m) / v - 1
    a, b = m * c, (1 - m) * c
    for p, (n, x) in parts.items():
        exp = (a + x) / (a + b + n)
        assert got[p].n == n and got[p].x == x
        assert got[p].raw_rate == pytest.approx(x / n, abs=2e-6)
        assert got[p].shrunk_rate == pytest.approx(exp, abs=2e-6)
    # the shrinkage property: 3 observations move much farther toward
    # the prior mean than 300 do (which barely move at all)
    prior_mean = a / (a + b)
    pull2 = got[2].raw_rate - got[2].shrunk_rate     # toward the mean
    pull1 = got[1].raw_rate - got[1].shrunk_rate
    assert got[2].raw_rate > prior_mean > 0
    assert pull2 > 10 * abs(pull1) > 0


# ---------------------------------------------------------------------------
# encoding_advisor
# ---------------------------------------------------------------------------

def test_encoding_advisor_recommendations(spark):
    """RLE_DICT for tiny domains, DICT for <=5% distinct ratio past 64
    values, PLAIN for near-unique columns — integer basis points."""
    from cloud_native_mapreduce_spark.sources.formats import (
        encoding_advisor)
    n = 2000
    rows = [(float(i % 65), float(i), i, "1995-01-01",
             "R" if i % 2 else "N", "O") for i in range(n)]
    li = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, "
              "l_partkey long, l_shipdate string, "
              "l_returnflag string, l_linestatus string")
    got = {r.column_name: r for r in encoding_advisor(li).collect()}
    assert got["l_returnflag"].recommendation == "RLE_DICT"
    assert got["l_linestatus"].recommendation == "RLE_DICT"
    assert got["l_shipdate"].recommendation == "RLE_DICT"
    assert got["l_quantity"].recommendation == "DICT"
    assert got["l_quantity"].n_distinct == 65
    assert got["l_quantity"].distinct_bp == (65 * 10000) // n
    assert got["l_extendedprice"].recommendation == "PLAIN"
    assert got["l_partkey"].recommendation == "PLAIN"
    assert got["l_partkey"].distinct_bp == 10000
    assert got["l_returnflag"].top1_bp == 5000


# ---------------------------------------------------------------------------
# erasure_cascade_audit
# ---------------------------------------------------------------------------

def test_erasure_cascade_audit_counts(spark):
    """FK cascade row counts: customer(%97) -> orders -> lineitem,
    plus events keyed by user id."""
    from cloud_native_mapreduce_spark.operators.governance import (
        erasure_cascade_audit)
    customer = spark.createDataFrame(
        [(i,) for i in range(1, 201)], "c_custkey long")
    orders = spark.createDataFrame(
        [(901, 97), (902, 97), (903, 194), (904, 5), (905, 5)],
        "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        [(901,), (901,), (903,), (904,), (904,), (904,)],
        "l_orderkey long")
    events = _events(spark, [
        (1, TS(1995, 1, 1), 97, "click", 0.0),
        (2, TS(1995, 1, 1), 97, "click", 0.0),
        (3, TS(1995, 1, 2), 97, "buy", 1.0),
        (4, TS(1995, 1, 1), 1, "click", 0.0),
        (5, TS(1995, 1, 1), 2, "click", 0.0),
    ])
    got = {r.table_name: r for r in erasure_cascade_audit(
        customer, orders, lineitem, events).collect()}
    assert (got["customer"].n_affected, got["customer"].n_total,
            got["customer"].affected_pct) == (2, 200, 1.0)
    assert (got["orders"].n_affected, got["orders"].n_total,
            got["orders"].affected_pct) == (3, 5, 60.0)
    assert (got["lineitem"].n_affected, got["lineitem"].n_total,
            got["lineitem"].affected_pct) == (3, 6, 50.0)
    assert (got["events"].n_affected, got["events"].n_total,
            got["events"].affected_pct) == (3, 5, 60.0)


# ---------------------------------------------------------------------------
# holdout_bigram_logprob
# ---------------------------------------------------------------------------

def test_holdout_bigram_logprob_hand_model(spark):
    """Fold-0 docs scored under the other folds' add-one bigram model;
    unseen bigram in a seen context falls out of COALESCE as
    1/(cctx+V)."""
    from cloud_native_mapreduce_spark.operators.curation import (
        holdout_bigram_logprob)
    docs = spark.createDataFrame(
        [(0, "a b c"), (5, "a a"),                  # fold 0: held out
         (1, "a b"), (2, "b c"), (3, "a b c"), (4, "c a")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in holdout_bigram_logprob(docs).collect()}
    # train: cbg = {a b: 2, b c: 2, c a: 1}; cctx = {a:2, b:2, c:1}; V=3
    assert got[0].n_bigrams == 2
    assert got[0].holdout_logprob == pytest.approx(
        round(math.log((2 + 1) / (2 + 3)), 4), abs=1e-9)
    assert got[5].n_bigrams == 1  # "a a": unseen bigram, seen context
    assert got[5].holdout_logprob == pytest.approx(
        round(math.log((0 + 1) / (2 + 3)), 4), abs=1e-9)
    assert set(got) == {0, 5}  # train folds never scored


# ---------------------------------------------------------------------------
# join_skew_profile
# ---------------------------------------------------------------------------

def test_join_skew_profile_integer_stats(spark):
    """Hot-key profile: share in basis points, max/avg straggler x100,
    ceil salt-bucket recommendation — all integer DIV arithmetic."""
    from cloud_native_mapreduce_spark.operators.skew import (
        join_skew_profile)
    rows, eid = [], 0
    for key, cnt in [(1, 50), (2, 10)] + [(k, 1) for k in range(3, 13)]:
        for _ in range(cnt):
            rows.append((eid, TS(1995, 1, 1), key, "click", 0.0))
            eid += 1
    out = join_skew_profile(_events(spark, rows)).collect()
    assert len(out) == 10  # top-10 cut of 12 keys
    top = out[0]
    # total=70, n_keys=12, max=50
    assert (top.key, top.n_rows) == (1, 50)
    assert top.share_bp == (50 * 10000) // 70
    assert top.n_keys == 12
    assert top.straggler_x100 == (50 * 100 * 12) // 70
    assert top.salt_buckets == math.ceil(50 * 32 / 70)
    assert (out[1].key, out[1].n_rows) == (2, 10)
    assert out[2].n_rows == 1 and out[2].key == 3  # key tiebreak


# ---------------------------------------------------------------------------
# l_diversity_audit
# ---------------------------------------------------------------------------

def test_l_diversity_audit_hand_groups(spark):
    """Three QI groups with 1/2/3 distinct sensitive values: distinct
    l-diversity counts and the recursive (c,l) r1 >= c·tail test."""
    from cloud_native_mapreduce_spark.operators.governance import (
        l_diversity_audit)
    rows = ([(0, 0.0, "A")] * 4                      # 1 distinct seg
            + [(1, 0.0, "A"), (1, 0.0, "A"), (1, 0.0, "B")]   # 2
            + [(2, 0.0, s) for s in "ABCABC"])       # 3 distinct
    customer = spark.createDataFrame(
        rows, "c_nationkey int, c_acctbal double, c_mktsegment string")
    got = {r.l: r for r in l_diversity_audit(customer).collect()}
    assert got[2].n_groups == 3 and got[3].n_groups == 3
    # l=2: only the homogeneous group fails distinct; recursive fails
    # there too (r1=4 >= 3*0)
    assert got[2].n_distinct_violating == 1
    assert got[2].n_at_risk_records == 4
    assert got[2].n_recursive_violating == 1
    # l=3: groups with 1 and 2 distinct both fail; recursive fails for
    # both (tail past rank 3 is empty => r1 >= 0)
    assert got[3].n_distinct_violating == 2
    assert got[3].n_at_risk_records == 7
    assert got[3].n_recursive_violating == 2


# ---------------------------------------------------------------------------
# ltv_cohort_curves
# ---------------------------------------------------------------------------

def test_ltv_cohort_curves_hand_cohort(spark):
    """One Monday-anchored epoch-week cohort of 2 users: cumulative
    revenue and revenue-per-user by age."""
    from cloud_native_mapreduce_spark.operators.events import (
        ltv_cohort_curves)
    rows = [
        (1, TS(1970, 1, 5), 1, "purchase", 10.00),   # wk 0 (Monday)
        (2, TS(1970, 1, 12), 1, "purchase", 5.00),   # wk 1
        (3, TS(1970, 1, 6), 2, "purchase", 2.00),    # wk 0
    ]
    got = {(r.cohort_week, r.age_weeks): r
           for r in ltv_cohort_curves(_events(spark, rows)).collect()}
    assert set(got) == {(0, 0), (0, 1)}
    assert got[(0, 0)].n_users == 2
    assert got[(0, 0)].cum_revenue == 12.0
    assert got[(0, 0)].revenue_per_user == 6.0
    assert got[(0, 1)].cum_revenue == 17.0
    assert got[(0, 1)].revenue_per_user == 8.5


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------

def test_psi_drift_zero_on_identical_halves(spark):
    """Identical bucket distributions in both date halves => every
    contribution is exactly 0 and psi = 0."""
    from cloud_native_mapreduce_spark.operators.stats import psi_drift
    prices = [10_000.0, 60_000.0, 110_000.0]  # buckets 0, 1, 2
    rows = [(i, d, p)
            for i, (d, p) in enumerate(
                [(d, p) for d in ("1995-01-01", "1995-01-02")
                 for p in prices]
                + [(d, p) for d in ("1995-01-03", "1995-01-04")
                   for p in prices])]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double")
    out = psi_drift(orders).collect()
    assert {r.bucket for r in out} == {0, 1, 2}
    for r in out:
        assert (r.n_ref, r.n_cur) == (2, 2)
        assert r.p_ref == r.p_cur
        assert r.contribution == 0.0
        assert r.psi == 0.0


def test_psi_drift_positive_on_shift(spark):
    """All mass moving buckets => large positive PSI, identical on
    every row."""
    from cloud_native_mapreduce_spark.operators.stats import psi_drift
    rows = ([(i, "1995-01-01", 10_000.0) for i in range(40)]
            + [(100 + i, "1995-01-04", 110_000.0) for i in range(40)])
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double")
    out = psi_drift(orders).collect()
    psis = {r.psi for r in out}
    assert len(psis) == 1 and psis.pop() > 0.25  # "action" territory


# ---------------------------------------------------------------------------
# plan pins: registry builders at sf0.001
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,max_bnlj", [
    ("conversion_lag_quantiles", 3),  # quantile-frame + threshold fans
    ("eb_shrunk_rates", 1),           # broadcast 1-row moment frame
    ("encoding_advisor", 0),
    ("erasure_cascade_audit", 4),     # one 1-row total per level
    ("holdout_bigram_logprob", 1),    # broadcast V
    ("join_skew_profile", 1),         # broadcast 1-row profile
    ("l_diversity_audit", 1),         # broadcast |L_LEVELS| fan-out
    ("ltv_cohort_curves", 0),         # keyed triangular join only
    ("psi_drift", 3),                 # bounds/totals 1-row frames
])
def test_late_wave_plans_never_cartesian(spark, sf_dir, name, max_bnlj):
    """No CartesianProduct anywhere; BroadcastNestedLoopJoin only for
    the intended bounded 1-row/constant-frame fan-outs, counted."""
    a = PA.audit(QUERIES[name].builder(spark, sf_dir))
    assert "CartesianProduct" not in a.text, name
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", a.text)
    assert len(nlj) <= max_bnlj, (name, len(nlj))


def test_late_wave_aggregates_are_partial(spark, sf_dir):
    """The two corpus-scan-heavy entries keep map-side combine: a
    partial HashAggregate must appear under the scan side."""
    for name in ("psi_drift", "eb_shrunk_rates", "encoding_advisor"):
        text = PA.audit(QUERIES[name].builder(spark, sf_dir)).text
        assert "HashAggregate" in text, name
