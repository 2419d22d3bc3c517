"""Dedicated value + plan tests for the round-12 operators:
nelson_aalen_hazard, removal_effect_attribution, hbos_outliers,
cuped_adjusted_lift, rfm_segments — registered WITH their tests in
the same session (the late-wave protocol-debt lesson from round 11).
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


def test_nelson_aalen_hand_cohort(spark):
    """Events at t=2 (d=2, n=4) and t=5 (d=1, n=2); one censored at
    the horizon: H = 0.5 then 1.0, exact 1e-8 integer increments."""
    from cloud_native_mapreduce_spark.operators.events import (
        nelson_aalen_hazard)
    rows = [
        (1, TS(1995, 1, 1), 1, "signup", 0.0),
        (2, TS(1995, 1, 3), 1, "purchase", 1.0),   # ev_day 2
        (3, TS(1995, 1, 1), 2, "signup", 0.0),
        (4, TS(1995, 1, 6), 2, "purchase", 1.0),   # ev_day 5
        (5, TS(1995, 1, 1), 3, "signup", 0.0),     # censored at d6
        (6, TS(1995, 1, 1), 4, "signup", 0.0),
        (7, TS(1995, 1, 3), 4, "purchase", 1.0),   # ev_day 2
        (8, TS(1995, 1, 7), 3, "view", 0.0),       # horizon setter
    ]
    got = {r.t: r for r in nelson_aalen_hazard(_events(spark, rows))
           .collect()}
    assert set(got) == {2, 5}
    assert (got[2].n_risk, got[2].n_events) == (4, 2)
    assert got[2].cum_hazard == 0.5        # (2*1e8)//4 = 5e7
    assert (got[5].n_risk, got[5].n_events) == (2, 1)
    assert got[5].cum_hazard == 1.0        # + (1*1e8)//2


def test_removal_effect_hand_chain(spark):
    """Five journeys (one restarting after a purchase) with a
    hand-solvable absorbing chain: p_full = 1/2; removing 'view'
    kills 2/3 of conversions, removing 'click' 1/6; absent channels
    get removal effect 0."""
    from cloud_native_mapreduce_spark.operators.events import (
        removal_effect_attribution)
    rows, eid = [], 0

    def add(user, *types):
        nonlocal eid
        for i, t in enumerate(types):
            rows.append((eid, TS(1995, 1, 1 + i), user, t, 0.0))
            eid += 1
    add(1, "view", "purchase")
    add(2, "view")
    add(3, "click", "view", "purchase")
    add(4, "click")
    add(5, "purchase", "view")   # journey restart after the purchase
    got = {r.channel: r
           for r in removal_effect_attribution(_events(spark, rows))
           .collect()}
    assert set(got) == {"click", "error", "signup", "view"}
    for ch in got.values():
        assert ch.p_full == 0.5
    assert got["view"].p_removed == pytest.approx(1 / 6, abs=1e-6)
    assert got["view"].removal_effect == pytest.approx(2 / 3, abs=1e-6)
    assert got["view"].attribution_share == pytest.approx(0.8, abs=1e-6)
    assert got["click"].p_removed == pytest.approx(5 / 12, abs=1e-6)
    assert got["click"].removal_effect == pytest.approx(1 / 6, abs=1e-6)
    assert got["click"].attribution_share == pytest.approx(0.2, abs=1e-6)
    for c in ("error", "signup"):
        assert got[c].removal_effect == 0.0
        assert got[c].attribution_share == 0.0


def test_hbos_scores_match_python_model(spark):
    """Scores replicate the micronat histogram model; the row rare on
    every feature tops the cut."""
    from cloud_native_mapreduce_spark.operators.stats import (
        HBOS_SCALE, hbos_outliers)
    # 9 common orders (bucket 0, month 1, prio 'A') + 1 rare
    # (bucket 9, month 6, prio 'Z')
    rows = [(i, 10_000.0, "1995-01-15", "A") for i in range(9)]
    rows.append((99, 999_999.0, "1995-06-15", "Z"))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, "
              "o_orderdate string, o_orderpriority string")
    out = hbos_outliers(orders).collect()
    assert len(out) == 10
    mn = lambda c: round(math.log(10 / c) * HBOS_SCALE)  # noqa: E731
    top = out[0]
    assert top.o_orderkey == 99
    assert (top.price_bucket, top.order_month, top.priority) == (9, 6, "Z")
    assert top.score_mn == 3 * mn(1)
    assert out[1].score_mn == 3 * mn(9)
    assert top.hbos_score == pytest.approx(3 * mn(1) / HBOS_SCALE,
                                           abs=1e-9)


def test_cuped_matches_python_model(spark):
    """theta, adjusted means and the variance-reduction percentage
    replicate the exact-moment formulas."""
    from cloud_native_mapreduce_spark.operators.stats import (
        cuped_adjusted_lift)
    # pre = days <= 1995-01-02 (dmin + 3 DIV 2); post after
    data = {1: (10000, 5000), 2: (20000, 12000),
            3: (5000, 3000), 4: (40000, 18000)}
    rows = []
    for u, (x, y) in data.items():
        rows.append((u * 10, TS(1995, 1, 1), u, "purchase", x / 100))
        rows.append((u * 10 + 1, TS(1995, 1, 4), u, "purchase", y / 100))
    got = {r.arm: r for r in cuped_adjusted_lift(_events(spark, rows))
           .collect()}
    n = len(data)
    sx = sum(x for x, _ in data.values())
    sy = sum(y for _, y in data.values())
    sxx = sum(x * x for x, _ in data.values())
    sxy = sum(x * y for x, y in data.values())
    syy = sum(y * y for _, y in data.values())
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, \
        n * syy - sy * sy
    theta = cov / varx
    for arm in (0, 1):
        us = [u for u in data if u % 2 == arm]
        na = len(us)
        sxa = sum(data[u][0] for u in us)
        sya = sum(data[u][1] for u in us)
        assert got[arm].n_users == na
        assert got[arm].mean_post == pytest.approx(
            sya / na / 100, abs=1e-4)
        assert got[arm].mean_post_adj == pytest.approx(
            (sya - theta * (sxa - na * (sx / n))) / na / 100, abs=1e-4)
        assert got[arm].theta == pytest.approx(theta, abs=1e-6)
        assert got[arm].var_reduction_pct == pytest.approx(
            100 * cov * cov / (varx * vary), abs=1e-4)
    # CUPED preserves the pooled mean: arm-weighted adjusted means
    # recombine to the raw pooled post mean
    pooled = sum(got[a].mean_post_adj * got[a].n_users
                 for a in (0, 1)) / n
    assert pooled == pytest.approx(sy / n / 100, abs=1e-3)


def test_rfm_singleton_quintiles(spark):
    """Five customers with strictly increasing R/F/M land one per
    quintile; exact integer-cent averages."""
    from cloud_native_mapreduce_spark.operators.relational import (
        rfm_segments)
    orders_rows = []
    ok = 0
    for k in range(1, 6):          # cust k: k orders, last day = 1+k
        for i in range(k):
            ok += 1
            orders_rows.append(
                (ok, k, f"1995-01-0{1 + k}", float(k * 100)))
    orders = spark.createDataFrame(
        orders_rows, "o_orderkey long, o_custkey long, "
                     "o_orderdate string, o_totalprice double")
    customer = spark.createDataFrame(
        [(k, 7) for k in range(1, 6)], "c_custkey long, c_nationkey int")
    out = rfm_segments(orders, customer).collect()
    assert len(out) == 5
    got = {r.r_score: r for r in out}
    for k in range(1, 6):
        # cust k is k-th most recent, k-th most frequent, k-th spender
        r = got[k]
        assert (r.nation, r.f_score, r.m_score) == (7, k, k)
        assert r.n_customers == 1
        assert r.avg_monetary == float(k * k * 100)  # k orders × k·100


@pytest.mark.parametrize("name,max_bnlj", [
    ("nelson_aalen_hazard", 1),          # broadcast 1-row horizon
    ("removal_effect_attribution", 1),   # broadcast 1-row totals
    ("hbos_outliers", 1),                # broadcast 1-row corpus count
    ("cuped_adjusted_lift", 2),          # bounds + pooled 1-row frames
    ("rfm_segments", 1),                 # broadcast 1-row horizon
])
def test_round12_plans_never_cartesian(spark, sf_dir, name, max_bnlj):
    a = PA.audit(QUERIES[name].builder(spark, sf_dir))
    assert "CartesianProduct" not in a.text, name
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", a.text)
    assert len(nlj) <= max_bnlj, (name, len(nlj))


def test_hbos_plan_takeordered_and_broadcast(spark, sf_dir):
    """The top-k cut must be TakeOrderedAndProject (never a global
    sort) and the three cost maps must broadcast."""
    a = PA.audit(QUERIES["hbos_outliers"].builder(spark, sf_dir))
    assert a.has_take_ordered, a.text
    assert a.has_broadcast_hash_join, a.text


def test_nelson_aalen_plan_no_window_no_python(spark, sf_dir):
    """NA's whole point vs KM: a pure-SQL sum — no Window node, no
    Python/Arrow stage anywhere in the plan."""
    a = PA.audit(QUERIES["nelson_aalen_hazard"].builder(spark, sf_dir))
    assert "Window" not in a.text, a.text
    assert "Python" not in a.text and "Arrow" not in a.text, a.text


def test_rfm_windows_are_nation_partitioned(spark, sf_dir):
    """Quintile ranks must ride nation-partitioned windows — never a
    global (unpartitioned) window."""
    a = PA.audit(QUERIES["rfm_segments"].builder(spark, sf_dir))
    assert a.unpartitioned_window_count == 0, a.text


# ---------------------------------------------------------------------------
# round-12 batch 2
# ---------------------------------------------------------------------------

def test_graph_diameter_on_path_graph(spark):
    """Path 1-2-3-4 via shared orders: sweep 1 from v=1 finds ecc 3
    at v=4; sweep 2 from v=4 confirms diameter 3 (double sweep is
    exact on trees)."""
    from cloud_native_mapreduce_spark.operators.graph import (
        graph_diameter_approx)
    li = spark.createDataFrame(
        [(101, 1), (101, 2), (102, 2), (102, 3), (103, 3), (103, 4)],
        "l_orderkey long, l_partkey long")
    row = graph_diameter_approx(li).collect()[0]
    assert (row.source_v, row.ecc_source, row.far_v,
            row.diameter_lb) == (1, 3, 4, 3)


def test_join_cardinality_audit_hand_case(spark):
    """cl={1:2,2:1,3:1}, cr={1:1,2:2,4:1}: actual 4 rows, uniformity
    estimate 16/3, ratio 0.75."""
    from cloud_native_mapreduce_spark.operators.relational import (
        join_cardinality_audit)
    orders = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "o_orderkey long")
    lineitem = spark.createDataFrame(
        [(1,), (2,), (2,), (4,)], "l_orderkey long")
    r = join_cardinality_audit(orders, lineitem).collect()[0]
    assert (r.n_left, r.d_left, r.n_right, r.d_right) == (4, 3, 4, 3)
    assert r.n_overlap == 2
    assert r.actual_rows == 4          # 2*1 + 1*2
    assert r.est_rows == pytest.approx(16 / 3, abs=1e-4)
    assert r.actual_over_est == pytest.approx(0.75, abs=1e-4)


def test_stratified_ate_single_stratum(spark):
    """One stratum, two users per arm: ATE is exactly the arm mean
    difference."""
    from cloud_native_mapreduce_spark.operators.stats import (
        stratified_treatment_effect)
    rows = [
        (1, TS(1995, 1, 1), 1, "purchase", 100.0),   # arm 1
        (2, TS(1995, 1, 1), 2, "purchase", 50.0),    # arm 0
        (3, TS(1995, 1, 1), 3, "purchase", 200.0),   # arm 1
        (4, TS(1995, 1, 1), 4, "purchase", 100.0),   # arm 0
    ]
    out = stratified_treatment_effect(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.stratum, r.n0, r.n1) == (0, 2, 2)
    assert (r.mean_y0, r.mean_y1) == (75.0, 150.0)
    assert r.diff == 75.0 and r.ate == 75.0


def test_ndcg_matches_python_replay(spark):
    """nDCG/MRR recomputed in Python from the returned (pos, gain)
    rows with the same quantized discounts must equal the reported
    columns; gains follow the planted >=2-terms rule."""
    from cloud_native_mapreduce_spark.operators.retrieval import (
        NDCG_SCALE, ndcg_retrieval_eval)
    docs = spark.createDataFrame(
        [(1, "hash join hash extra words"),
         (2, "scan appears once only here"),
         (3, "nothing relevant at all"),
         (4, "vector scan join rich doc"),
         (5, "filler filler filler")],
        "doc_id long, text string")
    out = ndcg_retrieval_eval(
        docs, ["hash", "join", "scan", "vector"], k=3).collect()
    assert len(out) == 3                       # only matching docs score
    assert {r.pos for r in out} == {1, 2, 3}
    gains = {r.doc_id: r.gain for r in out}
    assert gains[1] == 3 and gains[2] == 1 and gains[4] == 3

    w = lambda p: round(NDCG_SCALE / math.log2(p + 1))  # noqa: E731
    by_pos = sorted(out, key=lambda r: r.pos)
    dcg = sum(r.gain * w(r.pos) for r in by_pos)
    idcg = sum(g * w(p) for p, g in zip((1, 2, 3), (3, 3, 1)))
    first = min(r.pos for r in by_pos if r.gain > 0)
    for r in out:
        assert r.ndcg == pytest.approx(round(dcg / idcg, 6), abs=1e-9)
        assert r.mrr == pytest.approx(round(1.0 / first, 6), abs=1e-9)


def test_nb_margin_calibration_counts(spark):
    """Two test-fold docs, one deliberately mislabeled: totals,
    correctness and positive margins come out exactly."""
    from cloud_native_mapreduce_spark.operators.ml import (
        nb_margin_calibration)
    rows = [(0, "le le le", "en"),        # test: predicted fr, WRONG
            (5, "the the the", "en"),     # test: predicted en, right
            (1, "the the the and of", "en"),
            (2, "the of and to in", "en"),
            (3, "le la les des un", "fr"),
            (4, "le de la et un", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")
    out = nb_margin_calibration(docs).collect()
    assert sum(r.n_docs for r in out) == 2
    assert sum(r.n_correct for r in out) == 1
    for r in out:
        assert 0 <= r.bucket <= 9
        assert r.mean_margin_mn >= 0
        assert r.accuracy_bp == (r.n_correct * 10000) // r.n_docs


@pytest.mark.parametrize("name,max_bnlj", [
    ("graph_diameter_approx", 5),   # source/pivot/ecc 1-row frames
    ("join_cardinality_audit", 2),  # two 1-row side frames
    ("stratified_treatment_effect", 2),
    ("ndcg_retrieval_eval", 4),     # stats/summary/hist 1-row frames
    ("nb_margin_calibration", 5),   # NB scoring's bounded |langs|/
                                    # vocab/n-train broadcast fan-outs
])
def test_round12_batch2_plans_never_cartesian(spark, sf_dir, name,
                                              max_bnlj):
    a = PA.audit(QUERIES[name].builder(spark, sf_dir))
    assert "CartesianProduct" not in a.text, name
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", a.text)
    assert len(nlj) <= max_bnlj, (name, len(nlj))


def test_ndcg_plan_takeordered(spark, sf_dir):
    """The BM25 cut the evaluation ranks keeps its TakeOrdered. The
    outer plan can't show it — ndcg localCheckpoints the top-k frame
    (it feeds both sides of the triangular rank join), and the
    checkpoint boundary hides the subplan — so the pin audits the
    component the evaluation actually calls."""
    from cloud_native_mapreduce_spark.operators.retrieval import (
        bm25_topk)
    from cloud_native_mapreduce_spark.sources.tables import load_table
    a = PA.audit(bm25_topk(load_table(spark, sf_dir, "documents"),
                           ["hash", "join", "scan", "vector"], k=20))
    assert a.has_take_ordered, a.text


# ---------------------------------------------------------------------------
# round-12 batch 3
# ---------------------------------------------------------------------------

def test_growth_accounting_hand_weeks(spark):
    """u1 active wk0,1,3 (new/retained/resurrected); u2 wk0 only
    (churns into wk1); identity active = new+retained+resurrected."""
    from cloud_native_mapreduce_spark.operators.events import (
        growth_accounting)
    # 1970-01-05 = wk0 Monday; +7d = wk1; +21d = wk3
    rows = [
        (1, TS(1970, 1, 5), 1, "view", 0.0),    # u1 wk0
        (2, TS(1970, 1, 12), 1, "view", 0.0),   # u1 wk1
        (3, TS(1970, 1, 26), 1, "view", 0.0),   # u1 wk3 (gap)
        (4, TS(1970, 1, 6), 2, "view", 0.0),    # u2 wk0 only
    ]
    got = {r.week: r for r in growth_accounting(_events(spark, rows))
           .collect()}
    assert set(got) == {0, 1, 3}
    assert (got[0].n_active, got[0].n_new, got[0].n_retained,
            got[0].n_resurrected, got[0].n_churned_from_prev) \
        == (2, 2, 0, 0, 0)
    assert (got[1].n_active, got[1].n_new, got[1].n_retained,
            got[1].n_resurrected, got[1].n_churned_from_prev) \
        == (1, 0, 1, 0, 1)          # u2 churned out of wk0
    assert (got[3].n_active, got[3].n_new, got[3].n_retained,
            got[3].n_resurrected) == (1, 0, 0, 1)
    for r in got.values():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_series_strengths_flat_vs_seasonal(spark):
    """A pure weekly-cycle series scores seasonal_strength 1 and
    trend_strength 0 (residuals vanish; the deseasonalized series is
    flat)."""
    import datetime as dt
    from cloud_native_mapreduce_spark.operators.events import (
        series_strengths)
    base = dt.datetime(1970, 1, 5)
    rows = []
    for i in range(28):             # 4 exact weekly cycles
        v = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0][i % 7]
        rows.append((i, base + dt.timedelta(days=i), 1, "t", v))
    out = series_strengths(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 28 - 6       # full centered windows only
    assert r.seasonal_strength == 1.0
    assert r.trend_strength == 0.0


def test_prefix_join_lossless_vs_bruteforce(spark):
    """The prefix filter must return EXACTLY the brute-force
    threshold pairs (losslessness — the PPJoin pigeonhole), on a
    corpus with near-dup, partial-overlap and disjoint docs."""
    from cloud_native_mapreduce_spark.dedup.prefix_join import (
        T_DEN, T_NUM, jaccard_prefix_join)
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4, "alpha beta gamma nu xi omicron pi rho sigma tau"),
        (5, "completely different words here nothing shared at all ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): (r.n_shared, r.jaccard)
           for r in jaccard_prefix_join(df).collect()}
    # brute force in Python
    sets = {d: set(t.split()) for d, t in docs}
    exp = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ns = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            if ns * T_DEN >= T_NUM * un:
                exp[(a, b)] = (ns, round(ns / un, 4))
    assert got == exp
    assert (1, 3) in got and got[(1, 3)][1] == 1.0   # exact twins
    assert (1, 2) not in got                         # 9/11 < 0.9
    assert not any(5 in p for p in got)              # disjoint doc


# ---------------------------------------------------------------------------
# round-12 batch 4
# ---------------------------------------------------------------------------

def test_harmonic_centrality_on_path(spark):
    """Path 1-2-3-4 with landmarks {1,2,3,4} (all vertices): hc(2) =
    hc(3) = 1/1 + 1/1 + 1/2 = 2.5 top the ranking; endpoints score
    1 + 1/2 + 1/3."""
    from cloud_native_mapreduce_spark.operators.graph import (
        harmonic_centrality_approx)
    li = spark.createDataFrame(
        [(101, 1), (101, 2), (102, 2), (102, 3), (103, 3), (103, 4)],
        "l_orderkey long, l_partkey long")
    got = {r.v: r for r in harmonic_centrality_approx(li).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2].hc_score == 2.5 and got[3].hc_score == 2.5
    # endpoints: 1 + 0.5 + round(1e8/3)/1e8
    end = round((10**8 + 5 * 10**7 + round(10**8 / 3)) / 10**8, 6)
    assert got[1].hc_score == end and got[4].hc_score == end
    assert all(r.n_reached == 3 for r in got.values())


def test_qte_hand_distribution(spark):
    """Arm 1 shifted by +1 purchase everywhere: every quantile's QTE
    is exactly 1."""
    from cloud_native_mapreduce_spark.operators.stats import (
        quantile_treatment_effect)
    rows, eid = [], 0
    # arm 0 (even users): purchase counts 1,2,3,4; arm 1: 2,3,4,5
    for u, np_ in [(2, 1), (4, 2), (6, 3), (8, 4),
                   (1, 2), (3, 3), (5, 4), (7, 5)]:
        for _ in range(np_):
            rows.append((eid, TS(1995, 1, 1), u, "purchase", 1.0))
            eid += 1
    out = {r.q_label: r
           for r in quantile_treatment_effect(_events(spark, rows))
           .collect()}
    assert set(out) == {"p25", "p50", "p75", "p90"}
    # n=4 per arm: ranks ceil(q*4) = 1, 2, 3, 4
    assert (out["p25"].q_arm0, out["p25"].q_arm1) == (1, 2)
    assert (out["p50"].q_arm0, out["p50"].q_arm1) == (2, 3)
    assert (out["p75"].q_arm0, out["p75"].q_arm1) == (3, 4)
    assert (out["p90"].q_arm0, out["p90"].q_arm1) == (4, 5)
    assert all(r.qte == 1 and r.n0 == 4 and r.n1 == 4
               for r in out.values())


def test_mase_perfect_seasonal_naive(spark):
    """A perfectly periodic series: holdout errors 0 -> MAE 0,
    MASE 0; a trending series scores MASE > 0."""
    import datetime as dt
    from cloud_native_mapreduce_spark.operators.events import (
        mase_backtest)
    base = dt.datetime(1995, 1, 2)
    rows, eid = [], 0
    for i in range(28):
        v = [10.0, 20.0, 30.0][i % 7 % 3] + (0 if i % 7 else 5)
        rows.append((eid, base + dt.timedelta(days=i), 1, "cyc", v))
        eid += 1
        # trending type: strictly increasing revenue
        rows.append((eid, base + dt.timedelta(days=i), 2, "trend",
                     float(i + 1)))
        eid += 1
    got = {r.event_type: r
           for r in mase_backtest(_events(spark, rows)).collect()}
    cyc = got["cyc"]
    assert (cyc.h_days, cyc.m_days) == (7, 14)  # 28 days, 7 lag-less
    assert cyc.mae_holdout == 0.0 and cyc.mase == 0.0
    tr = got["trend"]
    # constant slope: every |e| = 7 cents*100 -> MASE exactly 1
    assert tr.mae_holdout == 7.0 and tr.mase == 1.0


@pytest.mark.parametrize("name,max_bnlj", [
    ("harmonic_centrality_approx", 2),  # landmark 1-row broadcast
    ("quantile_treatment_effect", 3),   # quantile/threshold fans
    ("mase_backtest", 0),               # keyed joins only
])
def test_round12_batch4_plans_never_cartesian(spark, sf_dir, name,
                                              max_bnlj):
    a = PA.audit(QUERIES[name].builder(spark, sf_dir))
    assert "CartesianProduct" not in a.text, name
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", a.text)
    assert len(nlj) <= max_bnlj, (name, len(nlj))


def test_harmonic_plan_takeordered(spark, sf_dir):
    a = PA.audit(QUERIES["harmonic_centrality_approx"]
                 .builder(spark, sf_dir))
    assert a.has_take_ordered, a.text


def test_kappa_hand_confusion(spark):
    """Hand corpus where NB and the heuristic agree on one doc and
    disagree on the other: kappa from the exact-integer formula."""
    from cloud_native_mapreduce_spark.operators.ml import (
        classifier_agreement_kappa)
    rows = [(0, "the the the and", "en"),     # test: both say en
            (5, "le le la et", "en"),         # test: both say fr...
            (1, "the and of to in", "en"),
            (2, "the of and by at", "en"),
            (3, "le la les des et", "fr"),
            (4, "le de la et un", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")
    out = classifier_agreement_kappa(docs).collect()
    cells = {(r.nb_lang, r.heur_lang): r.n_docs for r in out}
    # doc 0: NB en, heuristic en; doc 5: NB fr (le-heavy), heuristic fr
    assert cells == {("en", "en"): 1, ("fr", "fr"): 1}
    # perfect agreement with two classes: kappa exactly 1
    for r in out:
        assert r.agreement_bp == 10000
        assert r.kappa == 1.0


def test_kappa_plan_bounded_broadcast(spark, sf_dir):
    a = PA.audit(QUERIES["classifier_agreement_kappa"]
                 .builder(spark, sf_dir))
    assert "CartesianProduct" not in a.text


def test_fightin_words_hand_corpus(spark):
    """A term overused in one language scores a positive z there and
    negative elsewhere; ranking is variance-aware (a high-count
    overused term outranks a one-hit rarity)."""
    from cloud_native_mapreduce_spark.operators.curation import (
        odds_ratio_keywords)
    en = "spark " * 30 + "common " * 30
    fr = "etincelle " * 30 + "common " * 30 + "rare"
    docs = spark.createDataFrame(
        [(1, en, "en"), (2, fr, "fr")],
        "doc_id long, text string, lang string")
    out = odds_ratio_keywords(docs).collect()
    by = {(r.lang, r.term): r.z_score for r in out}
    assert by[("en", "spark")] > 0
    assert by[("fr", "etincelle")] > 0
    # variance awareness: the 30-count distinctive term beats the
    # single-occurrence 'rare' in fr's ranking
    fr_rank = [r.term for r in sorted(
        (r for r in out if r.lang == "fr"),
        key=lambda r: (-r.z_score, r.term))]
    assert fr_rank.index("etincelle") < fr_rank.index("rare")
    # 'common' is balanced: |z| small on both sides
    assert abs(by[("en", "common")]) < by[("en", "spark")]


def test_fightin_words_plan_partitioned_window(spark, sf_dir):
    a = PA.audit(QUERIES["odds_ratio_keywords"].builder(spark, sf_dir))
    assert "CartesianProduct" not in a.text
    assert a.unpartitioned_window_count == 0, a.text


def test_expected_steps_hand_chain(spark):
    """Deterministic DAG journeys: E[view] = 1 (always absorbs next),
    E[click] = 1 + 0.5·E[view]; E[start] follows the mix."""
    from cloud_native_mapreduce_spark.operators.events import (
        expected_steps_to_absorption)
    rows, eid = [], 0

    def add(user, *types):
        nonlocal eid
        for i, t in enumerate(types):
            rows.append((eid, TS(1995, 1, 1 + i), user, t, 0.0))
            eid += 1
    add(1, "view", "purchase")
    add(2, "view")
    add(3, "click", "view", "purchase")
    add(4, "click")
    got = {r.state: r.expected_steps
           for r in expected_steps_to_absorption(_events(spark, rows))
           .collect()}
    assert set(got) == {"start", "click", "error", "signup", "view"}
    assert got["view"] == 1.0            # view -> conv/null always
    assert got["click"] == 1.5           # 1 + 0.5·E[view]
    # start: half to view (E=1), half to click (E=1.5) => 1 + 1.25
    assert got["start"] == 2.25
    # absent channels: no outgoing mass => E = 1 (the one step out)
    assert got["error"] == 1.0 and got["signup"] == 1.0


def test_lorenz_singleton_nation(spark):
    """Spends 1,2,3,4,10 in one nation: exact decile shares of the
    ascending cumulative."""
    from cloud_native_mapreduce_spark.operators.stats import (
        lorenz_curve_points)
    orders = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(
            [(1, 1), (2, 2), (3, 3), (4, 4), (5, 10)])],
        "o_orderkey long, o_custkey long, o_totalprice double")
    customer = spark.createDataFrame(
        [(k, 3) for k in range(1, 6)], "c_custkey long, c_nationkey int")
    got = {r.decile: r for r in lorenz_curve_points(orders, customer)
           .collect()}
    # n=5: deciles 2,4,6,8,10 pick ranks 1..5 (others floor to same)
    total = 20.0
    assert got[2].buyers_cum == 1 and got[2].spend_share == 1 / total
    assert got[4].buyers_cum == 2 and got[4].spend_share == 3 / total
    assert got[6].buyers_cum == 3 and got[6].spend_share == 6 / total
    assert got[8].buyers_cum == 4 and got[8].spend_share == 0.5
    assert got[10].buyers_cum == 5 and got[10].spend_share == 1.0
    # bottom-heavy check: curve is convex (shares grow superlinearly)
    assert got[8].spend_share < 0.8


def test_lorenz_plan_partitioned_windows(spark, sf_dir):
    a = PA.audit(QUERIES["lorenz_curve_points"].builder(spark, sf_dir))
    assert a.unpartitioned_window_count == 0, a.text
    assert "CartesianProduct" not in a.text
