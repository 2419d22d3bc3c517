"""Value tests for the round-14 extension wave A (classical
hypothesis tests), registered WITH their tests in the same session
per the standing protocol."""

from __future__ import annotations

import datetime
import math


def _events(spark, rows):
    """rows: (event_type, value, day_offset) → events-shaped frame."""
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    data = [(i, base + datetime.timedelta(days=d), i % 7, t, v, "{}")
            for i, (t, v, d) in enumerate(rows)]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


class TestWelchTtestPairs:
    def test_hand_two_groups(self, spark):
        """alpha=[1..4], beta=[2,4,6,8,10]: t=-2.2514, df=6.81 by the
        textbook Welch formulas."""
        from cloud_native_mapreduce_spark.operators.events import (
            welch_ttest_pairs)
        rows = [("alpha", float(v), 0) for v in [1, 2, 3, 4]]
        rows += [("beta", float(v), 0) for v in [2, 4, 6, 8, 10]]
        got = welch_ttest_pairs(_events(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.type_a, r.type_b, r.na, r.nb) == ("alpha", "beta",
                                                    4, 5)
        assert r.mean_a == 2.5 and r.mean_b == 6.0
        va, vb = 5.0 / 3.0, 10.0
        se2 = va / 4 + vb / 5
        t = (2.5 - 6.0) / math.sqrt(se2)
        df = se2 * se2 / ((va / 4) ** 2 / 3 + (vb / 5) ** 2 / 4)
        assert r.t_stat == round(t, 4)
        assert r.df_welch == round(df, 2)

    def test_degenerate_group_reports_null(self, spark):
        """A single-row group has no variance: t/df must be NULL,
        never a number."""
        from cloud_native_mapreduce_spark.operators.events import (
            welch_ttest_pairs)
        rows = [("alpha", 1.0, 0), ("beta", 2.0, 0), ("beta", 4.0, 0)]
        r = welch_ttest_pairs(_events(spark, rows)).collect()[0]
        assert r.t_stat is None and r.df_welch is None


class TestBartlettVariances:
    def test_matches_quantized_replica(self, spark):
        """Two clean groups; expected value from a pure-Python replica
        of the same 1e-6/1e-4 quantization pipeline."""
        from cloud_native_mapreduce_spark.operators.events import (
            bartlett_variances)
        groups = {"alpha": [1, 2, 3, 4], "beta": [2, 4, 6, 8, 10]}
        rows = [(t, float(v), 0) for t, vs in groups.items()
                for v in vs]
        r = bartlett_variances(_events(spark, rows)).collect()[0]
        # replica in cents
        sum_ln_q6 = sum_inv_q6 = sq_over_n_q4 = 0
        tss = n_total = k = 0
        for vs in groups.values():
            cents = [v * 100 for v in vs]
            n, s = len(cents), sum(cents)
            ss = sum(c * c for c in cents)
            vi = (ss - s / n * s) / (n - 1)
            sum_ln_q6 += round((n - 1) * math.log(vi) * 1e6)
            sum_inv_q6 += round(1e6 / (n - 1))
            sq_over_n_q4 += round(s / n * s * 1e4)
            tss += ss
            n_total += n
            k += 1
        sp2 = (tss - sq_over_n_q4 / 1e4) / (n_total - k)
        t_num = (n_total - k) * math.log(sp2) - sum_ln_q6 / 1e6
        c = 1.0 + (sum_inv_q6 / 1e6 - 1.0 / (n_total - k)) / (3 * (k - 1))
        assert r.k == 2 and r.n == 9
        assert r.pooled_var == round(sp2 / 1e4, 4)
        assert r.t_stat == round(t_num / c, 4)

    def test_degenerate_group_nulls_the_statistic(self, spark):
        """One constant group (zero variance): Bartlett is undefined,
        the statistic must be NULL."""
        from cloud_native_mapreduce_spark.operators.events import (
            bartlett_variances)
        rows = [("alpha", 5.0, 0), ("alpha", 5.0, 0),
                ("beta", 2.0, 0), ("beta", 4.0, 0)]
        r = bartlett_variances(_events(spark, rows)).collect()[0]
        assert r.t_stat is None and r.pooled_var is None


class TestKendallsWDays:
    def test_perfect_agreement_is_one(self, spark):
        """3 complete days all ranking A<B<C: W=1, chi2=m(k-1)=6; an
        incomplete 4th day must be excluded, not poison the ranks."""
        from cloud_native_mapreduce_spark.operators.events import (
            kendalls_w_days)
        rows = []
        for d in range(3):
            rows += [("A", 1.0, d), ("B", 2.0, d), ("C", 3.0, d)]
        rows += [("A", 9.0, 3), ("B", 9.0, 3)]  # incomplete day
        r = kendalls_w_days(_events(spark, rows)).collect()[0]
        assert (r.k, r.m, r.tie_sum) == (3, 3, 0)
        assert r.w == 1.0
        assert r.chi2 == 6.0

    def test_all_tied_days_report_null(self, spark):
        """Every day fully tied → denominator 0 → NULL W."""
        from cloud_native_mapreduce_spark.operators.events import (
            kendalls_w_days)
        rows = []
        for d in range(2):
            rows += [("A", 1.0, d), ("B", 1.0, d)]
        r = kendalls_w_days(_events(spark, rows)).collect()[0]
        assert r.w is None and r.chi2 is None


class TestGrubbsDailyOutlier:
    def test_hand_outlier(self, spark):
        """Daily values 10,10,10,50: mean 20, sd 20, G=1.5 on the
        50-day."""
        from cloud_native_mapreduce_spark.operators.events import (
            grubbs_daily_outlier)
        rows = [("A", 10.0, 0), ("A", 10.0, 1), ("A", 10.0, 2),
                ("A", 50.0, 3)]
        r = grubbs_daily_outlier(_events(spark, rows)).collect()[0]
        assert r.n == 4
        assert r.outlier_day == "2024-01-04"
        assert r.outlier_value == 50.0
        assert r.g_stat == 1.5

    def test_tie_breaks_to_earliest_day(self, spark):
        """Symmetric deviations (5, 15): both days deviate equally;
        the earlier day must win deterministically."""
        from cloud_native_mapreduce_spark.operators.events import (
            grubbs_daily_outlier)
        rows = [("A", 15.0, 0), ("A", 5.0, 1), ("A", 10.0, 2)]
        r = grubbs_daily_outlier(_events(spark, rows)).collect()[0]
        assert r.outlier_day == "2024-01-01"


def _orders_lineitem(spark, groups):
    """groups: {priority_digit: [quantities]} → (lineitem, orders)."""
    orders, lines, ok = [], [], 0
    names = {1: "1-URGENT", 2: "2-HIGH", 3: "3-MEDIUM",
             4: "4-NOT SPECIFIED", 5: "5-LOW"}
    for w, qs in groups.items():
        for q in qs:
            ok += 1
            orders.append((ok, names[w]))
            lines.append((ok, float(q)))
    o = spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string")
    li = spark.createDataFrame(
        lines, "l_orderkey long, l_quantity double")
    return li, o


class TestJonckheereTerpstra:
    def test_hand_no_ties(self, spark):
        """g1=[1,2] < g2=[3,4] strictly: J=4, E[J]=2,
        Var=120/72, z=2/sqrt(120/72)."""
        from cloud_native_mapreduce_spark.operators.stats import (
            jonckheere_terpstra)
        li, o = _orders_lineitem(spark, {1: [1, 2], 2: [3, 4]})
        r = jonckheere_terpstra(li, o).collect()[0]
        assert r.n == 4
        assert r.j_stat == 4.0
        assert r.j_expected == 2.0
        assert r.z_stat == round(2.0 / math.sqrt(120.0 / 72.0), 6)

    def test_ties_use_half_weight_and_corrected_variance(self, spark):
        """g1=[1,2], g2=[2,3]: pairs (1,2),(1,3),(2,3) less, (2,2)
        tie → J = 3 + 0.5 = 3.5; variance per the tie-corrected
        three-term formula."""
        from cloud_native_mapreduce_spark.operators.stats import (
            jonckheere_terpstra)
        li, o = _orders_lineitem(spark, {1: [1, 2], 2: [2, 3]})
        r = jonckheere_terpstra(li, o).collect()[0]
        assert r.j_stat == 3.5
        assert r.j_expected == 2.0
        n, ns, ts = 4, [2, 2], [1, 2, 1]  # group sizes; tie counts
        a = (n * (n - 1) * (2 * n + 5)
             - sum(g * (g - 1) * (2 * g + 5) for g in ns)
             - sum(t * (t - 1) * (2 * t + 5) for t in ts)) / 72.0
        b = (sum(g * (g - 1) * (g - 2) for g in ns)
             * sum(t * (t - 1) * (t - 2) for t in ts)
             / (36.0 * n * (n - 1) * (n - 2)))
        c = (sum(g * (g - 1) for g in ns)
             * sum(t * (t - 1) for t in ts) / (8.0 * n * (n - 1)))
        assert r.z_stat == round(1.5 / math.sqrt(a + b + c), 6)


class TestCcfLeadLag:
    def test_shifted_copy_peaks_at_lag_one(self, spark):
        """beta's day t+1 equals alpha's day t: ccf(+1) = 1.0 on the
        5-day overlap, and the contemporaneous lag is weaker."""
        from cloud_native_mapreduce_spark.operators.events import (
            ccf_lead_lag)
        vals = [1.0, 5.0, 2.0, 8.0, 3.0]
        rows = [("alpha", v, d) for d, v in enumerate(vals)]
        rows += [("beta", v, d + 1) for d, v in enumerate(vals)]
        got = {r.lag: r for r in
               ccf_lead_lag(_events(spark, rows)).collect()}
        assert got[1].n == 5 and got[1].ccf == 1.0
        assert got[0].n == 4 and abs(got[0].ccf) < 1.0
        # symmetric window registered for every lag
        assert set(got) == set(range(-3, 4))

    def test_constant_series_reports_null(self, spark):
        from cloud_native_mapreduce_spark.operators.events import (
            ccf_lead_lag)
        rows = [("alpha", 1.0, d) for d in range(5)]
        rows += [("beta", float(d), d) for d in range(5)]
        got = {r.lag: r for r in
               ccf_lead_lag(_events(spark, rows)).collect()}
        assert got[0].ccf is None  # zero variance on the alpha side


def _replica_periodogram(day_vals):
    """Pure-Python replica of the quantized periodogram pipeline."""
    import math as _m
    cents = [round(v * 100) for v in day_vals]
    n, s = len(cents), sum(cents)
    out = {}
    for p in [2, 3, 4, 5, 6, 7, 8, 9, 10, 14]:
        sc = ss = 0
        for t, v in enumerate(cents):
            w = n * v - s
            sc += w * round(_m.cos(2 * _m.pi * t / p) * 1e6)
            ss += w * round(_m.sin(2 * _m.pi * t / p) * 1e6)
        out[p] = round((float(sc) * sc + float(ss) * ss)
                       / (float(n) * n * n * n * 1e12 * 1e4), 4) + 0.0
    return out


class TestPeriodogramDaily:
    def test_pure_cosine_peaks_at_its_period(self, spark):
        """v_t = 100 + 50·cos(2πt/5) over 10 days: the p=5 line must
        dominate, and every line must match the integer replica."""
        import math as _m
        from cloud_native_mapreduce_spark.operators.events import (
            periodogram_daily)
        vals = [round(100 + 50 * _m.cos(2 * _m.pi * t / 5), 2)
                for t in range(10)]
        rows = [("A", v, d) for d, v in enumerate(vals)]
        got = {r.period: r.power for r in
               periodogram_daily(_events(spark, rows)).collect()}
        want = _replica_periodogram(vals)
        assert got == want
        assert got[5] == max(got.values())


def _replica_hurst(day_vals):
    """Pure-Python replica of the quantized R/S pipeline."""
    import math as _m
    cents = [round(v * 100) for v in day_vals]
    per_size = {}
    for m in [5, 10, 15]:
        lq = []
        for c0 in range(0, len(cents) - m + 1, m):
            chunk = cents[c0:c0 + m]
            if len(chunk) < m:
                continue
            s_c = sum(chunk)
            ss_c = sum(v * v for v in chunk)
            cum = 0
            cds = []
            for j, v in enumerate(chunk):
                cum += v
                cds.append(m * cum - (j + 1) * s_c)
            r_scaled = max(cds) - min(cds)
            s2 = (ss_c - s_c / m * s_c) / m
            if s2 > 0 and r_scaled > 0:
                lq.append(round(_m.log(r_scaled / (m * _m.sqrt(s2)))
                                / _m.log(2) * 1e6))
        if lq:
            per_size[m] = (len(lq), sum(lq))
    pts = []
    for m, (nc, sl) in per_size.items():
        x = _m.log(m) / _m.log(2)
        y = sl / nc / 1e6
        pts.append((round(x * 1e6), round(x * y * 1e6),
                    round(x * x * 1e6), round(y * 1e6)))
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sxy = sum(p[1] for p in pts)
    sxx = sum(p[2] for p in pts)
    sy = sum(p[3] for p in pts)
    hurst = None
    if k >= 2:
        hurst = round((float(k) * sxy * 1e-6 - float(sx) * sy * 1e-12)
                      / (float(k) * sxx * 1e-6
                         - float(sx) * sx * 1e-12), 4) + 0.0
    rows = {}
    for m, (nc, sl) in per_size.items():
        rows[m] = (nc, round(sl / nc / 1e6, 4) + 0.0, k, hurst)
    return rows


class TestHurstRs:
    def test_matches_integer_replica(self, spark):
        """30-day deterministic series: every per-size row and the
        fitted H must equal the pure-Python quantized replica."""
        from cloud_native_mapreduce_spark.operators.events import (
            hurst_rs)
        vals = [10.0 + (t * 37 % 13) for t in range(30)]
        rows = [("A", v, d) for d, v in enumerate(vals)]
        got = {r.m: (r.n_chunks, r.mean_log2_rs, r.k, r.hurst)
               for r in hurst_rs(_events(spark, rows)).collect()}
        assert got == _replica_hurst(vals)

    def test_constant_series_drops_all_chunks(self, spark):
        """All-equal days: S=0 everywhere, no chunk survives, the
        frame is empty (never a fake H)."""
        from cloud_native_mapreduce_spark.operators.events import (
            hurst_rs)
        rows = [("A", 5.0, d) for d in range(15)]
        assert hurst_rs(_events(spark, rows)).count() == 0


def _docs(spark, rows):
    """rows: (text, source) → documents-shaped frame."""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


class TestQueryLikelihood:
    def test_hand_dirichlet_scores(self, spark):
        """3 docs, query {hash, join}: replica of the smoothed score
        including the zero-tf background term."""
        from cloud_native_mapreduce_spark.operators.retrieval import (
            query_likelihood_topk)
        docs = _docs(spark, [("hash hash join", "a"),
                             ("join scan", "a"),
                             ("other words here", "a")])
        got = {r.doc_id: r.ql for r in
               query_likelihood_topk(docs, ["hash", "join"],
                                     k=10).collect()}
        # corpus: d0 len 3, d1 len 2, d2 len 3 -> clen 8
        # cf: hash 2, join 2
        mu, clen = 2000.0, 8
        import math as _m

        def score(tfs, dl):
            return round(sum(
                _m.log((tf + mu * cf / clen) / (dl + mu))
                for tf, cf in tfs), 4)
        want = {0: score([(2, 2), (1, 2)], 3),
                1: score([(0, 2), (1, 2)], 2)}
        assert got == want  # d2 matches no term: not a candidate

    def test_oov_terms_dropped(self, spark):
        """A query term absent from the corpus must not nuke every
        score to -inf."""
        from cloud_native_mapreduce_spark.operators.retrieval import (
            query_likelihood_topk)
        docs = _docs(spark, [("hash join", "a")])
        got = query_likelihood_topk(docs, ["hash", "zzz_absent"],
                                    k=5).collect()
        assert len(got) == 1 and got[0].ql is not None


class TestCombsumFusion:
    def test_matches_leg_replica(self, spark, sf_dir):
        """Fused scores must equal the min-max CombSUM of the two
        legs' own outputs (computed independently here)."""
        from cloud_native_mapreduce_spark.operators.retrieval import (
            bm25_topk, combsum_fusion, query_likelihood_topk)
        from cloud_native_mapreduce_spark.sources.tables import (
            load_table)
        docs = load_table(spark, sf_dir, "documents")
        q = ["hash", "join", "scan", "vector"]
        a = {r.doc_id: r.bm25
             for r in bm25_topk(docs, q, k=100).collect()}
        b = {r.doc_id: r.ql
             for r in query_likelihood_topk(docs, q, k=100).collect()}
        mn_a, mx_a = min(a.values()), max(a.values())
        mn_b, mx_b = min(b.values()), max(b.values())

        def na(d):
            if d not in a or mx_a == mn_a:
                return 0.0
            return (a[d] - mn_a) / (mx_a - mn_a)

        def nb(d):
            if d not in b or mx_b == mn_b:
                return 0.0
            return (b[d] - mn_b) / (mx_b - mn_b)
        want = {}
        for d in set(a) | set(b):
            legs = (d in a) + (d in b)
            want[d] = (round(na(d) + nb(d), 6) + 0.0,
                       round(legs * (na(d) + nb(d)), 6) + 0.0, legs)
        top = sorted(want.items(),
                     key=lambda kv: (-kv[1][0], kv[0]))[:20]
        got = [(r.doc_id, (r.combsum, r.combmnz, r.n_legs))
               for r in combsum_fusion(docs, q, k=20).collect()]
        assert got == top


class TestSelfBleuSources:
    def test_hand_clipped_precision(self, spark):
        """s1='a b a b' (ab:2, ba:1), s2='a b c' (ab:1, bc:1):
        p_1 = min(2,1)/3, p_2 = min(1,2)/2."""
        from cloud_native_mapreduce_spark.operators.curation import (
            self_bleu_sources)
        docs = _docs(spark, [("a b a b", "s1"), ("a b c", "s2")])
        got = {r.source: (r.n_bigrams, r.clipped_overlap,
                          r.self_bleu2)
               for r in self_bleu_sources(docs).collect()}
        assert got == {"s1": (3, 1, round(1 / 3, 6)),
                       "s2": (2, 1, 0.5)}


class TestDirectionalHull:
    def test_square_extremes(self, spark):
        """Points (0,0),(10,0),(0,10) in one nation: direction 0
        (+x) picks (10,0), direction 4 (+y) picks (0,10)."""
        from cloud_native_mapreduce_spark.operators.spatial import (
            directional_hull)
        cust = spark.createDataFrame(
            [(256, 7, 0.00), (512, 7, 0.10), (778, 7, 0.00)],
            "c_custkey long, c_nationkey long, c_acctbal double")
        got = {r.direction: r for r in
               directional_hull(cust).collect()}
        assert len(got) == 16
        assert (got[0].x, got[0].y, got[0].support) == (10, 0, 10.0)
        assert (got[4].x, got[4].y, got[4].support) == (0, 10, 10.0)
        assert got[0].c_custkey == 512 and got[4].c_custkey == 778

    def test_tie_breaks_to_lowest_custkey(self, spark):
        """Two coincident extreme points: the lower custkey wins in
        every direction."""
        from cloud_native_mapreduce_spark.operators.spatial import (
            directional_hull)
        cust = spark.createDataFrame(
            [(256, 7, 0.10), (512, 7, 0.10)],
            "c_custkey long, c_nationkey long, c_acctbal double")
        got = {r.direction: r.c_custkey for r in
               directional_hull(cust).collect()}
        assert set(got.values()) == {256}


class TestSlopeReversalAudit:
    def test_classic_simpson_reversal(self, spark):
        """Both groups slope -200 cents/qty; pooled slope positive:
        the flag must fire, from exact integer signs."""
        from cloud_native_mapreduce_spark.operators.stats import (
            slope_reversal_audit)
        li = spark.createDataFrame(
            [("A", 1.0, 10.00), ("A", 2.0, 8.00),
             ("N", 5.0, 30.00), ("N", 6.0, 28.00)],
            "l_returnflag string, l_quantity double, "
            "l_extendedprice double")
        got = {r.grp: r for r in slope_reversal_audit(li).collect()}
        assert got["A"].group_slope == -200.0
        assert got["N"].group_slope == -200.0
        assert got["A"].pooled_slope == round(31200 / 68, 4)
        assert got["A"].sign_reversed and got["N"].sign_reversed

    def test_no_reversal_when_aligned(self, spark):
        from cloud_native_mapreduce_spark.operators.stats import (
            slope_reversal_audit)
        li = spark.createDataFrame(
            [("A", 1.0, 1.00), ("A", 2.0, 2.00),
             ("N", 3.0, 3.00), ("N", 4.0, 4.00)],
            "l_returnflag string, l_quantity double, "
            "l_extendedprice double")
        got = {r.grp: r for r in slope_reversal_audit(li).collect()}
        assert not got["A"].sign_reversed
        assert not got["N"].sign_reversed


class TestEffectSizePairs:
    def test_hand_cohen_hedges_mde(self, spark):
        from cloud_native_mapreduce_spark.operators.stats import (
            effect_size_pairs)
        rows = [("alpha", float(v), 0) for v in [1, 2, 3, 4]]
        rows += [("beta", float(v), 0) for v in [2, 4, 6, 8, 10]]
        r = effect_size_pairs(_events(spark, rows)).collect()[0]
        sp2 = (50000 + 400000) / 7  # cents², SSa=5$², SSb=40$²
        d = (250 - 600) / math.sqrt(sp2)
        assert r.cohens_d == round(d, 4)
        assert r.hedges_g == round(d * (1 - 3 / 27), 4)
        assert r.mde_80 == round(
            (1.959963984540054 + 0.8416212335729143)
            * math.sqrt(1 / 4 + 1 / 5), 4)


class TestTheilDecomposition:
    def test_matches_quantized_replica(self, spark):
        """Two nations with unequal spend: replica of the quantized
        Theil pipeline, and the decomposition identity
        T = Σ s_g·T_g + Σ between_g holds at rounding precision."""
        from cloud_native_mapreduce_spark.operators.stats import (
            theil_decomposition)
        # nation 0: customers spend $1 and $3; nation 1: $8
        orders = spark.createDataFrame(
            [(1, 1.00), (2, 3.00), (3, 8.00)],
            "o_custkey long, o_totalprice double")
        cust = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1)],
            "c_custkey long, c_nationkey long")
        got = {r.nationkey: r for r in
               theil_decomposition(orders, cust).collect()}
        ys = {0: [100, 300], 1: [800]}
        n = 3
        s = 1200
        ylny_tot = sum(round(y * math.log(y) * 100)
                       for g in ys.values() for y in g)
        t_total = round(ylny_tot / 100.0 / s - math.log(s / n), 6)
        recon = 0.0
        for g, lst in ys.items():
            n_g, s_g = len(lst), sum(lst)
            ylny = sum(round(y * math.log(y) * 100) for y in lst)
            t_g = round(ylny / 100.0 / s_g - math.log(s_g / n_g), 6)
            share = round(s_g / s, 6)
            btw = round(share * math.log((s_g / n_g) / (s / n)), 6)
            assert got[g].theil_within == t_g
            assert got[g].spend_share == share
            assert got[g].between_term == btw
            assert got[g].theil_total == t_total
            recon += share * t_g + btw
        assert abs(recon - t_total) < 1e-4


class TestChainLadder:
    def test_hand_triangle(self, spark):
        """Two cohorts: C0 = [2,3,4] (mature), C1 = [1,2] (one age
        short). f_1 = 4/3 projects C1's ultimate to 2*4/3."""
        from cloud_native_mapreduce_spark.operators.events import (
            chain_ladder_forecast)
        base = datetime.datetime(2024, 1, 1, 12, 0, 0)

        def ev(i, user, etype, day):
            return (i, base + datetime.timedelta(days=day), user,
                    etype, 1.0, "{}")
        rows = [ev(0, 1, "signup", 0), ev(1, 2, "signup", 0),
                ev(2, 3, "signup", 7),
                ev(3, 1, "purchase", 0), ev(4, 2, "purchase", 0),
                ev(5, 1, "purchase", 7), ev(6, 1, "purchase", 14),
                ev(7, 3, "purchase", 7), ev(8, 3, "purchase", 14)]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
        got = {r.cohort_week: r for r in
               chain_ladder_forecast(events).collect()}
        c0, c1 = got[0], got[1]
        assert (c0.latest_age, c0.observed_cum) == (2, 4)
        assert c0.dev_factor == 1.0 and c0.ultimate == 4.0
        assert (c1.latest_age, c1.observed_cum) == (1, 2)
        lnf = round(math.log(4 / 3) * 1e9) / 1e9
        assert c1.dev_factor == round(math.exp(lnf), 4)
        assert c1.ultimate == round(2 * math.exp(lnf), 2)

    def test_zero_denominator_age_contributes_no_factor(self, spark):
        """A cohort with zero purchases at every age must not poison
        the factors (den=0 ages are dropped, f=1 convention)."""
        from cloud_native_mapreduce_spark.operators.events import (
            chain_ladder_forecast)
        base = datetime.datetime(2024, 1, 1, 12, 0, 0)

        def ev(i, user, etype, day):
            return (i, base + datetime.timedelta(days=day), user,
                    etype, 1.0, "{}")
        rows = [ev(0, 1, "signup", 0), ev(1, 1, "click", 7),
                ev(2, 2, "signup", 7), ev(3, 2, "purchase", 7)]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
        got = {r.cohort_week: r for r in
               chain_ladder_forecast(events).collect()}
        assert got[0].observed_cum == 0 and got[0].ultimate == 0.0
        assert got[1].observed_cum == 1 and got[1].ultimate == 1.0


class TestConstraintAudit:
    def test_dirty_fixture_counts(self, spark):
        """One duplicated PK (2 extra rows) and one orphan FK must be
        counted exactly; clean constraints report 0."""
        from cloud_native_mapreduce_spark.operators.governance import (
            constraint_audit)
        region = spark.createDataFrame([(0,), (1,)],
                                       "r_regionkey long")
        nation = spark.createDataFrame(
            [(0, 0), (1, 0), (2, 9)],  # nation 2 → orphan region 9
            "n_nationkey long, n_regionkey long")
        customer = spark.createDataFrame(
            [(1, 0), (1, 0), (1, 1), (2, 1)],  # custkey 1 x3
            "c_custkey long, c_nationkey long")
        supplier = spark.createDataFrame(
            [(1, 0)], "s_suppkey long, s_nationkey long")
        part = spark.createDataFrame([(1,)], "p_partkey long")
        orders = spark.createDataFrame(
            [(10, 1), (11, 99)],  # custkey 99 orphan
            "o_orderkey long, o_custkey long")
        lineitem = spark.createDataFrame(
            [(10, 1, 1), (12, 1, 1)],  # orderkey 12 orphan
            "l_orderkey long, l_partkey long, l_suppkey long")
        got = {r.constraint_name: r for r in
               constraint_audit(region, nation, customer, supplier,
                                part, orders, lineitem).collect()}
        assert got["pk_customer"].violations == 2
        assert got["pk_customer"].n == 4
        assert got["fk_nation_region"].violations == 1
        assert got["fk_orders_customer"].violations == 1
        assert got["fk_lineitem_orders"].violations == 1
        assert got["pk_region"].violations == 0
        assert got["fk_lineitem_part"].violations == 0
        assert got["fk_orders_customer"].violation_rate == 0.5
        assert len(got) == 13


class TestUserStreaks:
    def test_hand_islands(self, spark):
        """User active on days 0,1,2,5,6: max streak 3, 2 islands,
        5 active days."""
        from cloud_native_mapreduce_spark.operators.events import (
            user_streaks)
        # single explicit user (the _events helper varies user_id)
        base = datetime.datetime(2024, 1, 1, 12, 0, 0)
        events = spark.createDataFrame(
            [(i, base + datetime.timedelta(days=d), 1, "A", 1.0, "{}")
             for i, d in enumerate((0, 1, 2, 5, 6))],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
        r = user_streaks(events).collect()
        assert len(r) == 1
        row = r[0]
        assert (row.max_streak, row.n_users) == (3, 1)
        assert row.mean_active_days == 5.0
        assert row.mean_islands == 2.0

    def test_histogram_over_users(self, spark):
        """Two users with max streaks 1 and 2 land in separate
        histogram rows."""
        from cloud_native_mapreduce_spark.operators.events import (
            user_streaks)
        base = datetime.datetime(2024, 1, 1, 12, 0, 0)
        rows = [(0, base, 1, "A", 1.0, "{}"),
                (1, base + datetime.timedelta(days=2), 2, "A", 1.0,
                 "{}"),
                (2, base + datetime.timedelta(days=3), 2, "A", 1.0,
                 "{}")]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
        got = {r.max_streak: r.n_users
               for r in user_streaks(events).collect()}
        assert got == {1: 1, 2: 1}


class TestWeibullKmFit:
    def test_fit_matches_python_on_km_points(self, spark, sf_dir):
        """The (shape, scale) must equal a pure-Python quantized OLS
        over the kaplan_meier curve's own published points."""
        from cloud_native_mapreduce_spark.operators.events import (
            kaplan_meier, weibull_km_fit)
        from cloud_native_mapreduce_spark.sources.tables import (
            load_table)
        events = load_table(spark, sf_dir, "events")
        km = [(r.t, r.s) for r in kaplan_meier(events).collect()]
        pts = [(round(math.log(t) * 1e6),
                round(math.log(-math.log(s)) * 1e6),
                round(math.log(t) * math.log(-math.log(s)) * 1e6),
                round(math.log(t) * math.log(t) * 1e6))
               for t, s in km if t > 0 and 0 < s < 1]
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[2] for p in pts)
        sxx = sum(p[3] for p in pts)
        slope = ((float(n) * sxy * 1e-6 - float(sx) * sy * 1e-12)
                 / (float(n) * sxx * 1e-6 - float(sx) * sx * 1e-12))
        icept = (sy * 1e-6 - slope * sx * 1e-6) / n
        r = weibull_km_fit(events).collect()[0]
        assert r.n_points == n
        assert r.shape_k == round(slope, 4)
        assert r.scale_days == round(math.exp(-icept / slope), 4)


class TestIsotonicDailyFit:
    def test_hand_pava_cases(self, spark):
        """[3,1,2] pools to [2,2,2]; [1,3,2] pools to [1,2.5,2.5] —
        the textbook PAVA answers, via the minimax identity."""
        from cloud_native_mapreduce_spark.operators.events import (
            isotonic_daily_fit)
        rows = [("A", 3.0, 0), ("A", 1.0, 1), ("A", 2.0, 2)]
        got = {r.day: r.fitted for r in
               isotonic_daily_fit(_events(spark, rows)).collect()}
        assert got == {"2024-01-01": 2.0, "2024-01-02": 2.0,
                       "2024-01-03": 2.0}
        rows = [("A", 1.0, 0), ("A", 3.0, 1), ("A", 2.0, 2)]
        got = {r.day: r.fitted for r in
               isotonic_daily_fit(_events(spark, rows)).collect()}
        assert got == {"2024-01-01": 1.0, "2024-01-02": 2.5,
                       "2024-01-03": 2.5}

    def test_monotone_and_mean_preserving(self, spark, sf_dir):
        """On real data: fitted is non-decreasing in day, and the
        fitted total equals the observed total (PAVA preserves block
        means) to quantization precision."""
        from cloud_native_mapreduce_spark.operators.events import (
            isotonic_daily_fit)
        from cloud_native_mapreduce_spark.sources.tables import (
            load_table)
        rows = sorted((r.day, r.observed, r.fitted) for r in
                      isotonic_daily_fit(
                          load_table(spark, sf_dir, "events"))
                      .collect())
        fits = [f for _, _, f in rows]
        assert all(a <= b for a, b in zip(fits, fits[1:]))
        assert abs(sum(f for f in fits)
                   - sum(o for _, o, _ in rows)) < 0.01 * len(rows)


class TestDecisionTreeDepth2:
    def test_xor_pattern_needs_depth2(self, spark):
        """XOR(quantity, discount): every root split is uninformative
        (gini unchanged), but both children split PERFECTLY — the
        canonical function a stump cannot learn and a depth-2 tree
        nails. Tie-break picks ('discount', 0.0) at the root."""
        from cloud_native_mapreduce_spark.operators.ml import (
            decision_tree_depth2)
        rows = []
        for q, d, flag in [(1, 0.0, "N"), (1, 0.1, "R"),
                           (2, 0.0, "R"), (2, 0.1, "N")]:
            rows += [(float(q), d, flag)] * 2
        li = spark.createDataFrame(
            rows, "l_quantity double, l_discount double, "
                  "l_returnflag string")
        got = {r.node: r for r in decision_tree_depth2(li).collect()}
        assert set(got) == {"root", "left", "right"}
        root = got["root"]
        assert (root.feature, root.threshold) == ("discount", 0.0)
        assert root.gini_scaled == 4_000_000  # 0.25 impurity x 1e6 x16/4
        left, right = got["left"], got["right"]
        assert (left.feature, left.threshold) == ("quantity", 1.0)
        assert left.gini_scaled == 0
        assert (left.predict_left, left.predict_right) == ("not_R", "R")
        assert (right.feature, right.threshold) == ("quantity", 1.0)
        assert right.gini_scaled == 0
        assert (right.predict_left, right.predict_right) == ("R",
                                                             "not_R")

    def test_root_matches_decision_stump(self, spark, sf_dir):
        """The depth-2 root must be EXACTLY the stump's split on real
        data (same machinery, same tie-breaks)."""
        from cloud_native_mapreduce_spark.operators.ml import (
            decision_stump, decision_tree_depth2)
        from cloud_native_mapreduce_spark.sources.tables import (
            load_table)
        li = load_table(spark, sf_dir, "lineitem")
        stump = decision_stump(li).collect()[0]
        root = [r for r in decision_tree_depth2(li).collect()
                if r.node == "root"][0]
        assert (root.feature, root.threshold, root.gini_scaled) == \
            (stump.feature, stump.threshold, stump.gini_scaled)

    def test_children_partition_root_sides(self, spark, sf_dir):
        """Each child's total (n_left + n_right) equals the root's
        corresponding side count."""
        from cloud_native_mapreduce_spark.operators.ml import (
            decision_tree_depth2)
        from cloud_native_mapreduce_spark.sources.tables import (
            load_table)
        got = {r.node: r for r in decision_tree_depth2(
            load_table(spark, sf_dir, "lineitem")).collect()}
        root = got["root"]
        if "left" in got:
            assert (got["left"].n_left + got["left"].n_right
                    == root.n_left)
        if "right" in got:
            assert (got["right"].n_left + got["right"].n_right
                    == root.n_right)


class TestSourceScorecard:
    def test_hand_scorecard(self, spark):
        """Cross-source duplicate counts for BOTH sides; majority
        language tie breaks alphabetically."""
        from cloud_native_mapreduce_spark.operators.curation import (
            source_scorecard)
        docs = spark.createDataFrame(
            [(0, "same text", "en", "s1", 9),
             (1, "same text", "de", "s2", 9),   # cross-source dup
             (2, "unique one", "en", "s1", 10),
             (3, "other words", "de", "s2", 11),
             (4, "more words", "en", "s2", 10)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long")
        got = {r.source: r for r in source_scorecard(docs).collect()}
        s1, s2 = got["s1"], got["s2"]
        assert (s1.n_docs, s1.dup_rate) == (2, 0.5)
        assert (s2.n_docs, s2.dup_rate) == (3, round(1 / 3, 6))
        assert s1.majority_lang == "en"
        assert s1.majority_lang_share == 1.0
        # s2 langs: docs 1,3 are de, doc 4 en -> de wins 2:1
        assert s2.majority_lang == "de"
        assert s2.mean_tokens == round((2 + 2 + 2) / 3, 2)
