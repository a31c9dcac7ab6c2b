"""Round-11 operator tests: Anderson-Darling, Jarque-Bera,
Durbin-Watson, TOST equivalence."""

from __future__ import annotations

import math
import random

import pytest

from azure_data_engineering_spark.operators.stats import (
    anderson_darling_normal,
    durbin_watson,
    jarque_bera,
    tost_equivalence,
)


class TestAndersonDarling:
    def test_normal_sample_passes(self, spark):
        random.seed(123)
        d = spark.createDataFrame(
            [(random.gauss(0.0, 1.0),) for _ in range(800)], "v double"
        )
        r = anderson_darling_normal(d, "v").collect()[0]
        assert r.nonnormal_5pct == 0
        assert r.a2_star < 0.752

    def test_exponential_sample_rejected(self, spark):
        random.seed(7)
        d = spark.createDataFrame(
            [(random.expovariate(0.5),) for _ in range(400)], "v double"
        )
        r = anderson_darling_normal(d, "v").collect()[0]
        assert r.nonnormal_5pct == 1
        assert r.a2_star > 5.0

    def test_matches_exact_phi_reference(self, spark):
        """Definition-level check with math.erf's exact Φ (the A&S
        polynomial's 1.5e-7 error is invisible at this tolerance)."""
        random.seed(42)
        vals = [random.gauss(5.0, 3.0) for _ in range(200)]
        n = len(vals)
        m = sum(vals) / n
        sd = math.sqrt(sum((x - m) ** 2 for x in vals) / (n - 1))

        def phi(z):
            return 0.5 * (1 + math.erf(z / math.sqrt(2)))

        s = 0.0
        for i, x in enumerate(sorted(vals), start=1):
            f = min(max(phi((x - m) / sd), 1e-12), 1 - 1e-12)
            s += (2 * i - 1) * math.log(f) + (2 * (n - i) + 1) * math.log(1 - f)
        a2_ref = -n - s / n
        d = spark.createDataFrame([(x,) for x in vals], "v double")
        r = anderson_darling_normal(d, "v").collect()[0]
        assert abs(r.a2 - a2_ref) < 1e-4, (r.a2, a2_ref)


class TestJarqueBera:
    def test_normal_sample_high_p(self, spark):
        random.seed(123)
        d = spark.createDataFrame(
            [(random.gauss(0.0, 1.0),) for _ in range(800)], "v double"
        )
        r = jarque_bera(d, "v").collect()[0]
        assert r.p_value > 0.05
        assert abs(r.skewness) < 0.3 and abs(r.kurtosis - 3.0) < 0.6

    def test_skewed_sample_rejected(self, spark):
        random.seed(7)
        d = spark.createDataFrame(
            [(random.expovariate(0.5),) for _ in range(400)], "v double"
        )
        r = jarque_bera(d, "v").collect()[0]
        assert r.p_value < 0.001 and r.skewness > 1.0

    def test_hand_moments(self, spark):
        # symmetric two-point mass {−1,+1}: skew 0, kurtosis exactly 1,
        # JB = n/6 · (0 + 4/4) = n/6
        d = spark.createDataFrame([(-1.0,), (1.0,)] * 30, "v double")
        r = jarque_bera(d, "v").collect()[0]
        assert abs(r.skewness) < 1e-9
        assert abs(r.kurtosis - 1.0) < 1e-9
        assert abs(r.jb_stat - 10.0) < 1e-6


class TestDurbinWatson:
    def test_iid_residuals_near_two(self, spark):
        random.seed(11)
        rows = [(i, 2.0 * i + random.gauss(0, 1), float(i)) for i in range(200)]
        d = spark.createDataFrame(rows, "t long, y double, x double")
        r = durbin_watson(d, "t", "y", "x").collect()[0]
        assert 1.6 < r.dw < 2.4, r.dw
        assert abs(r.slope - 2.0) < 0.05

    def test_smooth_residuals_near_zero(self, spark):
        rows = [
            (i, 2.0 * i + 5.0 * math.sin(i / 3.0), float(i)) for i in range(100)
        ]
        d = spark.createDataFrame(rows, "t long, y double, x double")
        r = durbin_watson(d, "t", "y", "x").collect()[0]
        assert r.dw < 0.5, r.dw

    def test_alternating_residuals_near_four(self, spark):
        rows = [(i, (1.0 if i % 2 else -1.0), 0.0) for i in range(100)]
        d = spark.createDataFrame(rows, "t long, y double, x double")
        r = durbin_watson(d, "t", "y", "x").collect()[0]
        assert r.dw > 3.5, r.dw


class TestTost:
    def _arms(self, spark, shift):
        random.seed(3)
        rows = [("a", random.gauss(10, 1)) for _ in range(400)] + [
            ("b", random.gauss(10 + shift, 1)) for _ in range(400)
        ]
        return spark.createDataFrame(rows, "g string, v double")

    def test_null_difference_equivalent(self, spark):
        r = tost_equivalence(self._arms(spark, 0.0), "g", "v", delta=0.5).collect()[0]
        assert r.equivalent_5pct == 1 and r.p_tost < 0.05

    def test_large_difference_not_equivalent(self, spark):
        r = tost_equivalence(self._arms(spark, 2.0), "g", "v", delta=0.5).collect()[0]
        assert r.equivalent_5pct == 0 and r.p_tost > 0.5

    def test_difference_at_bound_not_equivalent(self, spark):
        # diff ≈ δ sits ON the margin: one one-sided p ≈ 0.5
        r = tost_equivalence(self._arms(spark, 0.5), "g", "v", delta=0.5).collect()[0]
        assert r.equivalent_5pct == 0

    def test_bad_delta_raises(self, spark):
        with pytest.raises(ValueError, match="delta"):
            tost_equivalence(self._arms(spark, 0.0), "g", "v", delta=0.0)


class TestRougeChrf:
    def _df(self, spark, pairs):
        return spark.createDataFrame(pairs, "id long, hyp array<string>, ref array<string>")

    def test_identity_hypothesis_scores_one(self, spark):
        from azure_data_engineering_spark.operators.texteval import rouge_n_corpus

        d = self._df(spark, [(1, ["a", "b", "c"], ["a", "b", "c"])])
        r = rouge_n_corpus(d, "id", "hyp", "ref", max_n=2).collect()[0]
        assert r.r1_f1 == 1.0 and r.r2_f1 == 1.0

    def test_rouge_recall_vs_precision_direction(self, spark):
        from azure_data_engineering_spark.operators.texteval import rouge_n_corpus

        # hypothesis covers half the reference exactly: recall 0.5,
        # precision 1.0
        d = self._df(spark, [(1, ["a", "b"], ["a", "b", "c", "d"])])
        r = rouge_n_corpus(d, "id", "hyp", "ref", max_n=1).collect()[0]
        assert abs(r.r1_recall - 0.5) < 1e-9
        assert abs(r.r1_precision - 1.0) < 1e-9

    def test_rouge_clipping(self, spark):
        from azure_data_engineering_spark.operators.texteval import rouge_n_corpus

        # "the the the" vs one "the": clipped matches = 1
        d = self._df(spark, [(1, ["the", "the", "the"], ["the", "cat"])])
        r = rouge_n_corpus(d, "id", "hyp", "ref", max_n=1).collect()[0]
        assert abs(r.r1_precision - 1.0 / 3.0) < 1e-6
        assert abs(r.r1_recall - 0.5) < 1e-9

    def test_chrf_identity_and_degradation(self, spark):
        from azure_data_engineering_spark.operators.texteval import chrf_corpus

        d = spark.createDataFrame(
            [(1, "the cat sat", "the cat sat"), (2, "spark", "spark")],
            "id long, hyp string, ref string",
        )
        r = chrf_corpus(d, "id", "hyp", "ref", max_n=3).collect()[0]
        assert r.chrf == 1.0
        d2 = spark.createDataFrame(
            [(1, "the cat sat", "the dog sat")], "id long, hyp string, ref string"
        )
        r2 = chrf_corpus(d2, "id", "hyp", "ref", max_n=3).collect()[0]
        assert 0.0 < r2.chrf < 1.0

    def test_chrf_ignores_whitespace(self, spark):
        from azure_data_engineering_spark.operators.texteval import chrf_corpus

        d = spark.createDataFrame(
            [(1, "thecatsat", "the cat sat")], "id long, hyp string, ref string"
        )
        r = chrf_corpus(d, "id", "hyp", "ref", max_n=3).collect()[0]
        assert r.chrf == 1.0

    def test_chrf_short_and_empty_docs_emit_no_partial_grams(self, spark):
        # strings shorter than n must contribute ZERO n-grams for that
        # n: Spark's sequence(1, 0) yields the DESCENDING [1, 0], so an
        # unguarded bound would fabricate two empty-substring grams per
        # short doc. With hyp='' and a 2-char hyp, every gram count must
        # come from the real strings only.
        from azure_data_engineering_spark.operators.texteval import chrf_corpus

        d = spark.createDataFrame(
            [(1, "", "abcd"), (2, "ab", "abcd"), (3, "abcd", "abcd")],
            "id long, hyp string, ref string",
        )
        r = chrf_corpus(d, "id", "hyp", "ref", max_n=4).collect()[0]
        assert r.n_docs == 3
        # recall per n: m/r = 6/12, 4/9, 2/6, 1/3 (doc2 contributes NO
        # n>=3 grams; doc1 none at all)
        exp_recall = (6 / 12 + 4 / 9 + 2 / 6 + 1 / 3) / 4
        assert r.chr_recall == pytest.approx(exp_recall, abs=1e-6)
        # every emitted hyp gram matches, so each precision term is 1;
        # the buggy descending sequence(1,0) would add two fabricated
        # ''-grams per short side and drag precision below 1
        assert r.chr_precision == pytest.approx(1.0, abs=1e-6)


class TestQueryLikelihood:
    def _docs(self, spark):
        rows = [
            (1, "spark join spark join spark"),
            (2, "spark window table"),
            (3, "table scan filter group"),
            (4, "join join join window window table scan filter agg sort"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_term_heavy_doc_ranks_first(self, spark):
        from azure_data_engineering_spark.operators.tfidf import (
            query_likelihood_search,
        )

        r = query_likelihood_search(
            self._docs(spark), ["spark", "join"], "text", "doc_id", k=4, mu=10.0
        ).collect()
        assert r[0].doc_id == 1
        # doc 3 has no query term -> not a candidate
        assert all(row.doc_id != 3 for row in r)

    def test_duplicate_query_terms_weight(self, spark):
        from azure_data_engineering_spark.operators.tfidf import (
            query_likelihood_search,
        )

        single = query_likelihood_search(
            self._docs(spark), ["join"], "text", "doc_id", k=4, mu=10.0
        ).collect()
        doubled = query_likelihood_search(
            self._docs(spark), ["join", "join"], "text", "doc_id", k=4, mu=10.0
        ).collect()
        s1 = {r.doc_id: r.ql_score for r in single}
        s2 = {r.doc_id: r.ql_score for r in doubled}
        for d in s1:
            # both sides round to 6 dp independently: 2x a rounded
            # value can differ from the rounded 2x by one ulp of 1e-6
            assert abs(s2[d] - 2 * s1[d]) < 2.1e-6

    def test_empty_query_returns_empty(self, spark):
        from azure_data_engineering_spark.operators.tfidf import (
            query_likelihood_search,
        )

        assert (
            query_likelihood_search(
                self._docs(spark), ["!!!"], "text", "doc_id"
            ).count()
            == 0
        )


class TestShapleyAttribution:
    def test_hand_computed_two_channel_game(self, spark):
        # v({})=0, v({A})=10, v({B})=0, v({A,B})=30 ->
        # phi_A = (10+30)/2 = 20, phi_B = (0+20)/2 = 10
        rows = []
        uid = 0

        def add(chs, conv, n):
            nonlocal uid
            for _ in range(n):
                uid += 1
                for i, c in enumerate(chs):
                    rows.append((uid, c, i))
                if conv:
                    rows.append((uid, "buy", 99))

        add(["A"], True, 10)
        add(["A"], False, 10)
        add(["B"], False, 10)
        add(["A", "B"], True, 20)
        add(["A", "B"], False, 10)
        from azure_data_engineering_spark.operators.funnel import (
            shapley_attribution,
        )

        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        got = {
            r.channel: r.shapley_value
            for r in shapley_attribution(
                df, "user_id", "event_type", "ts", "buy"
            ).collect()
        }
        assert got == {"A": 20.0, "B": 10.0}

    def test_efficiency_identity(self, spark):
        # sum of shapley values == v(K) == total conversions of
        # users with at least one touch
        rows = [
            (1, "A", 0), (1, "buy", 1),
            (2, "B", 0), (2, "C", 1), (2, "buy", 2),
            (3, "A", 0), (3, "C", 1),
            (4, "C", 0), (4, "buy", 1),
        ]
        from azure_data_engineering_spark.operators.funnel import (
            shapley_attribution,
        )

        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        out = shapley_attribution(df, "user_id", "event_type", "ts", "buy").collect()
        assert abs(sum(r.shapley_value for r in out) - 3.0) < 1e-6

    def test_dummy_channel_gets_zero(self, spark):
        # a channel only touched by non-converters is a dummy player
        rows = [
            (1, "A", 0), (1, "buy", 1),
            (2, "D", 0),
            (3, "D", 0),
        ]
        from azure_data_engineering_spark.operators.funnel import (
            shapley_attribution,
        )

        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        got = {
            r.channel: r.shapley_value
            for r in shapley_attribution(
                df, "user_id", "event_type", "ts", "buy"
            ).collect()
        }
        assert got["D"] == 0.0 and got["A"] == 1.0

    def test_too_many_channels_raise(self, spark):
        from azure_data_engineering_spark.operators.funnel import (
            shapley_attribution,
        )

        rows = [(1, f"c{j}", j) for j in range(9)] + [(1, "buy", 99)]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        with pytest.raises(ValueError, match="max_channels"):
            shapley_attribution(df, "user_id", "event_type", "ts", "buy")


class TestBitemporalAsof:
    LOG = [
        (1, "2024-01-01", 5, "v1"),
        (1, "2024-02-01", 23, "v2"),
        (1, "2024-01-01", 40, "v1fix"),
        (2, "2024-01-15", 16, "w1"),
    ]

    def _asof(self, spark, v, t):
        from azure_data_engineering_spark.operators.scd import bitemporal_asof

        df = spark.createDataFrame(
            self.LOG, "pk long, valid_from string, tx long, val string"
        )
        return {
            r.pk: r.val
            for r in bitemporal_asof(df, ["pk"], "valid_from", "tx", v, t).collect()
        }

    def test_belief_before_correction(self, spark):
        assert self._asof(spark, "2024-01-20", 30) == {1: "v1", 2: "w1"}

    def test_correction_rewrites_history(self, spark):
        assert self._asof(spark, "2024-01-20", 99) == {1: "v1fix", 2: "w1"}

    def test_later_effective_version_wins_at_later_v(self, spark):
        assert self._asof(spark, "2024-02-15", 99) == {1: "v2", 2: "w1"}

    def test_nothing_known_before_first_tx(self, spark):
        assert self._asof(spark, "2024-02-15", 4) == {}


class TestGmmEm:
    def test_recovers_bimodal_mixture(self, spark):
        from azure_data_engineering_spark.operators.mlplan import gmm_em_1d

        random.seed(5)
        vals = [random.gauss(10, 2) for _ in range(500)] + [
            random.gauss(40, 4) for _ in range(300)
        ]
        d = spark.createDataFrame([(v,) for v in vals], "v double")
        r = gmm_em_1d(d, "v", rounds=5).collect()[0]
        assert abs(r.mu1 - 10.0) < 0.5 and abs(r.mu2 - 40.0) < 1.0
        assert abs(r.w1 - 0.625) < 0.02
        assert abs(r.sigma1 - 2.0) < 0.3 and abs(r.sigma2 - 4.0) < 0.6

    def test_loglik_monotone_nondecreasing(self, spark):
        # EM's defining property: average log-likelihood never drops
        from azure_data_engineering_spark.operators.mlplan import gmm_em_1d

        random.seed(9)
        vals = [random.gauss(0, 1) for _ in range(300)] + [
            random.gauss(8, 2) for _ in range(300)
        ]
        d = spark.createDataFrame([(v,) for v in vals], "v double")
        lls = [
            gmm_em_1d(d, "v", rounds=k).collect()[0].avg_loglik
            for k in (1, 3, 5)
        ]
        assert lls[0] <= lls[1] + 1e-6 and lls[1] <= lls[2] + 1e-6, lls

    def test_components_ordered(self, spark):
        from azure_data_engineering_spark.operators.mlplan import gmm_em_1d

        random.seed(2)
        vals = [random.gauss(-5, 1) for _ in range(200)] + [
            random.gauss(5, 1) for _ in range(200)
        ]
        d = spark.createDataFrame([(v,) for v in vals], "v double")
        r = gmm_em_1d(d, "v", rounds=4).collect()[0]
        assert r.mu1 < r.mu2

    def test_bad_rounds_raise(self, spark):
        from azure_data_engineering_spark.operators.mlplan import gmm_em_1d

        d = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="rounds"):
            gmm_em_1d(d, "v", rounds=0)


class TestThetaForecast:
    def _run(self, spark, vals, horizon=3, alpha=0.2):
        from azure_data_engineering_spark.operators.timeseries import (
            theta_forecast,
        )

        rows = [("s", f"t{i:03d}", float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, t string, x double")
        return theta_forecast(df, "g", "t", "x", horizon=horizon, alpha=alpha).collect()

    def test_pure_trend_extrapolates_exactly(self, spark):
        # y = 3 + 2t: theta2 line equals the series, SES converges to
        # values near the end; forecast ~ trend for h=1
        out = self._run(spark, [3 + 2 * t for t in range(1, 41)], horizon=2)
        f1 = [r for r in out if r.h == 1][0]
        # trend component is exact: a=3, b=2 -> 3 + 2*41 = 85
        assert abs(f1.trend_component - 85.0) < 1e-6
        # SES of the theta2 line (== y) lags the trend -> forecast
        # between the SES level and the trend line
        assert f1.ses_component < f1.trend_component
        assert f1.ses_component < f1.forecast < f1.trend_component

    def test_flat_series_forecasts_level(self, spark):
        out = self._run(spark, [10.0] * 30, horizon=3)
        for r in out:
            assert abs(r.forecast - 10.0) < 1e-6

    def test_closed_form_matches_recursive_ses(self, spark):
        # definition-level check: replay the theta decomposition +
        # recursive SES in pure python
        vals = [5.0, 7.0, 6.0, 9.0, 8.0, 12.0, 11.0, 13.0, 15.0, 14.0]
        n = len(vals)
        ts = list(range(1, n + 1))
        mi = sum(ts) / n
        mx = sum(vals) / n
        b = sum((t - mi) * (x - mx) for t, x in zip(ts, vals)) / sum(
            (t - mi) ** 2 for t in ts
        )
        b = round(b, 9)
        a = round(mx - b * mi, 9)
        z = [round(2 * x - (a + b * t), 9) for t, x in zip(ts, vals)]
        lvl = z[0]
        for zz in z[1:]:
            lvl = 0.2 * zz + 0.8 * lvl
        out = self._run(spark, vals, horizon=1)
        r = out[0]
        assert abs(r.ses_component - lvl) < 1e-5, (r.ses_component, lvl)
        assert abs(r.trend_component - (a + b * (n + 1))) < 1e-6

    def test_bad_horizon_raises(self, spark):
        with pytest.raises(ValueError, match="horizon"):
            self._run(spark, [1.0, 2.0], horizon=0)


class TestBreuschPagan:
    def test_heteroscedastic_flags(self, spark):
        from azure_data_engineering_spark.operators.stats import breusch_pagan

        random.seed(4)
        # residual sd grows with x
        rows = [
            (float(x), 2.0 * x + random.gauss(0, 0.2 + 0.5 * x))
            for x in range(1, 400)
        ]
        d = spark.createDataFrame(rows, "x double, y double")
        r = breusch_pagan(d, "y", "x").collect()[0]
        assert r.heteroscedastic_5pct == 1 and r.p_value < 0.01

    def test_homoscedastic_passes(self, spark):
        from azure_data_engineering_spark.operators.stats import breusch_pagan

        random.seed(8)
        rows = [
            (float(x), 2.0 * x + random.gauss(0, 5.0)) for x in range(1, 400)
        ]
        d = spark.createDataFrame(rows, "x double, y double")
        r = breusch_pagan(d, "y", "x").collect()[0]
        assert r.heteroscedastic_5pct == 0 and r.p_value > 0.05


class TestHistogram2d:
    def test_counts_and_grid_shape(self, spark):
        from azure_data_engineering_spark.operators.diagnostics import (
            histogram_2d,
        )

        rows = [(float(i % 4), float((i // 4) % 2)) for i in range(80)]
        d = spark.createDataFrame(rows, "x double, y double")
        out = histogram_2d(d, "x", "y", x_bins=4, y_bins=2).collect()
        assert len(out) == 8
        assert sum(r.n for r in out) == 80
        assert abs(sum(r.share for r in out) - 1.0) < 1e-6
        # uniform by construction: every cell holds 10
        assert all(r.n == 10 for r in out)

    def test_max_value_lands_in_last_bin(self, spark):
        from azure_data_engineering_spark.operators.diagnostics import (
            histogram_2d,
        )

        d = spark.createDataFrame(
            [(0.0, 0.0), (10.0, 10.0)], "x double, y double"
        )
        out = {(r.x_bin, r.y_bin): r.n for r in
               histogram_2d(d, "x", "y", x_bins=5, y_bins=5).collect()}
        assert out[(0, 0)] == 1 and out[(4, 4)] == 1

    def test_degenerate_axis_single_bin(self, spark):
        from azure_data_engineering_spark.operators.diagnostics import (
            histogram_2d,
        )

        d = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0)], "x double, y double"
        )
        out = histogram_2d(d, "x", "y", x_bins=2, y_bins=3).collect()
        assert sum(r.n for r in out) == 2
        assert all(r.y_bin == 0 for r in out if r.n > 0)


class TestMomentOperatorsExcludeNulls:
    """A NULL value row must be invisible: excluded before n is
    counted, not silently skipped by the sums while still inflating n
    (the histogram_2d contract, applied to every moment-based
    operator in the family)."""

    def _pair(self, spark, vals):
        clean = spark.createDataFrame([(v,) for v in vals], "v double")
        dirty = spark.createDataFrame(
            [(v,) for v in vals] + [(None,), (None,), (None,)], "v double"
        )
        return clean, dirty

    def test_jarque_bera_ignores_nulls(self, spark):
        random.seed(11)
        clean, dirty = self._pair(
            spark, [random.gauss(5, 2) for _ in range(200)]
        )
        a = jarque_bera(clean, "v").collect()[0]
        b = jarque_bera(dirty, "v").collect()[0]
        assert a == b and a.n == 200

    def test_anderson_darling_ignores_nulls(self, spark):
        random.seed(12)
        clean, dirty = self._pair(
            spark, [random.gauss(0, 1) for _ in range(150)]
        )
        a = anderson_darling_normal(clean, "v").collect()[0]
        b = anderson_darling_normal(dirty, "v").collect()[0]
        assert a == b and a.n == 150

    def test_gmm_em_ignores_nulls(self, spark):
        from azure_data_engineering_spark.operators.mlplan import gmm_em_1d

        random.seed(13)
        vals = [random.gauss(3, 1) for _ in range(80)] + [
            random.gauss(30, 2) for _ in range(80)
        ]
        clean, dirty = self._pair(spark, vals)
        a = gmm_em_1d(clean, "v", rounds=2).collect()[0]
        b = gmm_em_1d(dirty, "v", rounds=2).collect()[0]
        assert a == b and a.n == 160

    def test_durbin_watson_ignores_null_rows(self, spark):
        rows = [(float(t), 2.0 * t + (1 if t % 2 else -1), float(t))
                for t in range(1, 40)]
        clean = spark.createDataFrame(rows, "t double, y double, x double")
        dirty = spark.createDataFrame(
            rows + [(99.0, None, 99.0), (None, 5.0, 5.0)],
            "t double, y double, x double",
        )
        a = durbin_watson(clean, "t", "y", "x").collect()[0]
        b = durbin_watson(dirty, "t", "y", "x").collect()[0]
        assert a == b and a.n == 39

    def test_breusch_pagan_ignores_null_rows(self, spark):
        from azure_data_engineering_spark.operators.stats import breusch_pagan

        random.seed(14)
        rows = [
            (x, 3.0 * x + random.gauss(0, 1 + x / 10))
            for x in [float(i % 25 + 1) for i in range(200)]
        ]
        clean = spark.createDataFrame(rows, "x double, y double")
        dirty = spark.createDataFrame(
            rows + [(None, 4.0), (7.0, None)], "x double, y double"
        )
        a = breusch_pagan(clean, "y", "x").collect()[0]
        b = breusch_pagan(dirty, "y", "x").collect()[0]
        assert a == b and a.n == 200


class TestBitemporalTiebreak:
    def test_duplicate_assertions_resolve_deterministically(self, spark):
        # Two contradictory assertions with IDENTICAL (pk, valid_from,
        # tx): the winner must be the payload-digest total order —
        # stable across runs and partitionings — not partition arrival
        # order.
        import hashlib

        from azure_data_engineering_spark.operators.scd import bitemporal_asof

        rows = [
            (1, "2024-01-01", 10, "alpha"),
            (1, "2024-01-01", 10, "beta"),
            (2, "2024-01-01", 10, "gamma"),
        ]
        expected = min(
            ["alpha", "beta"], key=lambda v: hashlib.md5(v.encode()).hexdigest()
        )
        for parts in (1, 7):
            df = spark.createDataFrame(
                rows, "pk long, valid_from string, tx long, val string"
            ).repartition(parts)
            got = {
                r.pk: r.val
                for r in bitemporal_asof(
                    df, ["pk"], "valid_from", "tx", "2024-06-01", 99
                ).collect()
            }
            assert got == {1: expected, 2: "gamma"}

    def test_real_correction_still_beats_digest_order(self, spark):
        # the digest only breaks EXACT tx ties; a later tx always wins
        from azure_data_engineering_spark.operators.scd import bitemporal_asof

        df = spark.createDataFrame(
            [(1, "2024-01-01", 10, "zzz"), (1, "2024-01-01", 11, "aaa")],
            "pk long, valid_from string, tx long, val string",
        )
        got = bitemporal_asof(
            df, ["pk"], "valid_from", "tx", "2024-06-01", 99
        ).collect()
        assert got[0].val == "aaa"
