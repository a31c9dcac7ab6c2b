"""Round-10 wave-A operators: Herfindahl index, Deming regression,
sharp RDD, SRM check, Yule-Walker AR(2), Page-Hinkley, interval
union, cohort LTV curve."""

from __future__ import annotations

import pytest


class TestHerfindahl:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.diagnostics import (
            herfindahl_index,
        )

        df = spark.createDataFrame(rows, "m string, f int, v double")
        return {r.market: r for r in herfindahl_index(df, "m", "f", "v").collect()}

    def test_monopoly_is_one(self, spark):
        r = self._run(spark, [("a", 1, 10.0), ("a", 1, 5.0)])["a"]
        assert r.n_firms == 1 and r.hhi == 1.0 and r.hhi_normalized == 1.0

    def test_equal_split_normalized_zero(self, spark):
        rows = [("a", i, 10.0) for i in range(4)]
        r = self._run(spark, rows)["a"]
        assert abs(r.hhi - 0.25) < 1e-9
        assert abs(r.hhi_normalized) < 1e-9

    def test_skewed_market(self, spark):
        # shares 0.8 / 0.2 -> hhi 0.68
        r = self._run(spark, [("a", 1, 80.0), ("a", 2, 20.0)])["a"]
        assert abs(r.hhi - 0.68) < 1e-9


class TestDeming:
    def _run(self, spark, rows, delta=1.0):
        from azure_data_engineering_spark.operators.stats import deming_regression

        df = spark.createDataFrame(rows, "x double, y double")
        return deming_regression(df, "x", "y", delta=delta).collect()[0]

    def test_exact_line_recovered(self, spark):
        rows = [(float(i), 2.0 * i + 1.0) for i in range(20)]
        r = self._run(spark, rows)
        assert abs(r.slope - 2.0) < 1e-6
        assert abs(r.intercept - 1.0) < 1e-6
        assert abs(r.ols_slope - 2.0) < 1e-6

    def test_symmetric_noise_beats_ols_attenuation(self, spark):
        # true slope 1; noise on BOTH axes. Deming(delta=1) must sit
        # closer to 1 than attenuated OLS.
        rows = []
        for i in range(200):
            t = float(i % 50)
            nx = ((i * 7) % 5 - 2.0) * 1.5
            ny = ((i * 11) % 5 - 2.0) * 1.5
            rows.append((t + nx, t + ny))
        r = self._run(spark, rows)
        assert r.ols_slope < r.slope <= 1.05
        assert abs(r.slope - 1.0) < 0.05


class TestRddSharp:
    def _run(self, spark, rows, **kw):
        from azure_data_engineering_spark.operators.stats import rdd_sharp

        df = spark.createDataFrame(rows, "score double, y double")
        return rdd_sharp(df, "score", "y", **kw).collect()[0]

    def test_known_jump(self, spark):
        # y = 0.5*x below 50, 0.5*x + 10 at/above: tau = 10
        rows = [
            (float(s), 0.5 * s + (10.0 if s >= 50 else 0.0))
            for s in range(20, 80)
            for _ in range(3)
        ]
        r = self._run(spark, rows, cutoff=50.0, bandwidth=30.0)
        assert abs(r.tau_rdd - 10.0) < 1e-6
        assert abs(r.slope_left - 0.5) < 1e-6
        assert abs(r.slope_right - 0.5) < 1e-6

    def test_no_jump_near_zero(self, spark):
        rows = [(float(s), 2.0 * s) for s in range(20, 80) for _ in range(2)]
        r = self._run(spark, rows, cutoff=50.0, bandwidth=30.0)
        assert abs(r.tau_rdd) < 1e-6

    def test_bandwidth_excludes_far_points(self, spark):
        rows = [(float(s), 1.0) for s in range(0, 100)]
        r = self._run(spark, rows, cutoff=50.0, bandwidth=10.0)
        assert r.n_left == 10 and r.n_right == 10


class TestSrmCheck:
    def _run(self, spark, counts, expected=None):
        from azure_data_engineering_spark.operators.stats import srm_check

        rows = [(arm,) for arm, n in counts.items() for _ in range(n)]
        df = spark.createDataFrame(rows, "arm string")
        return srm_check(df, "arm", expected_ratios=expected).collect()[0]

    def test_balanced_no_flag(self, spark):
        r = self._run(spark, {"a": 500, "b": 500})
        assert r.srm_flag == 0 and r.p_value > 0.5

    def test_mismatch_flags(self, spark):
        r = self._run(spark, {"a": 600, "b": 400})
        assert r.srm_flag == 1 and r.p_value < 0.001

    def test_design_ratios_respected(self, spark):
        # 90/10 design observed exactly -> no alarm
        r = self._run(spark, {"a": 900, "b": 100}, expected={"a": 0.9, "b": 0.1})
        assert r.srm_flag == 0
        assert abs(r.chi2) < 1e-9

    def test_starved_design_arm_alarms(self, spark):
        # a design arm with ZERO observed rows must contribute its full
        # e-sized chi2 term — the broken-randomizer case the gate
        # exists for (ADVICE r10)
        r = self._run(
            spark,
            {"a": 500, "b": 500},
            expected={"a": 0.45, "b": 0.45, "c": 0.10},
        )
        assert r.k_arms == 3
        assert r.srm_flag == 1 and r.p_value < 0.001
        # the starved arm's term alone is e = 0.10 * 1000 = 100
        assert r.chi2 > 100.0 - 1e-6

    def test_stray_observed_arm_raises(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not in the experiment design"):
            self._run(spark, {"a": 500, "zz": 500}, expected={"a": 1.0})

    def test_ratios_must_sum_to_one(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="must sum to 1"):
            self._run(spark, {"a": 500}, expected={"a": 0.5})


class TestYuleWalker:
    def _run(self, spark, vals):
        from azure_data_engineering_spark.operators.timeseries import yule_walker_ar2

        rows = [(f"t{i:04d}", float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "t string, x double")
        return yule_walker_ar2(df, "t", "x").collect()[0]

    def test_alternating_series_negative_phi1(self, spark):
        vals = [10.0, -10.0] * 40
        r = self._run(spark, vals)
        assert r.r1 < -0.9
        assert r.phi1 < 0
        assert r.ar2_stationary == 1

    def test_ar1_series_recovers_phi1_zero_phi2(self, spark):
        # x_t = 0.6 x_{t-1} + deterministic md5 noise: Yule-Walker must
        # put the memory on phi1 and leave phi2 ~ 0 (pure-python
        # cross-check: phi1 = 0.545, phi2 = -0.003)
        import hashlib

        def noise(i):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            return (h % 1000) / 1000.0 - 0.5

        x = [0.0]
        for i in range(1, 150):
            x.append(round(0.6 * x[-1] + noise(i), 6))
        r = self._run(spark, x)
        assert abs(r.phi1 - 0.545) < 0.01
        assert abs(r.phi2) < 0.05
        assert r.ar2_stationary == 1

    def test_sigma2_nonnegative_and_leq_c0(self, spark):
        vals = [float(i % 9) for i in range(100)]
        r = self._run(spark, vals)
        assert r.sigma2 >= 0


class TestPageHinkley:
    def _run(self, spark, vals, lam=10.0):
        from azure_data_engineering_spark.operators.timeseries import page_hinkley

        rows = [(f"t{i:04d}", float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "t string, x double")
        return page_hinkley(df, "t", "x", lam=lam).orderBy("t").collect()

    def test_flat_series_never_alarms(self, spark):
        out = self._run(spark, [5.0] * 50)
        assert all(r.alarm == 0 for r in out)
        assert all(abs(r.ph_t) < 1e-9 for r in out)

    def test_upward_shift_alarms_after_shift(self, spark):
        vals = [10.0] * 30 + [25.0] * 20
        out = self._run(spark, vals, lam=20.0)
        assert all(r.alarm == 0 for r in out[:30])
        assert any(r.alarm == 1 for r in out[30:])

    def test_running_mean_is_causal(self, spark):
        out = self._run(spark, [2.0, 4.0, 6.0])
        assert [r.running_mean for r in out] == [2.0, 3.0, 4.0]


class TestIntervalUnion:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.relational import (
            interval_union_length,
        )

        df = spark.createDataFrame(rows, "g string, s double, e double")
        return {
            r.group: r for r in interval_union_length(df, "g", "s", "e").collect()
        }

    def test_disjoint_intervals_sum(self, spark):
        r = self._run(spark, [("a", 0.0, 10.0), ("a", 20.0, 25.0)])["a"]
        assert r.union_length == 15.0 and r.n_islands == 2
        assert r.span_length == 25.0
        assert abs(r.coverage_ratio - 0.6) < 1e-9

    def test_overlap_not_double_counted(self, spark):
        r = self._run(spark, [("a", 0.0, 10.0), ("a", 5.0, 15.0)])["a"]
        assert r.union_length == 15.0 and r.n_islands == 1

    def test_contained_interval_absorbed(self, spark):
        r = self._run(spark, [("a", 0.0, 20.0), ("a", 5.0, 8.0), ("a", 25.0, 30.0)])["a"]
        assert r.union_length == 25.0 and r.n_islands == 2

    def test_three_way_chain(self, spark):
        # a->b->c chained overlaps: one island despite c not touching a
        r = self._run(
            spark, [("a", 0.0, 10.0), ("a", 8.0, 18.0), ("a", 16.0, 26.0)]
        )["a"]
        assert r.union_length == 26.0 and r.n_islands == 1


class TestCohortLtv:
    def test_tiny_cohorts(self, spark):
        from azure_data_engineering_spark.operators.funnel import cohort_ltv_curve

        rows = [
            # user 1 acquired 2024-01, spends in jan + feb
            (1, "2024-01-05", 10.0),
            (1, "2024-02-10", 20.0),
            # user 2 acquired 2024-01, spends in jan only
            (2, "2024-01-20", 30.0),
            # user 3 acquired 2024-02
            (3, "2024-02-15", 40.0),
        ]
        df = spark.createDataFrame(rows, "u long, d string, v double").select(
            "u", F := None or __import__("pyspark.sql.functions", fromlist=["x"]).to_timestamp("d").alias("ts"), "v"
        )
        out = cohort_ltv_curve(df, "u", "ts", "v").collect()
        got = {(r.cohort_month, r.age_months): r for r in out}
        jan0 = got[("2024-01", 0)]
        assert jan0.cohort_users == 2 and jan0.revenue == 40.0
        jan1 = got[("2024-01", 1)]
        assert jan1.cum_revenue == 60.0 and jan1.cum_ltv_per_user == 30.0
        feb0 = got[("2024-02", 0)]
        assert feb0.cohort_users == 1 and feb0.cum_ltv_per_user == 40.0

    def test_week_mode_schema_is_truthful(self, spark):
        # period='week' emits (cohort_week, age_weeks), not month-named
        # columns carrying week-grained numbers (ADVICE r10)
        from azure_data_engineering_spark.operators.funnel import cohort_ltv_curve

        Fn = __import__("pyspark.sql.functions", fromlist=["x"])
        rows = [(1, "2024-01-01", 10.0), (1, "2024-01-10", 20.0)]
        df = spark.createDataFrame(rows, "u long, d string, v double").select(
            "u", Fn.to_timestamp("d").alias("ts"), "v"
        )
        out = cohort_ltv_curve(df, "u", "ts", "v", period="week")
        assert out.columns[:2] == ["cohort_week", "age_weeks"]
        got = {r.age_weeks: r for r in out.collect()}
        assert got[0].revenue == 10.0 and got[1].cum_revenue == 30.0


class TestIpwAte:
    def _mk(self, spark):
        # confounded assignment: treat prob rises with x1; outcome
        # y = 2*x1 + tau*t with TRUE tau = 1.0. Naive diff inflates
        # because treated units have larger x1.
        rows = []
        for i in range(800):
            x1 = float(i % 10)
            x2 = float((i * 3) % 7) / 7.0
            treat = 1.0 if (i * 37) % 100 < 10 * x1 else 0.0
            y = 2.0 * x1 + 1.0 * treat
            rows.append((x1 / 10.0, x2, treat, y))
        return spark.createDataFrame(
            rows, "x1 double, x2 double, treat double, y double"
        )

    def test_ipw_removes_confounding_bias(self, spark):
        from azure_data_engineering_spark.operators.stats import ipw_ate

        r = ipw_ate(self._mk(spark), "treat", "y", "x1", "x2").collect()[0]
        true_tau = 1.0
        assert abs(r.naive_diff - true_tau) > 3.0  # confounded by design
        assert abs(r.ate_ipw - true_tau) < abs(r.naive_diff - true_tau)

    def test_ess_bounded_by_arm_size(self, spark):
        from azure_data_engineering_spark.operators.stats import ipw_ate

        df = self._mk(spark)
        r = ipw_ate(df, "treat", "y", "x1", "x2").collect()[0]
        n1 = df.filter("treat = 1.0").count()
        n0 = df.filter("treat = 0.0").count()
        assert 0 < r.ess_treated <= n1 + 1e-6
        assert 0 < r.ess_control <= n0 + 1e-6


class TestCoxPh:
    def _run(self, spark, rows, iters=4):
        from azure_data_engineering_spark.operators.stats import cox_ph_newton

        df = spark.createDataFrame(rows, "duration long, ev int, x double")
        return cox_ph_newton(df, "duration", "ev", "x", iterations=iters).collect()[0]

    def test_matches_pure_python_newton(self, spark):
        # cross-checked against a pure-python replica of the same
        # rounded Breslow-Newton trajectory: beta = -0.474203
        rows = [(1, 1, 1.0), (2, 1, 0.0), (3, 0, 1.0), (4, 1, 1.0),
                (5, 0, 0.0), (6, 1, 0.0), (7, 0, 1.0), (8, 1, 1.0)]
        r = self._run(spark, rows)
        assert abs(r.beta - (-0.474203)) < 1e-5
        assert abs(r.se_beta - 1.002768) < 1e-5
        assert r.n == 8 and r.n_events == 5

    def test_risky_covariate_positive_beta(self, spark):
        # x=1 subjects die earlier with OVERLAPPING risk sets (a fully
        # separated fixture diverges - monotone likelihood). Pure-python
        # replica of the same rounded trajectory: beta = 1.642157
        rows = [(d, 1, 1.0) for d in range(1, 21)] + [
            (d + 10, 1, 0.0) for d in range(1, 21)
        ]
        r = self._run(spark, rows)
        assert abs(r.beta - 1.642157) < 1e-5
        assert r.hazard_ratio > 1.5
        assert r.p_value < 0.05

    def test_null_covariate_no_effect(self, spark):
        # covariate independent of timing -> beta ~ 0, p large
        rows = [(d, 1, float(d % 2)) for d in range(1, 41)]
        r = self._run(spark, rows)
        assert abs(r.beta) < 0.6
        assert r.p_value > 0.05


class TestSvmGd:
    def test_separable_perfect_accuracy(self, spark):
        from azure_data_engineering_spark.operators.mlplan import svm_gd

        rows = [
            (float(i % 10) - 4.5, 0.0, 1.0 if i % 10 >= 5 else -1.0)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = svm_gd(df, "x1", "x2", "t", iterations=20, lr=0.5, reg=0.001).collect()[0]
        assert r.accuracy == 1.0
        assert r.hinge_loss == 0.0 and r.margin_violations == 0
        assert r.w1 > 0  # larger x1 -> positive class

    def test_hinge_loss_nonnegative(self, spark):
        from azure_data_engineering_spark.operators.mlplan import svm_gd

        rows = [(float(i % 4), float(i % 3), 1.0 if (i * 7) % 2 else -1.0) for i in range(100)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = svm_gd(df, "x1", "x2", "t", iterations=5).collect()[0]
        assert r.hinge_loss >= 0
        assert 0 <= r.margin_violations <= 100


class TestCroston:
    def _run(self, spark, series, alpha=0.2):
        from azure_data_engineering_spark.operators.timeseries import croston_forecast

        rows = [("s", f"t{i:04d}", float(v)) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "g string, t string, x double")
        return croston_forecast(df, "g", "t", "x", alpha=alpha).collect()[0]

    def test_regular_intermittent_pattern(self, spark):
        # demand 6 every 3rd period: z_hat -> 6, p_hat -> 3, fc -> 2
        series = [0.0, 0.0, 6.0] * 10
        r = self._run(spark, series)
        assert abs(r.z_hat - 6.0) < 1e-6
        assert abs(r.p_hat - 3.0) < 1e-6
        assert abs(r.croston_forecast - 2.0) < 1e-6
        assert abs(r.sba_forecast - 1.8) < 1e-6

    def test_single_demand_null_interval(self, spark):
        series = [0.0, 5.0, 0.0, 0.0]
        r = self._run(spark, series)
        assert r.n_demands == 1 and abs(r.z_hat - 5.0) < 1e-9
        assert r.p_hat is None and r.croston_forecast is None

    def test_all_zero_series(self, spark):
        r = self._run(spark, [0.0] * 8)
        assert r.n_demands == 0 and r.z_hat is None

    def test_ses_weights_recent_demand_more(self, spark):
        # sizes 2,2,...,10 (last demand bigger): z_hat between 2 and 10,
        # above the plain mean because alpha favors recency
        series = ([0.0, 2.0] * 6) + [0.0, 10.0]
        r = self._run(spark, series, alpha=0.5)
        assert 2.0 < r.z_hat < 10.0
        assert r.z_hat > 3.1  # mean of sizes is ~3.14; SES(0.5) ~ 6


class TestEngleGranger:
    def _run(self, spark, ys, xs):
        from azure_data_engineering_spark.operators.timeseries import (
            engle_granger_coint,
        )

        rows = [(f"t{i:04d}", float(y), float(x)) for i, (y, x) in enumerate(zip(ys, xs))]
        df = spark.createDataFrame(rows, "t string, y double, x double")
        return engle_granger_coint(df, "t", "y", "x").collect()[0]

    def test_cointegrated_pair_flags(self, spark):
        # shared trend + mean-reverting spread: cointegrated
        import hashlib

        def noise(i, salt):
            h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
            return (h % 1000) / 1000.0 - 0.5

        xs, ys = [], []
        for i in range(120):
            trend = i * 1.0
            xs.append(trend + noise(i, "x"))
            ys.append(2.0 * trend + 5.0 + noise(i, "y"))
        r = self._run(spark, ys, xs)
        assert abs(r.slope - 2.0) < 0.01
        assert r.coint_flag == 1 and r.df_stat < -3.34

    def test_independent_walks_not_flagged(self, spark):
        # two independent random walks: residual itself a walk -> rho ~ 0
        import hashlib

        def noise(i, salt):
            h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
            return (h % 1000) / 1000.0 - 0.5

        x, y = 0.0, 0.0
        xs, ys = [], []
        for i in range(120):
            x += noise(i, "a")
            y += noise(i, "b")
            xs.append(x)
            ys.append(y)
        r = self._run(spark, ys, xs)
        assert r.coint_flag == 0


class TestModularity:
    def _run(self, spark, edges, assign):
        from azure_data_engineering_spark.operators.graph import modularity_score

        e = spark.createDataFrame(edges, "src long, dst long")
        a = spark.createDataFrame(assign, "node long, community long")
        return modularity_score(e, a).collect()

    def test_two_cliques_good_partition(self, spark):
        # two triangles joined by one bridge edge; perfect partition
        edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        assign = [(n, 0 if n < 3 else 1) for n in range(6)]
        out = self._run(spark, edges, assign)
        q = sum(r.q_contrib for r in out)
        # known value: e_c=3/7 each, d_c=7/(2*7) each -> Q = 2*(3/7 - 0.25^2)... 
        # hand: m=7, d_c = 3*2+1 = 7, Q = 2*(3/7 - (7/14)^2) = 6/7 - 0.5
        assert abs(q - (6.0 / 7.0 - 0.5)) < 1e-6

    def test_random_partition_lower_q(self, spark):
        edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        good = [(n, 0 if n < 3 else 1) for n in range(6)]
        bad = [(n, n % 2) for n in range(6)]
        q_good = sum(r.q_contrib for r in self._run(spark, edges, good))
        q_bad = sum(r.q_contrib for r in self._run(spark, edges, bad))
        assert q_good > q_bad

    def test_empty_edges_raise(self, spark):
        # modularity is undefined at m=0 — a clear error, not NULL
        # q_contrib rows (ADVICE r10)
        from azure_data_engineering_spark.operators.graph import modularity_score

        e = spark.createDataFrame([], "src long, dst long")
        a = spark.createDataFrame([(0, 0)], "node long, community long")
        with pytest.raises(ValueError, match="m=0"):
            modularity_score(e, a)


class TestTopoLayers:
    def _run(self, spark, edges, iters):
        from azure_data_engineering_spark.operators.graph import (
            dag_longest_path_layers,
        )

        e = spark.createDataFrame(edges, "src long, dst long")
        return {
            r.node: r.layer
            for r in dag_longest_path_layers(e, iterations=iters).collect()
        }

    def test_chain(self, spark):
        got = self._run(spark, [(0, 1), (1, 2), (2, 3)], 3)
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_longest_path_wins_over_short_cut(self, spark):
        # 0->1->2->3 and a shortcut 0->3: layer(3) = 3, not 1
        got = self._run(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], 4)
        assert got[3] == 3

    def test_diamond(self, spark):
        got = self._run(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], 3)
        assert got == {0: 0, 1: 1, 2: 1, 3: 2}


class TestAalenJohansen:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import aalen_johansen_cif

        df = spark.createDataFrame(rows, "duration long, cause int")
        return aalen_johansen_cif(df, "duration", "cause").collect()

    def test_hand_computed_two_causes(self, spark):
        # t=1: n=4, cause1 death; t=2: n=3, cause2 death; t=3 censored;
        # t=4: n=1, cause1 death
        rows = [(1, 1), (2, 2), (3, 0), (4, 1)]
        out = {(r.cause, r.dur): r for r in self._run(spark, rows)}
        # CIF1(1) = S(0)*1/4 = 0.25
        assert abs(out[(1, 1)].cif - 0.25) < 1e-6
        # S(1) = 3/4; CIF2(2) = 0.75 * 1/3 = 0.25
        assert abs(out[(2, 2)].cif - 0.25) < 1e-6
        # S(2) = 3/4*2/3 = 0.5; censoring at 3; CIF1(4) = 0.25 + S(3^-)*1/1
        # S(3) = 0.5 (no event at 3); CIF1(4) = 0.25 + 0.5 = 0.75
        assert abs(out[(1, 4)].cif - 0.75) < 1e-6

    def test_cifs_sum_below_one(self, spark):
        rows = [(d, (d % 3)) for d in range(1, 30)]
        out = self._run(spark, rows)
        last = {}
        for r in sorted(out, key=lambda r: (r.cause, r.dur)):
            last[r.cause] = r.cif
        assert sum(last.values()) <= 1.0 + 1e-9

    def test_single_cause_matches_one_minus_km(self, spark):
        from azure_data_engineering_spark.operators.stats import kaplan_meier

        rows = [(d, 1 if d % 2 else 0) for d in range(1, 21)]
        aj = {r.dur: r.cif for r in self._run(spark, rows)}
        df = spark.createDataFrame(rows, "duration long, cause int")
        km = {
            r.duration: r.survival
            for r in kaplan_meier(df, "duration", "cause").collect()
        }
        for d, cif in aj.items():
            assert abs(cif - (1.0 - km[d])) < 1e-6


class TestPeriodogram:
    def _run(self, spark, vals, periods):
        from azure_data_engineering_spark.operators.timeseries import (
            periodogram_power,
        )

        rows = [(i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "t long, x double")
        return {
            r.period: r
            for r in periodogram_power(df, "t", "x", periods=periods).collect()
        }

    def test_pure_sinusoid_dominant(self, spark):
        import math

        vals = [10.0 + 5.0 * math.cos(2 * math.pi * i / 7.0) for i in range(84)]
        got = self._run(spark, vals, [3, 5, 7, 14])
        assert got[7].dominant == 1
        assert got[7].power > 0.95
        assert got[3].power < 0.05 and got[5].power < 0.05

    def test_flat_series_zero_power(self, spark):
        got = self._run(spark, [4.0] * 30, [3, 7])
        # zero variance -> ss = 0 -> power NULL (0/0 guarded by round->None)
        assert all(g.power is None or g.power == 0 for g in got.values())


class TestPackingEfficiency:
    def test_fill_and_overflow(self, spark):
        from azure_data_engineering_spark.operators.chunking import (
            packing_efficiency,
        )

        rows = [(0, 0, 100), (0, 0, 120), (0, 1, 300), (1, 0, 64)]
        df = spark.createDataFrame(rows, "bucket long, seq_id long, token_len long")
        got = {
            (r.bucket, r.seq_id): r
            for r in packing_efficiency(
                df, ["bucket", "seq_id"], "token_len", capacity=256
            ).collect()
        }
        a = got[(0, 0)]
        assert a.used_tokens == 220 and a.pad_waste == 36 and a.overflowed == 0
        assert abs(a.fill_ratio - 220 / 256) < 1e-9
        b = got[(0, 1)]
        assert b.overflowed == 1 and b.pad_waste == 0
        assert got[(1, 0)].n_items == 1
