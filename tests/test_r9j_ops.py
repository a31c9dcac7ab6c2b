"""Round-9 wave-K operators: McNemar's paired test, mSPRT always-valid
p-values, Poisson GD regression, Haar wavelet top-k."""

from __future__ import annotations

import math

import pytest


class TestMcnemar:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import mcnemar_test

        df = spark.createDataFrame(rows, "pa int, pb int, y int")
        return mcnemar_test(df, "pa", "pb", "y").collect()[0]

    def test_cells_and_chi2(self, spark):
        # a_only = 6, b_only = 2: chi2 = (|6-2|-1)^2/8 = 9/8
        rows = [(1, 0, 1)] * 6 + [(0, 1, 1)] * 2 + [(1, 1, 1)] * 5 + [(0, 0, 1)] * 3
        r = self._run(spark, rows)
        assert r.a_only == 6 and r.b_only == 2
        assert r.both_right == 5 and r.both_wrong == 3
        assert abs(r.chi2 - 1.125) < 1e-9

    def test_identical_models_null(self, spark):
        rows = [(1, 1, 1)] * 4 + [(0, 0, 1)] * 4
        r = self._run(spark, rows)
        assert r.chi2 is None and r.p_value is None

    def test_symmetric_disagreement_ns(self, spark):
        rows = [(1, 0, 1)] * 10 + [(0, 1, 1)] * 10
        r = self._run(spark, rows)
        # |b-c| = 0 -> continuity-corrected numerator clamps at 0
        assert r.chi2 == 0.0 and r.p_value == 1.0


class TestMsprt:
    def _run(self, spark, rows, tau=1.0):
        from azure_data_engineering_spark.operators.stats import msprt_always_valid

        df = spark.createDataFrame(rows, "day string, arm int, v double")
        return msprt_always_valid(df, "day", "arm", "v", tau=tau).collect()

    def test_null_effect_p_stays_high(self, spark):
        rows = []
        for d in range(1, 10):
            day = f"2024-01-0{d}"
            for i in range(20):
                rows.append((day, i % 2, float(i % 5)))
        out = self._run(spark, rows)
        assert all(r.p_always_valid > 0.5 for r in out)

    def test_real_effect_p_drops_monotone(self, spark):
        rows = []
        for d in range(10, 40):
            day = f"2024-01-{d % 28 + 1:02d}" if d < 38 else f"2024-02-{d - 37:02d}"
        rows = []
        for d in range(1, 28):
            day = f"2024-01-{d:02d}"
            for i in range(40):
                arm = i % 2
                rows.append((day, arm, 10.0 + 5.0 * arm + (i % 3)))
        out = self._run(spark, rows)
        ps = [r.p_always_valid for r in out]
        # monotone non-increasing by construction (running max of lambda)
        assert all(ps[i + 1] <= ps[i] + 1e-12 for i in range(len(ps) - 1))
        assert ps[-1] < 0.05

    def test_p_capped_at_one(self, spark):
        rows = [("2024-01-01", i % 2, 1.0 + (i % 7) * 0.1) for i in range(30)]
        out = self._run(spark, rows)
        assert all(0.0 < r.p_always_valid <= 1.0 for r in out)


class TestPoissonGd:
    def test_recovers_constant_rate(self, spark):
        from azure_data_engineering_spark.operators.mlplan import poisson_gd

        # y ~ exactly 5 for all rows, x uninformative: lambda -> 5
        rows = [(0.0, 0.0, 5.0)] * 100
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = poisson_gd(df, "x1", "x2", "t", iterations=60, lr=0.3).collect()[0]
        assert abs(r.pred_mean - 5.0) < 0.1
        assert abs(r.w0 - math.log(5.0)) < 0.05

    def test_slope_direction(self, spark):
        from azure_data_engineering_spark.operators.mlplan import poisson_gd

        rows = []
        for i in range(200):
            x = (i % 10) / 10.0
            rows.append((x, 0.0, math.exp(1.0 + 1.5 * x)))
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = poisson_gd(df, "x1", "x2", "t", iterations=80, lr=0.2).collect()[0]
        assert r.w1 > 0.5  # positive rate slope recovered

    def test_clamp_no_overflow(self, spark):
        from azure_data_engineering_spark.operators.mlplan import poisson_gd

        rows = [(100.0, 0.0, 1.0)] * 10  # huge feature would overflow exp
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = poisson_gd(df, "x1", "x2", "t", iterations=4, lr=1.0).collect()[0]
        assert all(math.isfinite(v) for v in (r.w0, r.w1, r.mean_nll, r.pred_mean))


class TestHaarWavelet:
    def _run(self, spark, series, levels, top_k=10):
        from azure_data_engineering_spark.operators.timeseries import haar_wavelet_topk

        rows = [("a", p, float(v)) for p, v in enumerate(series)]
        df = spark.createDataFrame(rows, "k string, p long, v double")
        return haar_wavelet_topk(df, "k", "p", "v", levels=levels, top_k=top_k).collect()

    def test_constant_series_only_average(self, spark):
        out = self._run(spark, [3.0] * 8, levels=3)
        base = [r for r in out if r.level == 0]
        details = [r for r in out if r.level > 0]
        assert base[0].coeff == 3.0
        assert all(d.coeff == 0.0 for d in details)

    def test_hand_computed_length4(self, spark):
        # series [4, 2, 5, 7]: level-2 details (1, -1), level-1 averages
        # (3, 6) -> level-1 detail -1.5, global average 4.5
        out = {(r.level, r.idx): r.coeff for r in self._run(spark, [4, 2, 5, 7], levels=2)}
        assert out[(0, 0)] == 4.5
        assert out[(2, 0)] == 1.0 and out[(2, 1)] == -1.0
        assert out[(1, 0)] == -1.5

    def test_step_change_localized(self, spark):
        # step at midpoint of 16 points: the single largest detail is
        # the level-1 (coarsest-detail) coefficient at idx 0
        series = [0.0] * 8 + [10.0] * 8
        out = self._run(spark, series, levels=4, top_k=1)
        top = [r for r in out if r.level > 0][0]
        assert (top.level, top.idx) == (1, 0)
        assert abs(top.coeff) == 5.0
