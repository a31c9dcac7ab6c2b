"""Round-9 wave-O operators: 1-D Wasserstein, Yuen trimmed test,
Theil's U, LMDI decomposition."""

from __future__ import annotations

import math

import pytest


class TestWasserstein:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import wasserstein_1d

        df = spark.createDataFrame(rows, "g int, v double")
        return wasserstein_1d(df, "g", "v").collect()[0]

    def test_identical_distributions_zero(self, spark):
        rows = [(g, float(v)) for g in (0, 1) for v in (1, 2, 3, 4)]
        r = self._run(spark, rows)
        assert r.w1_distance == 0.0 and r.ks_stat == 0.0

    def test_pure_shift_equals_shift(self, spark):
        # W1 between X and X + c is exactly c
        rows = [(0, float(v)) for v in (1, 2, 3, 4)] + [
            (1, float(v) + 2.5) for v in (1, 2, 3, 4)
        ]
        r = self._run(spark, rows)
        assert abs(r.w1_distance - 2.5) < 1e-6
        # supports interleave: max CDF gap is 3/4, not 1
        assert abs(r.ks_stat - 0.75) < 1e-9

    def test_hand_computed_partial_overlap(self, spark):
        # F1 steps at 0 (1.0); F2 steps at 1 (1.0): W1 = 1
        rows = [(0, 0.0), (1, 1.0)]
        r = self._run(spark, rows)
        assert abs(r.w1_distance - 1.0) < 1e-9

    def test_two_group_contract(self, spark):
        from azure_data_engineering_spark.operators.stats import wasserstein_1d

        df = spark.createDataFrame([(0, 1.0), (1, 2.0), (2, 3.0)], "g int, v double")
        with pytest.raises(ValueError):
            wasserstein_1d(df, "g", "v")


class TestYuenTrimmed:
    def _run(self, spark, rows, trim=0.1):
        from azure_data_engineering_spark.operators.stats import yuen_trimmed_test

        df = spark.createDataFrame(rows, "g int, v double")
        return yuen_trimmed_test(df, "g", "v", trim=trim).collect()[0]

    def test_outlier_immune(self, spark):
        # identical bulks, one arm has a massive outlier: the trimmed
        # means must stay (near-)equal
        bulk = [float(v) for v in range(1, 21)]
        rows = [(0, v) for v in bulk] + [(1, v) for v in bulk[:-1]] + [(1, 1e6)]
        r = self._run(spark, rows)
        assert abs(r.trimmed_mean1 - r.trimmed_mean2) < 1.0
        assert r.p_value > 0.05

    def test_real_shift_detected(self, spark):
        rows = [(0, float(v)) for v in range(100)] + [
            (1, float(v) + 50) for v in range(100)
        ]
        r = self._run(spark, rows)
        assert abs((r.trimmed_mean2 - r.trimmed_mean1) - 50.0) < 1e-6
        assert r.p_value < 0.01

    def test_trimmed_mean_convention(self, spark):
        # n=10, trim 0.1 -> g=1: trimmed mean of ranks 2..9
        vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 100)]
        rows = [(0, v) for v in vals] + [(1, v) for v in vals]
        r = self._run(spark, rows)
        expected = sum(vals[1:9]) / 8
        assert abs(r.trimmed_mean1 - round(expected, 6)) < 1e-6


class TestTheilsU:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import theils_u

        df = spark.createDataFrame(rows, "x string, y string")
        return theils_u(df, "x", "y").collect()[0]

    def test_perfect_determination(self, spark):
        # y is a function of x: U(y|x) = 1; x has extra states y
        # can't resolve: U(x|y) < 1
        rows = [("a", "p")] * 3 + [("b", "q")] * 3 + [("c", "q")] * 3
        r = self._run(spark, rows)
        assert abs(r.u_y_given_x - 1.0) < 1e-6
        assert r.u_x_given_y < 1.0

    def test_independence_zero(self, spark):
        rows = [(x, y) for x in ("a", "b") for y in ("p", "q") for _ in range(5)]
        r = self._run(spark, rows)
        assert abs(r.mutual_info) < 1e-9
        assert abs(r.u_y_given_x) < 1e-6

    def test_entropy_values(self, spark):
        rows = [("a", "p")] * 5 + [("b", "p")] * 5
        r = self._run(spark, rows)
        assert abs(r.h_x - round(math.log(2), 6)) < 1e-6
        # constant y: H(Y)=0 so U(Y|X) is undefined (NULL); U(X|Y)=0
        assert r.h_y == 0.0
        assert r.u_y_given_x is None and r.u_x_given_y == 0.0


class TestLmdi:
    def _run(self, spark, rows, factors):
        from azure_data_engineering_spark.operators.timeseries import lmdi_decomposition

        schema = "period long, " + ", ".join(f"{f} double" for f in factors)
        df = spark.createDataFrame(rows, schema)
        return lmdi_decomposition(df, "period", factors).collect()

    def test_exact_additivity(self, spark):
        rows = [(1, 10.0, 2.0, 5.0), (2, 12.0, 2.5, 4.0), (3, 11.0, 3.0, 6.0)]
        out = self._run(spark, rows, ["a", "b", "c"])
        from collections import defaultdict

        sums = defaultdict(float)
        deltas = {}
        for r in out:
            sums[r.period] += r.contribution
            deltas[r.period] = r.delta_v
        for p, s in sums.items():
            assert abs(s - deltas[p]) < 1e-3, (p, s, deltas[p])

    def test_single_factor_change_attributed(self, spark):
        rows = [(1, 10.0, 3.0), (2, 20.0, 3.0)]
        out = {r.factor: r for r in self._run(spark, rows, ["a", "b"])}
        assert abs(out["b"].contribution) < 1e-9
        assert abs(out["a"].contribution - out["a"].delta_v) < 1e-6

    def test_no_change_zero_contributions(self, spark):
        rows = [(1, 10.0, 3.0), (2, 10.0, 3.0)]
        out = self._run(spark, rows, ["a", "b"])
        assert all(r.contribution == 0.0 and r.delta_v == 0.0 for r in out)
