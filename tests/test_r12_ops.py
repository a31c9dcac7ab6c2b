"""Round-12 operator tests: Shewhart X̄-R chart, Wald-Wolfowitz runs
test, mapInArrow surface."""

from __future__ import annotations

import math
import random

import pytest

from azure_data_engineering_spark.operators.stats import runs_test
from azure_data_engineering_spark.operators.timeseries import xbar_r_chart


class TestXbarRChart:
    def _df(self, spark, groups):
        rows = [(g, v) for g, vals in groups.items() for v in vals]
        return spark.createDataFrame(rows, "sg long, v double")

    def test_hand_computed_limits(self, spark):
        # textbook-style n=4 example: A2=0.729, D3=0, D4=2.282
        groups = {
            1: [10.0, 12.0, 11.0, 13.0],   # xbar 11.5, R 3
            2: [9.0, 11.0, 10.0, 10.0],    # xbar 10.0, R 2
            3: [14.0, 12.0, 13.0, 13.0],   # xbar 13.0, R 2
        }
        out = {r.subgroup: r for r in
               xbar_r_chart(self._df(spark, groups), "sg", "v").collect()}
        xbarbar = (11.5 + 10.0 + 13.0) / 3
        rbar = (3 + 2 + 2) / 3
        r1 = out[1]
        assert r1.xbar == pytest.approx(11.5) and r1.r == pytest.approx(3.0)
        assert r1.xbar_ucl == pytest.approx(xbarbar + 0.729 * rbar, abs=1e-6)
        assert r1.xbar_lcl == pytest.approx(xbarbar - 0.729 * rbar, abs=1e-6)
        assert r1.r_ucl == pytest.approx(2.282 * rbar, abs=1e-6)
        assert r1.r_lcl == 0.0
        assert all(r.n == 4 for r in out.values())

    def test_shifted_subgroup_flagged(self, spark):
        random.seed(21)
        groups = {g: [10 + random.gauss(0, 0.5) for _ in range(5)]
                  for g in range(20)}
        groups[20] = [16.0 + random.gauss(0, 0.5) for _ in range(5)]
        out = {r.subgroup: r for r in
               xbar_r_chart(self._df(spark, groups), "sg", "v").collect()}
        assert out[20].out_xbar == 1
        assert sum(r.out_xbar for r in out.values()) <= 2

    def test_mixed_sizes_raise(self, spark):
        with pytest.raises(ValueError, match="uniform subgroup size"):
            xbar_r_chart(
                self._df(spark, {1: [1.0, 2.0], 2: [1.0, 2.0, 3.0]}),
                "sg", "v",
            )

    def test_size_outside_table_raises(self, spark):
        with pytest.raises(ValueError, match="2..10"):
            xbar_r_chart(self._df(spark, {1: [1.0], 2: [2.0]}), "sg", "v")


class TestRunsTest:
    def _series(self, spark, vals):
        return spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "t long, x double"
        )

    def test_alternating_series_too_many_runs(self, spark):
        r = runs_test(
            self._series(spark, [1, 9] * 20), "t", "x"
        ).collect()[0]
        assert r.runs == 40 and r.n1 == 20 and r.n2 == 20
        assert r.z_stat > 3 and r.p_value < 0.05
        assert r.nonrandom_5pct == 1

    def test_blocky_series_too_few_runs(self, spark):
        r = runs_test(
            self._series(spark, [1] * 20 + [9] * 20), "t", "x"
        ).collect()[0]
        assert r.runs == 2
        assert r.z_stat < -3 and r.nonrandom_5pct == 1

    def test_hand_formula(self, spark):
        # sequence + - + - - + : n1=3, n2=3, R=5
        vals = [9, 1, 9, 1, 1, 9]
        r = runs_test(self._series(spark, vals), "t", "x").collect()[0]
        assert (r.n1, r.n2, r.runs) == (3, 3, 5)
        n1 = n2 = 3.0
        n = n1 + n2
        e = 2 * n1 * n2 / n + 1
        v = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
        assert r.expected_runs == pytest.approx(e, abs=1e-6)
        assert r.z_stat == pytest.approx((5 - e) / math.sqrt(v), abs=1e-5)

    def test_median_ties_dropped(self, spark):
        # odd n: the median value itself (5) drops from the sequence
        r = runs_test(
            self._series(spark, [1, 5, 9, 5, 1]), "t", "x"
        ).collect()[0]
        assert r.n1 + r.n2 == 3

    def test_degenerate_one_sided_series_null_stats(self, spark):
        r = runs_test(
            self._series(spark, [1, 1, 1, 9]), "t", "x"
        ).collect()[0]
        # median 1 -> ties drop, only the single 9 remains: n2 = 0
        assert r.z_stat is None and r.p_value is None


class TestMapInArrow:
    def test_arrow_kernel_agrees_with_jvm_twins(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        r = entrymod.q_map_in_arrow(spark, sf_dir).collect()[0]
        assert r.n_docs > 0
        assert r.n_char_mismatch == 0 and r.n_token_mismatch == 0


class TestFisherExact:
    def _df(self, spark, a, b, c, d):
        rows = (
            [(1, 1)] * a + [(1, 0)] * b + [(0, 1)] * c + [(0, 0)] * d
        )
        return spark.createDataFrame(rows, "g int, o int")

    def test_scipy_published_example(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            fisher_exact_2x2,
        )

        # scipy.stats.fisher_exact doc example: [[8,2],[1,5]] ->
        # two-sided p = 0.0349650..., odds ratio 20
        r = fisher_exact_2x2(self._df(spark, 8, 2, 1, 5), "g", "o").collect()[0]
        assert r.p_value == pytest.approx(0.034965, abs=1e-6)
        assert r.odds_ratio == 20.0

    def test_fisher_tea_tasting(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            fisher_exact_2x2,
        )

        # Fisher's lady-tasting-tea table [[3,1],[1,3]]: p = 34/70
        r = fisher_exact_2x2(self._df(spark, 3, 1, 1, 3), "g", "o").collect()[0]
        assert r.p_value == pytest.approx(34 / 70, abs=1e-6)

    def test_independent_table_p_one(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            fisher_exact_2x2,
        )

        r = fisher_exact_2x2(self._df(spark, 5, 5, 5, 5), "g", "o").collect()[0]
        assert r.p_value == 1.0 and r.odds_ratio == 1.0

    def test_zero_cell_odds_ratio_null(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            fisher_exact_2x2,
        )

        r = fisher_exact_2x2(self._df(spark, 5, 0, 2, 6), "g", "o").collect()[0]
        assert r.odds_ratio is None
        assert 0.0 < r.p_value <= 1.0

    def test_large_n_raises(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            fisher_exact_2x2,
        )

        with pytest.raises(ValueError, match="small-sample"):
            fisher_exact_2x2(
                self._df(spark, 40, 40, 40, 40), "g", "o", max_n=100
            )
