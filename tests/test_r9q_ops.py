"""Round-9 wave-R operators: Hurst R/S, Cronbach's alpha, price
indices, Kneedle knee detection."""

from __future__ import annotations

import math

import pytest


class TestHurst:
    def _run(self, spark, vals, sizes=(8, 16, 32)):
        from azure_data_engineering_spark.operators.timeseries import (
            hurst_rescaled_range,
        )

        rows = [(i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "p long, x double")
        out = hurst_rescaled_range(df, "p", "x", block_sizes=sizes).collect()
        ladder = {r.size: r for r in out if r.size > 0}
        h = [r for r in out if r.size == 0][0].avg_rs
        return ladder, h

    def test_trending_series_high_h(self, spark):
        # strongly persistent (monotone) series: H near 1
        vals = [float(i) + 0.1 * (i % 3) for i in range(128)]
        _, h = self._run(spark, vals)
        assert h > 0.8

    def test_alternating_series_low_h(self, spark):
        # rapidly mean-reverting series: H well below 0.5
        vals = [(1.0 if i % 2 else -1.0) + 0.01 * (i % 5) for i in range(128)]
        _, h = self._run(spark, vals)
        assert h < 0.35

    def test_rs_grows_with_block_size(self, spark):
        vals = [math.sin(i / 5.0) * 10 + (i % 7) for i in range(128)]
        ladder, _ = self._run(spark, vals)
        sizes = sorted(ladder)
        rs = [ladder[s].avg_rs for s in sizes]
        assert rs == sorted(rs)

    def test_incomplete_blocks_dropped(self, spark):
        vals = [float(i % 9) for i in range(100)]  # 100 = 12*8 + 4
        ladder, _ = self._run(spark, vals, sizes=(8,))
        assert ladder[8].n_blocks == 12


class TestCronbach:
    def _run(self, spark, rows, cols):
        from azure_data_engineering_spark.operators.stats import cronbach_alpha

        schema = ", ".join(f"{c} double" for c in cols)
        df = spark.createDataFrame(rows, schema)
        return cronbach_alpha(df, cols).collect()[0]

    def test_perfectly_correlated_items(self, spark):
        # identical items: alpha = 1
        rows = [(float(v), float(v), float(v)) for v in range(20)]
        r = self._run(spark, rows, ["a", "b", "c"])
        assert abs(r.alpha - 1.0) < 1e-6

    def test_independent_items_low(self, spark):
        rows = [
            (float(i % 5), float((i * 7) % 11), float((i * 13) % 3)) for i in range(200)
        ]
        r = self._run(spark, rows, ["a", "b", "c"])
        assert r.alpha < 0.3

    def test_hand_computed_two_items(self, spark):
        rows = [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)]
        r = self._run(spark, rows, ["a", "b"])
        # var_a = 2/3, var_b = 8/3, total var of (3,6,9) = 6
        # alpha = 2*(1 - (2/3+8/3)/6) = 2*(1-10/18) = 8/9
        assert abs(r.alpha - round(8 / 9, 6)) < 1e-5

    def test_contract(self, spark):
        from azure_data_engineering_spark.operators.stats import cronbach_alpha

        df = spark.createDataFrame([(1.0,)], "a double")
        with pytest.raises(ValueError):
            cronbach_alpha(df, ["a"])


class TestPriceIndices:
    def _run(self, spark, base, cur):
        from azure_data_engineering_spark.operators.relational import price_indices

        b = spark.createDataFrame(base, "k long, price double, qty double")
        c = spark.createDataFrame(cur, "k long, price double, qty double")
        return price_indices(b, c, "k", "price", "qty").collect()[0]

    def test_uniform_inflation(self, spark):
        base = [(1, 10.0, 5.0), (2, 20.0, 3.0)]
        cur = [(1, 11.0, 4.0), (2, 22.0, 6.0)]  # +10% everywhere
        r = self._run(spark, base, cur)
        assert abs(r.laspeyres - 1.1) < 1e-6
        assert abs(r.paasche - 1.1) < 1e-6
        assert abs(r.fisher - 1.1) < 1e-6

    def test_substitution_brackets(self, spark):
        # price up on good 1, consumers shift to good 2: L >= F >= P
        base = [(1, 10.0, 10.0), (2, 10.0, 10.0)]
        cur = [(1, 20.0, 2.0), (2, 10.0, 18.0)]
        r = self._run(spark, base, cur)
        assert r.laspeyres >= r.fisher >= r.paasche
        assert abs(r.fisher - math.sqrt(r.laspeyres * r.paasche)) < 1e-5

    def test_unmatched_reported(self, spark):
        base = [(1, 10.0, 1.0), (9, 5.0, 1.0)]
        cur = [(1, 12.0, 1.0), (7, 3.0, 1.0)]
        r = self._run(spark, base, cur)
        assert r.n_matched == 1
        assert r.n_base_only == 1 and r.n_current_only == 1


class TestKneedle:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.diagnostics import kneedle_point

        df = spark.createDataFrame(rows, "g string, w double")
        return kneedle_point(df, "g", "w").collect()[0]

    def test_sharp_knee(self, spark):
        # 2 heavy groups + 8 tiny ones: knee at rank 2
        rows = [("a", 100.0), ("b", 90.0)] + [(f"t{i}", 1.0) for i in range(8)]
        r = self._run(spark, rows)
        assert r.knee_rank == 2
        assert r.coverage_at_knee > 0.9

    def test_uniform_no_gap(self, spark):
        rows = [(f"g{i}", 10.0) for i in range(10)]
        r = self._run(spark, rows)
        # uniform: y = x at every rank -> max gap 0, first rank wins tie
        assert r.max_gap == 0.0 and r.knee_rank == 1

    def test_weights_aggregate_per_group(self, spark):
        rows = [("a", 50.0), ("a", 50.0), ("b", 10.0), ("c", 10.0)]
        r = self._run(spark, rows)
        assert r.knee_group == "a" and r.knee_rank == 1
