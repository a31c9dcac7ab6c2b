"""Round-9 wave-I operators: quantile regression GD, bitmap distinct,
chi-square post-hoc, effect-size panel."""

from __future__ import annotations

import math

import pytest


class TestQuantileRegression:
    def test_median_fit_coverage(self, spark):
        from azure_data_engineering_spark.operators.mlplan import quantile_regression_gd

        # y = 2 + 3x with symmetric +-1 noise: median line is y = 2 + 3x
        rows = []
        for i in range(200):
            x = (i % 20) / 10.0
            noise = 1.0 if i % 2 else -1.0
            rows.append((x, 0.0, 2.0 + 3.0 * x + noise))
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = quantile_regression_gd(df, "x1", "x2", "t", tau=0.5, iterations=60, lr=0.5).collect()[0]
        # coverage must straddle tau
        assert 0.3 <= r.coverage <= 0.7
        assert r.pinball_loss < 0.8

    def test_outlier_robustness(self, spark):
        from azure_data_engineering_spark.operators.mlplan import quantile_regression_gd

        # clean y = x plus a few massive outliers: pinball loss of the
        # median fit must stay near the clean loss (OLS would explode)
        rows = [(i / 10.0, 0.0, i / 10.0) for i in range(100)]
        rows += [(0.5, 0.0, 1000.0)] * 3
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = quantile_regression_gd(df, "x1", "x2", "t", tau=0.5, iterations=40, lr=0.5).collect()[0]
        # residual of the clean mass stays bounded
        assert abs(r.w1) < 5.0 and abs(r.w0) < 5.0

    def test_tau_asymmetry(self, spark):
        from azure_data_engineering_spark.operators.mlplan import quantile_regression_gd

        rows = [(0.0, 0.0, float(v)) for v in range(1, 101)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        lo = quantile_regression_gd(df, "x1", "x2", "t", tau=0.1, iterations=50, lr=4.0).collect()[0]
        hi = quantile_regression_gd(df, "x1", "x2", "t", tau=0.9, iterations=50, lr=4.0).collect()[0]
        assert lo.w0 < hi.w0  # intercept tracks the quantile


class TestBitmapDistinct:
    def test_matches_exact(self, spark):
        from pyspark.sql import functions as F

        rows = [(i % 7, i % 100) for i in range(1000)]
        df = spark.createDataFrame(rows, "g long, k long")
        per_bucket = df.groupBy(
            "g", F.bitmap_bucket_number(F.col("k")).alias("bkt")
        ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("k"))).alias("bm"))
        per_g = {
            r.g: r.n
            for r in per_bucket.groupBy("g")
            .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n"))
            .collect()
        }
        exact = {
            r.g: r.n
            for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
        }
        assert per_g == exact

    def test_or_merge_equals_global(self, spark):
        from pyspark.sql import functions as F

        rows = [(i % 3, i % 513) for i in range(2000)]  # keys straddle buckets
        df = spark.createDataFrame(rows, "g long, k long")
        per_bucket = df.groupBy(
            "g", F.bitmap_bucket_number(F.col("k")).alias("bkt")
        ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("k"))).alias("bm"))
        merged = (
            per_bucket.groupBy("bkt")
            .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
            .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n"))
            .collect()[0]
            .n
        )
        assert merged == 513


class TestChiPosthoc:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import chi_square_posthoc

        df = spark.createDataFrame(rows, "r string, c string")
        return chi_square_posthoc(df, "r", "c").collect()

    def test_independent_table(self, spark):
        # perfectly independent 2x2: residuals 0, V = 0
        rows = []
        for r in ("a", "b"):
            for c in ("x", "y"):
                rows += [(r, c)] * 25
        out = self._run(spark, rows)
        for cell in out:
            assert abs(cell.adj_residual) < 1e-9
            assert cell.cramers_v == 0.0
            assert cell.expected == 25.0

    def test_associated_cells_flagged(self, spark):
        rows = [("a", "x")] * 40 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 40
        out = {(c.row_val, c.col_val): c for c in self._run(spark, rows)}
        assert out[("a", "x")].adj_residual > 2.0
        assert out[("a", "y")].adj_residual < -2.0
        v = out[("a", "x")].cramers_v
        # 2x2: V = |phi| = (40*40-10*10)/sqrt(50^4) = 0.6
        assert abs(v - 0.6) < 1e-6


class TestEffectSizes:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import effect_size_panel

        df = spark.createDataFrame(rows, "g string, v double")
        return effect_size_panel(df, "g", "v").collect()[0]

    def test_hand_computed_d(self, spark):
        a = [1.0, 2.0, 3.0, 4.0, 5.0]
        b = [3.0, 4.0, 5.0, 6.0, 7.0]
        r = self._run(spark, [("a", v) for v in a] + [("b", v) for v in b])
        # pooled sd = sqrt(2.5), d = (3-5)/sqrt(2.5)
        d = (3.0 - 5.0) / math.sqrt(2.5)
        assert abs(r.cohens_d - round(d, 6)) < 1e-6
        assert abs(r.hedges_g - round(d * (1 - 3 / (4 * 10 - 9)), 6)) < 1e-6

    def test_cliffs_delta_separated(self, spark):
        rows = [("a", float(v)) for v in (1, 2, 3)] + [("b", float(v)) for v in (10, 11)]
        r = self._run(spark, rows)
        # every a below every b: U1 = 0 -> delta = -1, cles = 0
        assert r.cliffs_delta == -1.0 and r.cles == 0.0

    def test_ties_midrank(self, spark):
        rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
        r = self._run(spark, rows)
        # U1 counts P(a > b) pairs: only the (2,2) tie at 0.5
        # -> U1 = 0.5, cles = 0.5/4 = 0.125, delta = -0.75
        assert abs(r.cles - 0.125) < 1e-6
        assert abs(r.cliffs_delta - (-0.75)) < 1e-6

    def test_two_group_contract(self, spark):
        from azure_data_engineering_spark.operators.stats import effect_size_panel

        df = spark.createDataFrame([("a", 1.0), ("b", 2.0), ("c", 3.0)], "g string, v double")
        with pytest.raises(ValueError):
            effect_size_panel(df, "g", "v")
