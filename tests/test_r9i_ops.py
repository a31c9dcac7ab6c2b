"""Round-9 wave-J operators: restricted mean survival time, geometric
median (Weiszfeld), pairwise Welch-Bonferroni, Horvitz-Thompson."""

from __future__ import annotations

import math

import pytest


class TestRmst:
    def _run(self, spark, rows, horizon):
        from azure_data_engineering_spark.operators.stats import rmst

        df = spark.createDataFrame(rows, "duration long, ev int")
        return rmst(df, "duration", "ev", horizon=horizon).collect()[0]

    def test_no_events_full_area(self, spark):
        # all censored beyond horizon: S = 1 everywhere -> rmst = horizon
        rows = [(100, 0)] * 10
        r = self._run(spark, rows, horizon=30.0)
        assert r.rmst == 30.0 and r.n_subjects == 10

    def test_hand_computed_step_area(self, spark):
        # 4 subjects, events at t=10 (2 of 4) and t=20 (1 of 2):
        # S(10) = 0.5, S(20) = 0.25; one censored at 20
        rows = [(10, 1), (10, 1), (20, 1), (20, 0)]
        r = self._run(spark, rows, horizon=30.0)
        # area = 1*10 + 0.5*10 + 0.25*10 = 17.5
        assert abs(r.rmst - 17.5) < 1e-6

    def test_horizon_truncates(self, spark):
        rows = [(10, 1), (10, 1), (20, 1), (20, 0)]
        r = self._run(spark, rows, horizon=15.0)
        # area = 1*10 + 0.5*5 = 12.5
        assert abs(r.rmst - 12.5) < 1e-6


class TestGeometricMedian:
    def _run(self, spark, rows, iterations=16):
        from azure_data_engineering_spark.operators.spatial import geometric_median

        df = spark.createDataFrame(rows, "g string, x double, y double")
        return {
            r.group: r
            for r in geometric_median(df, "g", "x", "y", iterations=iterations).collect()
        }

    def test_symmetric_square(self, spark):
        rows = [("a", 0.0, 0.0), ("a", 2.0, 0.0), ("a", 0.0, 2.0), ("a", 2.0, 2.0)]
        r = self._run(spark, rows)["a"]
        assert abs(r.median_x - 1.0) < 1e-3 and abs(r.median_y - 1.0) < 1e-3
        assert abs(r.mean_dist - math.sqrt(2.0)) < 1e-3

    def test_outlier_robust_vs_centroid(self, spark):
        # 9 points at origin cluster + 1 far outlier: geometric median
        # stays near the cluster (centroid would be dragged to ~10)
        rows = [("a", 0.0 + i * 0.01, 0.0) for i in range(9)] + [("a", 100.0, 0.0)]
        r = self._run(spark, rows, iterations=32)["a"]
        assert r.median_x < 1.0

    def test_collinear_median(self, spark):
        # odd collinear points: geometric median = the middle point
        rows = [("a", float(v), 0.0) for v in (0, 1, 10)]
        r = self._run(spark, rows, iterations=64)["a"]
        assert abs(r.median_x - 1.0) < 0.05 and abs(r.median_y) < 1e-6


class TestPairwiseWelch:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import (
            pairwise_welch_bonferroni,
        )

        df = spark.createDataFrame(rows, "g string, v double")
        return pairwise_welch_bonferroni(df, "g", "v").collect()

    def test_pair_count_and_order(self, spark):
        rows = [(g, float(i)) for g in ("a", "b", "c") for i in range(5)]
        out = self._run(spark, rows)
        assert [(r.g1, r.g2) for r in out] == [("a", "b"), ("a", "c"), ("b", "c")]

    def test_bonferroni_scales_p(self, spark):
        rows = [("a", float(v)) for v in range(10)] + [
            ("b", float(v) + 0.5) for v in range(10)
        ] + [("c", float(v) + 100) for v in range(10)]
        out = {(r.g1, r.g2): r for r in self._run(spark, rows)}
        ab = out[("a", "b")]
        # 3 pairwise tests: adjusted p = min(1, 3 * raw)
        assert abs(ab.p_bonferroni - min(1.0, round(ab.p_raw * 3, 6))) < 2e-6
        assert out[("a", "c")].p_bonferroni < 0.01

    def test_matches_welch_z(self, spark):
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 6.0), ("b", 8.0)]
        out = self._run(spark, rows)[0]
        m1, m2 = 2.0, 6.0
        v1, v2 = 1.0, 4.0
        z = (m1 - m2) / math.sqrt(v1 / 3 + v2 / 3)
        assert abs(out.z_stat - round(z, 6)) < 1e-6


class TestHorvitzThompson:
    def test_self_audit_ratio(self, spark):
        from azure_data_engineering_spark.operators.sampling import horvitz_thompson

        rows = [(i, float(10 + (i * 37) % 500)) for i in range(5000)]
        df = spark.createDataFrame(rows, "id long, size double")
        r = horvitz_thompson(df, "id", "size", n_target=800).collect()[0]
        assert 0.9 < r.ratio < 1.1  # design-unbiased within sampling noise
        assert r.n_sampled > 0 and r.se_m > 0

    def test_certainty_units_exact(self, spark):
        from azure_data_engineering_spark.operators.sampling import horvitz_thompson

        # n_target >= population with equal sizes -> every pi = 1,
        # everything sampled, estimate exactly the total, SE = 0
        rows = [(i, 10.0) for i in range(50)]
        df = spark.createDataFrame(rows, "id long, size double")
        r = horvitz_thompson(df, "id", "size", n_target=50).collect()[0]
        assert r.n_sampled == 50
        assert r.ht_estimate_m == r.true_total_m == 0.0005
        assert r.se_m == 0.0

    def test_deterministic_replay(self, spark):
        from azure_data_engineering_spark.operators.sampling import horvitz_thompson

        rows = [(i, float(1 + i % 97)) for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, size double")
        a = horvitz_thompson(df, "id", "size", n_target=300).collect()[0]
        b = horvitz_thompson(df, "id", "size", n_target=300).collect()[0]
        assert a == b
