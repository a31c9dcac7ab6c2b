"""Behavioral tests for the round-6f additions: exact-k weighted
sampling, k-center coreset, Theil-Sen + Mann-Kendall trend."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.sampling import (
    weighted_sample_exact_k,
)
from azure_data_engineering_spark.operators.similarity import k_center_greedy
from azure_data_engineering_spark.operators.timeseries import (
    theil_sen_mann_kendall,
)


class TestWeightedSampleExactK:
    def test_exact_k_and_deterministic(self, spark):
        rows = [(i, float(i % 7 + 1)) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, w double")
        a = sorted(r.id for r in weighted_sample_exact_k(df, "id", "w", 50).collect())
        b = sorted(r.id for r in weighted_sample_exact_k(df, "id", "w", 50).collect())
        assert a == b and len(a) == 50

    def test_weight_proportionality(self, spark):
        # half the ids have 10x the weight -> they should dominate
        rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, w double")
        got = [r.id for r in weighted_sample_exact_k(df, "id", "w", 200).collect()]
        heavy = sum(1 for i in got if i % 2 == 0)
        assert heavy > 150  # expected ~10/11 * 200 = 182

    def test_nonpositive_weights_excluded(self, spark):
        rows = [(1, 0.0), (2, -1.0), (3, 5.0)]
        df = spark.createDataFrame(rows, "id long, w double")
        got = [r.id for r in weighted_sample_exact_k(df, "id", "w", 10).collect()]
        assert got == [3]


class TestKCenterGreedy:
    def test_farthest_point_order(self, spark):
        # three tight groups: picks must cycle through the groups first
        pool = spark.createDataFrame(
            [(i, f"{i:02d}") for i in (1, 2, 11, 12, 21, 22)], "pid long, draw string"
        )
        group = lambda x: x // 10
        rows = []
        for a in (1, 2, 11, 12, 21, 22):
            for b in (1, 2, 11, 12, 21, 22):
                if a != b:
                    rows.append((a, b, 0.01 if group(a) == group(b) else 1.0))
        dists = spark.createDataFrame(rows, "a long, b long, dist double")
        picks = [r.pid for r in k_center_greedy(pool, dists, k=3).orderBy("rank").collect()]
        assert picks[0] == 1  # smallest draw
        assert {group(p) for p in picks} == {0, 1, 2}

    def test_radius_reported_and_shrinking_groups(self, spark):
        pool = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "pid long, draw string")
        rows = [(a, b, float(abs(a - b))) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
        dists = spark.createDataFrame(rows, "a long, b long, dist double")
        out = k_center_greedy(pool, dists, k=3).orderBy("rank").collect()
        assert out[0].dist_to_centers is None
        assert out[1].pid == 3 and out[1].dist_to_centers == 2.0  # farthest from 1
        assert out[2].pid == 2 and out[2].dist_to_centers == 1.0


class TestTrendTests:
    def _run(self, spark, series):
        rows = [(g, f"d{i:02d}", v) for g, vals in series.items()
                for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, d string, v long")
        return {r.g: r for r in theil_sen_mann_kendall(df, "g", "d", "v").collect()}

    def test_monotone_and_flat(self, spark):
        out = self._run(spark, {
            "up": [10 + 3 * t for t in range(12)],
            "down": [100 - 5 * t for t in range(12)],
            "flat": [7] * 12,
        })
        assert out["up"].trend == "increasing" and out["up"].sen_slope == 3.0
        assert out["down"].trend == "decreasing" and out["down"].sen_slope == -5.0
        assert out["flat"].trend == "none" and out["flat"].mk_z == 0.0
        assert out["up"].mk_s == 66  # all 66 pairs concordant

    def test_outlier_robustness(self, spark):
        clean = [10 + 2 * t for t in range(12)]
        spiked = list(clean)
        spiked[5] = 500
        out = self._run(spark, {"clean": clean, "spiked": spiked})
        # Theil-Sen barely moves; OLS slope would be wrecked
        assert out["spiked"].sen_slope == pytest.approx(2.0, abs=0.1)
        assert out["spiked"].trend == "increasing"
