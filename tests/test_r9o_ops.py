"""Round-9 wave-P operators: IPF raking, Bradley-Terry, paired
permutation test, capture-recapture."""

from __future__ import annotations

import math

import pytest


class TestIpfRaking:
    def _run(self, spark, cells, row_t, col_t, iterations=16):
        from azure_data_engineering_spark.operators.sampling import ipf_raking

        df = spark.createDataFrame(cells, "r string, c string")
        rt = spark.createDataFrame(row_t, "k string, t double")
        ct = spark.createDataFrame(col_t, "k string, t double")
        return ipf_raking(df, "r", "c", rt, ct, iterations=iterations).collect()

    def test_marginals_match_targets(self, spark):
        cells = (
            [("a", "x")] * 10 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 10
        )
        row_t = [("a", 30.0), ("b", 10.0)]
        col_t = [("x", 25.0), ("y", 15.0)]
        out = self._run(spark, cells, row_t, col_t)
        row_sums = {}
        col_sums = {}
        for r in out:
            row_sums[r.row_key] = row_sums.get(r.row_key, 0) + r.weighted_n
            col_sums[r.col_key] = col_sums.get(r.col_key, 0) + r.weighted_n
        assert abs(row_sums["a"] - 30.0) < 1e-3 and abs(row_sums["b"] - 10.0) < 1e-3
        assert abs(col_sums["x"] - 25.0) < 1e-3 and abs(col_sums["y"] - 15.0) < 1e-3

    def test_already_matching_identity(self, spark):
        cells = [("a", "x")] * 6 + [("a", "y")] * 4 + [("b", "x")] * 4 + [("b", "y")] * 6
        row_t = [("a", 10.0), ("b", 10.0)]
        col_t = [("x", 10.0), ("y", 10.0)]
        out = self._run(spark, cells, row_t, col_t)
        for r in out:
            assert abs(r.weight - 1.0) < 1e-6


class TestBradleyTerry:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(rows, "a string, b string, wins_a long, n long")

    def test_dominant_item_strongest(self, spark):
        from azure_data_engineering_spark.operators.mlplan import bradley_terry

        rows = [("A", "B", 9, 10), ("A", "C", 9, 10), ("B", "C", 5, 10)]
        out = {r.item: r for r in bradley_terry(self._pairs(spark, rows)).collect()}
        assert out["A"].pi > out["B"].pi
        assert abs(out["B"].pi - out["C"].pi) < 0.2

    def test_balanced_uniform(self, spark):
        from azure_data_engineering_spark.operators.mlplan import bradley_terry

        rows = [("A", "B", 5, 10), ("A", "C", 5, 10), ("B", "C", 5, 10)]
        out = bradley_terry(self._pairs(spark, rows)).collect()
        for r in out:
            assert abs(r.pi - 1.0) < 1e-6

    def test_zero_win_item_raises(self, spark):
        from azure_data_engineering_spark.operators.mlplan import bradley_terry

        rows = [("A", "B", 10, 10)]
        with pytest.raises(ValueError):
            bradley_terry(self._pairs(spark, rows))

    def test_probability_identity(self, spark):
        from azure_data_engineering_spark.operators.mlplan import bradley_terry

        rows = [("A", "B", 8, 10), ("A", "C", 8, 10), ("B", "C", 8, 10)]
        out = {r.item: r for r in bradley_terry(self._pairs(spark, rows)).collect()}
        # p_vs_avg = pi/(pi+1) with avg strength normalized near 1
        for r in out.values():
            assert abs(r.p_vs_avg - r.pi / (r.pi + 1.0)) < 1e-5


class TestPairedPermutation:
    def _run(self, spark, diffs, n_perms=500):
        from azure_data_engineering_spark.operators.stats import paired_permutation_test

        df = spark.createDataFrame(diffs, "u string, d double")
        return paired_permutation_test(df, "u", "d", n_perms=n_perms).collect()[0]

    def test_strong_effect_small_p(self, spark):
        diffs = [(f"u{i}", 5.0 + (i % 3) * 0.1) for i in range(30)]
        r = self._run(spark, diffs)
        assert r.p_value < 0.02

    def test_null_effect_large_p(self, spark):
        diffs = [(f"u{i}", (1.0 if i % 2 else -1.0) * (1 + i % 5)) for i in range(30)]
        r = self._run(spark, diffs)
        assert r.p_value > 0.1

    def test_identity_included(self, spark):
        # p can never be 0: the observed labeling counts as 1/(B+1)
        diffs = [(f"u{i}", 100.0) for i in range(20)]
        r = self._run(spark, diffs, n_perms=100)
        assert r.p_value >= round(1 / 101, 6)


class TestCaptureRecapture:
    def test_recovers_population(self, spark):
        from azure_data_engineering_spark.operators.sampling import capture_recapture

        df = spark.createDataFrame([(i,) for i in range(20000)], "id long")
        r = capture_recapture(df, "id", p1=0.3, p2=0.3).collect()[0]
        assert abs(r.ratio - 1.0) < 0.05
        assert abs(r.n_hat - 20000) < 4 * r.se + 200

    def test_full_overlap_exact(self, spark):
        from azure_data_engineering_spark.operators.sampling import capture_recapture

        df = spark.createDataFrame([(i,) for i in range(100)], "id long")
        r = capture_recapture(df, "id", p1=1.0, p2=1.0).collect()[0]
        assert r.n1 == r.n2 == r.overlap == 100
        assert abs(r.n_hat - 100.0) < 1e-6 and r.se == 0.0

    def test_deterministic(self, spark):
        from azure_data_engineering_spark.operators.sampling import capture_recapture

        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        a = capture_recapture(df, "id").collect()[0]
        b = capture_recapture(df, "id").collect()[0]
        assert a == b
