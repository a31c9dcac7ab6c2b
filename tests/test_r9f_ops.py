"""Round-9 wave-G operators: activity streaks (gaps-and-islands),
DDSketch quantiles, isotonic calibration (PAV minimax), stratified
ATE/ATT."""

from __future__ import annotations

import datetime
import math

import pytest


def _ts(day):
    return datetime.datetime(2024, 1, day, 12, 0, 0)


class TestActivityStreaks:
    def _run(self, spark, rows, top_n=200):
        from azure_data_engineering_spark.operators.window_ops import activity_streaks

        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        return {
            r.key: r
            for r in activity_streaks(df, "user_id", "ts", top_n=top_n).collect()
        }

    def test_basic_islands(self, spark):
        # user 1: days 1,2,3 then 7,8 -> islands (3, 2); user 2: day 5 only
        rows = [(1, _ts(d)) for d in (1, 2, 3, 7, 8)] + [(2, _ts(5))]
        got = self._run(spark, rows)
        assert got[1].n_islands == 2 and got[1].longest_streak == 3
        assert got[1].longest_start == "2024-01-01"
        assert got[1].n_active_days == 5
        assert got[2].longest_streak == 1

    def test_duplicate_events_one_day(self, spark):
        rows = [(1, _ts(1)), (1, _ts(1)), (1, _ts(2))]
        got = self._run(spark, rows)
        assert got[1].n_active_days == 2 and got[1].longest_streak == 2

    def test_tie_breaks_earliest_start(self, spark):
        # two 2-day islands: days (1,2) and (9,10) -> report the first
        rows = [(1, _ts(d)) for d in (1, 2, 9, 10)]
        got = self._run(spark, rows)
        assert got[1].longest_streak == 2
        assert got[1].longest_start == "2024-01-01"


class TestDDSketch:
    def test_relative_error_bound(self, spark):
        from azure_data_engineering_spark.operators.ddsketch import ddsketch_quantiles

        vals = [(float(v),) for v in range(1, 2001)]
        df = spark.createDataFrame(vals, "x double")
        rows = ddsketch_quantiles(df, "x", alpha=0.02).collect()
        assert len(rows) == 3
        for r in rows:
            assert r.rel_err <= 0.02 + 1e-9, (r.q, r.rel_err)
            # exact order statistic: rank ceil(q*n) of 1..2000
            assert r.exact_value == math.ceil(r.q * 2000)

    def test_mergeable(self, spark):
        from azure_data_engineering_spark.operators.ddsketch import ddsketch_buckets

        vals = [(float(v),) for v in range(1, 1001)]
        df = spark.createDataFrame(vals, "x double")
        whole = {
            (r.bucket, r.ct) for r in ddsketch_buckets(df, "x", alpha=0.02).collect()
        }
        a = spark.createDataFrame(vals[:400], "x double")
        b = spark.createDataFrame(vals[400:], "x double")
        merged = (
            ddsketch_buckets(a, "x", alpha=0.02)
            .unionAll(ddsketch_buckets(b, "x", alpha=0.02))
            .groupBy("bucket")
            .sum("ct")
        )
        got = {(r.bucket, r["sum(ct)"]) for r in merged.collect()}
        assert got == whole

    def test_nonpositive_excluded(self, spark):
        from azure_data_engineering_spark.operators.ddsketch import ddsketch_quantiles

        df = spark.createDataFrame(
            [(0.0,), (-5.0,)] + [(float(v),) for v in range(1, 101)], "x double"
        )
        rows = ddsketch_quantiles(df, "x", alpha=0.05, quantiles=(0.5,)).collect()
        assert rows[0].n == 100


class TestIsotonicCalibration:
    def _run(self, spark, scores_labels, lo, width, n_bins):
        from azure_data_engineering_spark.operators.mlplan import isotonic_calibration

        df = spark.createDataFrame(scores_labels, "s double, y int")
        return isotonic_calibration(df, "s", "y", lo=lo, width=width, n_bins=n_bins).collect()

    def test_monotone_and_matches_pav(self, spark):
        # bins 0..3 with raw rates 0.2, 0.6, 0.4, 0.8 (violation at 1->2)
        data = []
        rates = {0: (1, 5), 1: (3, 5), 2: (2, 5), 3: (4, 5)}
        for b, (pos, n) in rates.items():
            for i in range(n):
                data.append((b + 0.5, 1 if i < pos else 0))
        rows = self._run(spark, data, lo=0.0, width=1.0, n_bins=4)
        iso = [r.iso_rate for r in sorted(rows, key=lambda r: r.bin)]
        assert all(iso[i] <= iso[i + 1] + 1e-9 for i in range(len(iso) - 1))
        # PAV pools bins 1,2 -> (3+2)/10 = 0.5
        assert iso == [0.2, 0.5, 0.5, 0.8]

    def test_already_monotone_identity(self, spark):
        data = []
        for b, (pos, n) in {0: (1, 10), 1: (5, 10), 2: (9, 10)}.items():
            for i in range(n):
                data.append((b + 0.5, 1 if i < pos else 0))
        rows = self._run(spark, data, lo=0.0, width=1.0, n_bins=3)
        for r in rows:
            assert abs(r.iso_rate - r.rate) < 1e-9

    def test_bin_cap(self, spark):
        from azure_data_engineering_spark.operators.mlplan import isotonic_calibration

        df = spark.createDataFrame([(0.1, 1)], "s double, y int")
        with pytest.raises(ValueError):
            isotonic_calibration(df, "s", "y", lo=0.0, width=1.0, n_bins=65)


class TestStratifiedAte:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import stratified_ate

        df = spark.createDataFrame(rows, "c string, t int, y double")
        return stratified_ate(df, "t", "y", "c").collect()[0]

    def test_simpson_proof(self, spark):
        # within each class the effect is +1; pooled comparison would
        # be contaminated by class-mix imbalance
        rows = []
        for _ in range(8):
            rows.append(("a", 1, 2.0))
            rows.append(("a", 0, 1.0))
        rows += [("b", 1, 11.0)] * 2 + [("b", 0, 10.0)] * 8
        r = self._run(spark, rows)
        assert abs(r.ate - 1.0) < 1e-9 and abs(r.att - 1.0) < 1e-9

    def test_overlap_dropped(self, spark):
        rows = [("a", 1, 2.0), ("a", 0, 1.0), ("z", 1, 99.0)]  # z lacks control
        r = self._run(spark, rows)
        assert r.n_classes == 2 and r.n_classes_used == 1
        assert r.n_dropped_rows == 1
        assert abs(r.ate - 1.0) < 1e-9

    def test_att_weights_treated(self, spark):
        # class a: diff +1 with n1=1; class b: diff +3 with n1=3
        rows = [("a", 1, 2.0), ("a", 0, 1.0)]
        rows += [("b", 1, 4.0)] * 3 + [("b", 0, 1.0)]
        r = self._run(spark, rows)
        # ATE weights by n: (2*1 + 4*3)/6 = 14/6; ATT by n1: (1*1+3*3)/4
        assert abs(r.ate - round(14 / 6, 6)) < 1e-6
        assert abs(r.att - 2.5) < 1e-9
