"""Round-7 operators: funnel conversion, cohort retention matrix,
weight-of-evidence encoding, and the rank-k ALS extension (the last
is covered in test_r6c_ops.TestAlsRankK)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.funnel import (
    cohort_retention,
    funnel_conversion,
)
from azure_data_engineering_spark.operators.features import woe_encoding


def _ev(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, event_type string, sec long")
    return df.select(
        "user_id", "event_type", F.timestamp_seconds("sec").alias("ts")
    )


class TestFunnelConversion:
    def test_strict_ordering_and_rates(self, spark):
        rows = [
            # u1 completes A -> B -> C in order
            (1, "A", 10), (1, "B", 20), (1, "C", 30),
            # u2's B arrives BEFORE A: must stop at A
            (2, "B", 5), (2, "A", 10),
            # u3's B at the SAME ts as A: equal timestamps do not chain
            (3, "A", 10), (3, "B", 10),
            # u4 never does A: appears nowhere
            (4, "B", 10), (4, "C", 20),
        ]
        out = {
            r["step"]: r
            for r in funnel_conversion(_ev(spark, rows), ["A", "B", "C"]).collect()
        }
        assert out[1]["n_users"] == 3  # u1 u2 u3
        assert out[2]["n_users"] == 1  # only u1 chains
        assert out[3]["n_users"] == 1
        assert out[1]["pct_of_first"] == 1.0
        assert out[1]["pct_of_previous"] is None
        assert out[2]["pct_of_first"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[3]["pct_of_previous"] == 1.0

    def test_later_retry_counts(self, spark):
        # u1: A@10, B@5 (too early), B@15 (counts)
        rows = [(1, "A", 10), (1, "B", 5), (1, "B", 15)]
        out = {r["step"]: r["n_users"]
               for r in funnel_conversion(_ev(spark, rows), ["A", "B"]).collect()}
        assert out == {1: 1, 2: 1}


class TestCohortRetention:
    def test_week_offsets_and_rates(self, spark):
        wk = 7 * 86400
        # cohort week 0: u1 (returns week 1), u2 (week 0 only)
        # cohort week 1: u3
        rows = [
            (1, "x", 4 * 86400), (1, "x", 4 * 86400 + wk),
            (2, "x", 5 * 86400),
            (3, "x", 4 * 86400 + wk),
        ]
        out = {
            (r["cohort_start"], r["period_offset"]): r
            for r in cohort_retention(_ev(spark, rows)).collect()
        }
        # epoch day 4 (1970-01-05) is a Monday -> cohort starts there
        k0 = ("1970-01-05", 0)
        assert out[k0]["n_active"] == 2 and out[k0]["cohort_size"] == 2
        assert out[k0]["retention"] == 1.0
        k1 = ("1970-01-05", 1)
        assert out[k1]["n_active"] == 1
        assert out[k1]["retention"] == 0.5
        k2 = ("1970-01-12", 0)
        assert out[k2]["cohort_size"] == 1 and out[k2]["retention"] == 1.0

    def test_offset_zero_is_always_full(self, spark):
        rows = [(u, "x", u * 86400) for u in range(1, 6)]
        for r in cohort_retention(_ev(spark, rows)).collect():
            if r["period_offset"] == 0:
                assert r["retention"] == 1.0


class TestWoeEncoding:
    def test_known_values(self, spark):
        # cat a: 3 pos / 1 neg; cat b: 1 pos / 3 neg
        rows = [("a", 1)] * 3 + [("a", 0)] + [("b", 1)] + [("b", 0)] * 3
        df = spark.createDataFrame(rows, "cat string, y int")
        out = {r["category"]: r for r in woe_encoding(df, "cat", "y").collect()}
        t_pos, t_neg, s = 4, 4, 0.5
        woe_a = math.log(((3 + s) / (t_pos + 1)) / ((1 + s) / (t_neg + 1)))
        assert out["a"]["woe"] == pytest.approx(woe_a, abs=1e-6)
        # symmetry: b is a's mirror
        assert out["b"]["woe"] == pytest.approx(-woe_a, abs=1e-6)
        # IV contributions are non-negative by construction
        assert out["a"]["iv"] >= 0 and out["b"]["iv"] >= 0
        assert out["a"]["n"] == 4 and out["a"]["n_pos"] == 3

    def test_single_class_category_stays_finite(self, spark):
        rows = [("only_pos", 1)] * 5 + [("mixed", 1), ("mixed", 0)]
        df = spark.createDataFrame(rows, "cat string, y int")
        out = {r["category"]: r for r in woe_encoding(df, "cat", "y").collect()}
        assert math.isfinite(out["only_pos"]["woe"])


class TestJoinSizeAms:
    def test_expectation_and_exact_identity(self, spark):
        from azure_data_engineering_spark.operators.diagnostics import join_size_ams

        left = spark.createDataFrame([(i % 50,) for i in range(500)], "k long")
        right = spark.createDataFrame([(i % 50,) for i in range(1000)], "k long")
        r = join_size_ams(left, right, "k", "k").first()
        # exact_rows is the frequency identity: 50 keys * 10 * 20
        assert r["exact_rows"] == 50 * 10 * 20
        # AMS is unbiased with variance ~ exact/sqrt(buckets); allow a
        # wide but meaningful envelope
        assert r["est_rows"] == pytest.approx(r["exact_rows"], rel=0.5)
        assert r["rel_error"] == pytest.approx(
            abs(r["est_rows"] - r["exact_rows"]) / r["exact_rows"], abs=1e-6
        )

    def test_disjoint_keys_estimate_near_zero(self, spark):
        from azure_data_engineering_spark.operators.diagnostics import join_size_ams

        left = spark.createDataFrame([(i,) for i in range(200)], "k long")
        right = spark.createDataFrame([(10_000 + i,) for i in range(200)], "k long")
        r = join_size_ams(left, right, "k", "k").first()
        assert r["exact_rows"] == 0
        # disjoint keys: signs are independent, estimate stays small
        assert abs(r["est_rows"]) < 200

    def test_deterministic(self, spark):
        from azure_data_engineering_spark.operators.diagnostics import join_size_ams

        df = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
        a = join_size_ams(df, df, "k", "k").first()["est_rows"]
        b = join_size_ams(df, df, "k", "k").first()["est_rows"]
        assert a == b


class TestHbosScores:
    def test_planted_outlier_ranks_first(self, spark):
        from azure_data_engineering_spark.operators.stats import hbos_scores

        rows = [(i, float(50 + i % 5), float(100 + i % 3)) for i in range(200)]
        rows.append((999, 10_000.0, -5_000.0))  # alone in its bins
        df = spark.createDataFrame(rows, "id long, x double, y double")
        top = hbos_scores(df, "id", ["x", "y"], top_n=3).collect()
        assert top[0]["id"] == 999
        assert top[0]["score"] > top[1]["score"]

    def test_constant_feature_is_neutral(self, spark):
        from azure_data_engineering_spark.operators.stats import hbos_scores

        rows = [(i, float(i % 10), 7.0) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, x double, c double")
        out = hbos_scores(df, "id", ["x", "c"], top_n=100).collect()
        # constant feature: every row in bin 0, density 1, -ln(1)=0 —
        # scores must equal the x-only screen (all equal here)
        assert len({r["score"] for r in out}) == 1


class TestEbShrunkRates:
    def test_small_samples_shrink_harder(self, spark):
        from azure_data_engineering_spark.operators.stats import eb_shrunk_rates

        rows = (
            [("big_hi", 1)] * 900 + [("big_hi", 0)] * 100     # 0.9 on 1000
            + [("small_hi", 1)] * 9 + [("small_hi", 0)]       # 0.9 on 10
            + [("mid", 1)] * 50 + [("mid", 0)] * 50           # 0.5 on 100
            + [("small_lo", 1)] + [("small_lo", 0)] * 9       # 0.1 on 10
            + [("big_lo", 1)] * 100 + [("big_lo", 0)] * 900   # 0.1 on 1000
        )
        df = spark.createDataFrame(rows, "g string, y int")
        out = {r["group"]: r for r in eb_shrunk_rates(df, "g", "y").collect()}
        m = sum(v["raw_rate"] for v in out.values()) / 5  # pooled mean 0.5
        # both high-rate groups shrink toward m, the small one harder
        assert out["small_hi"]["shrunk_rate"] < out["big_hi"]["shrunk_rate"]
        assert out["small_lo"]["shrunk_rate"] > out["big_lo"]["shrunk_rate"]
        # shrinkage never crosses the pooled mean
        assert out["small_hi"]["shrunk_rate"] > m > out["small_lo"]["shrunk_rate"]

    def test_zero_variance_means_no_shrink_target_shift(self, spark):
        from azure_data_engineering_spark.operators.stats import eb_shrunk_rates

        rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
        df = spark.createDataFrame(rows, "g string, y int")
        out = eb_shrunk_rates(df, "g", "y").collect()
        for r in out:  # v == 0 -> K = 0 -> raw rate preserved
            assert r["shrunk_rate"] == r["raw_rate"] == 0.5


class TestHoltWinters:
    def _seasonal(self, spark, periods=28):
        # value = 100 + 2*t + strong weekly shape
        season = [30, -20, -10, 0, 10, 20, -30]
        rows = [
            ("s", f"d{t:03d}", float(100 + 2 * t + season[t % 7]))
            for t in range(periods)
        ]
        return spark.createDataFrame(rows, "series string, day string, y double")

    def test_fits_seasonal_series_better_than_holt(self, spark):
        from azure_data_engineering_spark.operators.timeseries import (
            holt_linear,
            holt_winters_additive,
        )

        df = self._seasonal(spark)
        hw = holt_winters_additive(df, "series", "day", "y").first()
        h = holt_linear(df, "series", "day", "y").first()
        assert hw["n_periods"] == 28
        assert hw["sse"] < h["sse"]  # the seasonal state earns its keep
        assert hw["trend"] > 0  # upward drift detected
        # one-step forecast lands near the true next value (186);
        # holt_linear's straight line cannot see the +30 seasonal slot
        assert hw["forecast_1"] == pytest.approx(186.0, abs=10.0)

    def test_short_series_not_emitted(self, spark):
        from azure_data_engineering_spark.operators.timeseries import (
            holt_winters_additive,
        )

        rows = [("short", f"d{t}", float(t)) for t in range(10)]
        df = spark.createDataFrame(rows, "series string, day string, y double")
        assert holt_winters_additive(df, "series", "day", "y").count() == 0

    def test_deterministic(self, spark):
        from azure_data_engineering_spark.operators.timeseries import (
            holt_winters_additive,
        )

        df = self._seasonal(spark)
        a = holt_winters_additive(df, "series", "day", "y").first()
        b = holt_winters_additive(df, "series", "day", "y").first()
        assert a == b


class TestFunnelLatency:
    def test_transition_gaps(self, spark):
        from azure_data_engineering_spark.operators.funnel import funnel_latency

        rows = [
            # u1: A@10 -> B@40 (30s) ; u2: A@10 -> B@110 (100s)
            (1, "A", 10), (1, "B", 40),
            (2, "A", 10), (2, "B", 110),
            # u3 never converts: B before A only
            (3, "B", 5), (3, "A", 10),
        ]
        out = funnel_latency(_ev(spark, rows), ["A", "B"]).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["step"], r["event_type"], r["n_converted"]) == (2, "B", 2)
        assert r["median_sec"] == pytest.approx(65.0, abs=1e-4)  # interp of 30,100
        assert r["max_sec"] == pytest.approx(100.0, abs=1e-4)
