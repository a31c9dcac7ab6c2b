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
