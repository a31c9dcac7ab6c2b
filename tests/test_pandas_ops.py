"""Pandas-UDF surface + skew-ops tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_data_engineering_spark.catalog import load_table
from azure_data_engineering_spark.functions.text import whitespace_token_count
from azure_data_engineering_spark.operators.pandas_ops import (
    user_event_profile,
    vectorized_token_count,
)
from azure_data_engineering_spark.operators.relational import salted_aggregate
from azure_data_engineering_spark.streaming.stateful import running_user_totals
from azure_data_engineering_spark.streaming.windows import run_stream_to_table


class TestScalarPandasUdf:
    def test_matches_jvm_builtin(self, spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        diff = d.select(
            (vectorized_token_count(F.col("text")) != whitespace_token_count(F.col("text"))).alias("ne")
        ).filter("ne").count()
        assert diff == 0

    def test_handles_blank_and_null(self, spark):
        df = spark.createDataFrame([("",), ("  ",), (None,), ("a b",)], "text string")
        got = [r[0] for r in df.select(vectorized_token_count(F.col("text"))).collect()]
        assert got == [0, 0, 0, 2]


class TestGroupedMap:
    def test_profile_totals(self, spark, sf_dir):
        e = load_table(spark, sf_dir, "events")
        prof = {r["user_id"]: r for r in user_event_profile(e).collect()}
        direct = {
            r["user_id"]: r
            for r in e.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
            .collect()
        }
        assert set(prof) == set(direct)
        for uid, row in direct.items():
            assert prof[uid]["n_events"] == row["n"]
            assert abs(prof[uid]["total_value"] - row["tv"]) < 1e-6

    def test_builtin_twin_matches_pandas_version(self, spark, sf_dir):
        """user_event_profile_builtin (lag window + hash agg) must be
        row-identical to the applyInPandas version — it's the plan the
        crossover rule says to prefer."""
        from azure_data_engineering_spark.operators.pandas_ops import user_event_profile_builtin

        e = load_table(spark, sf_dir, "events")
        a = sorted(map(tuple, user_event_profile(e).collect()))
        b = sorted(map(tuple, user_event_profile_builtin(e).collect()))
        assert a == b


class TestSaltedAggregate:
    def test_equals_direct_groupby(self, spark, sf_dir):
        l = load_table(spark, sf_dir, "lineitem")
        salted = salted_aggregate(
            l, ["l_returnflag"], {"n": ("count", "l_quantity"), "s": ("sum", "l_quantity")}
        )
        direct = l.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), F.sum("l_quantity").alias("s")
        )
        a = sorted((r["l_returnflag"], r["n"], round(r["s"], 6)) for r in salted.collect())
        b = sorted((r["l_returnflag"], r["n"], round(r["s"], 6)) for r in direct.collect())
        assert a == b

    def test_skewed_hot_key(self, spark):
        # 50k rows on one hot key + 200 cold keys: results must still
        # match a direct groupBy exactly
        from pyspark.sql import functions as FF

        df = spark.range(50_200).select(
            FF.when(FF.col("id") < 50_000, FF.lit("hot")).otherwise(FF.col("id").cast("string")).alias("k"),
            (FF.col("id") % 7).alias("v"),
        )
        salted = salted_aggregate(df, ["k"], {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v")}, salt_buckets=8)
        direct = df.groupBy("k").agg(
            FF.count("*").alias("n"), FF.sum("v").alias("s"), FF.max("v").alias("mx")
        )
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))

    def test_rejects_non_mergeable(self, spark, sf_dir):
        import pytest

        l = load_table(spark, sf_dir, "lineitem")
        with pytest.raises(ValueError, match="non-mergeable"):
            salted_aggregate(l, ["l_returnflag"], {"a": ("avg", "l_quantity")})


class TestStatefulStreaming:
    def test_single_batch_equals_groupby(self, spark, sf_dir):
        out = run_stream_to_table(
            spark,
            os.path.join(sf_dir, "events.parquet"),
            running_user_totals,
            "t_stateful",
            output_mode="update",
        )
        e = load_table(spark, sf_dir, "events")
        direct = {
            r["user_id"]: (r["n"], round(r["tv"], 2))
            for r in e.groupBy("user_id").agg(F.count("*").alias("n"), F.sum("value").alias("tv")).collect()
        }
        # single parquet file -> single micro-batch -> one emission per user
        got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out.collect()}
        assert got == direct
