"""CDC-style streaming upsert sink: per-micro-batch MERGE into a
parquet target (foreachBatch)."""

from __future__ import annotations

import time

import pandas as pd

from azure_data_engineering_spark.streaming.sinks import stream_upsert_to_parquet


def test_two_batches_merge_into_target(spark, tmp_path):
    src = tmp_path / "cdc_src"
    src.mkdir()
    target = str(tmp_path / "cdc_target")
    # batch 0: initial keys; batch 1: one update + one insert + an
    # in-batch duplicate (PK dedup picks highest version)
    pd.DataFrame({"k": [1, 2], "v": ["a", "b"], "version": [1, 1]}).to_parquet(src / "b0.parquet")
    time.sleep(1.05)
    pd.DataFrame(
        {"k": [2, 3, 3], "v": ["B", "c_old", "c_new"], "version": [2, 1, 2]}
    ).to_parquet(src / "b1.parquet")

    from pyspark.sql import functions as F

    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = stream_upsert_to_parquet(
        stream, target, pk=["k"], dedup_order=[F.col("version").desc()]
    )
    q.awaitTermination()

    final = {r["k"]: (r["v"], r["version"]) for r in spark.read.parquet(target).collect()}
    assert final == {1: ("a", 1), 2: ("B", 2), 3: ("c_new", 2)}


def test_char_shingles(spark):
    from pyspark.sql import functions as F

    from azure_data_engineering_spark.operators.dedup import char_shingles

    out = spark.range(1).select(char_shingles(F.lit("abcdef"), 5).alias("s")).collect()[0]["s"]
    assert sorted(out) == ["abcde", "bcdef"]
    short = spark.range(1).select(char_shingles(F.lit("ab"), 5).alias("s")).collect()[0]["s"]
    assert short == ["ab"]
