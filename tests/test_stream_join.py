"""Stream-stream interval join: real two-stream execution equals the
batch join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_data_engineering_spark.catalog import load_table, restore_event_time
from azure_data_engineering_spark.streaming.joins import interval_join


def _sides(df):
    signup = df.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    purchase = df.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    return signup, purchase


def test_stream_stream_join_equals_batch(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    b_l, b_r = _sides(events)
    batch = interval_join(b_l, b_r, ["user_id"]).select("user_id", "l_id", "r_id")

    path = os.path.join(sf_dir, "events.parquet")
    import tempfile

    schema = spark.read.parquet(path).schema
    d = tempfile.mkdtemp(prefix="ssj_")
    os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
    raw = (
        spark.readStream.schema(schema)
        .parquet(d)
    )
    raw = restore_event_time(raw, "ts")
    s_l, s_r = _sides(raw)
    q = (
        interval_join(s_l, s_r, ["user_id"])
        .select("user_id", "l_id", "r_id")
        .writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("ssj_sink")
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, streamed.collect()))
    assert len(a) > 0, "fixture should produce signup->purchase pairs"
    assert a == b
