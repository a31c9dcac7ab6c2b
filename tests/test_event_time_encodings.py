"""The driver regenerates testdata between rounds and has already
shipped `events.ts` two different ways (TIMESTAMP(NANOS) -> bigint
under nanosAsLong in r1/r2, TIMESTAMP(MICROS, isAdjustedToUTC=false)
-> TIMESTAMP_NTZ in r3 — the latter broke every watermark until
restore_event_time learned it). This test pins all three physical
encodings to the same normalized TIMESTAMP so the next regen is a
no-op: batch loads agree instant-for-instant and the streaming path
accepts a watermark on each."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from azure_data_engineering_spark.catalog import restore_event_time

TS = [
    datetime.datetime(2024, 3, 1, 12, 0, 0),
    datetime.datetime(2024, 3, 1, 12, 30, 45, 123456),
    datetime.datetime(2024, 3, 2, 0, 0, 1),
]


def _write(tmp_path, name, arrow_type):
    arr = pa.array(TS).cast(arrow_type)
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(pa.table({"event_id": pa.array([1, 2, 3]), "ts": arr}), path)
    return path


@pytest.mark.parametrize(
    "name,arrow_type",
    [
        ("nanos", pa.timestamp("ns")),  # r1/r2 shape: bigint under nanosAsLong
        ("micros_ntz", pa.timestamp("us")),  # r3 shape: TIMESTAMP_NTZ
        ("micros_utc", pa.timestamp("us", tz="UTC")),  # plain TIMESTAMP
    ],
)
def test_all_encodings_normalize_to_same_instants(spark, tmp_path, name, arrow_type):
    path = _write(tmp_path, name, arrow_type)
    df = restore_event_time(spark.read.parquet(path), "ts")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = {r.event_id: r.ts for r in df.collect()}
    # session timezone is pinned UTC, so every encoding must yield the
    # original wall-clock instants exactly (micro precision)
    assert got == {1: TS[0], 2: TS[1], 3: TS[2]}


@pytest.mark.parametrize(
    "name,arrow_type",
    [("nanos", pa.timestamp("ns")), ("micros_ntz", pa.timestamp("us"))],
)
def test_streaming_watermark_accepts_every_encoding(spark, tmp_path, name, arrow_type):
    """The r3 breakage shape: withWatermark rejects TIMESTAMP_NTZ
    event time. run_stream_to_table must normalize any encoding before
    the watermark is attached."""
    from pyspark.sql import functions as F

    from azure_data_engineering_spark.streaming.windows import run_stream_to_table

    path = _write(tmp_path, name, arrow_type)
    out = run_stream_to_table(
        spark,
        path,
        lambda s: s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n")),
        table_name=f"enc_sink_{name}",
        output_mode="complete",  # append would hold back the still-open last window
    )
    assert sum(r.n for r in out.collect()) == 3
