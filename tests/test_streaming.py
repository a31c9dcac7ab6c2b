"""Structured Streaming tests: batch/stream equivalence, stateful
dedup, session windows (SURVEY.md §5 item 4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_data_engineering_spark.catalog import load_table
from azure_data_engineering_spark.operators.window_ops import sessionize
from azure_data_engineering_spark.streaming.windows import (
    run_stream_to_table,
    session_counts,
    stream_dedup,
    tumbling_counts,
)


def _events_path(sf_dir):
    return os.path.join(sf_dir, "events.parquet")


class TestBatchStreamEquivalence:
    def test_tumbling_counts(self, spark, sf_dir):
        batch = tumbling_counts(load_table(spark, sf_dir, "events")).collect()
        streamed = run_stream_to_table(
            spark,
            _events_path(sf_dir),
            lambda s: tumbling_counts(s),
            "t_tumbling",
            output_mode="complete",
        ).collect()
        key = lambda r: (r["window_start"], r["event_type"])
        assert sorted((key(r), r["n_events"], r["sum_value"]) for r in batch) == sorted(
            (key(r), r["n_events"], r["sum_value"]) for r in streamed
        )

    def test_session_window_matches_batch_sessionize(self, spark, sf_dir):
        streamed = run_stream_to_table(
            spark,
            _events_path(sf_dir),
            lambda s: session_counts(s, gap="30 minutes"),
            "t_sessions",
            output_mode="complete",
        )
        batch = sessionize(load_table(spark, sf_dir, "events"), "user_id", "ts", gap_minutes=30)
        a = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in streamed.collect())
        b = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect())
        assert a == b


class TestStreamDedup:
    def test_duplicates_dropped_within_watermark(self, spark, sf_dir):
        n_unique = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
        out = run_stream_to_table(
            spark,
            _events_path(sf_dir),
            lambda s: stream_dedup(s, ["user_id"], watermark="10 hours"),
            "t_dedup",
            output_mode="append",
        )
        # whole fixture spans ~1 month but each availableNow batch
        # dedups per watermark state; result must be <= total and >= unique
        total = load_table(spark, sf_dir, "events").count()
        assert n_unique <= out.count() <= total
