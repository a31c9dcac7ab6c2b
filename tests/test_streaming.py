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

    def test_exact_gap_boundary_continues_session(self, spark):
        """Pin the exact-boundary semantics against the native operator:
        session_window merges sessions whose [ts, ts+gap) intervals
        overlap OR touch, so an event arriving EXACTLY gap after the
        previous one CONTINUES the session — batch sessionize must use
        strictly `>` to match (verified empirically here)."""
        rows = [
            ("u", "2024-01-01 00:00:00"),
            ("u", "2024-01-01 00:30:00"),  # exactly 30m later → still same session
            ("u", "2024-01-01 01:30:01"),  # 30m01s later → new session
        ]
        df = spark.createDataFrame(rows, "user_id string, ts_s string").select(
            "user_id", F.to_timestamp("ts_s").alias("ts")
        )
        batch = sessionize(df, "user_id", "ts", gap_minutes=30)
        native = (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        )
        a = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect())
        b = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in native.collect())
        assert a == b
        assert [x[2] for x in a] == [2, 1]  # exact-boundary event merged into session 1


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


class TestCheckpointResume:
    def test_second_run_processes_only_new_files(self, spark, tmp_path):
        """Exactly-once across restarts: an availableNow run with a
        checkpoint drains the source; a second run with the SAME
        checkpoint after one more file arrives must process only that
        file (offset log resume), never reprocess the old ones."""
        import pandas as pd

        src = tmp_path / "ckpt_src"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "ckpt_out")
        pd.DataFrame({"k": [1, 2, 3]}).to_parquet(src / "f0.parquet")

        def run_once():
            stream = spark.readStream.schema("k long").parquet(str(src))
            q = (
                stream.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        assert spark.read.parquet(out_dir).count() == 3

        pd.DataFrame({"k": [4, 5]}).to_parquet(src / "f1.parquet")
        run_once()
        rows = sorted(r["k"] for r in spark.read.parquet(out_dir).collect())
        assert rows == [1, 2, 3, 4, 5]  # no duplicates from reprocessing
