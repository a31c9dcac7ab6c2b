"""RocksDB state store provider for stateful streaming.

The default HDFSBackedStateStoreProvider keeps every key of streaming
state in executor HEAP — the scale-killer for 100 TB streaming dedup,
where the signature store is far larger than memory. RocksDB spills
state to local disk with an in-memory block cache, making state size
disk-bound instead of heap-bound; rocksdbjni ships in $SPARK_HOME/jars
so flipping `spark.sql.streaming.stateStore.providerClass` is all a
cluster needs. These tests run the REAL engine under RocksDB and prove
(a) results are identical to the default provider and to batch, and
(b) the checkpoint actually contains RocksDB artifacts (zip snapshots /
changelogs), not the HDFS provider's .delta files — so the provider
demonstrably engaged rather than silently falling back.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.catalog import load_table, restore_event_time

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _run_stateful(spark, sf_dir, transform, name, checkpoint, output_mode="append"):
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path)
    import tempfile

    d = tempfile.mkdtemp(prefix="rocks_src_")
    os.symlink(os.path.abspath(path), os.path.join(d, "events.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(d)
    stream = restore_event_time(stream, "ts")
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@pytest.fixture()
def rocksdb_conf(spark):
    old = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    yield
    if old is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, old)


class TestRocksDbStateStore:
    def test_stateful_dedup_matches_default_provider(
        self, spark, sf_dir, tmp_path, rocksdb_conf
    ):
        """dropDuplicates state lives in RocksDB; emitted rows must be
        byte-identical to the default provider's run."""
        from azure_data_engineering_spark.streaming.windows import stream_dedup

        rocks = _run_stateful(
            spark, sf_dir,
            lambda s: stream_dedup(s, ["user_id"], watermark="10 hours"),
            "t_rocks_dedup", str(tmp_path / "ck_rocks"),
        ).collect()
        spark.conf.set(PROVIDER_CONF,
                       "org.apache.spark.sql.execution.streaming."
                       "state.HDFSBackedStateStoreProvider")
        hdfs = _run_stateful(
            spark, sf_dir,
            lambda s: stream_dedup(s, ["user_id"], watermark="10 hours"),
            "t_hdfs_dedup", str(tmp_path / "ck_hdfs"),
        ).collect()
        key = lambda r: tuple(str(x) for x in r)
        assert sorted(map(key, rocks)) == sorted(map(key, hdfs))
        assert len(rocks) > 0

    def test_rocksdb_artifacts_present_in_checkpoint(
        self, spark, sf_dir, tmp_path, rocksdb_conf
    ):
        """Proof the provider engaged: RocksDB checkpoints state as
        zip snapshots (+ optional changelogs); the HDFS provider's
        .delta files must be absent."""
        from azure_data_engineering_spark.streaming.windows import tumbling_counts

        ck = str(tmp_path / "ck_art")
        out = _run_stateful(
            spark, sf_dir, lambda s: tumbling_counts(s),
            "t_rocks_art", ck, output_mode="complete",
        )
        assert out.count() > 0
        state_files = glob.glob(os.path.join(ck, "state", "**", "*"), recursive=True)
        exts = {os.path.splitext(f)[1] for f in state_files if os.path.isfile(f)}
        assert ".zip" in exts or ".changelog" in exts, (
            f"no RocksDB artifacts under {ck}/state: {sorted(exts)}"
        )
        assert ".delta" not in exts, "HDFS provider artifacts found — fallback?"

    def test_windowed_agg_under_rocksdb_matches_batch(
        self, spark, sf_dir, tmp_path, rocksdb_conf
    ):
        """Tumbling-window counts under RocksDB equal the batch
        equivalent — state round-trips through RocksDB losslessly."""
        from azure_data_engineering_spark.streaming.windows import tumbling_counts

        streamed = _run_stateful(
            spark, sf_dir, lambda s: tumbling_counts(s),
            "t_rocks_tumbling", str(tmp_path / "ck_tumb"), output_mode="complete",
        ).collect()
        batch = tumbling_counts(load_table(spark, sf_dir, "events")).collect()
        key = lambda r: (r["window_start"], r["event_type"])
        assert sorted((key(r), r["n_events"], r["sum_value"]) for r in streamed) == \
               sorted((key(r), r["n_events"], r["sum_value"]) for r in batch)
