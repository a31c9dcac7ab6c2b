"""snapshot_diff: the changelog between two versions replays exactly."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.catalog import load_table
from azure_data_engineering_spark.operators.upsert import apply_cdc
from azure_data_engineering_spark.sources import snapshot as sn


def _collect_set(df):
    return {tuple(r) for r in df.collect()}


class TestSnapshotDiff:
    def test_diff_replays_v1_into_v2(self, spark, sf_dir):
        """apply_cdc(v1, diff(v1 -> v2)) must equal v2 row-for-row —
        the changelog is complete AND minimal (no-op keys absent)."""
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        table = tempfile.mkdtemp(prefix="snapdiff_t_") + "/tbl"
        v1 = sn.snapshot_write(o.filter(F.col("o_orderkey") % 2 == 1), table)
        changes = (
            o.filter(F.col("o_orderkey") % 3 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + 7.0)
            .withColumn("op", F.lit("U"))
            .unionByName(
                o.filter(F.col("o_orderkey") % 7 == 0)
                .filter(F.col("o_orderkey") % 3 != 0)
                .withColumn("op", F.lit("D"))
            )
        )
        v2 = sn.snapshot_apply_cdc(changes, table, pk=["o_orderkey"])
        diff = sn.snapshot_diff(spark, table, v1, v2, pk=["o_orderkey"])
        replayed = apply_cdc(
            sn.snapshot_read(spark, table, version=v1),
            diff,
            pk=["o_orderkey"],
        )
        assert _collect_set(replayed) == _collect_set(
            sn.snapshot_read(spark, table, version=v2)
        )

    def test_unchanged_keys_emit_nothing(self, spark, sf_dir):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        )
        table = tempfile.mkdtemp(prefix="snapdiff_n_") + "/tbl"
        v1 = sn.snapshot_write(o, table)
        v2 = sn.snapshot_write(o, table)  # identical content recommit
        assert sn.snapshot_diff(spark, table, v1, v2, pk=["o_orderkey"]).count() == 0

    def test_null_payload_transitions_detected(self, spark):
        table = tempfile.mkdtemp(prefix="snapdiff_null_") + "/tbl"
        a = spark.createDataFrame(
            [(1, None), (2, "x"), (3, "y")], "k long, v string"
        )
        b = spark.createDataFrame(
            [(1, "now"), (2, None), (3, "y")], "k long, v string"
        )
        v1 = sn.snapshot_write(a, table)
        v2 = sn.snapshot_write(b, table)
        diff = {r.k: (r.op, r.v) for r in
                sn.snapshot_diff(spark, table, v1, v2, pk=["k"]).collect()}
        assert diff == {1: ("U", "now"), 2: ("U", None)}

    def test_schema_change_rejected(self, spark):
        table = tempfile.mkdtemp(prefix="snapdiff_s_") + "/tbl"
        v1 = sn.snapshot_write(
            spark.createDataFrame([(1, "a")], "k long, v string"), table
        )
        v2 = sn.snapshot_write(
            spark.createDataFrame([(1, "a", 2.0)], "k long, v string, w double"),
            table,
        )
        with pytest.raises(ValueError, match="schema changed"):
            sn.snapshot_diff(spark, table, v1, v2, pk=["k"])
