"""MERGE/upsert semantics tests (PGHelperFunction.py:44-77 golden
behavior + property tests, SURVEY.md §5 items 2-3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.upsert import merge_upsert
from azure_data_engineering_spark.sources.jdbc import generate_merge_sql, generate_staging_ddl


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, grp string, val double")


@pytest.fixture()
def target(spark):
    return _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])


class TestMergeUpsert:
    def test_update_matched_insert_unmatched(self, spark, target):
        source = _df(spark, [(2, "B", 20.0), (9, "z", 9.0)])
        out = {r["k"]: (r["grp"], r["val"]) for r in merge_upsert(target, source, ["k"]).collect()}
        assert out == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 9: ("z", 9.0)}

    def test_source_dedup_deterministic(self, spark, target):
        # reference picks an arbitrary row per PK (GROUP BY s_pk,
        # PGHelperFunction.py:56); we define highest-val wins
        source = _df(spark, [(2, "x", 5.0), (2, "y", 7.0)])
        out = merge_upsert(target, source, ["k"], dedup_order=[F.col("val").desc()])
        assert {r["k"]: r["grp"] for r in out.collect()}[2] == "y"

    def test_idempotent(self, spark, target):
        source = _df(spark, [(1, "A", 10.0), (5, "e", 5.0)])
        once = merge_upsert(target, source, ["k"])
        twice = merge_upsert(once, source, ["k"])
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    def test_row_count(self, spark, target):
        source = _df(spark, [(1, "A", 10.0), (5, "e", 5.0), (6, "f", 6.0)])
        assert merge_upsert(target, source, ["k"]).count() == 5

    def test_schema_mismatch_raises(self, spark, target):
        with pytest.raises(ValueError, match="schema mismatch"):
            merge_upsert(target, target.drop("val"), ["k"])

    def test_empty_source_is_noop(self, spark, target):
        empty = target.limit(0)
        out = merge_upsert(target, empty, ["k"])
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, target.collect()))


class TestGeneratedSql:
    """SQL-text parity with the reference's generated statement
    (PGHelperFunction.py:44-67, 74)."""

    def test_merge_statement_shape(self):
        sql = generate_merge_sql("tgt", "stage", ["id", "ts"], ["a", "b"])
        assert "WITH updates AS (" in sql
        assert "UPDATE tgt t SET a = s.a, b = s.b" in sql
        assert "WHERE t.id = s.id AND t.ts = s.ts" in sql
        assert "RETURNING s.id, s.ts" in sql
        assert "LEFT JOIN updates u USING (id, ts)" in sql
        assert "WHERE u.id IS NULL" in sql

    def test_staging_ddl(self):
        assert (
            generate_staging_ddl("tgt", "stage")
            == "CREATE TEMP TABLE stage (LIKE tgt INCLUDING ALL) ON COMMIT DROP"
        )


class TestApplyCdc:
    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "pk bigint, v string, x double"
        )

    def test_iud_classes(self, spark):
        from azure_data_engineering_spark.operators.upsert import apply_cdc

        changes = spark.createDataFrame(
            [(2, "b2", 21.0, "U"), (3, "c", 30.0, "D"), (4, "d", 40.0, "I")],
            "pk bigint, v string, x double, op string",
        )
        out = {r["pk"]: (r["v"], r["x"]) for r in apply_cdc(self._base(spark), changes, ["pk"]).collect()}
        assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}

    def test_latest_wins_then_delete_compacts(self, spark):
        import pyspark.sql.functions as F

        from azure_data_engineering_spark.operators.upsert import apply_cdc

        # same key updated then deleted within one batch: delete wins
        changes = spark.createDataFrame(
            [(2, "b2", 21.0, "U", 1), (2, "b3", 22.0, "D", 2), (5, "e", 50.0, "I", 1)],
            "pk bigint, v string, x double, op string, seq bigint",
        )
        out = apply_cdc(
            self._base(spark), changes.select("pk", "v", "x", "op"), ["pk"],
            dedup_order=[F.col("v").desc()],  # b3 (the delete) wins
        )
        pks = sorted(r["pk"] for r in out.collect())
        assert pks == [1, 3, 5]

    def test_bad_op_raises(self, spark):
        import pytest

        from azure_data_engineering_spark.operators.upsert import apply_cdc

        changes = spark.createDataFrame([(2, "b", 1.0, "X")], "pk bigint, v string, x double, op string")
        with pytest.raises(Exception):
            apply_cdc(self._base(spark), changes, ["pk"]).collect()
