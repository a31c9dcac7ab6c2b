"""LIVE JDBC path against embedded Derby (bundled on Spark's
classpath) — the real-server counterpart of test_jdbc_exec.py's mocked
gateway. Proves the reference's full DB loop end-to-end: CREATE with a
real PRIMARY KEY, distributed append (reference: COPY,
adffunction/__init__.py:166-168), live PK/column introspection
(reference: information_schema, PGHelperFunction.py:12-34), staged
ANSI-MERGE upsert (PGHelperFunction.py:44-77), and read-back through
spark.read.jdbc."""

from __future__ import annotations

import pytest

from azure_data_engineering_spark.sources import jdbc as J

URL = "jdbc:derby:memory:livetests;create=true"
PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def _fresh_table(spark, name, ddl_cols):
    J.drop_table_if_exists(URL, name, PROPS, spark)
    J._execute_statement(URL, f"CREATE TABLE {name} ({ddl_cols})", PROPS, spark)


class TestLiveIntrospection:
    def test_single_pk(self, spark):
        _fresh_table(
            spark, "t_one", '"id" BIGINT NOT NULL, "v" DOUBLE, PRIMARY KEY ("id")'
        )
        assert J.introspect_pk_live(URL, "t_one", PROPS, spark) == ["id"]
        assert J.introspect_columns_live(URL, "t_one", PROPS, spark) == ["id", "v"]

    def test_composite_pk_preserves_key_order(self, spark):
        """KEY_SEQ ordering, not column ordinal ordering: the PK is
        declared (b, a) while the columns are laid out (a, b)."""
        _fresh_table(
            spark,
            "t_two",
            '"a" BIGINT NOT NULL, "b" BIGINT NOT NULL, "v" VARCHAR(10), PRIMARY KEY ("b", "a")',
        )
        assert J.introspect_pk_live(URL, "t_two", PROPS, spark) == ["b", "a"]

    def test_no_pk_returns_empty(self, spark):
        _fresh_table(spark, "t_nopk", '"x" BIGINT')
        assert J.introspect_pk_live(URL, "t_nopk", PROPS, spark) == []

    def test_setters_are_columns_minus_pk(self, spark):
        """The live equivalent of SETTER_INTROSPECTION_SQL: non-PK
        columns in ordinal order — the UPDATE SET list."""
        _fresh_table(
            spark,
            "t_set",
            '"k" BIGINT NOT NULL, "c1" DOUBLE, "c2" VARCHAR(8), PRIMARY KEY ("k")',
        )
        pk = J.introspect_pk_live(URL, "t_set", PROPS, spark)
        cols = J.introspect_columns_live(URL, "t_set", PROPS, spark)
        assert [c for c in cols if c not in pk] == ["c1", "c2"]


class TestLiveAppendUpsert:
    def test_append_then_readback(self, spark):
        _fresh_table(
            spark, "t_app", '"id" BIGINT NOT NULL, "v" DOUBLE, PRIMARY KEY ("id")'
        )
        df = spark.createDataFrame([(1, 1.5), (2, 2.5), (3, 3.5)], "id long, v double")
        J.jdbc_append(df, URL, "t_app", PROPS)
        back = spark.read.jdbc(URL, "t_app", properties=PROPS)
        assert sorted((r.id, r.v) for r in back.collect()) == [(1, 1.5), (2, 2.5), (3, 3.5)]

    def test_upsert_updates_matched_inserts_new(self, spark):
        _fresh_table(
            spark,
            "t_up",
            '"id" BIGINT NOT NULL, "name" VARCHAR(32), "bal" DOUBLE, PRIMARY KEY ("id")',
        )
        base = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, bal double"
        )
        J.jdbc_append(base, URL, "t_up", PROPS)
        delta = spark.createDataFrame(
            [(2, "B", 20.0), (3, "c", 3.0)], "id long, name string, bal double"
        )
        merge_sql = J.jdbc_upsert(spark, delta, URL, "t_up", ["id"], PROPS, dialect="ansi")
        assert merge_sql.startswith("MERGE INTO t_up")
        back = spark.read.jdbc(URL, "t_up", properties=PROPS)
        assert sorted((r.id, r.name, r.bal) for r in back.collect()) == [
            (1, "a", 1.0),
            (2, "B", 20.0),
            (3, "c", 3.0),
        ]
        # staging table dropped after the merge
        with pytest.raises(Exception):
            spark.read.jdbc(URL, "t_up__stage", properties=PROPS).collect()

    def test_upsert_dedupes_source_on_pk(self, spark):
        """ANSI MERGE errors when one target row matches two source
        rows; the upsert dedupes deterministically (keep-first by full
        row order) before staging, mirroring the reference's
        DISTINCT ON (PGHelperFunction.py:58)."""
        _fresh_table(
            spark, "t_dup", '"id" BIGINT NOT NULL, "v" VARCHAR(8), PRIMARY KEY ("id")'
        )
        J.jdbc_append(
            spark.createDataFrame([(1, "old")], "id long, v string"), URL, "t_dup", PROPS
        )
        delta = spark.createDataFrame(
            [(1, "zzz"), (1, "aaa"), (2, "new")], "id long, v string"
        )
        J.jdbc_upsert(spark, delta, URL, "t_dup", ["id"], PROPS, dialect="ansi")
        back = spark.read.jdbc(URL, "t_dup", properties=PROPS)
        assert sorted((r.id, r.v) for r in back.collect()) == [(1, "aaa"), (2, "new")]

    def test_upsert_with_introspected_pk(self, spark):
        """End-to-end as a caller would run it: the PK comes from the
        live server, not the caller's knowledge of the schema."""
        _fresh_table(
            spark, "t_auto", '"id" BIGINT NOT NULL, "v" DOUBLE, PRIMARY KEY ("id")'
        )
        J.jdbc_append(
            spark.createDataFrame([(7, 0.5)], "id long, v double"), URL, "t_auto", PROPS
        )
        pk = J.introspect_pk_live(URL, "t_auto", PROPS, spark)
        J.jdbc_upsert(
            spark,
            spark.createDataFrame([(7, 7.5), (8, 8.5)], "id long, v double"),
            URL,
            "t_auto",
            pk,
            PROPS,
            dialect="ansi",
        )
        back = spark.read.jdbc(URL, "t_auto", properties=PROPS)
        assert sorted((r.id, r.v) for r in back.collect()) == [(7, 7.5), (8, 8.5)]


class TestFailureCleanup:
    def test_staging_dropped_when_merge_fails(self, spark):
        """A failed server-side MERGE (CHECK-constraint violation) must
        not leak the staging table or mutate the target — the finally
        clause drops staging whatever the statement outcome."""
        J.drop_table_if_exists(URL, "t_chk", PROPS, spark)
        J._execute_statement(
            URL,
            'CREATE TABLE t_chk ("id" BIGINT NOT NULL, "v" BIGINT CHECK ("v" >= 0), '
            'PRIMARY KEY ("id"))',
            PROPS,
            spark,
        )
        J.jdbc_append(
            spark.createDataFrame([(1, 5)], "id long, v long"), URL, "t_chk", PROPS
        )
        bad = spark.createDataFrame([(1, -7)], "id long, v long")
        with pytest.raises(Exception):
            J.jdbc_upsert(spark, bad, URL, "t_chk", ["id"], PROPS, dialect="ansi")
        # staging gone
        with pytest.raises(Exception):
            spark.read.jdbc(URL, "t_chk__stage", properties=PROPS).collect()
        # target untouched
        back = spark.read.jdbc(URL, "t_chk", properties=PROPS)
        assert [(r.id, r.v) for r in back.collect()] == [(1, 5)]
