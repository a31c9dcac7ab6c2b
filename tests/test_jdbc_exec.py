"""JDBC execution path: statement ordering through a mocked py4j
gateway, real-DriverManager failure mode, and introspection SQL
behavior validated on a live information_schema (DuckDB).

The reference executes its generated SQL over a live Postgres
connection (adffunction/__init__.py:166-172, PGHelperFunction.py:74-77);
no server exists in this environment, so the gateway is mocked at the
connection seam while the same _execute_statement code runs."""

from __future__ import annotations

import duckdb
import pytest

from azure_data_engineering_spark.sources import jdbc as jdbc_mod
from azure_data_engineering_spark.sources.jdbc import (
    PK_INTROSPECTION_SQL,
    SETTER_INTROSPECTION_SQL,
    _execute_statement,
    jdbc_upsert,
)


class _FakeStatement:
    def __init__(self, log):
        self.log = log

    def execute(self, sql):
        self.log.append(("exec", sql))
        return True

    def close(self):
        pass


class _FakeConnection:
    def __init__(self, log):
        self.log = log
        self.closed = False

    def createStatement(self):
        return _FakeStatement(self.log)

    def close(self):
        self.closed = True


class TestUpsertStatementOrdering:
    def test_ddl_then_append_then_merge_then_drop(self, spark, monkeypatch):
        """The staged-upsert protocol must contact the server in the
        reference's order: create staging, distributed append into it,
        one server-side MERGE, drop staging."""
        log = []
        conns = []

        def fake_get_connection(url, properties, spark_):
            conn = _FakeConnection(log)
            conns.append(conn)
            return conn

        def fake_jdbc_write(self, url=None, table=None, mode=None, properties=None):
            log.append(("append", table, mode))

        monkeypatch.setattr(jdbc_mod, "_get_connection", fake_get_connection)
        from pyspark.sql.readwriter import DataFrameWriter

        monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc_write)

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, payload string")
        merge_sql = jdbc_upsert(
            spark, df, "jdbc:postgresql://db/x", "tgt", ["id"], {"driver": "org.postgresql.Driver"}
        )

        kinds = [e[0] for e in log]
        assert kinds == ["exec", "append", "exec", "exec"]
        assert log[0][1].startswith("CREATE TABLE IF NOT EXISTS tgt__stage")
        assert log[1][1:] == ("tgt__stage", "append")
        assert log[2][1] == merge_sql and "WITH updates AS (" in merge_sql
        assert log[3][1] == "DROP TABLE IF EXISTS tgt__stage"
        assert all(c.closed for c in conns)  # every connection released

    def test_staging_dropped_even_when_merge_fails(self, spark, monkeypatch):
        log = []

        def fake_get_connection(url, properties, spark_):
            return _FakeConnection(log)

        def fake_jdbc_write(self, url=None, table=None, mode=None, properties=None):
            raise RuntimeError("partition write failed")

        monkeypatch.setattr(jdbc_mod, "_get_connection", fake_get_connection)
        from pyspark.sql.readwriter import DataFrameWriter

        monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc_write)

        df = spark.createDataFrame([(1, "a")], "id int, payload string")
        with pytest.raises(RuntimeError, match="partition write failed"):
            jdbc_upsert(spark, df, "jdbc:postgresql://db/x", "tgt", ["id"], {})
        assert log[-1] == ("exec", "DROP TABLE IF EXISTS tgt__stage")


class TestRealDriverManagerPath:
    def test_unreachable_server_raises_runtime_error(self, spark):
        """The REAL py4j DriverManager path runs (no mocks); with no
        such driver registered it must raise RuntimeError naming the
        URL, not NotImplementedError — the path is real-when-configured."""
        with pytest.raises(RuntimeError, match="jdbc:nosuchdb"):
            _execute_statement("jdbc:nosuchdb://nowhere/x", "SELECT 1", {}, spark)


class TestIntrospectionSemantics:
    """Run the generated introspection SQL against a real
    information_schema (DuckDB) with PK + UNIQUE + cross-table-PK
    columns — the two reference bugs this module fixes."""

    def _con(self):
        con = duckdb.connect()
        con.execute("CREATE TABLE tgt (id INT PRIMARY KEY, u INT UNIQUE, payload TEXT)")
        # 'payload' is a PK elsewhere — the reference's unqualified join
        # would wrongly exclude it from tgt's setters
        con.execute("CREATE TABLE other (payload TEXT PRIMARY KEY)")
        return con

    def test_setters_exclude_only_primary_key(self):
        rows = self._con().execute(SETTER_INTROSPECTION_SQL.format(table="tgt")).fetchall()
        assert [r[0] for r in rows] == ["u", "payload"]  # UNIQUE col kept

    def test_pk_introspection(self):
        rows = self._con().execute(PK_INTROSPECTION_SQL.format(table="tgt")).fetchall()
        assert rows == [("id",)]
