"""JDBC source/sink with PK-introspected upsert.

Mirrors the reference's Postgres surface:
- append = COPY (adffunction/__init__.py:166-168)      -> df.write.jdbc(mode='append')
- upsert = staged MERGE (SharedCode/PGHelperFunction.py:44-77)
- PK/setter introspection from information_schema
  (PGHelperFunction.py:12-34)

Spark's JDBC writer has no upsert mode, so upsert is implemented the
way the reference does it — stage, then one set-based server-side
statement — but distributed: every partition appends into a staging
table concurrently, then ONE merge statement flips it in
(SURVEY.md §4). Server-side statements execute through py4j's
`java.sql.DriverManager` on the driver JVM (`_execute_statement`);
with no server/driver reachable (this environment) that raises a
RuntimeError naming the cause, while SQL generation stays pure and
fully tested. `tests/test_jdbc_exec.py` proves the end-to-end
statement ordering (staging DDL -> distributed append -> MERGE ->
DROP) against a mocked gateway.

Two introspection fixes over the reference (documented divergences,
SURVEY.md §2A quirks):
- the reference joins key_column_usage on column_name alone, wrongly
  excluding columns that are keys in *other* tables
  (PGHelperFunction.py:28-29) — fixed by qualifying the table;
- key_column_usage also lists UNIQUE and FOREIGN KEY constraint
  columns, so anti-joining it directly drops non-PK columns under a
  unique/FK constraint from the UPDATE SET list (their matched rows
  would silently keep stale values) — fixed by restricting the
  anti-join to constraint_type = 'PRIMARY KEY' via table_constraints,
  exactly as PK_INTROSPECTION_SQL already does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

PK_INTROSPECTION_SQL = """
SELECT string_agg(kcu.column_name, ',' ORDER BY kcu.ordinal_position) AS pk_columns
FROM information_schema.table_constraints tc
JOIN information_schema.key_column_usage kcu
  ON kcu.constraint_name = tc.constraint_name
 AND kcu.table_name = tc.table_name
WHERE tc.constraint_type = 'PRIMARY KEY' AND tc.table_name = '{table}'
GROUP BY tc.constraint_name
""".strip()

SETTER_INTROSPECTION_SQL = """
SELECT c.column_name
FROM information_schema.columns c
LEFT JOIN (
  SELECT kcu.table_name, kcu.column_name
  FROM information_schema.key_column_usage kcu
  JOIN information_schema.table_constraints tc
    ON tc.constraint_name = kcu.constraint_name
   AND tc.table_name = kcu.table_name
  WHERE tc.constraint_type = 'PRIMARY KEY'
) p ON p.column_name = c.column_name AND p.table_name = c.table_name
WHERE c.table_name = '{table}' AND p.column_name IS NULL
ORDER BY c.ordinal_position
""".strip()


def generate_merge_sql(table: str, staging: str, pk: Sequence[str], setters: Sequence[str]) -> str:
    """One set-based statement with the reference's MERGE semantics
    (PGHelperFunction.py:44-67): CTE UPDATE matched rows RETURNING pk,
    then INSERT source rows not returned, source deduped on pk."""
    pk_eq = " AND ".join(f"t.{c} = s.{c}" for c in pk)
    set_clause = ", ".join(f"{c} = s.{c}" for c in setters)
    pk_cols = ", ".join(pk)
    return (
        f"WITH updates AS (\n"
        f"  UPDATE {table} t SET {set_clause}\n"
        f"  FROM {staging} s WHERE {pk_eq}\n"
        f"  RETURNING {', '.join('s.' + c for c in pk)}\n"
        f")\n"
        f"INSERT INTO {table}\n"
        f"SELECT DISTINCT ON ({', '.join('s.' + c for c in pk)}) s.*\n"
        f"FROM {staging} s\n"
        f"LEFT JOIN updates u USING ({pk_cols})\n"
        f"WHERE u.{pk[0]} IS NULL"
    )


def generate_staging_ddl(table: str, staging: str, temp: bool = True) -> str:
    """Staging table like the target (PGHelperFunction.py:74). The
    reference stages in a TEMP table ON COMMIT DROP — valid for its
    single-connection COPY, but a distributed append opens one
    connection per partition and temp tables are per-session, so the
    distributed path uses a real table (temp=False) dropped after the
    merge."""
    if temp:
        return f"CREATE TEMP TABLE {staging} (LIKE {table} INCLUDING ALL) ON COMMIT DROP"
    return f"CREATE TABLE IF NOT EXISTS {staging} (LIKE {table} INCLUDING ALL)"


def jdbc_append(df: DataFrame, url: str, table: str, properties: dict[str, str]) -> None:
    """Distributed append — each partition opens its own connection
    (reference: single-threaded COPY per file, __init__.py:150-178)."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties)


def jdbc_upsert(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    pk: Sequence[str],
    properties: dict[str, str],
    staging: str | None = None,
) -> str:
    """Distributed staged upsert, end-to-end: create the staging table,
    append df into it distributed, execute ONE merge statement
    server-side, drop the staging table. Returns the merge SQL (for
    logging/tests). Raises RuntimeError if no JDBC server is reachable
    (nothing is half-applied in that case: the connection attempt for
    the staging DDL is the first server contact)."""
    staging = staging or f"{table}__stage"
    setters = [c for c in df.columns if c not in set(pk)]
    merge_sql = generate_merge_sql(table, staging, pk, setters)
    # Stage distributed, merge once — the scalable version of
    # PGHelperFunction.py:74-77's single-connection COPY+merge.
    _execute_statement(url, generate_staging_ddl(table, staging, temp=False), properties, spark)
    try:
        df.write.jdbc(url=url, table=staging, mode="append", properties=properties)
        _execute_statement(url, merge_sql, properties, spark)
    finally:
        _execute_statement(url, f"DROP TABLE IF EXISTS {staging}", properties, spark)
    return merge_sql


def _get_connection(url: str, properties: dict[str, str], spark: SparkSession | None):
    """Open a java.sql.Connection on the driver JVM via py4j.

    Raises RuntimeError (with the underlying cause) when no JVM driver
    class or server is reachable — the only circumstance in which the
    execution path is unavailable."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession — a JVM is required for JDBC execution")
    jvm = spark.sparkContext._jvm
    try:
        driver = properties.get("driver")
        if driver:
            # register the driver class with DriverManager (same effect
            # as Spark's own JDBCOptions driverClass load)
            jvm.java.lang.Class.forName(driver)
        props = jvm.java.util.Properties()
        for k, v in properties.items():
            props.setProperty(k, str(v))
        return jvm.java.sql.DriverManager.getConnection(url, props)
    except Exception as exc:
        raise RuntimeError(
            f"JDBC connection to {url!r} failed (driver missing or server unreachable): {exc}"
        ) from exc


def _execute_statement(
    url: str, sql: str, properties: dict[str, str], spark: SparkSession | None = None
) -> None:
    """Execute one server-side statement via java.sql.DriverManager
    (py4j) — the reference's cur.execute of generated SQL
    (PGHelperFunction.py:74-77, adffunction/__init__.py:166-172)."""
    conn = _get_connection(url, properties, spark)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()
