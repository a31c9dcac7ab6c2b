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
with no server/driver reachable that raises a RuntimeError naming the
cause. `tests/test_jdbc_exec.py` proves the end-to-end statement
ordering (staging DDL -> distributed append -> MERGE -> DROP) against
a mocked gateway, and `tests/test_jdbc_live.py` + the
`q_jdbc_roundtrip` oracle entry prove the whole loop LIVE against
embedded Derby (bundled on Spark's classpath): two dialects are
generated — 'postgres' (the reference's CTE upsert + LIKE staging)
and 'ansi' (standard MERGE + CTAS staging; Derby >=10.11, SQL Server,
Oracle, Postgres 15+). Live PK/setter introspection goes through
java.sql.DatabaseMetaData (engine-portable), with the
information_schema SQL kept for Postgres parity.

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


def quote_ident(name: str) -> str:
    """Double-quote an identifier (ANSI). Needed because Spark's JDBC
    writer creates columns with quoted (exact-case) names, so generated
    server-side SQL must quote them too or the server would fold the
    unquoted reference to upper/lower case and miss the column."""
    return '"' + name.replace('"', '""') + '"'


def generate_merge_sql_ansi(
    table: str, staging: str, pk: Sequence[str], setters: Sequence[str]
) -> str:
    """ANSI MERGE equivalent of generate_merge_sql — runs on Derby
    (>=10.11), SQL Server, Oracle, and Postgres 15+. Same semantics as
    the reference's CTE upsert (PGHelperFunction.py:44-67): matched
    target rows take the staged values, unmatched staged rows insert.
    The source must be pk-unique (ANSI MERGE errors on a target row
    matched twice); jdbc_upsert dedupes the staged frame first."""
    q = quote_ident
    on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in pk)
    set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in setters)
    all_cols = list(pk) + list(setters)
    insert_cols = ", ".join(q(c) for c in all_cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in all_cols)
    sql = f"MERGE INTO {table} t USING {staging} s ON ({on})\n"
    if set_clause:
        sql += f"WHEN MATCHED THEN UPDATE SET {set_clause}\n"
    sql += f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    return sql


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


def generate_staging_ddl_ansi(table: str, staging: str) -> str:
    """ANSI/Derby staging DDL — Derby has no `(LIKE t)` clause; CTAS
    `WITH NO DATA` copies the column list and types exactly (including
    Spark-created quoted column names)."""
    return f"CREATE TABLE {staging} AS SELECT * FROM {table} WITH NO DATA"


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
    dialect: str = "postgres",
) -> str:
    """Distributed staged upsert, end-to-end: create the staging table,
    append df into it distributed, execute ONE merge statement
    server-side, drop the staging table. Returns the merge SQL (for
    logging/tests). Raises RuntimeError if no JDBC server is reachable
    (nothing is half-applied in that case: the connection attempt for
    the staging DDL is the first server contact).

    dialect='postgres' (default) uses the reference's CTE upsert and
    LIKE-clause staging; dialect='ansi' uses standard MERGE + CTAS
    staging and runs live against Derby/SQL Server/Oracle/Postgres 15+.
    The ANSI path dedupes the staged frame on pk first (deterministic
    keep-first, mirroring the reference's DISTINCT ON) because ANSI
    MERGE errors when one target row matches two source rows."""
    staging = staging or f"{table}__stage"
    setters = [c for c in df.columns if c not in set(pk)]
    if dialect == "ansi":
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        merge_sql = generate_merge_sql_ansi(table, staging, pk, setters)
        w = Window.partitionBy(*pk).orderBy(*[F.col(c) for c in df.columns])
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        staging_ddl = generate_staging_ddl_ansi(table, staging)
    else:
        merge_sql = generate_merge_sql(table, staging, pk, setters)
        staging_ddl = generate_staging_ddl(table, staging, temp=False)
    # Stage distributed, merge once — the scalable version of
    # PGHelperFunction.py:74-77's single-connection COPY+merge.
    if dialect == "ansi":
        drop_table_if_exists(url, staging, properties, spark)
    _execute_statement(url, staging_ddl, properties, spark)
    try:
        df.write.jdbc(url=url, table=staging, mode="append", properties=properties)
        _execute_statement(url, merge_sql, properties, spark)
    finally:
        if dialect == "ansi":
            drop_table_if_exists(url, staging, properties, spark)
        else:
            _execute_statement(url, f"DROP TABLE IF EXISTS {staging}", properties, spark)
    return merge_sql


def drop_table_if_exists(
    url: str, table: str, properties: dict[str, str], spark: SparkSession | None = None
) -> None:
    """Portable `DROP TABLE IF EXISTS` — Derby lacks the IF EXISTS
    clause, so issue a plain DROP and swallow only the
    object-does-not-exist SQLSTATE (42Y55 Derby, 42P01 Postgres)."""
    try:
        _execute_statement(url, f"DROP TABLE {table}", properties, spark)
    except Exception as exc:  # py4j surfaces server errors as Py4JJavaError
        msg = str(exc)
        if "42Y55" in msg or "42P01" in msg or "does not exist" in msg:
            return
        raise


def introspect_pk_live(
    url: str, table: str, properties: dict[str, str], spark: SparkSession | None = None
) -> list[str]:
    """Primary-key column names in ordinal order from the live server
    via java.sql.DatabaseMetaData.getPrimaryKeys — the engine-portable
    equivalent of PK_INTROSPECTION_SQL (the reference's
    information_schema query, PGHelperFunction.py:12-22). Falls back to
    the server's case-folded name (Derby/Oracle store unquoted
    identifiers uppercase) when the exact name has no PK rows."""
    conn = _get_connection(url, properties, spark)
    try:
        meta = conn.getMetaData()
        for candidate in (table, table.upper(), table.lower()):
            rs = meta.getPrimaryKeys(None, None, candidate)
            cols: list[tuple[int, str]] = []
            while rs.next():
                cols.append((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
            rs.close()
            if cols:
                return [c for _, c in sorted(cols)]
        return []
    finally:
        conn.close()


def introspect_columns_live(
    url: str, table: str, properties: dict[str, str], spark: SparkSession | None = None
) -> list[str]:
    """All column names in ordinal order via DatabaseMetaData.getColumns
    — with introspect_pk_live this reproduces SETTER_INTROSPECTION_SQL
    (non-PK update-set list, PGHelperFunction.py:24-34) against any
    live JDBC server."""
    conn = _get_connection(url, properties, spark)
    try:
        meta = conn.getMetaData()
        for candidate in (table, table.upper(), table.lower()):
            rs = meta.getColumns(None, None, candidate, None)
            cols: list[tuple[int, str]] = []
            while rs.next():
                cols.append((rs.getInt("ORDINAL_POSITION"), rs.getString("COLUMN_NAME")))
            rs.close()
            if cols:
                return [c for _, c in sorted(cols)]
        return []
    finally:
        conn.close()


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
