"""JDBC source/sink with PK-introspected upsert.

Mirrors the reference's Postgres surface:
- append = COPY (adffunction/__init__.py:166-168)      -> df.write.jdbc(mode='append')
- upsert = staged MERGE (SharedCode/PGHelperFunction.py:44-77)
- PK/setter introspection from information_schema
  (PGHelperFunction.py:12-34)

Spark's JDBC writer has no upsert mode, so upsert is implemented the
way the reference does it — stage, then one set-based server-side
statement — but distributed: every partition COPYs into a staging
table concurrently, then ONE merge statement flips it in
(SURVEY.md §4). No JDBC server exists in this environment, so
execution paths raise unless a driver URL is supplied; SQL generation
is pure and fully tested.

Note: the reference's setter introspection joins key_column_usage on
column_name alone, wrongly excluding columns that are keys in *other*
tables (PGHelperFunction.py:28-29) — fixed here by qualifying the
table (documented divergence, SURVEY.md §2A quirks).
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
LEFT JOIN information_schema.key_column_usage k
  ON k.column_name = c.column_name AND k.table_name = c.table_name
WHERE c.table_name = '{table}' AND k.constraint_name IS NULL
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


def generate_staging_ddl(table: str, staging: str) -> str:
    """Staging table like the target (PGHelperFunction.py:74)."""
    return f"CREATE TEMP TABLE {staging} (LIKE {table} INCLUDING ALL) ON COMMIT DROP"


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
    """Distributed staged upsert: append df into a staging table, then
    execute ONE merge statement server-side. Returns the merge SQL (for
    logging/tests). Raises if no JDBC server is reachable."""
    staging = staging or f"{table}__stage"
    setters = [c for c in df.columns if c not in set(pk)]
    merge_sql = generate_merge_sql(table, staging, pk, setters)
    # Stage distributed, merge once — the scalable version of
    # PGHelperFunction.py:74-77's single-connection COPY+merge.
    df.write.jdbc(url=url, table=staging, mode="append", properties=properties)
    _execute_statement(url, merge_sql, properties)
    return merge_sql


def _execute_statement(url: str, sql: str, properties: dict[str, str]) -> None:
    raise NotImplementedError(
        "no JDBC server in this environment; executing server-side statements "
        "requires a live connection (py4j DriverManager). SQL generation above "
        "is the tested surface."
    )
