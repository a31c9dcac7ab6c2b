"""Bucketed tables: co-located (shuffle-free) joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle. If
both tables are written bucketed (and optionally sorted) on the join
key with the same bucket count, Spark's scan reports a compatible
HashPartitioning and the SortMergeJoin runs with NO Exchange on
either side — the join is pre-sharded at rest. This is the at-rest
analog of the reference's PK-staged upsert (stage once, then one
set-based operation — PGHelperFunction.py:74-77).

tests/test_bucketing.py asserts the no-Exchange property from the
physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist df as a bucketed (+sorted) managed parquet table.
    Bucket count should be sized so bucket_size ≈ 128-512 MB at the
    target scale; both sides of a co-located join must use the SAME
    count and columns."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # idempotent re-create: with the default in-memory catalog the
    # table registration dies with the session but its warehouse
    # directory survives -> LOCATION_ALREADY_EXISTS on the next run
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    writer = df.write.format("parquet").mode("overwrite").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket columns — planned
    with zero Exchange when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
