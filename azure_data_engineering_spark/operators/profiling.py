"""One-pass column profiling.

The first question against any new 100 TB table is "what's in it" —
null fractions, cardinalities, ranges. The naive profiler runs one
job per column; this one folds every column's statistics into a
SINGLE aggregate scan (count/count_distinct/min/max/null-count per
column are all mergeable, so Spark computes them map-side in one
pass), then unpivots the one wide row into the (column, stat...)
shape people read. Unpivoting one row is free; the table is scanned
exactly once regardless of column count.

Values are surfaced as strings so heterogeneous column types fit one
report schema; numeric min/max format through ``CAST AS STRING`` on
both engines (test data is ASCII, where Spark and DuckDB byte
ordering agree for the string min/max of string columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Profile ``cols`` (default: all) in one scan. Returns one row per
    column: (column, n_rows, n_null, n_distinct, min_value, max_value)
    with values stringified.

    ``approx=True`` swaps exact distinct counts for HyperLogLog
    (``approx_count_distinct``, ±5% default rsd) — the right default at
    real scale, where one exact count-distinct per column multiplies
    the shuffle; the sketch keeps the whole profile a single cheap
    pass. Exact remains the default here because the gate query hashes
    against a DuckDB oracle."""
    cols = cols or df.columns
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
