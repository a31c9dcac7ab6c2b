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


def referential_integrity_profile(
    constraints,
    out_decimals: int = 6,
) -> "DataFrame":
    """Declarative referential-integrity report — the constraint-level
    twin of profile_table's column stats: every warehouse load needs
    "are the joins still sound?" answered as data, per constraint:

    - orphan_children / orphan_pct: child rows whose FK matches no
      parent key (left_anti — the broken joins)
    - null_fk: child rows with a NULL FK (excluded from orphan math;
      nullable FKs are a policy question, not a breakage)
    - childless_parents: parent keys no child references (left_anti
      the other way — usually fine, sometimes a load gap)
    - dup_parent_keys: parent keys appearing more than once (a PK
      violation that silently fans out every downstream join)

    ``constraints`` is a list of (name, child_df, fk_col, parent_df,
    pk_col). Each check is one anti-join or one groupBy — Catalyst
    picks broadcast for dimension-sized parents; nothing is collected
    except the per-constraint summary row. Returns one row per
    constraint: (constraint, n_child, null_fk, orphan_children,
    orphan_pct, n_parent, dup_parent_keys, childless_parents)."""
    from functools import reduce as _reduce

    rows = []
    for name, child, fk, parent, pk in constraints:
        c = child.select(F.col(fk).alias("fk"))
        p = parent.select(F.col(pk).alias("pk"))
        n_child = c.count()
        null_fk = c.filter(F.col("fk").isNull()).count()
        orphans = (
            c.filter(F.col("fk").isNotNull())
            .join(p, c["fk"] == p["pk"], "left_anti")
            .count()
        )
        n_parent = p.count()
        dup_parents = (
            p.groupBy("pk").count().filter(F.col("count") > 1).count()
        )
        childless = p.join(
            c.filter(F.col("fk").isNotNull()).distinct(),
            p["pk"] == c["fk"],
            "left_anti",
        ).count()
        denom = max(n_child - null_fk, 1)
        rows.append(
            (
                name,
                n_child,
                null_fk,
                orphans,
                round(orphans / denom, out_decimals),
                n_parent,
                dup_parents,
                childless,
            )
        )
    spark = constraints[0][1].sparkSession
    return spark.createDataFrame(
        rows,
        "constraint string, n_child long, null_fk long, orphan_children long, "
        "orphan_pct double, n_parent long, dup_parent_keys long, "
        "childless_parents long",
    ).orderBy("constraint")
