"""2-D Pareto frontier (skyline query) without a global sort.

Skyline of (x minimize, y maximize): rows no other row strictly
dominates (x' <= x AND y' >= y with one inequality strict — the
classic BNL/SFS target, Börzsönyi et al., "The Skyline Operator",
ICDE 2001). The naive NOT EXISTS is a quadratic self-join and the
textbook sort-filter-skyline needs one global sort; both die at 100 TB.

Spark-first shape (same two-phase trick as sampling.global_sorted_index):
1. collapse to DISTINCT x with per-x max(y) — one shuffle, and the
   only stage that touches corpus-sized data;
2. band the distinct-x frame uniformly by x range (min/max from a
   1-row agg, broadcast); per-band running max of y in PARALLEL
   windows, plus an exclusive running max ACROSS bands computed on a
   `bands`-row frame (KB-scale single-task window, broadcast back);
3. a distinct-x row survives iff its max-y strictly exceeds every
   max-y at a cheaper x (greatest of in-band prefix + prior-band
   max); the surviving (x, y) pairs — at most one per distinct x —
   broadcast-join back to the corpus to emit every row that sits ON
   the frontier (ties on (x, y) all kept, matching NOT EXISTS
   semantics exactly).

Every corpus-sized stage is a hash shuffle or broadcast join; the only
serial window is `bands` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bands: int = 64,
) -> DataFrame:
    """All rows of df on the (minimize x_col, maximize y_col) Pareto
    frontier, exact NOT-EXISTS dominance semantics, no quadratic join
    and no corpus-sized global sort."""
    x, y = F.col(x_col), F.col(y_col)
    per_x = df.groupBy(x_col).agg(F.max(y_col).alias("__my"))

    rng = per_x.agg(
        F.min(x_col).alias("__xmin"), F.max(x_col).alias("__xmax")
    )
    banded = per_x.crossJoin(F.broadcast(rng)).withColumn(
        "__band",
        F.least(
            F.lit(bands - 1),
            F.floor(
                (x - F.col("__xmin"))
                / ((F.col("__xmax") - F.col("__xmin")) + F.lit(1e-12))
                * bands
            ).cast("int"),
        ),
    )
    band_prev = (
        banded.groupBy("__band")
        .agg(F.max("__my").alias("__bm"))
        .select(
            "__band",
            F.max("__bm")
            .over(
                Window.orderBy("__band").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("__prev_band_max"),
        )
    )
    # per_x carries ONE row per distinct x, so a ROWS frame ordered by
    # x is exactly "all strictly smaller x in this band"
    w_in = (
        Window.partitionBy("__band")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_x = (
        banded.join(F.broadcast(band_prev), "__band")
        .withColumn("__prev_in_band", F.max("__my").over(w_in))
        .withColumn(
            "__prevmax",
            F.greatest(
                F.coalesce(F.col("__prev_in_band"), F.lit(float("-inf"))),
                F.coalesce(F.col("__prev_band_max"), F.lit(float("-inf"))),
            ),
        )
        .filter(F.col("__my") > F.col("__prevmax"))
        .select(F.col(x_col).alias("__fx"), "__my")
    )
    return df.join(
        F.broadcast(frontier_x),
        (x == F.col("__fx")) & (y == F.col("__my")),
    ).select(*df.columns)
