"""Statistical screens over numeric / categorical columns.

Robust outlier flagging and categorical-association scoring — the two
workhorses of automated data-quality monitoring (anomalous metric
values; drifted / entangled categorical fields) and of feature triage
in curation pipelines.

Both operators are pure aggregation pipelines: a grouped
percentile/count pass, a broadcast join of the (tiny) per-group
statistics back onto the rows, and codegen arithmetic — no Python,
no window over the fat table, one shuffle per aggregation. At 100 TB
the per-group stat frames are KB-sized regardless of row count, so
the join back is always a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Flag rows whose value is a robust outlier within its group,
    by modified z-score (Iglewicz & Hoaglin 1993):

        M_i = 0.6745 * (x_i - median) / MAD,  outlier iff |M_i| > 3.5

    where MAD = median(|x - median|). Median/MAD resist the very
    outliers being hunted (mean/stddev get dragged by them — a single
    10^9 spike inflates sigma until nothing else looks anomalous).

    Two exact-percentile aggregations per group (Spark computes exact
    median via a single-pass sort-based percentile within each hash
    aggregate), then a broadcast join of the per-group (median, mad)
    frame. A zero MAD (>=50% of the group identical) yields NULL
    scores and FALSE flags rather than dividing by zero.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("grp_median")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("grp_median"))
    )
    mad = dev.groupBy(group_col, "grp_median").agg(
        F.expr("percentile(_absdev, 0.5)").alias("grp_mad")
    )
    scored = df.join(F.broadcast(mad), group_col).withColumn(
        "mod_z",
        F.when(
            F.col("grp_mad") > 0,
            0.6745 * (F.col(value_col) - F.col("grp_median")) / F.col("grp_mad"),
        ),
    )
    return scored.withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("mod_z")) > threshold, F.lit(False))
    )


def chi_squared(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categorical columns, plus Cramer's V effect size.

    Returns a 1-row frame (chi2, dof, cramers_v, n). The contingency
    table is one groupBy over (a, b); marginals are re-aggregated from
    it (never from the raw rows), so the full pass over the data
    happens exactly once and everything downstream operates on
    |domain_a| x |domain_b| rows — broadcast-sized for any sane
    categorical pair.
    """
    cont = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    row_m = cont.groupBy("a").agg(F.sum("obs").alias("row_n"))
    col_m = cont.groupBy("b").agg(F.sum("obs").alias("col_n"))
    tot = cont.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("a").cast("double").alias("ka"),
        F.countDistinct("b").cast("double").alias("kb"),
    )
    # expected counts from marginals; cells absent from the observed
    # table contribute E (since (O-E)^2/E = E when O=0) — realized by
    # the full marginal cross of present categories
    cells = (
        row_m.crossJoin(col_m)
        .join(cont, ["a", "b"], "left")
        .join(F.broadcast(tot))
        .withColumn("exp", F.col("row_n") * F.col("col_n") / F.col("n"))
        .withColumn(
            "cell",
            F.pow(F.coalesce(F.col("obs"), F.lit(0.0)) - F.col("exp"), 2)
            / F.col("exp"),
        )
    )
    return cells.groupBy("n", "ka", "kb").agg(F.sum("cell").alias("chi2")).select(
        F.col("chi2"),
        ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
        F.sqrt(
            F.col("chi2") / (F.col("n") * F.least(F.col("ka") - 1, F.col("kb") - 1))
        ).alias("cramers_v"),
        F.col("n").cast("long").alias("n"),
    )
