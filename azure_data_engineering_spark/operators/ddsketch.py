"""DDSketch — mergeable quantile sketch with a RELATIVE-error
guarantee (Masson, Rim & Lee, VLDB 2019).

approx_percentile (Greenwald-Khanna) bounds RANK error: at the p99 of
a heavy-tailed latency column a rank-error bound can still be off by
orders of magnitude in VALUE. DDSketch instead buckets values on a
log-γ grid, so every returned quantile is within α·true_value of the
truth — the guarantee SLOs are actually written against — and the
sketch is a plain (bucket, count) frame: merging shards/days/tenants
is a groupBy-sum, the property that makes it the standard pre-agg for
100 TB latency pipelines (one tiny bucket frame per partition unions
into the global sketch with no re-scan).

Design for the oracle gate: bucket index ``ceil(log_γ x)`` is computed
as ``ceil(round(ln x / ln γ, 9))`` — the 9 dp round before the integer
step is the module-standard defense against 1-ulp libm differences
between the JVM and the oracle engine; rank→bucket lookup walks the
cumulative-count frame (strictly increasing, so min() picks the unique
first crossing).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ddsketch_buckets(df: DataFrame, value_col: str, alpha: float = 0.01) -> DataFrame:
    """Collapse ``value_col`` (positives only — the standard DDSketch
    domain; zero/negative values belong in a mirrored sketch) to the
    (bucket, ct) frame for relative accuracy α. THIS frame is the
    sketch: mergeable by unionAll + groupBy-sum, size O(log(max/min)/α)
    regardless of corpus size."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lng = math.log(gamma)
    v = F.col(value_col).cast("double")
    return (
        df.filter(v > 0)
        .select(F.ceil(F.round(F.log(v) / F.lit(lng), 9)).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )


def ddsketch_quantiles(
    df: DataFrame,
    value_col: str,
    alpha: float = 0.01,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """Query quantiles from the sketch AND audit them against the
    exact order statistic in the same plan — the recall-gate
    discipline the repo's ANN operators use: the output carries the
    truth it claims to approximate.

    Rank convention: q → rank ⌈q·n⌉ (1-based, clamped to ≥1) over
    values ascending; the exact value at that rank comes from the
    distinct-value cumulative frame (no corpus sort), the sketch value
    from the first bucket whose cumulative count reaches the rank,
    estimated at the bucket's harmonic midpoint 2γ^b/(γ+1). Returns
    one row per q: (q, n, bucket, estimate, exact_value, rel_err,
    alpha) with rel_err = |estimate − exact|/exact ≤ α guaranteed."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lng = math.log(gamma)
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    pos = df.filter(v > 0).select(v.alias("x"))

    buckets = (
        pos.select(
            F.ceil(F.round(F.log(F.col("x")) / F.lit(lng), 9)).cast("long").alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    bcum = buckets.withColumn("cum", F.sum("ct").over(wb))

    vals = pos.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("ct"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vals.withColumn("cum", F.sum("ct").over(wv))

    total = pos.agg(F.count(F.lit(1)).cast("long").alias("n"))
    qf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    ranks = qf.crossJoin(F.broadcast(total)).select(
        "q",
        "n",
        F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n")).cast("long")).alias("r"),
    )
    # first crossing = min cum among cum >= r (cum strictly increases)
    pick_b = (
        ranks.join(F.broadcast(bcum), F.col("cum") >= F.col("r"))
        .groupBy("q", "n")
        .agg(F.min(F.struct("cum", "b")).alias("m"))
        .select("q", "n", F.col("m.b").alias("bucket"))
    )
    pick_v = (
        ranks.join(vcum, F.col("cum") >= F.col("r"))
        .groupBy("q")
        .agg(F.min(F.struct("cum", "x")).alias("m"))
        .select("q", F.col("m.x").alias("exact_value"))
    )
    est = F.round(
        F.exp(F.col("bucket").cast("double") * F.lit(lng)) * 2.0 / (gamma + 1.0),
        round_digits,
    )
    return (
        pick_b.join(pick_v, "q")
        .select(
            "q",
            "n",
            "bucket",
            est.alias("estimate"),
            F.round(F.col("exact_value"), round_digits).alias("exact_value"),
            F.round(
                F.abs(est - F.col("exact_value")) / F.col("exact_value"), round_digits
            ).alias("rel_err"),
            F.lit(float(alpha)).alias("alpha"),
        )
        .orderBy("q")
    )
