"""Pandas-UDF operator surface (SURVEY.md §2B "UDF surface").

The rule for this engine: built-ins first, Pandas UDFs only where the
semantics genuinely need Python (here: demonstrating the Arrow-batched
infrastructure the multimodal/text extensions plug into). Every entry
is Arrow-batched — never row-at-a-time Python UDFs (10-100x slower).

- scalar pandas_udf: vectorized column → column, executed per Arrow
  batch inside the stage (no shuffle).
- applyInPandas (grouped map): one pandas frame per group after a
  hash shuffle on the keys — the escape hatch for per-group logic the
  built-ins can't express. Groups must fit in executor memory; at
  100 TB that means high-cardinality keys only (user_id, doc_id), or
  pre-aggregation first.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def vectorized_token_count(col):
    """Scalar Pandas UDF: whitespace token count, vectorized over the
    Arrow batch (blank → 0, matching functions/text.py semantics).
    The udf is constructed lazily — the DDL type parse needs an active
    SparkSession, so module import must stay session-free."""

    @pandas_udf("long")
    def _count(text: pd.Series) -> pd.Series:
        stripped = text.fillna("").str.strip()
        return (
            stripped.str.split(r"\s+", regex=True).map(len).where(stripped != "", 0).astype("int64")
        )

    return _count(col)


def user_event_profile(events: DataFrame) -> DataFrame:
    """Grouped-map (applyInPandas): per-user event profile — count,
    value sum, mean inter-event gap in seconds. One group = one user's
    events as a pandas frame (shuffle on user_id)."""

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        # numpy kernels instead of pandas frame ops: sort_values /
        # .diff() / per-group DataFrame construction dominate when the
        # engine calls this once per (small) group — the work per call
        # is microseconds, the pandas scaffolding hundreds of them.
        # Arithmetic is unchanged: int64-ns sort, float-seconds gaps,
        # float64 sums, same rounding.
        import numpy as np

        ts = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        ts.sort()
        gaps = np.diff(ts) / 1e9
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [round(float(pdf["value"].to_numpy().sum()), 2)],
                "mean_gap_sec": [
                    round(float(gaps.mean()), 1) if len(gaps) else None
                ],
            }
        )

    # Explicit REPARTITION_BY_NUM on the group key: AQE coalesces the
    # pre-grouped-map shuffle by BYTES, and this frame is small enough
    # that every group lands in ONE post-shuffle partition — which
    # serializes all per-group Python calls into a single task
    # (measured 4.5 s -> 1.2 s at sf0.1). AQE is forbidden to coalesce
    # a user-specified numPartitions exchange, and groupBy reuses it,
    # so this stays one shuffle. Same reasoning as the r7
    # link_prediction wedge fix: partition count must track DOWNSTREAM
    # per-row cost (a Python call per group), which byte-based
    # coalescing cannot see — true at any scale.
    n = events.sparkSession.sparkContext.defaultParallelism
    return events.select("user_id", "ts", "value").repartition(
        n, "user_id"
    ).groupBy("user_id").applyInPandas(
        profile, schema="user_id bigint, n_events bigint, total_value double, mean_gap_sec double"
    )


def user_event_profile_builtin(events: DataFrame) -> DataFrame:
    """The built-in twin of user_event_profile: lag window + hash
    aggregate, whole-stage codegen end-to-end — identical output,
    roughly an order of magnitude cheaper (no Arrow transfer, no
    per-group pandas frame).

    Crossover rule: prefer THIS plan whenever the per-group logic is
    expressible with window functions + aggregates — i.e. any
    fold/scan over a sorted group. Reach for applyInPandas only when
    the group logic needs real Python (iterative model fitting,
    dynamic-programming passes, third-party libs); then keys must be
    high-cardinality so groups fit in executor memory."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = events.select("user_id", "ts", "value").withColumn(
        "gap",
        F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("gap"), 1).alias("mean_gap_sec"),
    )
