"""Window/analytic operators over the events table.

Running aggregates, lag/lead, and gap-based sessionization — the batch
half of the streaming surface (streaming/windows.py implements the
same semantics incrementally with watermarks).

Scale: all of these shuffle exactly once on the partition key
(user_id); frames are computed within partitions. Skewed power-users
are handled by AQE; for extreme skew, sessionize can pre-split on
(user_id, day) then merge boundary sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_aggregates(
    df: DataFrame,
    partition_by: str,
    order_by: list[Column],
    value_col: str,
) -> DataFrame:
    """Running sum/avg + lag/lead over an ordered per-key frame."""
    w = Window.partitionBy(partition_by).orderBy(*order_by)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("running_sum", F.sum(value_col).over(frame))
        .withColumn("running_avg", F.avg(value_col).over(frame))
        .withColumn("prev_value", F.lag(value_col, 1).over(w))
        .withColumn("next_value", F.lead(value_col, 1).over(w))
        .withColumn("row_in_key", F.row_number().over(w))
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts
    when the time since the previous event for the same user exceeds
    the gap. Returns one row per session: (user, session_start,
    session_end, n_events, total_value-if-present).

    Batch equivalent of Structured Streaming's session_window
    (streaming/windows.py) — same session boundaries, INCLUDING the
    exact-boundary case: session_window assigns each event the interval
    [ts, ts+gap) and MERGES sessions whose intervals overlap OR touch
    (new start == current end), so an event arriving exactly `gap`
    after the previous one CONTINUES the session. Hence strictly `>`
    below — pinned empirically against the native operator in
    tests/test_streaming.py (exact-gap case).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double"), 1).over(w)
    marked = df.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("__session_id", F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    return marked.groupBy(user_col, "__session_id").agg(*aggs).drop("__session_id")
