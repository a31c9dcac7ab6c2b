"""Stream-stream joins with event-time interval conditions.

Structured Streaming buffers both sides in the state store and needs
(a) watermarks on both streams and (b) a time-range join condition so
it can age buffered rows out — without them state grows unboundedly
at 100 TB/day stream rates. Same declarative transform works on batch
frames (the oracle/equivalence path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing `keys` where right_ts ∈ [left_ts,
    left_ts + max_delay]. Column names must already be disjoint except
    for the keys (alias upstream). On streaming inputs both sides get
    the watermark; the range condition lets Spark bound join state."""
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    # rename the right-side keys BEFORE the join: on outer joins the
    # surviving key must be the left one (the right key is NULL for
    # unmatched rows), and when both streams derive from the same
    # source, post-join drop(r[k]) is ambiguous (self-join lineage)
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in keys:
        c = l[k] == F.col(f"__r_{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(right_ts) >= l[left_ts])
        & (F.col(right_ts) <= l[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = l.join(r, cond, how)
    if how in ("fullOuter", "full_outer", "full", "outer"):
        # unmatched RIGHT rows carry a NULL left key — surface the
        # surviving key as coalesce(left, right) so both null-extended
        # populations keep their join key
        for k in keys:
            joined = joined.withColumn(k, F.coalesce(l[k], F.col(f"__r_{k}")))
    return joined.drop(*[f"__r_{k}" for k in keys])
