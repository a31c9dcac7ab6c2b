"""Ordered-funnel conversion and cohort retention — the two
product-analytics aggregates every event warehouse ships.

Scale discipline: both operators collapse the event stream to
USER-sized frames in their first aggregation and do all subsequent
work on those (a funnel of s steps is s groupBy passes + s-1
co-partitioned user-key joins; retention is two groupBys and one
cohort-sized join). Nothing is ever event²; no windows over the raw
stream; every join key is the user or the cohort period.

Reference scope: the reference's pipeline lands event exports into
Postgres for exactly this kind of report (SharedCode/
PGHelperFunction.py execution of arbitrary report SQL); here they are
engine-native operators with oracle twins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    out_decimals: int = 6,
) -> DataFrame:
    """Strictly-ordered funnel: a user completes step i at their
    EARLIEST event of type steps[i] that is strictly later than their
    step i-1 completion time (the classic product funnel — re-ordered
    arrivals do not count, equal timestamps do not chain). Returns one
    row per step: (step, event_type, n_users, pct_of_first,
    pct_of_previous), rates rounded and computed from exact counts.

    Plan: per step, one groupBy over the single-type event slice to a
    user-sized (user, min ts) frame, joined to the previous step's
    frame on the user key — s aggregations + s-1 equi-joins, all
    co-partitioned on the user; the per-step output is one row."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    prev = None
    counts: list[DataFrame] = []
    for idx, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if prev is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("t"))
        else:
            cur = (
                ev.join(prev.select("u", F.col("t").alias("t_prev")), "u")
                .filter(F.col("t") > F.col("t_prev"))
                .groupBy("u")
                .agg(F.min("t").alias("t"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit(idx + 1).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                "n_users",
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    first = out.filter(F.col("step") == 1).select(
        F.col("n_users").alias("n_first")
    )
    w_prev = out.select(
        (F.col("step") + 1).alias("step"), F.col("n_users").alias("n_prev")
    )
    return (
        out.crossJoin(F.broadcast(first))
        .join(F.broadcast(w_prev), "step", "left")
        .select(
            "step",
            "event_type",
            "n_users",
            F.round(F.col("n_users") / F.col("n_first"), out_decimals).alias(
                "pct_of_first"
            ),
            F.round(F.col("n_users") / F.col("n_prev"), out_decimals).alias(
                "pct_of_previous"
            ),
        )
        .orderBy("step")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    out_decimals: int = 6,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; each (cohort, offset) cell counts distinct
    cohort members active offset periods later. Returns (cohort_start,
    period_offset, n_active, cohort_size, retention) sorted by
    (cohort, offset); offset 0 always has retention 1.

    Plan: one groupBy to the user-sized first-activity frame, one
    join back on the user key (co-partitioned), one (cohort, offset)
    groupBy — the output is calendar², never user²."""
    per = F.date_trunc(period, F.col(ts_col))
    firsts = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(per).alias("cohort")
    )
    activity = (
        events.select(F.col(user_col).alias("u"), per.alias("p"))
        .distinct()
        .join(firsts, "u")
        .groupBy("cohort", "p")
        .agg(F.countDistinct("u").cast("long").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    unit = {"week": 7 * 86400, "day": 86400}.get(period)
    if unit is not None:
        offset = (
            (F.unix_timestamp("p") - F.unix_timestamp("cohort")) / unit
        ).cast("long")
    else:  # month cohorts: calendar arithmetic, not fixed seconds
        offset = (
            (F.year("p") - F.year("cohort")) * 12
            + (F.month("p") - F.month("cohort"))
        ).cast("long")
    return (
        activity.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_start"),
            offset.alias("period_offset"),
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size"), out_decimals
            ).alias("retention"),
        )
        .orderBy("cohort_start", "period_offset")
    )


def funnel_latency(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    out_decimals: int = 4,
) -> DataFrame:
    """Conversion LATENCY between consecutive funnel steps, under the
    same strict ordering as funnel_conversion: for each user who
    chains step i-1 → i, the gap is (first qualifying step-i event −
    step i-1 completion). One row per transition: (step, event_type,
    n_converted, median_sec, p90_sec, max_sec) — the "where do users
    stall" companion to the conversion-rate funnel.

    Same plan discipline: per step one groupBy to a user-sized
    (user, min ts) frame + a co-partitioned user-key join; the
    percentile aggregations run per transition over user-sized
    latency frames (exact interpolated percentile, quantile_cont's
    twin)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    prev = None
    out = None
    for idx, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if prev is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("t"))
        else:
            cur = (
                ev.join(prev.select("u", F.col("t").alias("t_prev")), "u")
                .filter(F.col("t") > F.col("t_prev"))
                .groupBy("u")
                .agg(F.min("t").alias("t"))
            )
            lat = (
                cur.join(prev.select("u", F.col("t").alias("t_prev")), "u")
                .select(
                    (
                        F.unix_micros(F.col("t")) - F.unix_micros(F.col("t_prev"))
                    ).cast("double").alias("lat_us")
                )
            )
            row = lat.agg(
                F.count(F.lit(1)).cast("long").alias("n_converted"),
                F.round(
                    F.expr("percentile(lat_us, 0.5)") / 1e6, out_decimals
                ).alias("median_sec"),
                F.round(
                    F.expr("percentile(lat_us, 0.9)") / 1e6, out_decimals
                ).alias("p90_sec"),
                F.round(F.max("lat_us") / 1e6, out_decimals).alias("max_sec"),
            ).select(
                F.lit(idx + 1).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                "n_converted",
                "median_sec",
                "p90_sec",
                "max_sec",
            )
            out = row if out is None else out.unionByName(row)
        prev = cur
    return out.orderBy("step")


def dau_mau_stickiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 28,
    round_digits: int = 6,
) -> DataFrame:
    """DAU / MAU stickiness per calendar day: daily active users,
    rolling `window_days`-day distinct active users, and their ratio —
    the canonical "how often do actives come back" product metric
    (window_days=28 is the industry MAU convention).

    Scale shape: the event stream collapses FIRST to the distinct
    (user, day) frame (one groupBy — the only corpus-scale shuffle).
    Rolling DISTINCT counts can't ride a window aggregate, so each
    user-day row is EXPLODED over the window_days spine days it
    supports (sequence(d, d + window_days - 1)) and equi-joined to the
    observed-day spine — a broadcast HASH join on the day key (the
    spine is day-frame sized), then one (day, user) distinct + count.
    Work is O(user-days · window_days), independent of BOTH raw event
    volume and history length. (The r8 version phrased the support
    relation as a non-equi range join against the spine; with no
    equi-key Catalyst planned a BroadcastNestedLoopJoin whose per-row
    cost grew with |spine| — O(user-days · n_days) on a multi-year
    corpus. The explode form is the same relation with a real hash
    key; tests/test_plans.py asserts no BNLJ survives in this plan.)
    Days with no events in their trailing window emit nothing (they
    have no user-day support rows) — the spine is observed days
    only."""
    ud = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_format(ts_col, "yyyy-MM-dd").alias("day"),
        )
        .distinct()
    )
    spine = ud.select("day").distinct().select(
        "day", F.to_date("day").alias("d")
    )
    support = ud.select(
        "u",
        F.explode(
            F.sequence(
                F.to_date("day"),
                F.date_add(F.to_date("day"), window_days - 1),
            )
        ).alias("d"),
    )
    windowed = support.join(F.broadcast(spine), "d").select("day", "u")
    mau = windowed.groupBy("day").agg(
        F.countDistinct("u").cast("long").alias("mau")
    )
    dau = ud.groupBy("day").agg(F.countDistinct("u").cast("long").alias("dau"))
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            F.round(
                F.col("dau").cast("double") / F.col("mau").cast("double"),
                round_digits,
            ).alias("stickiness"),
        )
    )


def window_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    within_seconds: int,
    round_digits: int = 6,
) -> DataFrame:
    """Time-constrained conversion funnel ("window funnel"): for every
    `from_type` event, did the SAME user emit a `to_type` event within
    `within_seconds` AFTER it? The product-analytics primitive behind
    "viewed → purchased within 30 minutes" — funnel_conversion's
    global step order can't express the deadline, and a naive
    conversions × touches join explodes; this is the deadline-aware
    form.

    Plan: ONE window per user over the event-time order — each row
    carries the timestamp of the NEXT `to_type` event at-or-after it
    (a conditional running min over the following frame, the sessionize
    cost envelope) — then one aggregate. No self-join, no pair
    explosion: work is one shuffle of the two event types.

    Exactness: latencies are exact integer microseconds; the median is
    Spark's exact `percentile` over integers (DuckDB quantile_cont
    twin) and is emitted in MICROSECONDS — an even-count median is
    x.5 µs exactly, and dividing to seconds before rounding lands on
    the .xx45 midpoints where engine round() conventions diverge (the
    repo's standing divide-before-round lesson). Returns one row:
    (n_source, n_converted, conv_rate, median_latency_us)."""
    from pyspark.sql import Window

    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("t"),
    ).filter(F.col("t").isin([from_type, to_type]))
    w_next = (
        Window.partitionBy("u")
        .orderBy("us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    scored = (
        e.withColumn(
            "next_to_us",
            F.min(F.when(F.col("t") == to_type, F.col("us"))).over(w_next),
        )
        .filter(F.col("t") == from_type)
        .select(
            "u",
            "us",
            (
                F.col("next_to_us").isNotNull()
                & (
                    F.col("next_to_us") - F.col("us")
                    <= F.lit(int(within_seconds) * 1_000_000)
                )
            ).cast("int").alias("converted"),
            (F.col("next_to_us") - F.col("us")).alias("lat_us"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_source"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)).cast("double"),
            round_digits,
        ).alias("conv_rate"),
        F.expr(
            "percentile(CASE WHEN converted = 1 THEN lat_us END, 0.5)"
        ).alias("median_latency_us"),
    )
