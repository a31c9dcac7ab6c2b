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

from pyspark.sql import DataFrame, Window
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


def markov_attribution(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    conv_state: str,
    rounds: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014) — the
    data-driven alternative to the positional rules in
    multi_touch_attribution: model journeys as a first-order Markov
    chain over touch channels with absorbing CONV/NULL states, and
    credit each channel by its REMOVAL EFFECT — how much total
    conversion probability disappears when every edge into that
    channel is redirected to NULL:

        RE(c)    = 1 − P_c(conv)/P_base(conv)
        share(c) = RE(c) / Σ RE

    Journey construction: per key, touches are the non-conversion
    states strictly BEFORE the key's first conversion event;
    transitions are start→first, touch→touch, last→conv (converted
    keys) / last→null (never-converted), plus start→conv for keys
    converting with zero prior touches.

    Scale shape: ONE per-key window over the event order builds the
    pair counts (the fat-table shuffle); everything after runs on the
    |states|²-sized transition frame. Absorption probabilities come
    from `rounds` fixed in-plan power-iteration steps over ONE frame
    keyed by (chain, state) — chain '__base' plus one chain per
    channel with that channel's inbound edges redirected — with the
    state vector rounded to 12 dp every round (the repo's
    trajectory-pinning trick: float summation order can differ
    across engines, identical rounded inputs cannot), and
    localCheckpoint lineage truncation every 8 rounds (the pagerank
    discipline). No collect anywhere — the chain frame is built by a
    broadcast cross join of the distinct-state frame. Returns one
    row per channel: (channel, base_conv_p, conv_p_removed,
    removal_effect, attribution_share)."""
    from pyspark.sql import Window

    if rounds < 1:
        # sequence(1, 0) is DESCENDING in Spark — the fold below would
        # silently run 2 rounds instead of 0
        raise ValueError("markov_attribution needs rounds >= 1")
    START, CONV, NULL = "__start", "__conv", "__null"
    wk = Window.partitionBy("k")
    ev = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("ts"),
        F.col(state_col).alias("st"),
        *([F.col(order_tiebreak).alias("tb")] if order_tiebreak else []),
    ).withColumn(
        "conv_ts",
        F.min(F.when(F.col("st") == conv_state, F.col("ts"))).over(wk),
    )
    touches = ev.filter(
        (F.col("st") != conv_state)
        & (F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts")))
    )
    worder = Window.partitionBy("k").orderBy(
        *([F.col("ts").asc(), F.col("tb").asc()] if order_tiebreak else [F.col("ts").asc()])
    )
    seq = touches.withColumn("rn", F.row_number().over(worder)).withColumn(
        "nxt", F.lead("st").over(worder)
    )
    converted = F.col("conv_ts").isNotNull()
    mid = seq.select(
        F.col("st").alias("from_state"),
        F.coalesce(
            F.col("nxt"), F.when(converted, F.lit(CONV)).otherwise(F.lit(NULL))
        ).alias("to_state"),
    )
    firsts = seq.filter(F.col("rn") == 1).select(
        F.lit(START).alias("from_state"), F.col("st").alias("to_state")
    )
    # keys converting with zero prior touches: start -> conv directly
    per_key = ev.groupBy("k").agg(
        F.max(converted.cast("int")).alias("cv"),
        F.max(
            (
                (F.col("st") != conv_state)
                & (F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts")))
            ).cast("int")
        ).alias("has_touch"),
    )
    direct = per_key.filter((F.col("cv") == 1) & (F.col("has_touch") == 0)).select(
        F.lit(START).alias("from_state"), F.lit(CONV).alias("to_state")
    )
    pairs = (
        mid.unionByName(firsts)
        .unionByName(direct)
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("fn"))
    pmat = pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        F.round(F.col("n") / F.col("fn"), 12).alias("p"),
    )
    channels = (
        pairs.select(F.col("from_state").alias("ch"))
        .filter(~F.col("ch").isin(START, CONV, NULL))
        .distinct()
    )
    # chain list fully in-plan: the base chain plus one per channel
    base_row = channels.select(F.lit("__base").alias("chain")).limit(1)
    chains = channels.select(F.col("ch").alias("chain")).unionByName(base_row)
    # per-chain matrix: edges INTO the removed channel go to __null
    pc = chains.crossJoin(F.broadcast(pmat)).select(
        "chain",
        "from_state",
        F.when(
            (F.col("chain") != "__base") & (F.col("to_state") == F.col("chain")),
            F.lit(NULL),
        )
        .otherwise(F.col("to_state"))
        .alias("to_state"),
        "p",
    ).groupBy("chain", "from_state", "to_state").agg(
        F.round(F.sum("p"), 12).alias("p")
    )
    # absorbing self-loops so mass at conv/null persists through rounds
    absorbing_states = base_row.select(F.lit(CONV).alias("from_state")).unionByName(
        base_row.select(F.lit(NULL).alias("from_state"))
    )
    absorb = chains.crossJoin(F.broadcast(absorbing_states)).select(
        "chain", "from_state", F.col("from_state").alias("to_state"), F.lit(1.0).alias("p")
    )
    # the transition frame is |states|²·|chains| rows — KB-sized AT ANY
    # SCALE, so the `rounds` power-iteration steps run IN-ROW as
    # chained higher-order-function projections over one per-chain
    # edge array instead of `rounds` scheduled join+aggregate stages
    # (the relational form cost ~0.25 s of pure stage scheduling per
    # round — 30 rounds ≈ 7.5 s for arithmetic on ~50 rows; this form
    # is ONE exchange + one codegen stage). Numerics are unchanged:
    # each state's new mass is round(Σ mass[from]·p, 12) exactly as
    # the groupBy computed it — the HOF sum order is pinned by the
    # array_sort, and zero-mass states contribute exact +0.0 terms.
    # Each round lives in its OWN withColumn projection; Catalyst does
    # not collapse them because the previous round's array column is
    # referenced |states| times (non-cheap multi-reference), so the
    # expression tree stays LINEAR in rounds.
    pc = pc.unionByName(absorb)
    estates = pc.groupBy("chain").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_list(F.array("from_state", "to_state")))
            )
        ).alias("S"),
        F.array_sort(
            F.collect_list(F.struct("from_state", "to_state", "p"))
        ).alias("E"),
    )
    m = estates.withColumn(
        "M",
        F.transform(
            F.col("S"),
            lambda sp: F.transform(
                F.filter(F.col("E"), lambda e: e["to_state"] == sp),
                lambda e: F.struct(
                    F.array_position(F.col("S"), e["from_state"])
                    .cast("int")
                    .alias("i"),
                    e["p"].alias("p"),
                ),
            ),
        ),
    )
    final_mass = F.aggregate(
        F.sequence(F.lit(1), F.lit(int(rounds))),
        F.transform(
            F.col("S"),
            lambda s: F.when(s == F.lit(START), F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
        ),
        # fold over the round counter: the accumulator `acc` is a
        # LAMBDA VARIABLE, so the expression tree is constant-size in
        # `rounds` (a withColumn-per-round chain was measured to blow
        # up analysis time — each projection re-inlines the previous
        # round's array expression)
        lambda acc, r: F.transform(
            F.col("M"),
            lambda contribs: F.round(
                F.aggregate(
                    contribs,
                    F.lit(0.0),
                    lambda a2, c: a2 + F.element_at(acc, c["i"]) * c["p"],
                ),
                12,
            ),
        ),
    )
    # a chain whose conversions vanish entirely has mass 0 at __conv;
    # CONV is always in S (the absorbing self-loops are added per
    # chain above), but guard the 1-based element_at anyway
    conv_pos = F.array_position(F.col("S"), F.lit(CONV)).cast("int")
    conv_p = m.select(
        "chain",
        F.when(conv_pos > 0, F.element_at(final_mass, conv_pos))
        .otherwise(F.lit(0.0))
        .alias("cp"),
    )
    base_p = conv_p.filter(F.col("chain") == "__base").select(
        F.col("cp").alias("base_cp")
    )
    rem = (
        conv_p.filter(F.col("chain") != "__base")
        .join(F.broadcast(base_p))
        .select(
            F.col("chain").alias("channel"),
            F.col("base_cp"),
            F.col("cp"),
            F.round(
                F.greatest(F.lit(0.0), 1.0 - F.col("cp") / F.col("base_cp")), 9
            ).alias("re"),
        )
    )
    tot_re = rem.agg(F.round(F.sum("re"), 9).alias("re_sum"))
    return (
        rem.join(F.broadcast(tot_re))
        .select(
            "channel",
            F.round("base_cp", 6).alias("base_conv_p"),
            F.round("cp", 6).alias("conv_p_removed"),
            F.round("re", 6).alias("removal_effect"),
            F.round(
                F.when(F.col("re_sum") > 0, F.col("re") / F.col("re_sum")), 6
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )


def cohort_ltv_curve(
    events: DataFrame,
    user_col: str,
    time_col: str,
    value_col: str,
    period: str = "month",
    round_digits: int = 6,
) -> DataFrame:
    """Cumulative lifetime-value curve by acquisition cohort — the
    revenue twin of cohort_retention: users are cohorted by their
    FIRST event month, and for each cohort age (months since
    acquisition) the curve reports cumulative revenue per acquired
    user. Reading down a column compares cohort quality at equal age;
    the row where a cohort's curve crosses acquisition cost is its
    payback age.

    Plan: one user-frame window for the cohort month (no self-join),
    one (cohort, age) aggregate, one cohort-partition running-sum
    window over ages, and a broadcast-sized cohort-size frame joined
    back. Ages are exact month diffs; per-user normalization uses the
    DISTINCT acquired-user count, so returning users do not inflate
    the denominator. Returns (cohort_month, age_months, cohort_users,
    revenue, cum_revenue, cum_ltv_per_user) for period='month'; with
    period='week' the first two columns are named (cohort_week,
    age_weeks) so the schema states its own grain (ADVICE r10)."""
    if period not in ("month", "week"):
        raise ValueError(f"period must be month|week, got {period!r}")
    cohort_name = "cohort_month" if period == "month" else "cohort_week"
    age_name = "age_months" if period == "month" else "age_weeks"
    fmt = "yyyy-MM" if period == "month" else "yyyy-MM-dd"
    wu = Window.partitionBy("u")
    base = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(time_col)).alias("month_start"),
        F.col(value_col).cast("decimal(18,6)").alias("v"),
    )
    with_cohort = base.withColumn(
        "cohort_start", F.min("month_start").over(wu)
    ).withColumn(
        "cohort_month", F.date_format("cohort_start", fmt)
    ).withColumn(
        "age_months",
        F.months_between(F.col("month_start"), F.col("cohort_start")).cast("long")
        if period == "month"
        else (F.datediff(F.col("month_start"), F.col("cohort_start")) / 7).cast(
            "long"
        ),
    )
    per_cell = with_cohort.groupBy("cohort_month", "age_months").agg(
        F.sum("v").alias("rev"),
        F.countDistinct("u").cast("long").alias("active_users"),
    )
    sizes = (
        with_cohort.filter(F.col("age_months") == 0)
        .groupBy("cohort_month")
        .agg(F.countDistinct("u").cast("long").alias("cohort_users"))
    )
    wc = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = per_cell.join(F.broadcast(sizes), "cohort_month").withColumn(
        "cum_rev", F.sum("rev").over(wc)
    )
    return curve.select(
        F.col("cohort_month").alias(cohort_name),
        F.col("age_months").alias(age_name),
        "cohort_users",
        F.round(F.col("rev").cast("double"), round_digits).alias("revenue"),
        F.round(F.col("cum_rev").cast("double"), round_digits).alias("cum_revenue"),
        F.round(
            F.col("cum_rev").cast("double") / F.col("cohort_users"), round_digits
        ).alias("cum_ltv_per_user"),
    ).orderBy(cohort_name, age_name)


def shapley_attribution(
    events: DataFrame,
    user_col: str,
    channel_col: str,
    time_col: str,
    conversion_value: str,
    max_channels: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """EXACT Shapley-value conversion attribution (Shapley 1953; the
    coalition-game alternative to markov_attribution's removal
    effects — Shapley is the scheme ad platforms standardized on
    because it is the unique allocation that is efficient, symmetric,
    and dummy-free):

        φ_c = Σ_{S ⊆ K\\{c}} |S|!·(k−|S|−1)!/k! · (v(S∪{c}) − v(S))

    with the characteristic function v(S) = conversions of users whose
    touched-channel set is contained in S (the standard
    "coalition-reach" game on observed journeys).

    Scale shape: the corpus collapses in ONE pass to per-user
    (channel-bitmask, converted) rows, then to a ≤2^k-row mask
    histogram; everything after runs on coalition frames of size 2^k
    and 2^k·k — k is the CHANNEL count (≤ max_channels enforced), so
    the exponential lives on a frame the size of a lookup table, never
    on users. Channel indexing is a bounded driver collect (the
    welch/bm25 contract). Popcount and subset tests are plain integer
    arithmetic (portable to any SQL engine — no bit_count builtin
    assumed). Returns one row per channel: (channel, shapley_value,
    share) with Σ shapley_value = v(K) (total attributable
    conversions), the Shapley efficiency identity."""
    import math as _math

    u = F.col(user_col)
    conv_user = (
        events.filter(F.col(channel_col) == conversion_value)
        .select(u.alias("uid"))
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    touches = (
        events.filter(F.col(channel_col) != conversion_value)
        .select(u.alias("uid"), F.col(channel_col).alias("ch"))
        .distinct()
    )
    channels = sorted(
        r["ch"] for r in touches.select("ch").distinct().collect()
    )
    k = len(channels)
    if k == 0:
        raise ValueError("no touch channels besides the conversion event")
    if k > max_channels:
        raise ValueError(
            f"{k} channels exceeds max_channels={max_channels}; exact "
            "Shapley is 2^k — group channels first"
        )
    bit_of = {c: 1 << i for i, c in enumerate(channels)}
    bit_expr = None
    for c, b in bit_of.items():
        clause = F.when(F.col("ch") == c, F.lit(b))
        bit_expr = clause if bit_expr is None else bit_expr.when(
            F.col("ch") == c, F.lit(b)
        )
    user_masks = (
        touches.withColumn("bit", bit_expr)
        .groupBy("uid")
        .agg(F.sum(F.col("bit")).cast("long").alias("mask"))
        .join(conv_user, "uid", "left")
        .groupBy("mask")
        .agg(
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("long")
            .alias("n_conv")
        )
    ).localCheckpoint(eager=True)
    spark = events.sparkSession
    coalitions = spark.range(0, 2**k).select(F.col("id").alias("s"))
    # v(S) = conversions of users whose mask ⊆ S; subset test via
    # portable integer arithmetic: every bit of mask present in S
    sub = user_masks.crossJoin(coalitions)
    contained = None
    for j in range(k):
        bit_in_mask = (F.col("mask") / (1 << j)).cast("long") % 2
        bit_in_s = (F.col("s") / (1 << j)).cast("long") % 2
        ok = (bit_in_mask == 0) | (bit_in_s == 1)
        contained = ok if contained is None else (contained & ok)
    v = (
        sub.filter(contained)
        .groupBy("s")
        .agg(F.sum("n_conv").cast("long").alias("v"))
    )
    # Shapley sum: channels × coalitions not containing the channel
    ch_frame = spark.createDataFrame(
        [(c, bit_of[c]) for c in channels], "channel string, bit long"
    )
    pairs = ch_frame.crossJoin(coalitions).filter(
        (F.col("s") / F.col("bit")).cast("long") % 2 == 0
    )
    v_s = v.select(F.col("s").alias("s0"), F.col("v").alias("v_without"))
    v_sc = v.select(F.col("s").alias("s1"), F.col("v").alias("v_with"))
    joined = (
        pairs.join(v_s, F.col("s") == F.col("s0"), "left")
        .join(v_sc, (F.col("s") + F.col("bit")) == F.col("s1"), "left")
        .select(
            "channel",
            "s",
            F.coalesce(F.col("v_without"), F.lit(0)).alias("v0"),
            F.coalesce(F.col("v_with"), F.lit(0)).alias("v1"),
        )
    )
    popcount = None
    for j in range(k):
        term = (F.col("s") / (1 << j)).cast("long") % 2
        popcount = term if popcount is None else popcount + term
    weight = None
    for size in range(k):
        wgt = (
            _math.factorial(size)
            * _math.factorial(k - size - 1)
            / _math.factorial(k)
        )
        clause = F.when(popcount == size, F.lit(wgt))
        weight = clause if weight is None else weight.when(
            popcount == size, F.lit(wgt)
        )
    scored = joined.select(
        "channel",
        F.round(weight * (F.col("v1") - F.col("v0")).cast("double"), 9).alias(
            "term"
        ),
    )
    per_channel = scored.groupBy("channel").agg(
        F.round(F.sum("term"), round_digits).alias("shapley_value")
    )
    total = per_channel.agg(
        F.sum("shapley_value").alias("__tot")
    )
    return (
        per_channel.crossJoin(F.broadcast(total))
        .select(
            "channel",
            "shapley_value",
            F.round(
                F.when(
                    F.col("__tot") > 0, F.col("shapley_value") / F.col("__tot")
                ),
                round_digits,
            ).alias("share"),
        )
        .orderBy("channel")
    )
