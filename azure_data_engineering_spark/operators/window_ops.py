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


def time_decay_sum(
    df: DataFrame,
    partition_by: str,
    ts_col: str,
    value_col: str,
    half_life_days: float,
    out_col: str = "decayed_sum",
) -> DataFrame:
    """Exponentially time-decayed running sum per key: at each event,
    sum of all values so far for the key, each weighted by
    2^(-age / half_life) where age = current event's ts minus the
    contributing event's ts. The standard recency-weighted engagement
    / trending score (each half_life_days, old contributions halve).

    Scale-first formulation: the naive definition needs a weight that
    depends on BOTH the frame row and the current row, which Spark
    windows cannot express without collect_list (O(frame) memory per
    row, Python-side). Instead use the algebraic identity

        sum_i x_i * 2^(-(t - t_i)/h)  =  2^(-t/h) * sum_i x_i * 2^(t_i/h)

    which turns the decayed sum into a PLAIN running sum of
    pre-scaled values — one shuffle on the key, whole-stage codegen,
    O(1) state per row, identical to running_sum cost.

    Numeric stability: 2^(t_i/h) overflows double once t_i/h > 1023,
    so t_i is re-based to the key's own minimum timestamp first (one
    extra window min, same shuffle). Safe whenever one key's history
    spans < 1023 half-lives — e.g. 19 years of data at h = 7 days —
    and the rebasing makes the guarantee depend on the DATA WINDOW
    length, never on the epoch.
    """
    w = Window.partitionBy(partition_by).orderBy(F.col(ts_col).asc())
    wkey = Window.partitionBy(partition_by)
    # RANGE (not ROWS) frame: rows tied on ts all enter the sum
    # together, so the result is deterministic under any tie order /
    # partition layout (a ROWS frame would make tied rows' running
    # values depend on shuffle order)
    frame = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t = F.col(ts_col).cast("double")
    t0 = F.min(t).over(wkey)
    rel_hl = (t - t0) / F.lit(half_life_days * 86400.0)
    scaled = F.col(value_col) * F.pow(F.lit(2.0), rel_hl)
    return df.withColumn(
        out_col, F.pow(F.lit(2.0), -rel_hl) * F.sum(scaled).over(frame)
    )


def total_order_key(ts_col: str, id_col: str) -> Column:
    """Sortable-string TOTAL order over (timestamp, unique id):
    zero-padded unix_micros || '|' || zero-padded id — the tie-break
    key that makes min_by/max_by open/close deterministic for
    same-timestamp events.

    Preconditions asserted IN-PLAN (ADVICE r5): the zero-pad encoding
    silently breaks outside ts >= 1970-01-01 (negative unix_micros
    sort AFTER all zero-padded positives) and for ids longer than 20
    chars (lpad TRUNCATES, collapsing distinct ids into one key) —
    both would make open/close nondeterministic again, so they fail
    loudly instead of corrupting bars."""
    micros = F.unix_micros(F.col(ts_col))
    ids = F.col(id_col).cast("string")
    guard = F.assert_true(
        (micros >= 0) & (F.length(ids) <= 20),
        F.lit(
            f"total_order_key: requires {ts_col} >= 1970-01-01 and "
            f"string length of {id_col} <= 20 chars (zero-pad encoding "
            "would silently mis-sort / collapse keys otherwise)"
        ),
    )
    # assert_true yields NULL when the predicate holds (and raises
    # otherwise), so the when() both forces its evaluation and leaves
    # the key value untouched
    return F.concat(
        F.when(guard.isNull(), F.lpad(micros.cast("string"), 20, "0")),
        F.lit("|"),
        F.lpad(ids, 20, "0"),
    )


def ohlc_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Downsample a (key, timestamp, value) stream to per-bucket OHLC
    bars — open / high / low / close / count / sum — the classic
    time-series resample (financial candlesticks; equally the shape
    of "first/last reading per sensor per hour" telemetry rollups).

    Pure single-aggregation plan: date_trunc the timestamp, then ONE
    groupBy(key, bucket) with min_by/max_by for open/close and
    min/max for low/high — no window function, no secondary shuffle,
    so at 100 TB this is exactly one map-side-combinable pass whose
    output is |keys| x |buckets| rows. Open/close use a TOTAL
    event order (timestamp, then unique event id, packed into one
    zero-padded sortable string) so concurrent same-timestamp events
    resolve identically on every engine — min_by over a merely
    partial order is nondeterministic under retries.

    Returns (key, bucket_ts, open, high, low, close, n, total)."""
    order_key = total_order_key(ts_col, id_col)
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
            F.col(value_col).alias("v"),
            order_key.alias("__ord"),
        )
        .groupBy("key", "bucket_ts")
        .agg(
            F.min_by("v", "__ord").alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max_by("v", "__ord").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
            # exact decimal accumulation, surfaced as double: float sums
            # drift with accumulation order across engines/partitionings
            F.round(F.sum(F.col("v").cast("decimal(18,2)")).cast("double"), 2).alias(
                "total"
            ),
        )
    )


def rfm_scores(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation (Hughes,
    "Strategic Database Marketing" 1994): quintile scores per entity,
    5 = most recent / most frequent / highest spend. The workhorse
    customer-value segmentation every warehouse runs; here as a
    deterministic two-aggregation plan.

    Scale shape: ONE groupBy collapses the fact table to one row per
    entity (recency = days from the entity's last event to the global
    max, frequency = count, monetary = sum); the global reference
    date rides in as a 1-row broadcast frame. ntile then runs over
    the ENTITY frame — |entities| rows, not |facts| — with a total
    order (metric, then entity id) so tile boundaries are identical
    on every engine and run. For entity counts too large for one
    ntile window, swap ntile for the percentile-bucket formulation
    (quantile_binning) — same output contract.

    Returns (entity, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment)."""
    per_e = df.groupBy(F.col(entity_col).alias("entity")).agg(
        F.max(F.col(ts_col)).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        # exact decimal sum: monetary feeds an ntile ORDER BY, so float
        # accumulation-order drift would move tile boundaries
        F.round(
            F.sum(F.col(amount_col).cast("decimal(18,2)")).cast("double"), 2
        ).alias("monetary"),
    )
    ref = df.agg(F.max(F.col(ts_col)).alias("__ref"))
    base = per_e.join(F.broadcast(ref)).withColumn(
        "recency_days", F.datediff(F.col("__ref"), F.col("__last")).cast("long")
    )
    # 5 = best: most recent (smallest recency), most frequent, highest spend
    w_r = Window.orderBy(F.col("recency_days").desc(), F.col("entity").asc())
    w_f = Window.orderBy(F.col("frequency").asc(), F.col("entity").asc())
    w_m = Window.orderBy(F.col("monetary").asc(), F.col("entity").asc())
    return base.select(
        "entity",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(w_r).alias("r_score"),
        F.ntile(n_tiles).over(w_f).alias("f_score"),
        F.ntile(n_tiles).over(w_m).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition estimates over per-key ordered
    event sequences: (from_state, to_state, n, p) where p is the
    row-conditional probability P(to | from). The classic "user
    journey" / next-action model behind funnel diagnostics and
    session simulators.

    One window (lead over the per-key time order — the same single
    shuffle every sequence operator here pays) followed by a
    count aggregation over (from, to) pairs, then the per-from
    normalizer is re-aggregated FROM THE PAIR COUNTS (|states|^2
    rows), never from the raw events — so the fat table is touched
    once. Terminal events (no successor) are excluded from the
    numerator and denominator alike, matching the maximum-likelihood
    estimator for transition probabilities.

    Determinism: ties on ts are broken by order_tiebreak (pass a
    unique column, e.g. the event id) so `lead` sees one canonical
    order per key under any partition layout.
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("_next", F.lead(F.col(state_col)).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"), F.col("_next").alias("to_state")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("from_n"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        (F.col("n") / F.col("from_n")).alias("p"),
    )


def multi_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    lookback_hours: int = 72,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    exact_decimals: int | None = None,
) -> DataFrame:
    """Multi-touch conversion attribution over an event stream: every
    conversion event credits the same user's touch events inside the
    lookback window under the three standard models at once —
    first-touch (earliest touch gets 100%), last-touch (latest gets
    100%), and linear (1/n each). Conversions with no in-window touch
    are unattributed and drop (count them upstream if needed).

    Plan shape: conversions equi-join touches on the USER key (the
    range predicate rides as a join residual — never a cartesian; the
    same shuffle shape as range_join, AQE-skew-splittable on hot
    users), then ONE window over the candidate pairs keyed by the
    conversion id computes n, first-rank, and last-rank in a single
    pass. Ties on touch timestamp break by the touch event id, so
    first/last credit is total and engine-portable.

    Returns per touch channel (`touch_type`): n_conversions (distinct
    conversions the channel participated in), first_touch_value,
    last_touch_value, linear_value — each the sum of conversion
    `value` credited under that model.

    exact_decimals: when set, each credit term is rounded to that many
    decimals and aggregated in DECIMAL(18, exact_decimals) — the
    engine's exact-decimal discipline (cf. q_tpch_q5_style) making the
    sums independent of partial-aggregation accumulation order, hence
    bit-identical across engines and partitionings.
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.col(value_col).alias("__cval"),
        F.col(id_col).alias("__cid"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(type_col).alias("touch_type"),
        F.col(id_col).alias("__tid"),
    )
    pairs = conv.join(touch, "__u").filter(
        (F.col("__tts") <= F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.expr(f"INTERVAL {int(lookback_hours)} HOURS"))
    )
    w = Window.partitionBy("__cid")
    w_first = w.orderBy(F.col("__tts").asc(), F.col("__tid").asc())
    w_last = w.orderBy(F.col("__tts").desc(), F.col("__tid").desc())
    scored = pairs.select(
        "__cid",
        "__cval",
        "touch_type",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.row_number().over(w_first).alias("__rn_first"),
        F.row_number().over(w_last).alias("__rn_last"),
    )
    if exact_decimals is None:
        full = F.col("__cval")
        lin = F.col("__cval") / F.col("__n")
        zero = F.lit(0.0)
    else:
        dt = f"decimal(18,{int(exact_decimals)})"
        full = F.round(F.col("__cval"), exact_decimals).cast(dt)
        lin = F.round(F.col("__cval") / F.col("__n"), exact_decimals).cast(dt)
        zero = F.lit(0).cast(dt)
    return scored.groupBy("touch_type").agg(
        F.countDistinct("__cid").alias("n_conversions"),
        F.sum(F.when(F.col("__rn_first") == 1, full).otherwise(zero)).alias(
            "first_touch_value"
        ),
        F.sum(F.when(F.col("__rn_last") == 1, full).otherwise(zero)).alias(
            "last_touch_value"
        ),
        F.sum(lin).alias("linear_value"),
    )


def path_ngrams(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    n: int = 3,
) -> DataFrame:
    """Ordered path n-gram mining: for each key's event sequence
    (total order: timestamp, then unique id — same-timestamp events
    must resolve identically on every engine), count every run of
    `n` consecutive states — the "what do users do next" path
    analytics that generalizes markov_transitions (its n=2 case) to
    longer behavioral motifs.

    One window pass (n-1 chained leads over the per-key order) + one
    count aggregate; no self-joins, no explosion beyond one row per
    event. At 100 TB the window shuffles once on the key and a hot
    key costs O(its events), not O(events²). Returns
    (s1..s{n}, n_paths)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    cur = df.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), F.col(state_col).alias("s1")
    )
    for i in range(1, n):
        cur = cur.withColumn(f"s{i + 1}", F.lead("s1", i).over(w))
    grams = cur.filter(F.col(f"s{n}").isNotNull())
    return grams.groupBy(*[f"s{i + 1}" for i in range(n)]).agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )


def activity_streaks(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    top_n: int = 200,
) -> DataFrame:
    """Longest-consecutive-day activity streaks per key — the classic
    gaps-and-islands engagement metric (sessionize detects islands in
    EVENT-TIME gaps; this detects them on the integer DAY grid, the
    granularity retention teams actually report "streaks" at).

    Method: collapse to the distinct (key, epoch-day) frame — the only
    corpus-scale shuffle — then the island anchor is ``day −
    row_number()`` per key (consecutive days share an anchor), one
    groupBy per island, one per key. Epoch-day INTEGER arithmetic end
    to end, so no date/interval convention can diverge cross-engine;
    the longest island breaks length ties on EARLIEST start
    (max-struct(len, −start) — the repo's lexicographic-extreme
    discipline). Returns the top ``top_n`` keys by (longest_streak
    DESC, key ASC): key, n_active_days, n_islands, longest_streak,
    longest_start (ISO date string)."""
    day = F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit("1970-01-01")))
    kd = df.select(F.col(key_col).alias("k"), day.alias("d")).distinct()
    w = Window.partitionBy("k").orderBy("d")
    anchored = kd.withColumn("anchor", F.col("d") - F.row_number().over(w))
    islands = anchored.groupBy("k", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("d").alias("start"),
    )
    per_key = islands.groupBy("k").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max(F.struct(F.col("len"), (-F.col("start")).alias("negstart"))).alias("m"),
    )
    return (
        per_key.select(
            F.col("k").alias("key"),
            "n_active_days",
            "n_islands",
            F.col("m.len").alias("longest_streak"),
            F.date_format(
                F.date_add(F.to_date(F.lit("1970-01-01")), -F.col("m.negstart")),
                "yyyy-MM-dd",
            ).alias("longest_start"),
        )
        .orderBy(F.col("longest_streak").desc(), F.col("key").asc())
        .limit(top_n)
    )
