"""Relational operators the engine owns (SURVEY.md §2B).

The reference delegates its relational surface to Postgres via
generated SQL (SharedCode/PGHelperFunction.py:44-67) and stored procs
(adffunction/__init__.py:216). Here that surface is native: each helper
returns a *declarative* DataFrame plan so Catalyst/AQE pick the join
strategy, push predicates, and prune columns.

Scale notes (100 TB discipline):
- `asof_join`/`range_join` take an explicit `broadcast_small` flag —
  an as-of against a small effective-dated dim must broadcast, never
  shuffle the fact table.
- `top_k_per_group` uses a window rank, which shuffles once on the
  group key with partial top-k pushed map-side by Spark's
  `WindowGroupLimit` physical optimization (rank filter pushdown).
- `dedup_keep_first` is the deterministic version of the reference's
  nondeterministic `GROUP BY s_pk` arbitrary-row dedup
  (PGHelperFunction.py:56) — see SURVEY.md §7 "hard parts".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: TakeOrderedAndProject physical op — each partition
    keeps k rows, only k*partitions rows reach the driver-side merge.
    Pass a total order (unique tiebreak column) for determinism."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, group_by: Sequence[str], order_by: Sequence[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """Top-k rows per group via row_number window; the rank<=k filter is
    pushed into the sort by Spark's WindowGroupLimit, so each shuffle
    partition materialises only k rows per group."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Deterministic PK-dedup: keep the first row per key under an
    explicit total order. Replaces the reference's arbitrary-row-per-PK
    `GROUP BY s_pk` (PGHelperFunction.py:56) with defined semantics."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def string_agg(df: DataFrame, group_by: Sequence[str], value: str, sep: str = ",", alias: str = "agg") -> DataFrame:
    """Postgres string_agg equivalent (PGHelperFunction.py:12-15).

    collect_list order is nondeterministic across shuffles, so the list
    is array_sort'ed before joining — deterministic output at any
    parallelism (SURVEY.md §7 hard-parts)."""
    return df.groupBy(*group_by).agg(
        F.concat_ws(sep, F.array_sort(F.collect_list(F.col(value)))).alias(alias)
    )


def salted_aggregate(
    df: DataFrame,
    group_by: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: stage 1 aggregates on
    (keys, salt) spreading a hot key over `salt_buckets` reducers;
    stage 2 merges partials on the keys alone. Results are identical to
    a direct groupBy — this is the manual fallback when AQE skew
    handling isn't available (e.g. fixed at-rest partitioning).

    aggs: output_name -> (function, column) with function in
    {sum, count, min, max}; mergeable aggregates only (avg = sum/count
    composed by the caller).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in mergers:
            raise ValueError(f"non-mergeable aggregate {fn!r}")
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*[F.col(c) for c in group_by], F.monotonically_increasing_id()), F.lit(salt_buckets)))
    partial = salted.groupBy(*group_by, "__salt").agg(
        *[firsts[fn](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*group_by).agg(
        *[mergers[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe shuffle join for a hot-keyed fact side that is too
    big to salt via AQE (fixed at-rest partitioning, or a dim side too
    large to broadcast). The fact side gets a deterministic per-row
    salt; the dim side is replicated ``salt_buckets`` ways with
    ``explode(sequence(...))``; the join runs on (keys..., salt), so a
    key holding 30% of the fact rows spreads over ``salt_buckets``
    reducers instead of melting one. Results are identical to
    ``fact.join(dim, on, how)`` — replication is join-key-disjoint.

    Cost: dim shuffle volume × salt_buckets — use for genuinely
    skewed fact×medium-dim joins, not as a default. Supported how:
    inner / left (semantics preserved because every fact row keeps
    exactly its one salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()), F.lit(salt_buckets))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))).withColumn(
        "__salt", F.col("__salt").cast("long")
    )
    out = f.join(d, [*on, "__salt"], how)
    return out.drop("__salt")


def range_join(
    fact: DataFrame,
    dim: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_small: bool = True,
) -> DataFrame:
    """Non-equi (theta/range) join. Spark executes these as
    BroadcastNestedLoopJoin; at scale the dim side MUST be broadcast-
    small (band tables, calendars) or this degenerates to a cartesian
    shuffle — hence the default broadcast hint."""
    d = F.broadcast(dim) if broadcast_small else dim
    return fact.join(d, on=condition, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_on: str,
    right_on: str,
    partition_keys: Sequence[str] = (),
    direction: str = "backward",
    broadcast_small: bool = True,
) -> DataFrame:
    """As-of join: for each left row (identified by unique ``left_id``),
    the single right row with the greatest ``right_on <= left_on``
    (backward) or smallest ``right_on >= left_on`` (forward), optionally
    per partition key. Left rows with no match survive with nulls.

    Implementation: range join + deterministic keep-first on the left
    row identity. With a broadcast-able right side (effective-dated
    dims, rate tables) the fact side never shuffles for the join; the
    row_number dedup then shuffles on the left id only. For
    two-big-tables as-of, pre-bucket both sides on the partition keys
    instead of broadcasting.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    lcol, rcol = F.col(f"l.{left_on}"), F.col(f"r.{right_on}")
    cond = rcol <= lcol if direction == "backward" else rcol >= lcol
    for k in partition_keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    r = right.alias("r")
    joined = left.alias("l").join(F.broadcast(r) if broadcast_small else r, cond, "left")
    order = rcol.desc_nulls_last() if direction == "backward" else rcol.asc_nulls_last()
    w = Window.partitionBy(F.col(f"l.{left_id}")).orderBy(order)
    return joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def asof_join_big(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    partition_keys: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Fact x fact as-of join — the scale path when NEITHER side is
    broadcastable (asof_join above assumes a small right side).

    Union-merge plan instead of any join: tag both sides, union, then
    per partition key fill each left row's right-payload columns with
    `last(..., ignorenulls)` over the time-ordered window (backward;
    `first` over the following window for forward). ONE shuffle on the
    partition keys, zero BroadcastNestedLoopJoin, no pair explosion —
    the plan a 100 TB fact x fact as-of needs (plan shape asserted in
    tests/test_relational.py). Same tie semantics as asof_join: a right
    row at exactly left_on matches in both directions.

    direction="nearest" (pandas merge_asof's third mode) computes the
    backward AND forward fills over the SAME union frame — same single
    shuffle, two sorts — and picks per row whichever right timestamp
    is closer, preferring backward on exact distance ties (the pandas
    convention, documented for the oracle).

    Requirements: non-empty partition_keys (the window would otherwise
    be single-partition); right payload column names must not collide
    with left columns (rename before calling); for deterministic output
    right should be unique per (partition_keys, right_on) — pre-
    aggregate duplicates away.

    Reference parity: extends the MERGE-style temporal lookup of the
    reference's load path (PGHelperFunction.py:44-67 has no temporal
    variant); semantics follow the standard ASOF JOIN (DuckDB/Pandas
    merge_asof definition).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    if not partition_keys:
        raise ValueError("asof_join_big requires partition_keys; use asof_join for global as-of")
    keys = list(partition_keys)
    right_payload = [c for c in right.columns if c not in set(keys) | {right_on}]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    left_only = [c for c in left.columns if c not in keys]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    l_side = left.select(
        *keys,
        *left_only,
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in right_payload],
    )
    r_side = right.select(
        *keys,
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_only],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__src"),
        *right_payload,
    )
    u = l_side.unionByName(r_side)
    if direction == "nearest":
        u = u.withColumn(
            "__rt", F.when(F.col("__src") == 0, F.col("__t"))
        )
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__src").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__src").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        rt_b = F.last("__rt", ignorenulls=True).over(wb)
        rt_f = F.first("__rt", ignorenulls=True).over(wf)
        # backward wins on exact-distance ties (pandas convention)
        use_b = F.when(rt_f.isNull(), F.lit(True)).otherwise(
            rt_b.isNotNull()
            & ((F.col("__t") - rt_b) <= (rt_f - F.col("__t")))
        )
        filled = [
            F.when(use_b, F.last(c, ignorenulls=True).over(wb))
            .otherwise(F.first(c, ignorenulls=True).over(wf))
            .alias(c)
            for c in right_payload
        ]
        out = u.select(*keys, *left_only, F.col("__src"), *filled)
        return out.filter(F.col("__src") == 1).drop("__src")
    if direction == "backward":
        # right rows (__src=0) sort before left rows at the same __t,
        # so an exactly-equal right timestamp is inside the window
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__src").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = [F.last(c, ignorenulls=True).over(w).alias(c) for c in right_payload]
    else:
        # left rows first at equal __t so the following window sees an
        # exactly-equal right timestamp
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__src").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = [F.first(c, ignorenulls=True).over(w).alias(c) for c in right_payload]
    out = u.select(*keys, *left_only, F.col("__src"), *filled)
    return out.filter(F.col("__src") == 1).drop("__src")


def price_indices(
    base: DataFrame,
    current: DataFrame,
    key_col: str,
    price_col: str,
    qty_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Classic bilateral price indices (Laspeyres 1871, Paasche 1874,
    Fisher 1922) between a base and a current period — THE
    index-number toolkit for "did prices move, holding the basket
    fixed", and the deflator a revenue trend needs before it means
    anything:

        L = Σ p₁q₀ / Σ p₀q₀   (base-period basket)
        P = Σ p₁q₁ / Σ p₀q₁   (current-period basket)
        F = √(L·P)            (Fisher ideal; L ≥ F ≥ P typically —
                               substitution bias brackets the truth)

    Only keys present in BOTH periods enter (matched-model indexing,
    the standard practice; dropped counts are reported). Every Σpq
    is an exact DECIMAL sum of 6 dp-quantized per-row products; the
    three indices are ratios of those exact totals. ONE inner join on
    the key + one aggregate. Returns one row: (n_matched,
    n_base_only, n_current_only, laspeyres, paasche, fisher)."""
    b = base.select(
        F.col(key_col).alias("k"),
        F.col(price_col).cast("double").alias("p0"),
        F.col(qty_col).cast("double").alias("q0"),
    )
    c = current.select(
        F.col(key_col).alias("k"),
        F.col(price_col).cast("double").alias("p1"),
        F.col(qty_col).cast("double").alias("q1"),
    )
    matched = b.join(c, "k")
    n_b_only = b.join(c.select("k"), "k", "left_anti").count()
    n_c_only = c.join(b.select("k"), "k", "left_anti").count()
    dec = "decimal(38,6)"

    def _s(expr):
        return F.sum(F.round(expr, 6).cast(dec))

    agg = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        _s(F.col("p1") * F.col("q0")).alias("p1q0"),
        _s(F.col("p0") * F.col("q0")).alias("p0q0"),
        _s(F.col("p1") * F.col("q1")).alias("p1q1"),
        _s(F.col("p0") * F.col("q1")).alias("p0q1"),
    )
    lasp = F.col("p1q0").cast("double") / F.col("p0q0").cast("double")
    paas = F.col("p1q1").cast("double") / F.col("p0q1").cast("double")
    return agg.select(
        "n_matched",
        F.lit(n_b_only).cast("long").alias("n_base_only"),
        F.lit(n_c_only).cast("long").alias("n_current_only"),
        F.round(lasp, round_digits).alias("laspeyres"),
        F.round(paas, round_digits).alias("paasche"),
        F.round(F.sqrt(lasp * paas), round_digits).alias("fisher"),
    )


def interval_union_length(
    df: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Union length of possibly-overlapping [start, end] intervals per
    group — the sweep-line classic (total machine uptime from
    overlapping job runs, total listened-time from overlapping play
    sessions, covered-span of annotation highlights). Naive
    pairwise-overlap subtraction is O(n²) per group and wrong past
    two-way overlaps; the island construction is one sort:

        prev_max_end = max(end) over rows BEFORE this one (row frame)
        new island  ⟺ start > prev_max_end
        island_id    = running count of new-island flags
        union        = Σ_islands (max(end) − min(start))

    Scale shape: one (group, start) sort shuffle + one (group,
    island) aggregate + one group aggregate — no self-join, no
    explode. Returns per group: (group, n_intervals, n_islands,
    union_length, span_length, coverage_ratio) where span is
    max(end)−min(start) overall and coverage = union/span."""
    w_prev = (
        Window.partitionBy("g")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("g")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(start_col).cast("double").alias("s"),
        F.col(end_col).cast("double").alias("e"),
    )
    flagged = base.withColumn(
        "prev_max_e", F.max("e").over(w_prev)
    ).withColumn(
        "new_island",
        (
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))
        ).cast("int"),
    )
    islands = flagged.withColumn(
        "island_id", F.sum("new_island").over(w_run)
    )
    per_island = islands.groupBy("g", "island_id").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.min("s").alias("i_start"),
        F.max("e").alias("i_end"),
    )
    return (
        per_island.groupBy("g")
        .agg(
            F.sum("ni").cast("long").alias("n_intervals"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.round(
                F.sum(
                    F.round(F.col("i_end") - F.col("i_start"), 9).cast(
                        "decimal(28,9)"
                    )
                ).cast("double"),
                round_digits,
            ).alias("union_length"),
            F.round(F.max("i_end") - F.min("i_start"), round_digits).alias(
                "span_length"
            ),
        )
        .withColumn(
            "coverage_ratio",
            F.round(
                F.when(
                    F.col("span_length") > 0,
                    F.col("union_length") / F.col("span_length"),
                ),
                round_digits,
            ),
        )
        .select(
            F.col("g").alias("group"),
            "n_intervals",
            "n_islands",
            "union_length",
            "span_length",
            "coverage_ratio",
        )
    )
