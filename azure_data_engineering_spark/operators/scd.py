"""Slowly-changing-dimension Type 2 maintenance.

The reference's upsert (SharedCode/PGHelperFunction.py:36-77)
overwrites matched rows — Type 1, history lost. Warehouses that feed
time-aware analytics keep Type 2 instead: every attribute change
closes the current row (sets ``valid_to``) and opens a new one, so
an as-of join against the dimension reconstructs what was true when
a fact happened.

Scale shape: ONE full-outer shuffle join between the open slice of
the dimension and the update snapshot (both hashed on the business
key), then pure column logic and unions — no window over the whole
history, no driver round-trip. The closed slice streams through
untouched, so cost tracks |open| + |updates|, not |history|.

Determinism: change detection is null-safe equality (`eqNullSafe`)
over the tracked columns; rows with no attribute change are kept,
not rewritten, so applying the same snapshot twice is a no-op
(idempotent refresh).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Fold an update snapshot into an SCD2 dimension.

    ``current`` carries ``keys + tracked + [valid_from, valid_to]``
    (``valid_to`` NULL = open row). ``updates`` carries
    ``keys + tracked``; ``effective`` is the snapshot's effective
    timestamp (string or Column literal) stamped on closes and opens.

    Returns the full new history table with the same schema as
    ``current``."""
    eff = F.lit(effective) if isinstance(effective, str) else effective
    open_cur = current.filter(F.col(valid_to).isNull())
    closed_cur = current.filter(F.col(valid_to).isNotNull())

    c = open_cur.alias("c")
    u = updates.alias("u")
    on = reduce(lambda a, b: a & b, [F.col(f"c.{k}") == F.col(f"u.{k}") for k in keys])
    j = c.join(u, on, "full_outer")

    in_cur = F.col(f"c.{keys[0]}").isNotNull()
    in_upd = F.col(f"u.{keys[0]}").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"c.{t}").eqNullSafe(F.col(f"u.{t}")) for t in tracked],
    )
    changed = in_cur & in_upd & ~same

    # surviving version of the previously-open row: closed if changed
    kept = j.filter(in_cur).select(
        *[F.col(f"c.{k}").alias(k) for k in keys],
        *[F.col(f"c.{t}").alias(t) for t in tracked],
        F.col(f"c.{valid_from}").alias(valid_from),
        F.when(changed, eff).otherwise(F.col(f"c.{valid_to}")).alias(valid_to),
    )
    # newly-opened rows: changed attributes or brand-new keys
    opened = j.filter((changed) | (in_upd & ~in_cur)).select(
        *[F.col(f"u.{k}").alias(k) for k in keys],
        *[F.col(f"u.{t}").alias(t) for t in tracked],
        eff.alias(valid_from),
        F.lit(None).cast(open_cur.schema[valid_to].dataType).alias(valid_to),
    )
    return closed_cur.select(kept.columns).unionByName(kept).unionByName(opened)


def bitemporal_asof(
    log: DataFrame,
    pk_cols: list[str],
    valid_from_col: str,
    tx_col: str,
    valid_at,
    known_at,
) -> DataFrame:
    """BITEMPORAL as-of query over an append-only correction log —
    the two-clock question scd2_apply's single valid-time axis cannot
    answer: "what did we BELIEVE at transaction time T was effective
    at valid time V?" (Snodgrass, "Developing Time-Oriented Database
    Applications"; the audit/restatement primitive: late-arriving
    corrections rewrite history without destroying what was reported
    at the time).

    `log` rows are assertions: (pk, valid_from, tx, attributes...) —
    "as of transaction time `tx`, the entity's state effective from
    `valid_from` is these attributes". The query:

      1. keep assertions with tx ≤ known_at (what was known at T);
      2. per (pk, valid_from): the LATEST tx wins (corrections
         supersede earlier assertions about the same effective date);
      3. per pk: the largest valid_from ≤ valid_at wins (the version
         effective at V).

    Two windows over the pk-hashed log — no interval materialization,
    no self-join; cost tracks |log|, and both windows reuse ONE
    partitioning by pk. Returns one row per pk visible at (V, T) with
    all attribute columns plus (valid_from, tx).

    Determinism contract: (pk, valid_from, tx) SHOULD be unique — a
    transaction asserting two different states for the same effective
    date at the same instant is a contradiction. If duplicates do
    occur, the winner is total-ordered by a payload digest (md5 over
    the remaining attribute columns in sorted-name order, NULLs
    sentinel-coded) so the result is identical across runs,
    partitionings, and engines — never Spark's arbitrary
    within-partition arrival order."""
    vf, tx = F.col(valid_from_col), F.col(tx_col)
    known = log.filter(tx <= F.lit(known_at))
    keyed = set(pk_cols) | {valid_from_col, tx_col}
    payload_cols = sorted(c for c in log.columns if c not in keyed)
    tiebreak = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in payload_cols
            ],
        )
    )
    w_corr = Window.partitionBy(*pk_cols, valid_from_col).orderBy(
        tx.desc(), tiebreak.asc()
    )
    latest_belief = known.withColumn(
        "__rn", F.row_number().over(w_corr)
    ).filter(F.col("__rn") == 1)
    effective = latest_belief.filter(vf <= F.lit(valid_at))
    w_eff = Window.partitionBy(*pk_cols).orderBy(vf.desc())
    return (
        effective.withColumn("__rk", F.row_number().over(w_eff))
        .filter(F.col("__rk") == 1)
        .drop("__rn", "__rk")
    )
