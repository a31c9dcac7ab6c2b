"""One-pass data-quality expectation checking (Deequ-style).

A lake pipeline should refuse to publish a table that violates its
contract; at 100 TB the check must not cost more than the write. The
design rule here: every column-level expectation folds into a SINGLE
aggregate pass over the table (one scan, map-side partials, one tiny
shuffle), and referential integrity adds exactly one left-anti join
per foreign key. Nothing collects to the driver — the report is
itself a (one-row) DataFrame.

Reference parity: the reference's only "validation" is Postgres
rejecting a bad COPY row (adffunction/__init__.py:168-176, caught and
stringified); this module is the declarative front door that makes
those failures pre-write and auditable.

Expectations supported (all composable in one ``check`` call):
- ``not_null(col)`` — count of NULLs must be 0;
- ``unique(cols)`` — (approx-free) exact duplicate-group count must
  be 0, computed as ``count(*) - count(distinct struct(cols))``;
- ``in_range(col, lo, hi)`` — count of out-of-range values must be 0;
- ``accepted_values(col, values)`` — count outside the set must be 0;
- ``matches(col, regex)`` — count of non-matching non-null strings
  must be 0;
- ``foreign_key(cols, dim_df, dim_cols)`` — orphan count via
  left-anti join must be 0 (dim side broadcast when small).

Each expectation contributes ``<name>_violations`` (long) and an
overall ``passed`` boolean ANDs them all.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    # aggregate expression producing a violation count (column-level
    # expectations), or None for join-based expectations
    agg: Column | None = None
    # (fact_cols, dim_df, dim_cols) for foreign-key expectations
    fk: tuple[list[str], DataFrame, list[str]] | None = None


@dataclass
class Suite:
    expectations: list[Expectation] = field(default_factory=list)

    def not_null(self, col: str) -> "Suite":
        self.expectations.append(
            Expectation(f"{col}_not_null", F.sum(F.col(col).isNull().cast("long")))
        )
        return self

    def unique(self, *cols: str) -> "Suite":
        key = F.struct(*[F.col(c) for c in cols])
        self.expectations.append(
            Expectation(
                "_".join(cols) + "_unique",
                F.count(F.lit(1)) - F.count_distinct(key),
            )
        )
        return self

    def in_range(self, col: str, lo, hi) -> "Suite":
        bad = ~F.col(col).between(F.lit(lo), F.lit(hi))
        self.expectations.append(
            Expectation(f"{col}_in_range", F.sum(F.coalesce(bad, F.lit(True)).cast("long")))
        )
        return self

    def accepted_values(self, col: str, values: list) -> "Suite":
        bad = ~F.col(col).isin(values)
        self.expectations.append(
            Expectation(f"{col}_accepted", F.sum(F.coalesce(bad, F.lit(True)).cast("long")))
        )
        return self

    def matches(self, col: str, regex: str) -> "Suite":
        bad = F.col(col).isNotNull() & ~F.col(col).rlike(regex)
        self.expectations.append(
            Expectation(f"{col}_matches", F.sum(bad.cast("long")))
        )
        return self

    def foreign_key(
        self, cols: list[str], dim: DataFrame, dim_cols: list[str], broadcast: bool = True
    ) -> "Suite":
        self.expectations.append(
            Expectation(
                "_".join(cols) + "_fk",
                fk=(cols, F.broadcast(dim) if broadcast else dim, dim_cols),
            )
        )
        return self


def check(df: DataFrame, suite: Suite) -> DataFrame:
    """Evaluate every expectation; returns a one-row DataFrame with a
    ``<name>_violations`` column per expectation plus ``passed``.

    All aggregate expectations share one scan. Each foreign key adds a
    left-anti join + count, unioned in via a cross join of one-row
    frames (cheap: every frame is a single row)."""
    aggs = [e.agg.cast("long").alias(f"{e.name}_violations") for e in suite.expectations if e.agg is not None]
    parts: list[DataFrame] = []
    if aggs:
        parts.append(df.agg(*aggs))
    for e in suite.expectations:
        if e.fk is None:
            continue
        cols, dim, dim_cols = e.fk
        cond = reduce(
            lambda a, b: a & b,
            [df[c] == dim[dc] for c, dc in zip(cols, dim_cols)],
        )
        orphans = df.join(dim, cond, "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias(f"{e.name}_violations")
        )
        parts.append(orphans)
    report = reduce(lambda a, b: a.crossJoin(b), parts)
    names = [f"{e.name}_violations" for e in suite.expectations]
    passed = reduce(lambda a, b: a & b, [F.col(n) == 0 for n in names])
    return report.withColumn("passed", passed)
