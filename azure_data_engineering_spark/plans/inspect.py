"""Physical-plan inspection helpers.

The 100 TB discipline is enforceable: a query that claims predicate
pushdown must show `PushedFilters` on its parquet scan, and a query
that must not cartesian-join must not contain a CartesianProduct.
These helpers turn `.explain("formatted")` into assertions used by the
plan-shape tests (tests/test_plans.py) and by bench reporting.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert some parquet scan in the plan pushed a filter mentioning
    `fragment` (column name etc.)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "PushedFilters: []" not in line:
            return
    raise AssertionError(f"no pushed filter mentioning {fragment!r}:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains CartesianProduct:\n{plan}")
