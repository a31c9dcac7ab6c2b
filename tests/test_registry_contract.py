"""Registry-wide output contract: every `queries()` entry must emit
SCALAR columns only.

The driver's correctness gate canonicalizes each result with a pandas
`sort_values` over the RAW cells; an array/map/struct column arrives as
numpy ndarrays / dicts, which pandas cannot factorize — the whole query
is recorded as an ERROR regardless of the values being right (this is
exactly how `q_bpe_encode` failed round 4 while every local artifact
showed it green, because tools/check_oracle.py `.tolist()`s arrays
before comparing). Complex intermediates are fine; the RETURNED frame
must stringify them (concat_ws / md5 / to_json) first.

This test walks the full registry at sf0.001 and asserts the contract
on the declared schema (cheap: building the plan is enough, no
execution of the final frame is required), so the class of failure can
never recur silently. check_oracle.py enforces the same rule at
runtime on the pandas frame (belt and braces)."""

from __future__ import annotations

from pyspark.sql import types as T

import __spark_entry__ as entrymod


def _complex_fields(schema):
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def test_all_registry_outputs_are_scalar(spark, sf_dir):
    violations = {}
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # building the plan should never raise
            failures[name] = repr(e)
            continue
        bad = _complex_fields(df.schema)
        if bad:
            violations[name] = bad
    assert not failures, f"queries raised while building their plan: {failures}"
    assert not violations, (
        "registry queries returning array/map/struct columns (the driver's "
        f"canonicalizer cannot hash these cells — stringify them): {violations}"
    )


def test_oracle_keys_subset_of_queries():
    """Every oracle entry must correspond to a registry query — a
    stale oracle key would silently never be checked."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs, f"orphan oracle entries: {sorted(os_ - qs)}"


def test_every_registry_query_documented_in_coverage():
    """SURVEY.md §2B / COVERAGE.md drift gate (the r10 and r11 verdicts
    both caught operators implemented and registry-green but invisible
    to the declared blueprint): every `queries()` key must appear in
    COVERAGE.md. New operators ship with their documentation row, not
    as a next-round cleanup item."""
    import pathlib

    cov = pathlib.Path(__file__).resolve().parent.parent / "COVERAGE.md"
    text = cov.read_text(encoding="utf-8")
    missing = sorted(q for q in entrymod.queries() if q not in text)
    assert not missing, (
        "registry queries absent from COVERAGE.md — add their operator "
        f"rows (and the SURVEY.md §2B sibling): {missing}"
    )
