"""Driver-contract smoke tests (SURVEY.md §5 item 5)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    for key in entrymod.oracle_sql():
        assert key in qs, f"oracle key {key} missing from queries()"


def test_queries_are_callable(spark, sf_dir):
    # spot-run a representative sample end-to-end at sf0.001
    qs = entrymod.queries()
    for name in ["q_filter_project", "q_semi_join", "q_string_agg", "q_token_count"]:
        assert qs[name](spark, sf_dir).count() >= 0
