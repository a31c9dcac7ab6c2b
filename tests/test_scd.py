"""SCD2 behavioral tests: change/close/open mechanics, new-key
insertion, idempotent re-apply, multi-generation history."""

from __future__ import annotations

from azure_data_engineering_spark.operators.scd import scd2_apply


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, attr string, valid_from string, valid_to string"
    )


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, attr string")


class TestScd2:
    def test_change_close_open_and_new_key(self, spark):
        cur = _dim(spark, [(1, "a", "2020-01-01", None), (2, "b", "2020-01-01", None)])
        upd = _snap(spark, [(1, "a2"), (2, "b"), (3, "c")])
        out = scd2_apply(cur, upd, ["k"], ["attr"], "2021-01-01")
        rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in out.collect()}
        assert rows == {
            (1, "a", "2020-01-01", "2021-01-01"),   # closed
            (1, "a2", "2021-01-01", None),           # reopened
            (2, "b", "2020-01-01", None),            # untouched no-op
            (3, "c", "2021-01-01", None),            # new key
        }

    def test_reapply_is_noop(self, spark):
        cur = _dim(spark, [(1, "a", "2020-01-01", None)])
        upd = _snap(spark, [(1, "a2")])
        once = scd2_apply(cur, upd, ["k"], ["attr"], "2021-01-01")
        twice = scd2_apply(once, upd, ["k"], ["attr"], "2022-01-01")
        assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))

    def test_three_generations(self, spark):
        cur = _dim(spark, [(1, "v1", "2020-01-01", None)])
        for i, (attr, eff) in enumerate([("v2", "2021-01-01"), ("v3", "2022-01-01")]):
            cur = scd2_apply(cur, _snap(spark, [(1, attr)]), ["k"], ["attr"], eff)
        rows = sorted((r["attr"], r["valid_from"], r["valid_to"]) for r in cur.collect())
        assert rows == [
            ("v1", "2020-01-01", "2021-01-01"),
            ("v2", "2021-01-01", "2022-01-01"),
            ("v3", "2022-01-01", None),
        ]

    def test_null_safe_change_detection(self, spark):
        cur = _dim(spark, [(1, None, "2020-01-01", None)])
        # NULL -> NULL is not a change; NULL -> value is
        same = scd2_apply(cur, _snap(spark, [(1, None)]), ["k"], ["attr"], "2021-01-01")
        assert same.count() == 1
        diff = scd2_apply(cur, _snap(spark, [(1, "x")]), ["k"], ["attr"], "2021-01-01")
        assert diff.count() == 2
