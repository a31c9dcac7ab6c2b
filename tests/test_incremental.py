"""Incremental rollup maintenance: sequential delta folds must equal
the full recompute exactly (ints) / within float tolerance."""

from __future__ import annotations

from azure_data_engineering_spark.operators.incremental import (
    finalize_avg,
    merge_partials,
    partial_agg,
)


class TestIncremental:
    MEASURES = {
        "n": ("count", "*"),
        "s": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }

    def test_three_delta_fold_equals_full(self, spark):
        rows = [(i % 4, i, float(i * 7 % 97)) for i in range(1000)]
        df = spark.createDataFrame(rows, "g int, i int, v double")
        full = {r["g"]: r for r in partial_agg(df, ["g"], self.MEASURES).collect()}

        rollup = partial_agg(df.filter("i < 250"), ["g"], self.MEASURES)
        for lo, hi in [(250, 600), (600, 900), (900, 1000)]:
            delta = partial_agg(df.filter(f"i >= {lo} AND i < {hi}"), ["g"], self.MEASURES)
            rollup = merge_partials(rollup, delta, ["g"], self.MEASURES)

        for r in rollup.collect():
            f = full[r["g"]]
            assert r["n"] == f["n"] and r["lo"] == f["lo"] and r["hi"] == f["hi"]
            assert abs(r["s"] - f["s"]) < 1e-6

    def test_new_group_in_delta(self, spark):
        base_df = spark.createDataFrame([(1, 10.0)], "g int, v double")
        delta_df = spark.createDataFrame([(2, 5.0), (2, 7.0)], "g int, v double")
        base = partial_agg(base_df, ["g"], self.MEASURES)
        delta = partial_agg(delta_df, ["g"], self.MEASURES)
        merged = finalize_avg(
            merge_partials(base, delta, ["g"], self.MEASURES), "avg", "s", "n"
        )
        out = {r["g"]: r for r in merged.collect()}
        assert out[2]["n"] == 2 and out[2]["avg"] == 6.0 and out[1]["avg"] == 10.0


class TestIncrementalJoinDelta:
    def test_cross_delta_counted_once(self, spark):
        """A delta order matching a delta customer must appear exactly
        once in dJ (the classic IVM double-count bug)."""
        from pyspark.sql import functions as F

        from azure_data_engineering_spark.operators.incremental import (
            incremental_join_delta,
        )

        a_old = spark.createDataFrame([(1, 100)], "oid long, k long")
        b_old = spark.createDataFrame([(100, "x")], "k long, tag string")
        a_delta = spark.createDataFrame([(2, 100), (3, 200)], "oid long, k long")
        b_delta = spark.createDataFrame([(200, "y")], "k long, tag string")
        d = incremental_join_delta(a_old, b_old, a_delta, b_delta, on=["k"])
        got = sorted((r.oid, r.tag) for r in d.collect())
        # delta rows: order 2 -> old cust 100; order 3 -> NEW cust 200
        # (cross term, once); old order 1 -> new cust 200: no key match
        assert got == [(2, "x"), (3, "y")]
        # stored view + delta == full recompute
        full = (
            a_old.unionByName(a_delta)
            .join(b_old.unionByName(b_delta), "k")
            .select("oid", "tag")
        )
        view = a_old.join(b_old, "k").select("oid", "tag").unionByName(
            d.select("oid", "tag")
        )
        assert sorted(map(tuple, view.collect())) == sorted(map(tuple, full.collect()))
