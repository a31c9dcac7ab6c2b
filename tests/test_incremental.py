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
