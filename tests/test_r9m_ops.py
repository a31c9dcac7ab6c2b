"""Round-9 wave-N operators: KM Greenwood bands, Kendall's W/Friedman,
Gumbel block maxima, referential-integrity profile."""

from __future__ import annotations

import math

import pytest


class TestKmGreenwood:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import kaplan_meier_greenwood

        df = spark.createDataFrame(rows, "duration long, ev int")
        return {r.duration: r for r in kaplan_meier_greenwood(df, "duration", "ev").collect()}

    def test_hand_computed_greenwood(self, spark):
        # 4 subjects, 2 events at t=10 of 4 at risk: S = 0.5,
        # V = S^2 * (2/(4*2)) = 0.0625 -> se = 0.25
        rows = [(10, 1), (10, 1), (20, 0), (20, 0)]
        got = self._run(spark, rows)
        r = got[10]
        assert abs(r.survival - 0.5) < 1e-9
        assert abs(r.se - 0.25) < 1e-9
        assert abs(r.lo - max(0.0, 0.5 - 1.959964 * 0.25)) < 1e-5
        assert abs(r.hi - min(1.0, 0.5 + 1.959964 * 0.25)) < 1e-5

    def test_dead_curve_null_bands(self, spark):
        rows = [(5, 1), (5, 1)]  # everyone dies at t=5: survival 0
        got = self._run(spark, rows)
        assert got[5].survival == 0.0 and got[5].se is None

    def test_bands_clip_to_unit(self, spark):
        rows = [(10, 1)] + [(20, 0)] * 20  # tiny variance, S near 1
        got = self._run(spark, rows)
        for r in got.values():
            if r.lo is not None:
                assert 0.0 <= r.lo <= r.hi <= 1.0


class TestKendallsW:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import kendalls_w_friedman

        df = spark.createDataFrame(rows, "j string, item long, v double")
        return kendalls_w_friedman(df, "j", "item", "v").collect()[0]

    def test_perfect_concordance(self, spark):
        rows = [(j, i, float(i * 10 + 1)) for j in ("a", "b", "c") for i in range(1, 6)]
        r = self._run(spark, rows)
        assert r.w == 1.0 and r.p_value < 0.05

    def test_textbook_example(self, spark):
        # Kendall's classic: 3 judges, 4 items with rank matrices
        ranks = {"a": [1, 2, 3, 4], "b": [1, 3, 2, 4], "c": [2, 1, 3, 4]}
        rows = []
        for j, rk in ranks.items():
            for i, v in enumerate(rk):
                rows.append((j, i, float(v)))
        r = self._run(spark, rows)
        # rank sums: 4, 6, 8, 12; mean 7.5 -> ssdev = 12.25+2.25+0.25+20.25 = 35
        # W = 12*35 / (9*(64-4)) = 420/540
        assert abs(r.w - round(420 / 540, 6)) < 1e-6

    def test_incomplete_panel_raises(self, spark):
        from azure_data_engineering_spark.operators.stats import kendalls_w_friedman

        rows = [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 1.0)]
        df = spark.createDataFrame(rows, "j string, item long, v double")
        with pytest.raises(ValueError):
            kendalls_w_friedman(df, "j", "item", "v")


class TestGumbelMaxima:
    def _run(self, spark, rows, T=100.0):
        from azure_data_engineering_spark.operators.stats import gumbel_block_maxima

        df = spark.createDataFrame(rows, "g string, b string, v double")
        return {
            r.group: r
            for r in gumbel_block_maxima(df, "g", "b", "v", return_period=T).collect()
        }

    def test_moments_formula(self, spark):
        # blocks with maxima 10, 20, 30: mean 20, sd 10
        rows = [("g", "b1", 10.0), ("g", "b2", 20.0), ("g", "b3", 30.0)]
        r = self._run(spark, rows)["g"]
        beta = 10.0 * math.sqrt(6.0) / math.pi
        mu = 20.0 - 0.5772156649015329 * beta
        rl = mu + beta * (-math.log(-math.log(1 - 1 / 100)))
        assert abs(r.beta - round(beta, 6)) < 1e-5
        assert abs(r.mu - round(mu, 6)) < 1e-5
        assert abs(r.return_level - round(rl, 6)) < 1e-4

    def test_block_max_not_values(self, spark):
        # many small values inside a block must not move the maxima fit
        rows = [("g", "b1", v) for v in (1.0, 2.0, 50.0)] + [("g", "b2", 60.0)]
        r = self._run(spark, rows)["g"]
        assert r.n_blocks == 2 and abs(r.mean_max - 55.0) < 1e-9

    def test_return_level_grows_with_period(self, spark):
        rows = [("g", f"b{i}", float(10 + i)) for i in range(10)]
        short = self._run(spark, rows, T=10.0)["g"].return_level
        long = self._run(spark, rows, T=1000.0)["g"].return_level
        assert long > short


class TestRefIntegrity:
    def _run(self, spark, child_rows, parent_rows):
        from azure_data_engineering_spark.operators.profiling import (
            referential_integrity_profile,
        )

        child = spark.createDataFrame(child_rows, "fk long")
        parent = spark.createDataFrame(parent_rows, "pk long")
        return referential_integrity_profile([("t", child, "fk", parent, "pk")]).collect()[0]

    def test_clean_constraint(self, spark):
        r = self._run(spark, [(1,), (2,), (2,)], [(1,), (2,)])
        assert r.orphan_children == 0 and r.orphan_pct == 0.0
        assert r.dup_parent_keys == 0 and r.childless_parents == 0

    def test_orphans_and_nulls(self, spark):
        r = self._run(spark, [(1,), (99,), (None,)], [(1,), (2,)])
        assert r.orphan_children == 1
        assert r.null_fk == 1
        # orphan_pct over non-null children: 1/2
        assert abs(r.orphan_pct - 0.5) < 1e-9
        assert r.childless_parents == 1  # pk=2 unreferenced

    def test_duplicate_parents_flagged(self, spark):
        r = self._run(spark, [(1,)], [(1,), (1,), (2,)])
        assert r.dup_parent_keys == 1
