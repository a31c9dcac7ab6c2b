"""Round-9 wave-F operators: Kruskal-Wallis H, Fleiss' kappa,
threshold average precision, l-diversity audit."""

from __future__ import annotations

import math

import pytest


class TestKruskalWallis:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import kruskal_wallis

        df = spark.createDataFrame(rows, "g string, v double")
        return kruskal_wallis(df, "g", "v").collect()[0]

    def test_identical_groups_h_zero(self, spark):
        rows = [("a", float(v)) for v in range(1, 7)] + [
            ("b", float(v)) for v in range(1, 7)
        ]
        r = self._run(spark, rows)
        assert r.k_groups == 2 and r.n == 12
        assert abs(r.h_corrected) < 1e-9
        assert r.p_value > 0.5

    def test_matches_scipy_convention(self, spark):
        # hand-computed: groups fully separated -> near-maximal H
        rows = [("a", float(v)) for v in (1, 2, 3)] + [
            ("b", float(v)) for v in (10, 11, 12)
        ] + [("c", float(v)) for v in (20, 21, 22)]
        r = self._run(spark, rows)
        # ranks 1..9, no ties: H = 12/(9*10) * (6^2+15^2+24^2)/3 - 3*10
        h = 12.0 / 90.0 * ((6**2 + 15**2 + 24**2) / 3.0) - 30.0
        assert abs(r.h_stat - round(h, 6)) < 1e-6
        assert r.p_value < 0.05

    def test_tie_correction_applied(self, spark):
        rows = [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 3.0), ("b", 3.0)]
        r = self._run(spark, rows)
        # ties present -> corrected H strictly larger than raw H
        assert r.h_corrected > r.h_stat

    def test_all_values_tied_null_not_nan(self, spark):
        # single distinct value: tie3 = n^3 - n so the correction is 0/0;
        # the guard must emit NULL (not NaN) for h_corrected and p_value
        rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 4
        r = self._run(spark, rows)
        assert r.h_corrected is None
        assert r.p_value is None
        assert abs(r.h_stat) < 1e-9


class TestFleissKappa:
    def _run(self, spark, ratings, n_raters):
        from azure_data_engineering_spark.operators.stats import fleiss_kappa

        df = spark.createDataFrame(ratings, "item long, cat string")
        return fleiss_kappa(df, "item", "cat", n_raters=n_raters).collect()[0]

    def test_perfect_agreement(self, spark):
        ratings = [(i, "x" if i % 2 else "y") for i in range(10) for _ in range(3)]
        r = self._run(spark, ratings, 3)
        assert r.n_items == 10 and r.kappa == 1.0

    def test_fleiss_worked_example(self, spark):
        # Fleiss (1971)-style hand check on a tiny panel: 4 items,
        # 3 raters, 2 categories; pure-python reference below.
        panel = {1: ["a", "a", "a"], 2: ["a", "a", "b"], 3: ["b", "b", "b"], 4: ["a", "b", "b"]}
        ratings = [(i, c) for i, cats in panel.items() for c in cats]
        n, big_n = 3, 4
        p_i = []
        from collections import Counter

        cj = Counter()
        for cats in panel.values():
            cnt = Counter(cats)
            cj.update(cnt)
            p_i.append((sum(v * v for v in cnt.values()) - n) / (n * (n - 1)))
        p_bar = sum(p_i) / big_n
        p_e = sum((v / (big_n * n)) ** 2 for v in cj.values())
        kappa = (p_bar - p_e) / (1 - p_e)
        r = self._run(spark, ratings, 3)
        assert abs(r.p_bar - round(p_bar, 6)) < 1e-6
        assert abs(r.kappa - round(kappa, 6)) < 1e-6

    def test_ragged_items_excluded(self, spark):
        ratings = [(1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "b")]  # item 2 has n=2
        r = self._run(spark, ratings, 3)
        assert r.n_items == 1


class TestAveragePrecision:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.mlplan import average_precision

        df = spark.createDataFrame(rows, "s double, y int")
        return average_precision(df, "s", "y").collect()[0]

    def test_perfect_ranking(self, spark):
        rows = [(3.0, 1), (2.0, 1), (1.0, 0), (0.5, 0)]
        r = self._run(spark, rows)
        assert r.ap == 1.0 and r.n_pos == 2

    def test_sklearn_threshold_definition(self, spark):
        # scores all distinct: AP = sum over positives of P@k * (1/n_pos)
        rows = [(4.0, 0), (3.0, 1), (2.0, 0), (1.0, 1)]
        ap = (1 / 2) * (1 / 2) + (1 / 2) * (2 / 4)
        r = self._run(spark, rows)
        assert abs(r.ap - round(ap, 6)) < 1e-6

    def test_tie_block_single_threshold(self, spark):
        # one tied block with 1 pos + 1 neg enters as ONE threshold:
        # contribution (1/1) * (1/2), never the optimistic within-tie order
        rows = [(1.0, 1), (1.0, 0)]
        r = self._run(spark, rows)
        assert abs(r.ap - 0.5) < 1e-9


class TestLDiversity:
    def _run(self, spark, rows, l=3):
        from azure_data_engineering_spark.operators.privacy import l_diversity_audit

        df = spark.createDataFrame(rows, "q string, sv string")
        return l_diversity_audit(df, ["q"], "sv", l=l).collect()[0]

    def test_homogeneous_class_flagged(self, spark):
        rows = [("g1", "x")] * 5 + [("g2", "a"), ("g2", "b"), ("g2", "c")]
        r = self._run(spark, rows)
        assert r.min_distinct_l == 1
        assert r.classes_below_l == 1 and r.rows_below_l == 5
        assert abs(r.min_entropy_l - 1.0) < 1e-6  # exp(0) for the pure class

    def test_entropy_l_below_distinct_l_under_skew(self, spark):
        rows = [("g", "x")] * 8 + [("g", "y"), ("g", "z")]
        r = self._run(spark, rows)
        assert r.min_distinct_l == 3
        p = [0.8, 0.1, 0.1]
        ent = math.exp(-sum(round(pi * math.log(pi), 9) for pi in p))
        assert abs(r.min_entropy_l - round(ent, 6)) < 1e-5
        assert r.min_entropy_l < 3.0

    def test_uniform_entropy_equals_distinct(self, spark):
        rows = [("g", c) for c in ("a", "b", "c", "d")]
        r = self._run(spark, rows, l=2)
        assert r.min_distinct_l == 4
        assert abs(r.min_entropy_l - 4.0) < 1e-5
        assert r.rows_below_l == 0
