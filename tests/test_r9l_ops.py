"""Round-9 wave-M operators: randomized response, fairness audit,
vocabulary coverage (Chao1/Good-Turing), ICC(1)."""

from __future__ import annotations

import math

import pytest


class TestRandomizedResponse:
    def _run(self, spark, rows, q=0.75):
        from azure_data_engineering_spark.operators.privacy import (
            randomized_response_estimate,
        )

        df = spark.createDataFrame(rows, "id long, flag boolean")
        return randomized_response_estimate(df, "id", "flag", q=q).collect()[0]

    def test_deconvolution_near_truth(self, spark):
        # true rate 0.3 over a big panel: estimate within a few SE
        rows = [(i, i % 10 < 3) for i in range(20000)]
        r = self._run(spark, rows)
        assert abs(r.true_p - 0.3) < 1e-9
        assert abs(r.estimated_p - r.true_p) < 4 * r.se + 1e-9

    def test_epsilon_formula(self, spark):
        rows = [(i, False) for i in range(100)]
        r = self._run(spark, rows, q=0.75)
        assert abs(r.epsilon - round(math.log(0.875 / 0.125), 6)) < 1e-6

    def test_deterministic(self, spark):
        rows = [(i, i % 2 == 0) for i in range(500)]
        a = self._run(spark, rows)
        b = self._run(spark, rows)
        assert a == b


class TestFairnessAudit:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.mlplan import fairness_audit

        df = spark.createDataFrame(rows, "g string, p int, y int")
        return {r.group: r for r in fairness_audit(df, "g", "p", "y").collect()}

    def test_perfectly_fair(self, spark):
        rows = []
        for g in ("a", "b"):
            rows += [(g, 1, 1)] * 4 + [(g, 0, 0)] * 6
        got = self._run(spark, rows)
        assert got["a"].dp_gap == 0.0 and got["a"].eo_gap == 0.0
        assert got["a"].di_ratio == 1.0
        assert got["a"].tpr == 1.0 and got["a"].fpr == 0.0

    def test_selection_gap_detected(self, spark):
        # group a selected at 0.8, group b at 0.2 -> dp_gap 0.6, DI 0.25
        rows = [("a", 1, 1)] * 8 + [("a", 0, 1)] * 2
        rows += [("b", 1, 1)] * 2 + [("b", 0, 1)] * 8
        got = self._run(spark, rows)
        assert abs(got["a"].dp_gap - 0.6) < 1e-9
        assert abs(got["a"].di_ratio - 0.25) < 1e-9
        # equal-opportunity gap = TPR gap = 0.6 here too
        assert abs(got["a"].eo_gap - 0.6) < 1e-9

    def test_empty_denominator_null(self, spark):
        rows = [("a", 1, 1), ("a", 0, 1)]  # no negatives -> fpr NULL
        got = self._run(spark, rows)
        assert got["a"].fpr is None


class TestVocabularyCoverage:
    def _run(self, spark, tokens):
        from azure_data_engineering_spark.operators.quality import vocabulary_coverage

        df = spark.createDataFrame([(t,) for t in tokens], "tok string")
        return vocabulary_coverage(df, "tok").collect()[0]

    def test_hand_computed(self, spark):
        # a a a b b c d -> D=4, f1=2 (c,d), f2=1 (b), N=7
        r = self._run(spark, ["a", "a", "a", "b", "b", "c", "d"])
        assert r.n_tokens == 7 and r.n_types == 4
        assert r.f1 == 2 and r.f2 == 1
        assert abs(r.chao1 - (4 + 4 / 2)) < 1e-9
        assert abs(r.coverage - (1 - 2 / 7)) < 1e-6

    def test_no_doubletons_bias_corrected(self, spark):
        r = self._run(spark, ["a", "b", "c"])  # all singletons, f2=0
        # chao1 = 3 + 3*2/2 = 6
        assert abs(r.chao1 - 6.0) < 1e-9

    def test_fully_saturated(self, spark):
        r = self._run(spark, ["a"] * 5 + ["b"] * 5)
        assert r.f1 == 0 and r.chao1 == 2.0 and r.coverage == 1.0


class TestIcc:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import icc_oneway

        df = spark.createDataFrame(rows, "g string, v double")
        return icc_oneway(df, "g", "v").collect()[0]

    def test_perfect_reliability(self, spark):
        # within-group variance 0, between-group variance > 0 -> ICC = 1
        rows = [("a", 1.0)] * 3 + [("b", 5.0)] * 3 + [("c", 9.0)] * 3
        r = self._run(spark, rows)
        assert abs(r.icc1 - 1.0) < 1e-9
        assert r.ms_ratio is None  # msw = 0 -> ratio undefined

    def test_no_group_effect_hits_floor(self, spark):
        # EXACTLY equal group means: SSB = 0, so ICC sits at its
        # theoretical floor -1/(k_bar - 1) = -0.5 (negative ICC =
        # between-variance below chance)
        rows = [(g, float(v)) for g in ("a", "b", "c") for v in (1, 2, 3)]
        r = self._run(spark, rows)
        assert abs(r.icc1 - (-0.5)) < 1e-9
        assert r.ms_ratio == 0.0

    def test_balanced_kbar(self, spark):
        rows = [(g, float(v)) for g in ("a", "b") for v in (1, 2, 3)]
        r = self._run(spark, rows)
        assert r.k_bar == 3.0 and r.n_groups == 2
