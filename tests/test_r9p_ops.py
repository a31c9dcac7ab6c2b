"""Round-9 wave-Q operators: IV Wald estimate, Sobel mediation, EWMA
control chart, distinct-n diversity."""

from __future__ import annotations

import math

import pytest


class TestIvWald:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import iv_wald_estimate

        df = spark.createDataFrame(rows, "z int, x double, y double")
        return iv_wald_estimate(df, "z", "x", "y").collect()[0]

    def test_recovers_structural_effect(self, spark):
        # x = 2 + z + confounder u; y = 3x + 5u: OLS is biased by u,
        # IV (z independent of u) recovers beta = 3
        rows = []
        for i in range(2000):
            z = i % 2
            u = (i % 7) - 3.0
            x = 2.0 + z + u
            y = 3.0 * x + 5.0 * u
            rows.append((z, x, y))
        r = self._run(spark, rows)
        assert abs(r.beta_iv - 3.0) < 0.2
        assert r.first_stage_f > 10  # strong instrument

    def test_wald_ratio_identity(self, spark):
        # beta_iv = (mean y|z=1 - mean y|z=0)/(mean x|z=1 - mean x|z=0)
        rows = [(0, 1.0, 10.0)] * 5 + [(1, 3.0, 16.0)] * 5
        r = self._run(spark, rows)
        assert abs(r.beta_iv - 3.0) < 1e-6
        # with balanced z, itt = cov(z,y)/var(z) = the full mean diff
        assert abs(r.itt - 6.0) < 1e-6

    def test_irrelevant_instrument_null(self, spark):
        rows = [(i % 2, 5.0, float(i % 3)) for i in range(100)]
        r = self._run(spark, rows)
        assert r.beta_iv is None  # cov(z, x) = 0


class TestMediationSobel:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.stats import mediation_sobel

        df = spark.createDataFrame(rows, "t double, m double, y double")
        return mediation_sobel(df, "t", "m", "y").collect()[0]

    def test_full_mediation(self, spark):
        # m = 2t + noise, y = 3m exactly: c' ~ 0, indirect ~ c
        rows = []
        for i in range(500):
            t = (i % 10) / 2.0
            m = 2.0 * t + ((i % 3) - 1.0) * 0.1
            y = 3.0 * m
            rows.append((t, m, y))
        r = self._run(spark, rows)
        assert abs(r.a - 2.0) < 0.05
        assert abs(r.b - 3.0) < 0.05
        assert abs(r.c_direct) < 0.05
        assert r.prop_mediated > 0.95
        assert r.p_value < 0.01

    def test_no_mediation(self, spark):
        # y depends on t directly; m is pure noise
        rows = []
        for i in range(500):
            t = (i % 10) / 2.0
            m = float((i * 7) % 11)
            y = 4.0 * t + ((i % 5) - 2.0) * 0.1
            rows.append((t, m, y))
        r = self._run(spark, rows)
        assert abs(r.indirect) < 0.1
        assert abs(r.c_direct - 4.0) < 0.1
        # the pure-noise mediator must NOT be significant — this is the
        # assertion that catches a sqrt(n)-inflated Sobel z (numpy
        # cross-check: z = -0.057, p = 0.955)
        assert r.p_value > 0.5
        assert abs(r.sobel_z) < 1.0

    def test_moderate_mediation_z_band(self, spark):
        # m = 0.5t + noise, y = 0.5m + 0.5t + noise: a real but partial
        # indirect path. numpy cross-check of the corrected SEs gives
        # sobel_z = 9.366; the pre-fix formula would report z ~ 209.
        rows = []
        for i in range(500):
            t = (i % 10) / 2.0
            m = 0.5 * t + float((i * 7) % 11) / 3.0
            y = 0.5 * m + 0.5 * t + float((i * 13) % 7) / 2.0
            rows.append((t, m, y))
        r = self._run(spark, rows)
        assert abs(r.a - 0.5133) < 0.01
        assert abs(r.b - 0.4994) < 0.01
        assert 5.0 < r.sobel_z < 15.0
        assert r.p_value < 0.01

    def test_decomposition_identity(self, spark):
        rows = []
        for i in range(300):
            t = float(i % 7)
            m = 1.5 * t + float((i * 3) % 5)
            y = 2.0 * m + 1.0 * t + float((i * 11) % 3)
            rows.append((t, m, y))
        r = self._run(spark, rows)
        # c = c' + a*b exactly (OLS identity)
        assert abs(r.c_total - (r.c_direct + r.indirect)) < 1e-4


class TestEwmaChart:
    def _run(self, spark, vals, lam=0.2):
        from azure_data_engineering_spark.operators.timeseries import ewma_control_chart

        rows = [(f"d{i:03d}", float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "tk string, x double")
        return ewma_control_chart(df, "tk", "x", lam=lam).collect()

    def test_matches_recursive_ewma(self, spark):
        vals = [10.0, 12, 9, 11, 30, 10, 8]
        out = self._run(spark, vals)
        mu = sum(vals) / len(vals)
        z = mu
        for r, x in zip(out, vals):
            z = 0.2 * x + 0.8 * z
            assert abs(r.ewma - z) < 1e-4, (r.t_index, r.ewma, z)

    def test_constant_series_no_breach(self, spark):
        out = self._run(spark, [5.0] * 20)
        assert all(not r.breach for r in out)
        assert all(abs(r.ewma - 5.0) < 1e-9 for r in out)

    def test_limits_widen_then_plateau(self, spark):
        out = self._run(spark, [float(10 + (i % 5)) for i in range(30)])
        widths = [r.ucl - r.lcl for r in out]
        assert widths[1] > widths[0] * 0.99 and widths[1] >= widths[0]
        # asymptotic width: ratio of last two ~ 1
        assert abs(widths[-1] - widths[-2]) < 1e-3

    def test_shift_breaches(self, spark):
        # phase-I baseline includes the shifted tail, so the shift has
        # to clear the inflated sigma: alternate 9/10/11 then jump to 16
        vals = [float(9 + i % 3) for i in range(24)] + [16.0] * 6
        out = self._run(spark, vals)
        assert any(r.breach for r in out[24:])


class TestDistinctN:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.quality import distinct_n_diversity

        df = spark.createDataFrame(rows, "g string, text string")
        return {r.group: r for r in distinct_n_diversity(df, "text", "g").collect()}

    def test_all_unique_ratio_one(self, spark):
        rows = [("s", "alpha beta gamma delta epsilon")]
        r = self._run(spark, rows)["s"]
        assert r.distinct_1 == 1.0 and r.distinct_2 == 1.0 and r.distinct_3 == 1.0

    def test_mode_collapse_low(self, spark):
        rows = [("s", "the cat sat")] * 10
        r = self._run(spark, rows)["s"]
        assert r.n_tokens == 30
        assert abs(r.distinct_1 - 3 / 30) < 1e-6
        assert abs(r.distinct_2 - 2 / 20) < 1e-6

    def test_cross_document_sameness(self, spark):
        # two docs with identical text: distinct-n halves vs one doc
        rows = [("a", "one two three four"), ("a", "one two three four")]
        r = self._run(spark, rows)["a"]
        assert abs(r.distinct_1 - 0.5) < 1e-6

    def test_short_group_survives_with_nulls(self, spark):
        # a group whose docs all have < 2 tokens has no 2/3-gram rows;
        # it must still appear (left join) with NULL distinct_2/3
        rows = [("tiny", "hello"), ("tiny", "world"), ("big", "a b c d")]
        out = self._run(spark, rows)
        assert set(out) == {"tiny", "big"}
        t = out["tiny"]
        assert t.n_tokens == 2 and t.distinct_1 == 1.0
        assert t.distinct_2 is None and t.distinct_3 is None
        assert out["big"].distinct_2 == 1.0

    def test_two_token_group_null_distinct_3_only(self, spark):
        rows = [("g", "alpha beta")]
        r = self._run(spark, rows)["g"]
        assert r.distinct_2 == 1.0
        assert r.distinct_3 is None
