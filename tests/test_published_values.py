"""Published worked-example fixtures for the closed-form stats family.

The Sobel lesson generalized (VERDICT r10 ask 4): the DuckDB oracle
replays the implementation's own formula, so for closed-form statistics
the correctness gate proves cross-engine REPLAYABILITY, not statistical
correctness. These tests pin each operator to a value that does NOT
come from this repo: a number published in the literature for a
published dataset, or a definition-level independent computation
(brute-force pair counting, hand-evaluated textbook formula) documented
inline. A formula bug that both the Spark plan and its oracle share
fails HERE.

Sources are cited per test. The survival-family fixtures use the
Freireich et al. (1963) 6-MP leukemia remission trial — the worked
example in essentially every survival textbook (Kleinbaum & Klein,
"Survival Analysis"; Klein & Moeschberger; Collett Table 1.1).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from azure_data_engineering_spark.operators import stats as st


# Freireich et al. (1963): 6-MP arm, 21 patients. Remission lengths in
# weeks; (duration, event) with event=1 = relapse, 0 = censored.
FREIREICH_6MP = [
    (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
    (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
    (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0),
]
# Placebo arm, 21 patients, no censoring.
FREIREICH_PLACEBO = [
    1, 1, 2, 2, 3, 4, 4, 5, 5, 8, 8, 8, 8, 11, 11, 12, 12, 15, 17, 22, 23,
]


def _surv_df(spark):
    return spark.createDataFrame(FREIREICH_6MP, "duration long, event int")


class TestKaplanMeierPublished:
    def test_freireich_6mp_survival_curve(self, spark):
        """Published product-limit estimates for the 6-MP arm
        (Kleinbaum & Klein ch.2 Table 2.10; Collett Table 2.2):
        S(6)=.857, S(7)=.807, S(10)=.753, S(13)=.690, S(16)=.627,
        S(22)=.538, S(23)=.448."""
        out = {
            r.duration: r
            for r in st.kaplan_meier(_surv_df(spark), "duration", "event").collect()
        }
        published = {
            6: 0.857, 7: 0.807, 10: 0.753, 13: 0.690,
            16: 0.627, 22: 0.538, 23: 0.448,
        }
        for t, s in published.items():
            assert abs(out[t].survival - s) < 0.0015, (t, out[t].survival)
        # the published risk-set sizes at the first two event times
        assert out[6].n_risk == 21 and out[6].n_events == 3
        assert out[7].n_risk == 17 and out[7].n_events == 1


class TestNelsonAalenPublished:
    def test_freireich_6mp_cumulative_hazard(self, spark):
        """Klein & Moeschberger Table 4.2 Nelson-Aalen estimates for
        the same arm: H(6)=.1429, H(7)=.2017, H(10)=.2683, H(13)=.3517,
        H(16)=.4426, H(22)=.5854, H(23)=.7521."""
        out = {
            r.duration: r.cum_hazard
            for r in st.nelson_aalen(_surv_df(spark), "duration", "event").collect()
        }
        published = {
            6: 0.1429, 7: 0.2017, 10: 0.2683, 13: 0.3517,
            16: 0.4426, 22: 0.5854, 23: 0.7521,
        }
        for t, h in published.items():
            assert abs(out[t] - h) < 0.0005, (t, out[t])


class TestLogrankPublished:
    def _df(self, spark):
        rows = [("6mp", d, e) for d, e in FREIREICH_6MP] + [
            ("placebo", d, 1) for d in FREIREICH_PLACEBO
        ]
        return spark.createDataFrame(rows, "arm string, duration long, event int")

    def test_gehan_two_group_logrank(self, spark):
        """The Gehan (1965) two-arm comparison: published log-rank
        chi-square = 16.79 with O(6-MP)=9 vs E(6-MP)=19.25 (Klein &
        Moeschberger Example 7.2; Kleinbaum & Klein ch.2)."""
        r = st.logrank_test(self._df(spark), "arm", "duration", "event").collect()[0]
        assert abs(r.chi2 - 16.79) < 0.05, r.chi2
        o1 = r.observed1 if r.group1 == "6mp" else (9 + 21 - r.observed1)
        e1 = r.expected1 if r.group1 == "6mp" else None
        assert o1 == 9
        if e1 is not None:
            assert abs(e1 - 19.25) < 0.05, e1
        assert r.p_value < 1e-3


class TestCoxPhPublished:
    def test_gehan_breslow_coefficient(self, spark):
        """Cox PH on the Gehan trial, treatment indicator x=1 for
        placebo: published Breslow-ties estimate β=1.509, SE=0.410
        (Klein & Moeschberger ch.8; Efron ties give 1.572 — this
        implementation uses Breslow, asserted within the bracket the
        two published values span)."""
        rows = [(float(d), e, 0.0) for d, e in FREIREICH_6MP] + [
            (float(d), 1, 1.0) for d in FREIREICH_PLACEBO
        ]
        df = spark.createDataFrame(rows, "t double, e int, x double")
        r = st.cox_ph_newton(df, "t", "e", "x", iterations=6).collect()[0]
        assert abs(r.beta - 1.509) < 0.02, r.beta
        assert 4.2 < r.hazard_ratio < 4.9, r.hazard_ratio
        assert 0.35 < r.se_beta < 0.48, r.se_beta
        assert r.p_value < 0.001


class TestAalenJohansenPublished:
    def test_single_cause_reduces_to_one_minus_km(self, spark):
        """Definition-level identity (Aalen & Johansen 1978): with a
        single failure cause the CIF equals 1 − KM, so the published
        Freireich survival values pin the CIF: CIF(23) = 1 − 0.448."""
        df = spark.createDataFrame(FREIREICH_6MP, "duration long, cause int")
        out = {
            r.dur: r.cif
            for r in st.aalen_johansen_cif(df, "duration", "cause").collect()
        }
        assert abs(out[23] - (1 - 0.448)) < 0.0015, out[23]
        assert abs(out[6] - (1 - 0.857)) < 0.0015, out[6]


class TestFleissKappaPublished:
    # The standard worked example (Fleiss 1971 structure; the table and
    # results as published in the widely-reproduced worked example):
    # 10 items, 14 raters, 5 categories; per-item category counts.
    TABLE = [
        (0, 0, 0, 0, 14),
        (0, 2, 6, 4, 2),
        (0, 0, 3, 5, 6),
        (0, 3, 9, 2, 0),
        (2, 2, 8, 1, 1),
        (7, 7, 0, 0, 0),
        (3, 2, 6, 3, 0),
        (2, 5, 3, 2, 2),
        (6, 5, 2, 1, 0),
        (0, 2, 2, 3, 7),
    ]

    def test_worked_example(self, spark):
        """Published results for the table: P̄=0.378, P̄e=0.213,
        κ=0.210."""
        rows = []
        for item, counts in enumerate(self.TABLE):
            for cat, n in enumerate(counts):
                rows.extend([(item, cat)] * n)
        df = spark.createDataFrame(rows, "item long, category long")
        r = st.fleiss_kappa(df, "item", "category", n_raters=14).collect()[0]
        assert abs(r.p_bar - 0.378) < 0.001, r.p_bar
        assert abs(r.p_e - 0.213) < 0.001, r.p_e
        assert abs(r.kappa - 0.210) < 0.001, r.kappa
        assert r.n_items == 10 and r.k_categories == 5


class TestCohensKappaPublished:
    def test_textbook_2x2(self, spark):
        """Cohen (1960) formula on the standard 2×2 teaching example
        a=20, b=5, c=10, d=15: p_o=0.7, p_e=0.5, κ=0.4 exactly."""
        from azure_data_engineering_spark.operators.mlplan import cohens_kappa

        cells = [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [
            ("n", "n")
        ] * 15
        df = spark.createDataFrame(cells, "a string, b string")
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert abs(r.p_o - 0.7) < 1e-9
        assert abs(r.p_e - 0.5) < 1e-9
        assert abs(r.kappa - 0.4) < 1e-9


class TestSrmMendelPublished:
    def test_mendel_f2_seed_shape(self, spark):
        """Mendel's F2 seed-shape data (5474 round, 1850 wrinkled)
        against the 3:1 design: χ²=0.263 (Fisher 1936's re-analysis of
        Mendel's data), p≈0.61 — no mismatch. Exercises the explicit
        expected_ratios path against a value that predates this repo
        by 160 years."""
        rows = [("round",)] * 5474 + [("wrinkled",)] * 1850
        df = spark.createDataFrame(rows, "phenotype string")
        r = st.srm_check(
            df, "phenotype", expected_ratios={"round": 0.75, "wrinkled": 0.25}
        ).collect()[0]
        assert abs(r.chi2 - 0.2629) < 0.002, r.chi2
        # Wilson-Hilferty at df=1 is approximate: the exact p is 0.608
        assert 0.55 < r.p_value < 0.66, r.p_value
        assert r.srm_flag == 0


class TestPearsonAnscombePublished:
    X = [10, 8, 13, 9, 11, 14, 6, 4, 12, 7, 5]
    Y1 = [8.04, 6.95, 7.58, 8.81, 8.33, 9.96, 7.24, 4.26, 10.84, 4.82, 5.68]

    def test_anscombe_set_one(self, spark):
        """Anscombe (1973) quartet set I: published r = 0.816."""
        df = spark.createDataFrame(
            list(zip(map(float, self.X), self.Y1)), "x double, y double"
        )
        r = st.pearson_matrix(df, ["x", "y"]).collect()[0]
        assert abs(r.corr - 0.816) < 0.001, r.corr


class TestKendallTauIndependent:
    def test_brute_force_pair_count_with_ties(self, spark):
        """Definition-level independent check: τ-b recomputed by an
        O(n²) pure-Python concordant/discordant/tie pair count
        (Kendall 1945 tie-corrected form) — shares nothing with the
        Spark plan or its oracle."""
        data = [
            (1.0, 2.0), (2.0, 1.0), (3.0, 3.0), (4.0, 3.0), (4.0, 5.0),
            (5.0, 4.0), (6.0, 6.0), (7.0, 8.0), (8.0, 7.0), (8.0, 8.0),
        ]
        n = len(data)
        c = d = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = data[i][0] - data[j][0]
                dy = data[i][1] - data[j][1]
                if dx == 0 and dy == 0:
                    tx += 1
                    ty += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif dx * dy > 0:
                    c += 1
                else:
                    d += 1
        n0 = n * (n - 1) // 2
        expected = (c - d) / ((n0 - tx) * (n0 - ty)) ** 0.5
        df = spark.createDataFrame(data, "x double, y double")
        r = st.kendall_tau_b(df, "x", "y").collect()[0]
        assert r.concordant == c and r.discordant == d
        assert abs(r.tau_b - expected) < 1e-6, (r.tau_b, expected)


class TestMannWhitneyIndependent:
    def test_brute_force_u(self, spark):
        """Definition-level check: U₁ = #{(i,j): x_i > y_j} + ties/2,
        counted by a pure-Python double loop."""
        xs = [1.0, 4.0, 4.0, 7.0, 9.0]
        ys = [2.0, 4.0, 5.0, 6.0]
        u1 = sum(
            1.0 if x > y else (0.5 if x == y else 0.0) for x in xs for y in ys
        )
        rows = [("a", v) for v in xs] + [("b", v) for v in ys]
        df = spark.createDataFrame(rows, "g string, v double")
        r = st.mann_whitney_u(df, "g", "v").collect()[0]
        got_u1 = r.u1 if r.group1 == "a" else len(xs) * len(ys) - r.u1
        assert abs(got_u1 - u1) < 1e-9, (got_u1, u1)
        auc_a = got_u1 / (len(xs) * len(ys))
        got_auc = r.auc if r.group1 == "a" else 1 - r.auc
        assert abs(got_auc - auc_a) < 1e-9


class TestWelchHandEvaluated:
    def test_welch_1947_formula_by_hand(self, spark):
        """Welch (1947) statistic hand-evaluated: x={1..5} (m=3,
        s²=2.5), y={2,4,6,8,10} (m=6, s²=10) → t = −3/√2.5 =
        −1.897367, ν = 6.25/(0.0625+1) = 5.882353."""
        rows = [("x", float(v)) for v in range(1, 6)] + [
            ("y", float(v)) for v in (2, 4, 6, 8, 10)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = st.welch_t_test(df, "g", "v").collect()[0]
        t = r.t_stat if r.group1 == "x" else -r.t_stat
        assert abs(t - (-1.897367)) < 1e-4, t
        assert abs(r.welch_df - 5.882353) < 1e-4, r.welch_df


class TestKruskalWallisHandEvaluated:
    def test_exact_h_no_ties(self, spark):
        """Kruskal & Wallis (1952) H hand-evaluated on {1,2},{3,4},
        {5,6}: ranks are the values, H = 12/(6·7)·(3²/2+7²/2+11²/2) −
        3·7 = 32/7 = 4.571429; no ties so H_corrected = H."""
        rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
                ("c", 5.0), ("c", 6.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = st.kruskal_wallis(df, "g", "v").collect()[0]
        assert abs(r.h_stat - 32.0 / 7.0) < 1e-6, r.h_stat
        assert abs(r.h_corrected - r.h_stat) < 1e-9


class TestAnovaHandEvaluated:
    def test_exact_f(self, spark):
        """One-way ANOVA hand-evaluated on (1,2,3),(4,5,6),(7,8,9):
        SSB=54 (df 2), SSW=6 (df 6) → F=27, η²=54/60=0.9."""
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 4.0), ("b", 5.0), ("b", 6.0),
                ("c", 7.0), ("c", 8.0), ("c", 9.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = st.anova_oneway(df, "g", "v").collect()[0]
        assert abs(r.f_stat - 27.0) < 1e-6, r.f_stat
        assert abs(r.eta_sq - 0.9) < 1e-9, r.eta_sq


class TestNormPpfPublished:
    def test_published_z_values(self, spark):
        """Published standard-normal quantiles (Abramowitz & Stegun
        Table 26.1 / every z-table): Φ⁻¹(0.975)=1.959964,
        Φ⁻¹(0.995)=2.575829, Φ⁻¹(0.5)=0."""
        df = spark.range(1).select(
            st.norm_ppf(F.lit(0.975)).alias("z975"),
            st.norm_ppf(F.lit(0.995)).alias("z995"),
            st.norm_ppf(F.lit(0.5)).alias("z50"),
        )
        r = df.collect()[0]
        assert abs(r.z975 - 1.959964) < 2e-4, r.z975
        assert abs(r.z995 - 2.575829) < 2e-4, r.z995
        assert abs(r.z50) < 1e-9


class TestBenfordPublished:
    def test_published_first_digit_shares(self, spark):
        """Newcomb (1881) / Benford (1938) first-digit law:
        P(1)=0.30103, P(2)=0.17609, P(9)=0.045757 — the exp_p column
        must carry the published log10(1+1/d) shares."""
        df = spark.createDataFrame(
            [(float(v),) for v in range(1, 200)], "v double"
        )
        out = {
            int(r.digit): r.exp_p
            for r in st.benford_digit_test(df, "v").collect()
        }
        assert abs(out[1] - 0.301030) < 1e-5
        assert abs(out[2] - 0.176091) < 1e-5
        assert abs(out[9] - 0.045757) < 1e-5


class TestWassersteinHandEvaluated:
    def test_point_masses(self, spark):
        """W₁ between point masses at 0 and 1 is exactly 1 (Vallender
        1974 closed form ∫|F−G|)."""
        rows = [("a", 0.0), ("a", 0.0), ("b", 1.0), ("b", 1.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = st.wasserstein_1d(df, "g", "v").collect()[0]
        assert abs(r.w1_distance - 1.0) < 1e-9
        assert abs(r.ks_stat - 1.0) < 1e-9
