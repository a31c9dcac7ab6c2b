"""Round-9 wave-B operators: Welch's t-test, Mann-Whitney U,
difference-in-differences, Qini uplift deciles."""

from __future__ import annotations

import math

import pytest


class TestWelchT:
    def test_against_hand_computed(self, spark):
        from azure_data_engineering_spark.operators.stats import welch_t_test

        a = [3.1, 2.9, 3.4, 3.0, 3.3, 2.8, 3.2, 3.5]
        b = [2.5, 2.7, 2.6, 2.9, 2.4, 2.8]
        df = spark.createDataFrame(
            [("t", v) for v in a] + [("c", v) for v in b], "g string, v double"
        )
        r = welch_t_test(df, "g", "v").collect()[0]
        # groups sort: c first -> t = (mean_c - mean_t)/se = -4.330127
        assert r.group1 == "c" and r.group2 == "t"
        assert r.n1 == 6 and r.n2 == 8
        assert r.t_stat == pytest.approx(-4.330127, abs=1e-5)
        assert r.welch_df == pytest.approx(11.97861, abs=1e-4)
        assert r.p_value == pytest.approx(1.5e-05, abs=1e-4)

    def test_identical_groups(self, spark):
        from azure_data_engineering_spark.operators.stats import welch_t_test

        rows = [("a", float(i % 5)) for i in range(50)] + [
            ("b", float(i % 5)) for i in range(50)
        ]
        r = welch_t_test(spark.createDataFrame(rows, "g string, v double"), "g", "v").collect()[0]
        assert r.t_stat == pytest.approx(0.0, abs=1e-9)
        assert r.p_value == pytest.approx(1.0, abs=1e-4)

    def test_rejects_three_groups(self, spark):
        from azure_data_engineering_spark.operators.stats import welch_t_test

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("c", 3.0)], "g string, v double"
        )
        with pytest.raises(ValueError):
            welch_t_test(df, "g", "v")


class TestMannWhitney:
    def test_against_hand_computed_with_ties(self, spark):
        from azure_data_engineering_spark.operators.stats import mann_whitney_u

        x = [1.0, 2.0, 2.0, 3.0, 5.0]
        y = [2.0, 4.0, 4.0, 6.0]
        df = spark.createDataFrame(
            [("x", v) for v in x] + [("y", v) for v in y], "g string, v double"
        )
        r = mann_whitney_u(df, "g", "v").collect()[0]
        assert r.group1 == "x"
        assert float(r.u1) == pytest.approx(5.0)
        assert r.auc == pytest.approx(0.25)
        assert r.z_stat == pytest.approx(-1.251086, abs=1e-5)
        assert r.p_value == pytest.approx(0.210903, abs=1e-4)

    def test_auc_matches_roc_auc(self, spark):
        from azure_data_engineering_spark.operators.stats import mann_whitney_u, roc_auc

        rows = [((i * 7) % 3 == 0, float((i * 13) % 17)) for i in range(60)]
        df = spark.createDataFrame(
            [("pos" if lab else "neg", v) for lab, v in rows], "g string, v double"
        )
        mw = mann_whitney_u(df, "g", "v").collect()[0]
        scored = spark.createDataFrame(
            [(v, 1 if lab else 0) for lab, v in rows], "score double, label int"
        )
        auc = roc_auc(scored, "score", "label").collect()[0].auc
        # group1 = "neg": U1/(n1 n2) is P(neg > pos) = 1 - AUC(pos)
        assert float(mw.auc) == pytest.approx(1.0 - float(auc), abs=1e-6)

    def test_perfect_separation_significant(self, spark):
        from azure_data_engineering_spark.operators.stats import mann_whitney_u

        rows = [("lo", float(i)) for i in range(30)] + [
            ("hi", float(100 + i)) for i in range(30)
        ]
        r = mann_whitney_u(spark.createDataFrame(rows, "g string, v double"), "g", "v").collect()[0]
        assert r.p_value < 1e-6
        assert r.auc in (0.0, 1.0)


class TestDiD:
    def test_known_effect_recovered(self, spark):
        from azure_data_engineering_spark.operators.stats import did_estimate

        rows = []
        for i in range(40):
            base = float(i % 5)
            rows.append((0, 0, 10.0 + base))          # control pre
            rows.append((0, 1, 12.0 + base))          # control post: +2 trend
            rows.append((1, 0, 11.0 + base))          # treated pre
            rows.append((1, 1, 16.0 + base))          # treated post: +2 trend +3 effect
        df = spark.createDataFrame(rows, "tr int, po int, v double")
        r = did_estimate(df, "tr", "po", "v").collect()[0]
        assert r.did == pytest.approx(3.0, abs=1e-9)
        assert r.mean_c_pre == pytest.approx(12.0)
        assert r.mean_t_post == pytest.approx(18.0)
        assert r.p_value < 1e-6

    def test_no_effect_is_noise(self, spark):
        from azure_data_engineering_spark.operators.stats import did_estimate

        rows = []
        for i in range(50):
            noise = float((i * 7) % 11) / 10.0
            for tr in (0, 1):
                for po in (0, 1):
                    rows.append((tr, po, 5.0 + 2.0 * po + noise))
        df = spark.createDataFrame(rows, "tr int, po int, v double")
        r = did_estimate(df, "tr", "po", "v").collect()[0]
        assert r.did == pytest.approx(0.0, abs=1e-9)
        assert r.p_value == pytest.approx(1.0, abs=1e-4)


class TestQini:
    def test_final_decile_is_overall_incremental(self, spark):
        from azure_data_engineering_spark.operators.features import qini_uplift_deciles

        rows = []
        for i in range(200):
            score = float((i * 37) % 100)
            treated = i % 2
            persuadable = score >= 70
            outcome = 1 if (treated and persuadable) or (i % 10 == 0) else 0
            rows.append((score, treated, outcome))
        df = spark.createDataFrame(rows, "score double, tr int, y int")
        out = qini_uplift_deciles(df, "score", "tr", "y").collect()
        last = [r for r in out if r.decile == max(x.decile for x in out)][0]
        rt = sum(r[2] for r in rows if r[1] == 1)
        rc = sum(r[2] for r in rows if r[1] == 0)
        nt = sum(1 for r in rows if r[1] == 1)
        nc = len(rows) - nt
        # cumulative at the last decile covers everything
        assert float(last.qini) == pytest.approx(rt - rc * nt / nc, abs=1e-6)

    def test_perfect_targeting_front_loads_qini(self, spark):
        from azure_data_engineering_spark.operators.features import qini_uplift_deciles

        rows = []
        for i in range(400):
            persuadable = i < 100
            treated = i % 2
            score = 1.0 if persuadable else 0.0
            outcome = 1 if (treated and persuadable) else 0
            rows.append((score + (i % 7) * 1e-4, treated, outcome))
        df = spark.createDataFrame(rows, "score double, tr int, y int")
        out = {r.decile: r for r in qini_uplift_deciles(df, "score", "tr", "y").collect()}
        top = min(out)
        assert float(out[top].uplift) > 0.8
        # deciles populated and counts exact
        assert sum(r.n for r in out.values()) == 400


class TestC4Rules:
    def test_line_rules(self, spark):
        from azure_data_engineering_spark.operators.quality import c4_quality_rules

        page = "\n".join(
            [
                "This is a good sentence.",          # kept
                "short.",                             # <3 words -> dropped
                "no terminal punctuation here",       # dropped
                "Please enable JavaScript to view.",  # javascript -> dropped
                "Another fine sentence here!",        # kept
                "Is this kept? Yes it is.",           # kept (2 sentences... 3 marks)
            ]
        )
        df = spark.createDataFrame([(1, page)], "id long, text string")
        r = c4_quality_rules(df, "text", "id", min_sentences=4).collect()[0]
        assert r.n_lines == 6
        assert r.n_kept_lines == 3
        # terminal marks in kept lines: 1 + 1 + 2 = 4
        assert r.n_sentences == 4
        assert not r.has_lorem_ipsum and not r.has_brace
        assert r.keep

    def test_page_level_poison(self, spark):
        from azure_data_engineering_spark.operators.quality import c4_quality_rules

        good = "A sentence that is fine.\n" * 6
        rows = [
            (1, good),
            (2, good + "\nLorem Ipsum dolor sit amet."),
            (3, good + '\nvar cfg = { "a": 1 };'),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {r.doc_id: r for r in c4_quality_rules(df, "text", "id").collect()}
        assert out[1].keep
        assert not out[2].keep and out[2].has_lorem_ipsum
        assert not out[3].keep and out[3].has_brace

    def test_clean_text_md5_stable(self, spark):
        from azure_data_engineering_spark.operators.quality import c4_quality_rules
        import hashlib

        page = "Keep me please today.\ndrop me\nAnd keep me as well!"
        df = spark.createDataFrame([(1, page)], "id long, text string")
        r = c4_quality_rules(df, "text", "id").collect()[0]
        expect = "Keep me please today.\nAnd keep me as well!"
        assert r.clean_len == len(expect)
        assert r.clean_md5 == hashlib.md5(expect.encode()).hexdigest()


class TestEditDistancePairs:
    def test_typo_pair_found_exact_dist(self, spark):
        from azure_data_engineering_spark.operators.linkage import edit_distance_pairs

        rows = [
            (1, "chocolate fudge"),
            (2, "chocolate fudgee"),   # dist 1
            (3, "chocolate fudgy"),    # dist 1 from #1 (e->y)... actually 1
            (4, "vanilla cream"),
            (5, "completely different thing"),
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        out = {(r.id_a, r.id_b): r.dist for r in
               edit_distance_pairs(df, "id", "name", max_dist=2).collect()}
        assert out[(1, 2)] == 1
        assert out[(1, 3)] == 1
        assert (1, 4) not in out and (4, 5) not in out

    def test_prefix_block_bounds_candidates(self, spark):
        from azure_data_engineering_spark.operators.linkage import edit_distance_pairs

        # same edit distance but different prefix -> not a candidate
        rows = [(1, "abcdef"), (2, "zbcdef")]
        df = spark.createDataFrame(rows, "id long, name string")
        assert edit_distance_pairs(df, "id", "name", max_dist=2).count() == 0

    def test_length_prefilter(self, spark):
        from azure_data_engineering_spark.operators.linkage import edit_distance_pairs

        rows = [(1, "abcd"), (2, "abcdefghijk")]
        df = spark.createDataFrame(rows, "id long, name string")
        assert edit_distance_pairs(df, "id", "name", max_dist=2).count() == 0


class TestKmv:
    def test_underfilled_sketch_is_exact(self, spark):
        from azure_data_engineering_spark.operators.kmv import kmv_sketch, kmv_estimate

        rows = [("a", f"v{i}") for i in range(40)] + [("b", f"v{i}") for i in range(25)]
        df = spark.createDataFrame(rows, "g string, v string")
        est = {r.g: r for r in kmv_estimate(kmv_sketch(df, "g", "v", k=256), k=256).collect()}
        assert est["a"].distinct_est == pytest.approx(40.0)
        assert est["b"].distinct_est == pytest.approx(25.0)

    def test_estimate_within_tolerance_when_filled(self, spark):
        from azure_data_engineering_spark.operators.kmv import kmv_sketch, kmv_estimate

        n = 5000
        rows = [("a", f"user-{i}") for i in range(n)]
        df = spark.createDataFrame(rows, "g string, v string")
        r = kmv_estimate(kmv_sketch(df, "g", "v", k=256), k=256).collect()[0]
        # KMV relative error ~ 1/sqrt(k-1) ≈ 6.3%; allow 4 sigma
        assert abs(r.distinct_est - n) / n < 0.25
        assert r.n_retained == 256

    def test_set_ops_overlap(self, spark):
        from azure_data_engineering_spark.operators.kmv import kmv_set_ops

        # a = 0..999, b = 500..1499 -> union 1500, intersection 500, J=1/3
        rows = [("a", f"k{i}") for i in range(1000)] + [
            ("b", f"k{i}") for i in range(500, 1500)
        ]
        df = spark.createDataFrame(rows, "g string, v string")
        r = kmv_set_ops(df, "g", "v", k=256).collect()[0]
        assert r.g_a == "a" and r.g_b == "b"
        assert abs(r.union_est - 1500) / 1500 < 0.3
        assert abs(r.jaccard_est - 1 / 3) < 0.12
        assert abs(r.intersect_est - 500) / 500 < 0.45

    def test_disjoint_sets(self, spark):
        from azure_data_engineering_spark.operators.kmv import kmv_set_ops

        rows = [("a", f"x{i}") for i in range(300)] + [
            ("b", f"y{i}") for i in range(300)
        ]
        df = spark.createDataFrame(rows, "g string, v string")
        r = kmv_set_ops(df, "g", "v", k=128).collect()[0]
        assert r.jaccard_est == pytest.approx(0.0)
        assert r.intersect_est == pytest.approx(0.0)


class TestHampel:
    def test_spike_flagged_and_replaced(self, spark):
        from azure_data_engineering_spark.operators.timeseries import hampel_filter

        vals = [10.0, 11.0, 10.0, 9.0, 100.0, 10.0, 11.0, 10.0, 9.0]
        rows = [("s", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = {r.ord: r for r in hampel_filter(df, "k", "t", "v", half_window=3).collect()}
        assert out[4].is_spike
        assert out[4].replacement == out[4].median
        assert not out[1].is_spike
        assert out[1].replacement == pytest.approx(11.0)

    def test_flat_series_no_flags(self, spark):
        from azure_data_engineering_spark.operators.timeseries import hampel_filter

        rows = [("s", i, 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = hampel_filter(df, "k", "t", "v").collect()
        assert all(not r.is_spike for r in out)
        assert all(r.score is None for r in out)  # MAD = 0 -> cannot testify

    def test_even_window_median_averages_middles(self, spark):
        from azure_data_engineering_spark.operators.timeseries import hampel_filter

        # first row's window is [v0..v3] = 4 elements -> median = avg of middles
        vals = [1.0, 2.0, 3.0, 4.0, 5.0]
        rows = [("s", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = {r.ord: r for r in hampel_filter(df, "k", "t", "v", half_window=3).collect()}
        assert out[0].median == pytest.approx(2.5)

    def test_custom_block_expr_catches_prefix_edits(self, spark):
        from pyspark.sql import functions as F

        from azure_data_engineering_spark.operators.linkage import edit_distance_pairs

        rows = [(1, "cold ring"), (2, "old ring"), (3, "red ring"), (4, "cold bolt")]
        df = spark.createDataFrame(rows, "id long, name string")
        # prefix block misses the cold/old pair entirely
        assert edit_distance_pairs(df, "id", "name", max_dist=1).count() == 0
        last = F.element_at(F.split(F.col("name"), " "), -1)
        out = {(r.id_a, r.id_b): r.dist for r in edit_distance_pairs(
            df, "id", "name", max_dist=1, block_expr=last).collect()}
        assert out == {(1, 2): 1}


class TestGranger:
    def test_x_leads_y_detected(self, spark):
        from azure_data_engineering_spark.operators.timeseries import granger_lag1_f

        # y_t = x_{t-1} + small drift: x strongly Granger-causes y
        xs = [(i * 13) % 29 for i in range(60)]
        rows = []
        y_prev = 0
        for t, xv in enumerate(xs):
            y = (xs[t - 1] if t > 0 else 0) * 3 + (t % 2)
            rows.append((t, xv, y))
        df = spark.createDataFrame(rows, "t int, x long, y long")
        r = granger_lag1_f(df, "t", "x", "y").collect()[0]
        assert r.n_used == 59
        assert r.beta_xlag == pytest.approx(3.0, abs=0.05)
        assert r.f_stat > 100
        assert r.p_value < 1e-6

    def test_independent_series_not_significant(self, spark):
        from azure_data_engineering_spark.operators.timeseries import granger_lag1_f

        rows = [(t, (t * 7) % 11, (t * 5) % 13) for t in range(80)]
        df = spark.createDataFrame(rows, "t int, x long, y long")
        r = granger_lag1_f(df, "t", "x", "y").collect()[0]
        assert r.p_value is None or r.p_value > 0.01

    def test_matches_numpy_ols(self, spark):
        import numpy as np

        from azure_data_engineering_spark.operators.timeseries import granger_lag1_f

        rows = [(t, (t * 17) % 23, ((t * t) % 19) + (t * 3) % 7) for t in range(50)]
        df = spark.createDataFrame(rows, "t int, x long, y long")
        r = granger_lag1_f(df, "t", "x", "y").collect()[0]
        xs = np.array([v[1] for v in rows], float)
        ys = np.array([v[2] for v in rows], float)
        a, b, z = ys[:-1], xs[:-1], ys[1:]
        X = np.column_stack([np.ones_like(a), a, b])
        beta, *_ = np.linalg.lstsq(X, z, rcond=None)
        sse_u = float(((z - X @ beta) ** 2).sum())
        Xr = np.column_stack([np.ones_like(a), a])
        br, *_ = np.linalg.lstsq(Xr, z, rcond=None)
        sse_r = float(((z - Xr @ br) ** 2).sum())
        f_ref = (sse_r - sse_u) / (sse_u / (len(z) - 3))
        assert r.beta_xlag == pytest.approx(beta[2], abs=1e-4)
        assert r.f_stat == pytest.approx(f_ref, rel=1e-4)


class TestWeightedQuantiles:
    def test_hand_computed(self, spark):
        from azure_data_engineering_spark.operators.stats import weighted_quantiles

        # values 1..4 with weights 1,1,1,7 -> W=10
        rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)]
        df = spark.createDataFrame(rows, "v double, w double")
        out = {r.q_bp: r.value for r in
               weighted_quantiles(df, "v", "w", quantiles_bp=(1000, 3000, 5000, 9900)).collect()}
        assert out[1000] == 1.0   # cumw 1 >= 1.0
        assert out[3000] == 3.0   # cumw at 2 is 2 < 3; at 3 is 3 >= 3
        assert out[5000] == 4.0
        assert out[9900] == 4.0

    def test_unit_weights_match_exact_percentile(self, spark):
        from azure_data_engineering_spark.operators.stats import weighted_quantiles

        vals = [float((i * 7) % 100) for i in range(200)]
        df = spark.createDataFrame([(v, 1.0) for v in vals], "v double, w double")
        out = {r.q_bp: r.value for r in
               weighted_quantiles(df, "v", "w", quantiles_bp=(5000,)).collect()}
        sv = sorted(vals)
        # lower quantile: smallest v with cum count >= 100
        assert out[5000] == sv[99]


class TestNormPpf:
    def test_matches_stdlib(self, spark):
        from statistics import NormalDist

        from pyspark.sql import functions as F

        from azure_data_engineering_spark.operators.stats import norm_ppf

        ps = [0.01, 0.025, 0.2, 0.5, 0.8, 0.975, 0.995]
        df = spark.createDataFrame([(p,) for p in ps], "p double")
        got = {r.p: r.z for r in df.select("p", norm_ppf(F.col("p")).alias("z")).collect()}
        for p in ps:
            assert got[p] == pytest.approx(NormalDist().inv_cdf(p), abs=2e-8)


class TestAbSampleSize:
    def test_textbook_case(self, spark):
        from azure_data_engineering_spark.operators.stats import ab_sample_size

        # p0=0.10, mde=0.02, alpha=0.05, power=0.8 -> ~3841 per arm (Fleiss unpooled)
        df = spark.createDataFrame([(0.10, 0.02)], "p0 double, mde double")
        r = ab_sample_size(df, "p0", "mde").collect()[0]
        assert r.z_alpha == pytest.approx(1.959964, abs=1e-5)
        assert r.z_power == pytest.approx(0.841621, abs=1e-5)
        assert 3700 <= r.n_per_arm <= 4000

    def test_smaller_mde_needs_more(self, spark):
        from azure_data_engineering_spark.operators.stats import ab_sample_size

        df = spark.createDataFrame([(0.2, 0.01), (0.2, 0.05)], "p0 double, mde double")
        out = {r.mde: r.n_per_arm for r in ab_sample_size(df, "p0", "mde").collect()}
        assert out[0.01] > 20 * out[0.05] / 2


class TestPointInPolygon:
    def test_square_and_concave(self, spark):
        from azure_data_engineering_spark.operators.spatial import point_in_polygon_join

        polys = spark.createDataFrame(
            [
                ("sq", [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),
                # concave "L": contains (1,1), NOT (3,3)
                ("L", [0.0, 4.0, 4.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]),
            ],
            "poly_id string, xs array<double>, ys array<double>",
        )
        pts = spark.createDataFrame(
            [(1, 1.0, 1.0), (2, 3.0, 3.0), (3, 5.0, 5.0), (4, 3.0, 1.0)],
            "pid long, lon double, lat double",
        )
        out = {(r.pid, r.poly_id) for r in
               point_in_polygon_join(pts, polys).collect()}
        assert (1, "sq") in out and (1, "L") in out
        assert (2, "sq") in out and (2, "L") not in out
        assert not any(pid == 3 for pid, _ in out)
        assert (4, "sq") in out and (4, "L") in out

    def test_boundary_convention_deterministic(self, spark):
        from azure_data_engineering_spark.operators.spatial import point_in_polygon_join

        polys = spark.createDataFrame(
            [("sq", [0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0])],
            "poly_id string, xs array<double>, ys array<double>",
        )
        # bottom edge (y=0): y_i <= y < y_j convention includes it;
        # top edge (y=2) excluded
        pts = spark.createDataFrame(
            [(1, 1.0, 0.0), (2, 1.0, 2.0)], "pid long, lon double, lat double"
        )
        got = {r.pid for r in point_in_polygon_join(pts, polys).collect()}
        assert got == {1}
