"""Behavioral tests for the in-plan classical ML operators
(operators/mlplan.py) and the r6-wired siblings fim_split,
link_prediction, random_project — each verified against a known
closed-form answer on constructed data, plus the determinism /
plan-shape properties the engine's operator standard requires."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.mlplan import (
    calibration_bins,
    decision_stump,
    logistic_gd,
    pca_power,
    ridge_closed_form,
)


class TestPcaPower:
    def test_recovers_dominant_axis(self, spark):
        # points along the x-axis with tiny y jitter: pc1 must be the
        # x-axis (up to sign, pinned positive by the all-positive v0)
        rows = [(i, [float(i - 4), 0.1 * ((i % 3) - 1)]) for i in range(9)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = pca_power(df, "embedding", "vec_id", dim=2, iterations=8)
        r = {row["id"]: row for row in out.collect()}
        # scores must be monotone in x and variance ~ var(x) = 60/9
        scores = [r[i]["pc1"] for i in range(9)]
        assert scores == sorted(scores) or scores == sorted(scores, reverse=True)
        assert r[0]["variance_pc1"] == pytest.approx(60.0 / 9.0, abs=0.05)

    def test_deterministic(self, spark):
        rows = [(i, [math.sin(i * 1.7 + j) for j in range(4)]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = sorted(map(tuple, pca_power(df, "embedding", "vec_id", dim=4, iterations=5).collect()))
        b = sorted(map(tuple, pca_power(df, "embedding", "vec_id", dim=4, iterations=5).collect()))
        assert a == b


class TestRidgeClosedForm:
    def test_recovers_exact_linear_fit_at_lam_zero(self, spark):
        # y = 2 + 3*x1 - 5*x2 exactly, lam=0 -> OLS recovers it, r2=1
        rows = [
            (float(i % 7), float((i * 3) % 5), 2.0 + 3.0 * (i % 7) - 5.0 * ((i * 3) % 5))
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        r = ridge_closed_form(df, "x1", "x2", "y", lam=0.0).first()
        assert r["w0"] == pytest.approx(2.0, abs=1e-4)
        assert r["w1"] == pytest.approx(3.0, abs=1e-4)
        assert r["w2"] == pytest.approx(-5.0, abs=1e-4)
        assert r["r2"] == pytest.approx(1.0, abs=1e-6)
        assert r["n"] == 50

    def test_ridge_shrinks_toward_zero(self, spark):
        # x2 carries tiny uncorrelated variation so the lam=0 normal
        # matrix stays invertible (a constant feature + lam=0 is
        # singular by construction)
        rows = [(float(i), float(i % 3), 10.0 * i) for i in range(1, 21)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        w_ols = ridge_closed_form(df, "x1", "x2", "y", lam=0.0).first()["w1"]
        w_big = ridge_closed_form(df, "x1", "x2", "y", lam=1000.0).first()["w1"]
        assert abs(w_big) < abs(w_ols)


class TestLogisticGd:
    def test_separable_data_high_accuracy(self, spark):
        # perfectly separable on x1: t = (x1 > 0)
        rows = [((i - 50) / 10.0, 0.0, 1.0 if i > 50 else 0.0) for i in range(101) if i != 50]
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        r = logistic_gd(df, "x1", "x2", "t", iterations=10, lr=2.0).first()
        assert r["accuracy"] >= 0.95
        assert r["w1"] > 0  # weight points along the separating feature
        assert r["log_loss"] < 0.69314718  # better than the p=0.5 prior

    def test_one_row_output(self, spark):
        rows = [(0.1, 0.2, 1.0), (0.3, 0.1, 0.0)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, t double")
        assert logistic_gd(df, "x1", "x2", "t", iterations=2).count() == 1


class TestDecisionStump:
    def test_perfect_split_gains_full_entropy(self, spark):
        # label flips exactly at x = 5: gain = parent entropy = 1 bit
        rows = [(float(i), 1 if i > 5 else 0) for i in range(1, 11)]
        df = spark.createDataFrame(rows, "x double, t long")
        r = decision_stump(df, "x", "t", feature_decimals=2).first()
        assert r["threshold"] == pytest.approx(5.0)
        assert r["gain_bits"] == pytest.approx(1.0, abs=1e-9)
        assert (r["n_left"], r["pos_left"]) == (5, 0)
        assert (r["n_right"], r["pos_right"]) == (5, 5)

    def test_uninformative_feature_zero_gain(self, spark):
        rows = [(1.0, i % 2) for i in range(20)]
        df = spark.createDataFrame(rows, "x double, t long")
        # single distinct value -> no valid split row survives
        assert decision_stump(df, "x", "t").count() == 0


class TestCalibrationBins:
    def test_perfectly_calibrated_zero_gap(self, spark):
        # bin b holds scores b/10 + 0.05 with observed rate == score
        rows = []
        for b in range(10):
            p = b / 10.0 + 0.05
            n_pos = int(p * 100)
            rows += [(p, 1.0)] * n_pos + [(p, 0.0)] * (100 - n_pos)
        df = spark.createDataFrame(rows, "p double, t double")
        out = calibration_bins(df, "p", "t", bins=10).collect()
        assert len(out) == 10
        for r in out:
            assert r["n"] == 100
            assert r["abs_gap"] <= 0.005  # int() truncation slack

    def test_clamps_p_equal_one_into_last_bin(self, spark):
        df = spark.createDataFrame([(1.0, 1.0), (0.0, 0.0)], "p double, t double")
        bins = {r["bin"] for r in calibration_bins(df, "p", "t", bins=10).collect()}
        assert bins == {0, 9}


class TestFimSplit:
    def test_reassembly_fingerprint_matches_manual(self, spark):
        import hashlib

        from azure_data_engineering_spark.operators.chunking import fim_split

        text = "0123456789abcdef"
        df = spark.createDataFrame([(7, text)], "doc_id long, text string")
        r = fim_split(df, "text", "doc_id").first()
        a, b = r["split_a"], r["split_b"]
        assert 1 <= a < b <= len(text) - 1
        fim = "<PRE>" + text[:a] + "<SUF>" + text[b:] + "<MID>" + text[a:b]
        assert r["fim_md5"] == hashlib.md5(fim.encode()).hexdigest()
        assert r["n_chars"] == len(text)

    def test_short_docs_dropped_and_non_ascii_stripped(self, spark):
        from azure_data_engineering_spark.operators.chunking import fim_split

        df = spark.createDataFrame(
            [(1, "tiny"), (2, "café latte with steam—always hot")],
            "doc_id long, text string",
        )
        out = fim_split(df, "text", "doc_id").collect()
        assert [r["id"] for r in out] == [2]
        # é and em-dash stripped: 'café latte with steam—always hot' -> 30 ascii chars
        assert out[0]["n_chars"] == 30

    def test_deterministic_across_runs(self, spark, sf_dir):
        from azure_data_engineering_spark.catalog import load_table
        from azure_data_engineering_spark.operators.chunking import fim_split

        d = load_table(spark, sf_dir, "documents")
        a = sorted(map(tuple, fim_split(d, "text", "doc_id").collect()))
        b = sorted(map(tuple, fim_split(d, "text", "doc_id").repartition(13).collect()))
        assert a == b


class TestLinkPrediction:
    def test_square_graph_predicts_diagonals(self, spark):
        from azure_data_engineering_spark.operators.graph import link_prediction

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
        out = link_prediction(edges, top_k=10).collect()
        got = {(r["a"], r["b"]): r for r in out}
        assert set(got) == {(1, 3), (2, 4)}
        for r in got.values():
            assert r["common_neighbors"] == 2
            assert r["deg_a"] == r["deg_b"] == 2
            assert r["jaccard"] == pytest.approx(1.0)

    def test_degree_cap_excludes_hub_centers(self, spark):
        from azure_data_engineering_spark.operators.graph import link_prediction

        # star: hub 0 connects 1..9; only wedges THROUGH the hub exist
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 10)], "src long, dst long"
        )
        assert link_prediction(edges, max_degree=5, top_k=100).count() == 0
        assert link_prediction(edges, max_degree=None, top_k=100).count() == 36


class TestRandomProject:
    def test_shape_and_determinism(self, spark):
        from azure_data_engineering_spark.operators.similarity import random_project

        rows = [(i, [math.cos(i + j) for j in range(16)]) for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = random_project(df, "embedding", "vec_id", dim=16, out_dim=4)
        assert out.count() == 120
        a = sorted(map(tuple, out.collect()))
        b = sorted(map(tuple, random_project(
            df.repartition(7), "embedding", "vec_id", dim=16, out_dim=4
        ).collect()))
        assert a == b

    def test_distance_preservation_on_average(self, spark):
        # JL with +-1/sqrt(k) signs is an isometry IN EXPECTATION:
        # E|Px|^2 = |x|^2. Check the corpus-mean ratio, not per-vector.
        import numpy as np

        from azure_data_engineering_spark.operators.similarity import random_project

        rng = [(i, [math.sin(i * 2.3 + j * 0.7) for j in range(32)]) for i in range(64)]
        df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
        out = random_project(df, "embedding", "vec_id", dim=32, out_dim=16, round_decimals=9)
        proj = out.groupBy("id").agg(F.sum(F.col("y") * F.col("y")).alias("nrm2"))
        mean_proj = proj.agg(F.avg("nrm2")).first()[0]
        mean_orig = float(np.mean([sum(x * x for x in v) for _, v in rng]))
        assert mean_proj == pytest.approx(mean_orig, rel=0.35)


class TestRidgeCv:
    def test_folds_train_on_complement(self, spark):
        # exact linear data: every fold's model recovers the truth and
        # holdout rmse ~ 0 (lam tiny relative to signal)
        rows = [
            (i % 5, float(i % 11), float((i * 7) % 13),
             1.0 + 2.0 * (i % 11) + 3.0 * ((i * 7) % 13))
            for i in range(200)
        ]
        from azure_data_engineering_spark.operators.mlplan import ridge_cv

        df = spark.createDataFrame(rows, "fold int, x1 double, x2 double, y double")
        out = ridge_cv(df, "x1", "x2", "y", "fold", lam=0.0).collect()
        assert len(out) == 5
        for r in out:
            assert r["n_train"] + r["n_test"] == 200
            assert r["w1"] == pytest.approx(2.0, abs=1e-4)
            assert r["rmse"] == pytest.approx(0.0, abs=1e-3)

    def test_moment_subtraction_matches_direct_fit(self, spark):
        # CV fold-0 weights == ridge_closed_form trained directly on
        # the fold!=0 subset (the subtraction is exact, not approximate)
        from azure_data_engineering_spark.operators.mlplan import ridge_cv

        rows = [
            (i % 3, float(i % 11), float((i * 5) % 7), float((i * i) % 97))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "fold int, x1 double, x2 double, y double")
        cv0 = {r["fold"]: r for r in ridge_cv(df, "x1", "x2", "y", "fold", lam=1.0).collect()}[0]
        direct = ridge_closed_form(
            df.filter(F.col("fold") != 0), "x1", "x2", "y", lam=1.0
        ).first()
        assert (cv0["w0"], cv0["w1"], cv0["w2"]) == (
            direct["w0"], direct["w1"], direct["w2"]
        )


class TestConformalInterval:
    def test_coverage_and_quantile_on_known_noise(self, spark):
        # y = 10*x1 + e with |e| <= 1: q_hat must be <= ~1 and train
        # coverage >= 0.9 (exchangeable by construction)
        from azure_data_engineering_spark.operators.mlplan import conformal_interval

        rows = [
            (i, float(i % 50), 0.0,
             10.0 * (i % 50) + (((i * 31) % 200) - 100) / 100.0)
            for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "rid long, x1 double, x2 double, y double")
        r = conformal_interval(
            df, "x1", "x2", "y", "rid", calib_size=400, alpha=0.1
        ).first()
        assert r["n_calib"] == 400
        assert r["n_train"] == 1600
        assert r["k"] == math.ceil(401 * 0.9)
        assert 0.5 <= r["q_hat"] <= 1.5
        assert r["coverage_train"] >= 0.85

    def test_panel_smaller_than_corpus_guard(self, spark):
        # corpus smaller than calib_size: every row lands in calib,
        # train is empty -> ridge det division fails loudly rather
        # than emitting silent garbage
        from azure_data_engineering_spark.operators.mlplan import conformal_interval

        rows = [(i, float(i), float(i % 3), float(i * 2)) for i in range(10)]
        df = spark.createDataFrame(rows, "rid long, x1 double, x2 double, y double")
        with pytest.raises(Exception):
            conformal_interval(df, "x1", "x2", "y", "rid", calib_size=100).collect()


class TestMutualInformation:
    def test_perfect_predictor_equals_label_entropy(self, spark):
        from azure_data_engineering_spark.operators.features import mutual_information

        # feature 'copy' IS the label; feature 'noise' is constant
        rows = []
        for i in range(100):
            lab = "A" if i % 4 == 0 else "B"  # H(Y) = H(0.25)
            rows.append(("copy", lab, lab))
            rows.append(("noise", "x", lab))
        df = spark.createDataFrame(rows, "feature string, value string, label string")
        out = {r["feature"]: r for r in mutual_information(df).collect()}
        h_y = -(0.25 * math.log2(0.25) + 0.75 * math.log2(0.75))
        assert out["copy"]["mi_bits"] == pytest.approx(h_y, abs=1e-9)
        assert out["copy"]["h_bits"] == pytest.approx(h_y, abs=1e-9)
        assert out["noise"]["mi_bits"] == pytest.approx(0.0, abs=1e-9)
        assert out["noise"]["h_bits"] == pytest.approx(0.0, abs=1e-9)

    def test_independent_feature_near_zero(self, spark):
        from azure_data_engineering_spark.operators.features import mutual_information

        rows = [("f", str(i % 2), "A" if (i // 2) % 2 == 0 else "B") for i in range(400)]
        df = spark.createDataFrame(rows, "feature string, value string, label string")
        r = mutual_information(df).first()
        assert r["mi_bits"] == pytest.approx(0.0, abs=1e-9)
        assert r["h_bits"] == pytest.approx(1.0, abs=1e-9)


class TestKAnonymityAudit:
    def test_known_group_structure(self, spark):
        from azure_data_engineering_spark.operators.privacy import k_anonymity_audit

        # groups: (a: 6 rows, 2 sensitive values), (b: 3 rows, 1 value),
        # (c: 1 row) -> k_min=1, singletons=1, rows_below_5=4, min_l=1
        rows = (
            [("a", i % 2 == 0) for i in range(6)]
            + [("b", True)] * 3
            + [("c", False)]
        )
        df = spark.createDataFrame(rows, "qi string, s boolean")
        r = k_anonymity_audit(df, ["qi"], "s", k=5).first()
        assert r["n_rows"] == 10
        assert r["n_groups"] == 3
        assert r["k_min"] == 1
        assert r["n_singletons"] == 1
        assert r["rows_below_k"] == 4
        assert r["pct_below_k"] == pytest.approx(0.4)
        assert r["min_l_diversity"] == 1

    def test_null_qi_forms_own_group(self, spark):
        from azure_data_engineering_spark.operators.privacy import k_anonymity_audit

        df = spark.createDataFrame(
            [(None, True), (None, False), ("x", True)], "qi string, s boolean"
        )
        r = k_anonymity_audit(df, ["qi"], "s", k=2).first()
        assert r["n_groups"] == 2
        assert r["k_min"] == 1


class TestGbmStumps:
    def test_step_function_learned_in_one_round(self, spark):
        from azure_data_engineering_spark.operators.mlplan import gbm_stumps

        # y = 100 for x<=5, 300 for x>5: round 1 must split at 5 and
        # (with lr=1) the leaf increments recover the two levels
        rows = [(float(i % 10 + 1), 100.0 if i % 10 + 1 <= 5 else 300.0)
                for i in range(100)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = gbm_stumps(df, "x", "y", rounds=2, lr=1.0, y_scale=1).collect()
        r1 = out[0]
        assert r1["round"] == 1 and r1["threshold"] == 5
        # base = 200; left leaf -100, right leaf +100 (integer units)
        assert (r1["add_left"], r1["add_right"]) == (-100, 100)
        assert r1["gain_frac"] == pytest.approx(1.0, abs=1e-3)
        # round 2 enters with ~zero residual
        assert out[1]["sse_pre"] == pytest.approx(0.0, abs=1.0)

    def test_training_curve_monotone(self, spark):
        from azure_data_engineering_spark.operators.mlplan import gbm_stumps

        rows = [(float(i % 20), float((i * i) % 500)) for i in range(300)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = gbm_stumps(df, "x", "y", rounds=3, lr=0.5, y_scale=100).collect()
        sses = [r["sse_pre"] for r in out]
        assert sses == sorted(sses, reverse=True)  # boosting reduces SSE


class TestPsi:
    def test_identical_distributions_near_zero(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            population_stability_index,
        )

        rows = [(float(i % 500),) for i in range(5000)]
        df = spark.createDataFrame(rows, "value double")
        r = population_stability_index(df, df, "value", 50.0, 10).first()
        assert r["psi"] == pytest.approx(0.0, abs=1e-9)
        assert r["n_shifted_bins"] == 0

    def test_shifted_distribution_flags(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            population_stability_index,
        )

        base = spark.createDataFrame([(float(i % 100),) for i in range(2000)], "value double")
        cur = spark.createDataFrame([(float(400 + i % 100),) for i in range(2000)], "value double")
        r = population_stability_index(base, cur, "value", 50.0, 10).first()
        assert r["psi"] > 0.25  # "shifted" per the scorecard convention
        assert r["n_shifted_bins"] >= 2

    def test_negative_values_clamp_to_bin_zero(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            population_stability_index,
        )

        # Negative values must land in bin 0 (mirroring the upper
        # clamp), not silently vanish from counts and totals.
        base = spark.createDataFrame(
            [(-25.0,)] * 100 + [(75.0,)] * 100, "value double"
        )
        shifted_to_bin0 = spark.createDataFrame(
            [(25.0,)] * 100 + [(75.0,)] * 100, "value double"
        )
        r = population_stability_index(base, shifted_to_bin0, "value", 50.0, 10).first()
        assert r["n_baseline"] == 200  # negatives counted in the total
        assert r["n_current"] == 200
        # -25 and 25 both clamp/floor into bin 0 => identical histograms
        assert r["psi"] == pytest.approx(0.0, abs=1e-9)


class TestKsTwoSample:
    def test_identical_samples_d_zero(self, spark):
        from azure_data_engineering_spark.operators.stats import ks_two_sample

        df = spark.createDataFrame([(float(i % 37),) for i in range(1000)], "value double")
        r = ks_two_sample(df, df, "value").first()
        assert r["d_stat"] == 0.0
        assert not r["reject_95"]

    def test_disjoint_supports_d_one(self, spark):
        from azure_data_engineering_spark.operators.stats import ks_two_sample

        a = spark.createDataFrame([(float(i % 10),) for i in range(200)], "value double")
        b = spark.createDataFrame([(float(100 + i % 10),) for i in range(200)], "value double")
        r = ks_two_sample(a, b, "value").first()
        assert r["d_stat"] == 1.0
        assert r["reject_95"]
        assert r["d_crit"] == pytest.approx(1.358 * math.sqrt(400 / (200 * 200)), abs=1e-9)


class TestGainChart:
    def test_perfect_score_captures_everything_in_top_decile(self, spark):
        from azure_data_engineering_spark.operators.features import gain_chart

        # 10% responders, all with the highest score
        rows = [(1.0 if i < 100 else 0.0, 1 if i < 100 else 0) for i in range(1000)]
        df = spark.createDataFrame(rows, "score double, lab long")
        out = {r["decile"]: r for r in gain_chart(df, "score", "lab").collect()}
        assert out[1]["responders"] == 100
        assert out[1]["cum_capture"] == pytest.approx(1.0)
        assert out[1]["lift"] == pytest.approx(10.0)
        assert out[10]["cum_capture"] == pytest.approx(1.0)

    def test_ties_share_a_decile_row_order_independent(self, spark):
        from azure_data_engineering_spark.operators.features import gain_chart

        rows = [(float(i % 3), i % 2) for i in range(300)]
        df = spark.createDataFrame(rows, "score double, lab long")
        a = sorted(map(tuple, gain_chart(df, "score", "lab").collect()))
        b = sorted(map(tuple, gain_chart(df.repartition(7), "score", "lab").collect()))
        assert a == b
        # 3 distinct scores of 100 rows each -> deciles land on 4, 7, 10
        deciles = {r[0] for r in a}
        assert deciles == {4, 7, 10}
