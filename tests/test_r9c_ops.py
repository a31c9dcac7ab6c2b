"""Round-9 wave-D operators: Markov removal-effect attribution,
Brier decomposition, UCB1 allocation, Matryoshka truncation eval."""

from __future__ import annotations

import pytest


class TestMarkovAttribution:
    def _journeys(self, spark, rows):
        return spark.createDataFrame(rows, "u long, t int, ch string")

    def test_sole_channel_gets_all_credit(self, spark):
        from azure_data_engineering_spark.operators.funnel import markov_attribution

        rows = []
        for u in range(20):
            rows.append((u, 1, "ads"))
            if u < 10:
                rows.append((u, 2, "buy"))
        df = self._journeys(spark, rows)
        out = markov_attribution(df, "u", "t", "ch", "buy").collect()
        assert len(out) == 1
        r = out[0]
        assert r.channel == "ads"
        assert r.base_conv_p == pytest.approx(0.5, abs=1e-6)
        # removing the only channel kills every conversion
        assert r.removal_effect == pytest.approx(1.0, abs=1e-6)
        assert r.attribution_share == pytest.approx(1.0, abs=1e-6)

    def test_removal_effect_ranks_the_necessary_channel(self, spark):
        from azure_data_engineering_spark.operators.funnel import markov_attribution

        rows = []
        u = 0
        # 10 users: email -> buy  (email necessary for these)
        for _ in range(10):
            rows.append((u, 1, "email")); rows.append((u, 2, "buy")); u += 1
        # 10 users: social -> no conversion
        for _ in range(10):
            rows.append((u, 1, "social")); u += 1
        # 2 users: social -> email -> buy
        for _ in range(2):
            rows.append((u, 1, "social")); rows.append((u, 2, "email"))
            rows.append((u, 3, "buy")); u += 1
        df = self._journeys(spark, rows)
        out = {r.channel: r for r in markov_attribution(df, "u", "t", "ch", "buy").collect()}
        assert out["email"].removal_effect > out["social"].removal_effect
        assert out["email"].attribution_share > 0.5
        shares = sum(r.attribution_share for r in out.values())
        assert shares == pytest.approx(1.0, abs=1e-4)

    def test_direct_conversions_survive_any_removal(self, spark):
        from azure_data_engineering_spark.operators.funnel import markov_attribution

        rows = []
        u = 0
        for _ in range(10):          # direct: no touches, straight buy
            rows.append((u, 1, "buy")); u += 1
        for _ in range(10):          # ads -> buy
            rows.append((u, 1, "ads")); rows.append((u, 2, "buy")); u += 1
        df = self._journeys(spark, rows)
        r = markov_attribution(df, "u", "t", "ch", "buy").collect()[0]
        # base conv = 1.0 (all 20 convert); removing ads keeps the 10 direct
        assert r.base_conv_p == pytest.approx(1.0, abs=1e-6)
        assert r.conv_p_removed == pytest.approx(0.5, abs=1e-6)
        assert r.removal_effect == pytest.approx(0.5, abs=1e-6)


class TestBrierDecomposition:
    def test_identity_and_perfect_calibration(self, spark):
        from azure_data_engineering_spark.operators.mlplan import brier_decomposition

        # forecasts exactly match per-bin outcome rates -> REL ~ 0
        rows = []
        for i in range(1000):
            p = 0.25 if i % 2 == 0 else 0.75
            y = 1 if (i % 8 < 2 if i % 2 == 0 else i % 8 < 6) else 0
            rows.append((p, y))
        df = spark.createDataFrame(rows, "p double, y int")
        r = brier_decomposition(df, "p", "y", bins=10).collect()[0]
        assert r.reliability == pytest.approx(0.0, abs=1e-9)
        assert r.bs_binned == pytest.approx(r.reliability - r.resolution + r.uncertainty, abs=1e-6)
        # constant-per-bin forecasts: raw == binned
        assert r.raw_brier == pytest.approx(r.bs_binned, abs=1e-6)

    def test_matches_hand_computation(self, spark):
        from azure_data_engineering_spark.operators.mlplan import brier_decomposition

        rows = [(0.1, 0), (0.1, 1), (0.9, 1), (0.9, 1), (0.55, 0), (0.55, 1)]
        df = spark.createDataFrame(rows, "p double, y int")
        r = brier_decomposition(df, "p", "y", bins=10).collect()[0]
        raw = sum((p - y) ** 2 for p, y in rows) / len(rows)
        assert r.raw_brier == pytest.approx(raw, abs=1e-6)
        assert r.base_rate == pytest.approx(4 / 6, abs=1e-6)


class TestUcb1:
    def test_hand_computed_and_exploration_bonus(self, spark):
        import math

        from azure_data_engineering_spark.operators.mlplan import ucb1_allocation

        # arm a: 100 pulls mean 0.5; arm b: 4 pulls mean 0.45
        rows = [("a", 1.0 if i % 2 == 0 else 0.0) for i in range(100)]
        rows += [("b", 0.45), ("b", 0.45), ("b", 0.45), ("b", 0.45)]
        df = spark.createDataFrame(rows, "arm string, r double")
        out = {r.arm: r for r in ucb1_allocation(df, "arm", "r").collect()}
        n_all = 104
        ucb_a = 0.5 + math.sqrt(2 * math.log(n_all) / 100)
        ucb_b = 0.45 + math.sqrt(2 * math.log(n_all) / 4)
        assert out["a"].ucb == pytest.approx(ucb_a, abs=1e-5)
        assert out["b"].ucb == pytest.approx(ucb_b, abs=1e-5)
        # the under-explored arm wins despite the lower mean
        assert out["b"].chosen and not out["a"].chosen

    def test_tiebreak_deterministic(self, spark):
        from azure_data_engineering_spark.operators.mlplan import ucb1_allocation

        rows = [("x", 0.5), ("y", 0.5)]
        df = spark.createDataFrame(rows, "arm string, r double")
        out = {r.arm: r.chosen for r in ucb1_allocation(df, "arm", "r").collect()}
        assert out == {"x": True, "y": False}


class TestMatryoshka:
    def test_full_dim_self_check_and_monotone_tendency(self, spark):
        import random

        from azure_data_engineering_spark.operators.similarity import matryoshka_eval

        rng = random.Random(7)
        rows = []
        for i in range(120):
            # first 8 dims carry essentially all the vector mass (the
            # matryoshka premise); the tail is near-zero jitter
            c = i % 3
            vec = [float(c) + rng.random() * 0.2 for _ in range(8)] + [
                rng.random() * 1e-3 for _ in range(24)
            ]
            rows.append((i, vec))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.dim: r for r in matryoshka_eval(
            df, "vec_id", "embedding", dims=(4, 8, 16), k=5, n_queries=8).collect()}
        # the NULL dim row is the full-dimension self check: overlap 1.0
        assert out[None].mean_overlap_at_k == pytest.approx(1.0)
        assert out[None].n_queries == 8
        # signal dims recover most of the ranking
        assert out[8].mean_overlap_at_k > 0.4
        assert out[16].mean_overlap_at_k >= out[4].mean_overlap_at_k - 0.2

    def test_duplicate_of_full_slice_is_exact(self, spark):
        from azure_data_engineering_spark.operators.similarity import matryoshka_eval

        rows = [(i, [float((i * j) % 7) for j in range(1, 9)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.dim: r for r in matryoshka_eval(
            df, "vec_id", "embedding", dims=(8,), k=3, n_queries=5).collect()}
        # dim 8 IS the full dimension here -> identical ranking
        assert out[8].mean_overlap_at_k == pytest.approx(1.0)
