"""Behavioral tests for the round-6b additions: DP noisy counts,
key-skew / Lorenz diagnostics, Zipf-Heaps scaling-law fits, NDCG,
rolling z-score anomalies, and Holt linear smoothing — hand-built
fixtures with closed-form answers (the oracle gate covers data scale;
these pin semantics and edge cases)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.diagnostics import (
    key_skew_report,
    lorenz_deciles,
)
from azure_data_engineering_spark.operators.privacy import dp_noisy_counts
from azure_data_engineering_spark.operators.retrieval_eval import ndcg_at_k
from azure_data_engineering_spark.operators.scaling_laws import (
    heaps_fit,
    zipf_fit,
)
from azure_data_engineering_spark.operators.timeseries import (
    _round_away,
    holt_linear,
    rolling_zscore_anomalies,
)


class TestDpNoisyCounts:
    def test_reproducible_and_calibrated(self, spark):
        rows = [(i, "a" if i % 3 else "b") for i in range(90)]
        df = spark.createDataFrame(rows, "id long, grp string")
        r1 = {r.grp: r for r in dp_noisy_counts(df, ["grp"], epsilon=1.0, seed="t").collect()}
        r2 = {r.grp: r for r in dp_noisy_counts(df, ["grp"], epsilon=1.0, seed="t").collect()}
        assert {g: v.released for g, v in r1.items()} == {
            g: v.released for g, v in r2.items()
        }
        assert r1["a"].true_n == 60 and r1["b"].true_n == 30
        for v in r1.values():
            assert v.released >= 0.0
            assert v.released == round(max(0.0, v.true_n + v.noise), 6)

    def test_smaller_epsilon_means_larger_noise(self, spark):
        df = spark.createDataFrame([(i, "g") for i in range(10)], "id long, grp string")
        tight = dp_noisy_counts(df, ["grp"], epsilon=10.0, seed="t").collect()[0]
        loose = dp_noisy_counts(df, ["grp"], epsilon=0.1, seed="t").collect()[0]
        # identical unit draw, scale differs by exactly eps ratio
        assert abs(loose.noise) == pytest.approx(abs(tight.noise) * 100, rel=1e-4)

    def test_salt_changes_draw(self, spark):
        df = spark.createDataFrame([(i, "g") for i in range(10)], "id long, grp string")
        a = dp_noisy_counts(df, ["grp"], seed="s1").collect()[0].noise
        b = dp_noisy_counts(df, ["grp"], seed="s2").collect()[0].noise
        assert a != b

    def test_seed_is_required(self, spark):
        df = spark.createDataFrame([(1, "g")], "id long, grp string")
        with pytest.raises(ValueError, match="secret seed"):
            dp_noisy_counts(df, ["grp"])

    def test_key_encoding_is_injective_across_tuples(self, spark):
        # ('a|b', 'c') and ('a', 'b|c') would collide under a plain
        # '|' join and share a noise draw; the per-column md5
        # encoding must keep their draws independent.
        df = spark.createDataFrame(
            [("a|b", "c"), ("a", "b|c")], "x string, y string"
        )
        rows = dp_noisy_counts(df, ["x", "y"], seed="t").collect()
        assert len(rows) == 2
        assert rows[0].noise != rows[1].noise


class TestKeySkewReport:
    def test_uniform_keys_gini_zero(self, spark):
        rows = [(i % 4,) for i in range(40)]
        df = spark.createDataFrame(rows, "k long")
        r = key_skew_report(df, "k").collect()[0]
        assert r.n_rows == 40 and r.n_keys == 4 and r.max_freq == 10
        assert r.top1_share == 0.25
        assert r.skew_ratio == 1.0
        assert r.gini == 0.0

    def test_hot_key_dominates(self, spark):
        # key 0: 97 rows; keys 1..3: 1 row each
        rows = [(0,)] * 97 + [(1,), (2,), (3,)]
        df = spark.createDataFrame(rows, "k long")
        r = key_skew_report(df, "k").collect()[0]
        assert r.top1_share == 0.97
        assert r.skew_ratio == pytest.approx(97 * 4 / 100, abs=1e-6)
        # Glasser: freqs sorted [1,1,1,97] -> sum i*f = 1+2+3+388 = 394
        expected_gini = 2 * 394 / (4 * 100) - 5 / 4
        assert r.gini == pytest.approx(expected_gini, abs=1e-6)

    def test_top_n_share(self, spark):
        rows = [(k,) for k in range(20) for _ in range(k + 1)]
        df = spark.createDataFrame(rows, "k long")
        r = key_skew_report(df, "k", top_n=5).collect()[0]
        total = sum(range(1, 21))
        top5 = 20 + 19 + 18 + 17 + 16
        assert r["top5_share"] == round(top5 / total, 6)


class TestLorenzDeciles:
    def test_uniform_values(self, spark):
        rows = [(i, 10.0) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, v double")
        out = lorenz_deciles(df, "id", F.col("v").cast("decimal(18,2)")).collect()
        assert len(out) == 10
        assert all(r.n_entities == 10 for r in out)
        assert all(r.value_share == 0.1 for r in out)
        assert out[-1].cum_share == 1.0

    def test_concentrated_values_monotone(self, spark):
        rows = [(i, float(2**i)) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, v double")
        out = lorenz_deciles(df, "id", F.col("v").cast("decimal(18,2)")).collect()
        shares = [r.value_share for r in out]
        assert shares == sorted(shares)
        assert out[-1].value_share > 0.7  # top decile dominates 2^i
        cums = [r.cum_share for r in out]
        assert cums == sorted(cums) and cums[-1] == 1.0


class TestScalingLaws:
    def test_zipf_exact_power_law(self, spark):
        # freq = 10^6 / r  -> ln f = ln 1e6 - 1*ln r  -> s = 1
        rows = [(f"t{r}", int(1_000_000 / r)) for r in range(1, 201)]
        df = spark.createDataFrame(rows, "term string, n long")
        r = zipf_fit(df, "term", "n", top_k=200).collect()[0]
        assert r.n_terms_fit == 200
        assert r.zipf_s == pytest.approx(1.0, abs=0.01)
        assert r.zipf_intercept == pytest.approx(math.log(1_000_000), abs=0.05)

    def test_heaps_exact_power_law(self, spark):
        # distinct = 2 * tokens^0.5
        rows = [(i, n, int(2 * math.sqrt(n))) for i, n in enumerate(range(50, 1000, 10))]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long, n_distinct long")
        r = heaps_fit(df, "n_tokens", "n_distinct").collect()[0]
        assert r.heaps_beta == pytest.approx(0.5, abs=0.02)

    def test_zero_token_docs_excluded(self, spark):
        rows = [(1, 0, 0), (2, 10, 5), (3, 100, 20), (4, 1000, 60)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long, n_distinct long")
        assert heaps_fit(df, "n_tokens", "n_distinct").collect()[0].n_docs_fit == 3


class TestNdcg:
    def _frames(self, spark, ann_rows, truth_rows):
        ann = spark.createDataFrame(ann_rows, "query_id long, neighbor_id long, rank long")
        truth = spark.createDataFrame(truth_rows, "query_id long, neighbor_id long, rank long")
        return ann, truth

    def test_perfect_ranking_is_one(self, spark):
        rows = [(q, n, r) for q in (1, 2) for r, n in enumerate((10, 11, 12), 1)]
        ann, truth = self._frames(spark, rows, rows)
        out = {r.k: r.ndcg for r in ndcg_at_k(ann, truth, ks=(1, 3)).collect()}
        assert out == {1: 1.0, 3: 1.0}

    def test_disjoint_ranking_is_zero(self, spark):
        truth = [(1, n, r) for r, n in enumerate((10, 11, 12), 1)]
        ann = [(1, n, r) for r, n in enumerate((20, 21, 22), 1)]
        a, t = self._frames(spark, ann, truth)
        out = {r.k: r.ndcg for r in ndcg_at_k(a, t, ks=(3,)).collect()}
        assert out == {3: 0.0}

    def test_swapped_top_two(self, spark):
        truth = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
        ann = [(1, 11, 1), (1, 10, 2), (1, 12, 3)]
        a, t = self._frames(spark, ann, truth)
        out = {r.k: r.ndcg for r in ndcg_at_k(a, t, ks=(1, 3)).collect()}
        # k=1: ann's top item (11) IS in true top-1? no -> dcg 0
        assert out[1] == 0.0
        # k=3: same item set, same gains -> ndcg 1
        assert out[3] == 1.0


class TestRollingZscore:
    def _run(self, spark, vals, **kw):
        rows = [("s", f"d{i:02d}", v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, d string, v long")
        return rolling_zscore_anomalies(df, "g", "d", "v", **kw).orderBy("d").collect()

    def test_constant_series_never_flags(self, spark):
        out = self._run(spark, [5] * 10)
        assert all(not r.is_anomaly for r in out)
        assert all(r.zscore is None for r in out)

    def test_spike_flagged(self, spark):
        out = self._run(spark, [10, 11, 10, 9, 10, 11, 10, 100], window=7, z_threshold=3.0)
        assert out[-1].is_anomaly
        assert all(not r.is_anomaly for r in out[:-1])

    def test_warmup_rows_null(self, spark):
        out = self._run(spark, [1, 2, 3, 4, 5, 6], min_periods=3)
        assert out[0].zscore is None and out[1].zscore is None and out[2].zscore is None
        assert out[0].baseline_n == 0 and out[3].baseline_n == 3

    def test_baseline_excludes_current(self, spark):
        out = self._run(spark, [10, 10, 10, 40], window=7)
        assert out[3].baseline_mean == 10.0


class TestHoltLinear:
    def _run(self, spark, vals, **kw):
        rows = [("s", f"d{i:02d}", v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, d string, v long")
        return holt_linear(df, "g", "d", "v", **kw).collect()[0]

    def test_perfect_linear_trend(self, spark):
        # y_t = 10 + 3t: Holt tracks it exactly from the exact init
        r = self._run(spark, [10 + 3 * t for t in range(12)], horizon=7)
        assert r.n_periods == 12
        assert r.level == pytest.approx(10 + 3 * 11, abs=1e-6)
        assert r.trend == pytest.approx(3.0, abs=1e-6)
        assert r.forecast == pytest.approx(10 + 3 * 18, abs=1e-6)
        assert r.sse == 0.0

    def test_constant_series(self, spark):
        r = self._run(spark, [7] * 10)
        assert r.level == 7.0 and r.trend == 0.0 and r.forecast == 7.0

    def test_single_point_series(self, spark):
        r = self._run(spark, [42])
        assert r.n_periods == 1 and r.level == 42.0 and r.trend == 0.0

    def test_round_away_matches_sql_convention(self):
        assert _round_away(3.5e-6, 6) == 4e-6  # py round() gives 3e-6
        assert _round_away(-3.5e-6, 6) == -4e-6
        assert _round_away(63.3032425, 6) == 63.303243
