"""Round-9 operators: Pearson correlation matrix, one-way ANOVA,
Kendall tau-b, Nelson-Aalen, CUPED, Benjamini-Hochberg FDR."""

from __future__ import annotations

import math

import pytest


class TestPearsonMatrix:
    def test_perfect_and_anti_correlation(self, spark):
        from azure_data_engineering_spark.operators.stats import pearson_matrix

        df = spark.createDataFrame(
            [(float(i), float(2 * i + 1), float(10 - i)) for i in range(8)],
            "a double, b double, c double",
        )
        got = {
            (r.feature_x, r.feature_y): r.corr
            for r in pearson_matrix(df, ["a", "b", "c"]).collect()
        }
        assert got[("a", "b")] == pytest.approx(1.0)
        assert got[("a", "c")] == pytest.approx(-1.0)
        assert got[("b", "c")] == pytest.approx(-1.0)
        assert len(got) == 3

    def test_constant_column_yields_null(self, spark):
        from azure_data_engineering_spark.operators.stats import pearson_matrix

        df = spark.createDataFrame(
            [(float(i), 5.0) for i in range(5)], "a double, b double"
        )
        row = pearson_matrix(df, ["a", "b"]).collect()[0]
        assert row.corr is None

    def test_matches_numpy(self, spark):
        import numpy as np

        from azure_data_engineering_spark.operators.stats import pearson_matrix

        rows = [(float(i % 7), float((i * 3) % 11), float((i * i) % 13)) for i in range(50)]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        got = {
            (r.feature_x, r.feature_y): r.corr
            for r in pearson_matrix(df, ["a", "b", "c"]).collect()
        }
        m = np.corrcoef(np.array(rows).T)
        assert got[("a", "b")] == pytest.approx(m[0, 1], abs=1e-6)
        assert got[("a", "c")] == pytest.approx(m[0, 2], abs=1e-6)
        assert got[("b", "c")] == pytest.approx(m[1, 2], abs=1e-6)


class TestAnovaOneway:
    def test_hand_computed_f(self, spark):
        from azure_data_engineering_spark.operators.stats import anova_oneway

        # groups: x=[1,2], y=[5,6], z=[3,3.5] -> hand ANOVA
        df = spark.createDataFrame(
            [("x", 1.0), ("x", 2.0), ("y", 5.0), ("y", 6.0), ("z", 3.0), ("z", 3.5)],
            "g string, v double",
        )
        r = anova_oneway(df, "g", "v").collect()[0]
        # means 1.5, 5.5, 3.25; grand 3.4166667; ssb=16.0833, ssw=1.125
        ssb, ssw = 16.083333, 1.125
        assert r.k_groups == 3 and r.n == 6
        assert r.f_stat == pytest.approx((ssb / 2) / (ssw / 3), abs=1e-4)
        assert r.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=1e-4)

    def test_identical_groups_f_zero(self, spark):
        from azure_data_engineering_spark.operators.stats import anova_oneway

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)], "g string, v double"
        )
        r = anova_oneway(df, "g", "v").collect()[0]
        assert r.f_stat == pytest.approx(0.0)
        assert r.eta_sq == pytest.approx(0.0)


class TestKendallTauB:
    def test_against_reference_implementation(self, spark):
        from azure_data_engineering_spark.operators.stats import kendall_tau_b

        xs = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 5.0, 7.0]
        ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 4.0, 8.0]
        # pure-python tau-b reference
        n = len(xs)
        c = d = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                sx = (xs[i] < xs[j]) - (xs[i] > xs[j])
                sy = (ys[i] < ys[j]) - (ys[i] > ys[j])
                if sx * sy > 0:
                    c += 1
                elif sx * sy < 0:
                    d += 1
                if xs[i] == xs[j]:
                    tx += 1
                if ys[i] == ys[j]:
                    ty += 1
        n0 = n * (n - 1) // 2
        want = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        r = kendall_tau_b(df, "x", "y").collect()[0]
        assert (r.concordant, r.discordant) == (c, d)
        assert r.tau_b == pytest.approx(want, abs=1e-6)

    def test_perfect_concordance(self, spark):
        from azure_data_engineering_spark.operators.stats import kendall_tau_b

        df = spark.createDataFrame(
            [(float(i), float(i * 2)) for i in range(6)], "x double, y double"
        )
        r = kendall_tau_b(df, "x", "y").collect()[0]
        assert r.tau_b == pytest.approx(1.0)


class TestNelsonAalen:
    def test_hand_computed_hazard(self, spark):
        from azure_data_engineering_spark.operators.stats import nelson_aalen

        # durations (event): 3(1) 5(1) 5(0) 8(1) 10(0)
        df = spark.createDataFrame(
            [(3, 1), (5, 1), (5, 0), (8, 1), (10, 0)], "duration long, ev int"
        )
        got = {r.duration: r for r in nelson_aalen(df, "duration", "ev").collect()}
        assert got[3].n_risk == 5 and got[3].cum_hazard == pytest.approx(1 / 5, abs=1e-6)
        assert got[5].n_risk == 4 and got[5].cum_hazard == pytest.approx(
            1 / 5 + 1 / 4, abs=1e-6
        )
        assert got[8].cum_hazard == pytest.approx(1 / 5 + 1 / 4 + 1 / 2, abs=1e-6)
        assert got[8].survival_fh == pytest.approx(math.exp(-(1 / 5 + 1 / 4 + 1 / 2)), abs=1e-6)
        # censored-only duration adds no hazard
        assert got[10].cum_hazard == got[8].cum_hazard

    def test_survival_dominates_kaplan_meier(self, spark):
        """exp(-H) >= KM product-limit at every time (standard bound)."""
        from azure_data_engineering_spark.operators.stats import kaplan_meier, nelson_aalen

        rows = [(int(i % 13 + 1), int(i % 3 != 0)) for i in range(60)]
        df = spark.createDataFrame(rows, "duration long, ev int")
        km = {r.duration: r.survival for r in kaplan_meier(df, "duration", "ev").collect()}
        na = {r.duration: r.survival_fh for r in nelson_aalen(df, "duration", "ev").collect()}
        assert set(km) == set(na)
        for t in km:
            assert na[t] >= km[t] - 1e-9


class TestCuped:
    def test_variance_shrinks_and_effect_preserved(self, spark):
        from azure_data_engineering_spark.operators.stats import cuped_adjust

        # post strongly predicted by pre + small variant effect
        rows = []
        for i in range(200):
            pre = float(i % 50)
            variant = i % 2
            post = 2.0 * pre + 5.0 * variant + float((i * 7) % 3)
            rows.append((variant, pre, post))
        df = spark.createDataFrame(rows, "variant int, pre double, post double")
        got = {r.variant: r for r in cuped_adjust(df, "variant", "pre", "post").collect()}
        for v in (0, 1):
            assert got[v].var_adjusted < got[v].var_post * 0.2  # big reduction
        # the fixture is pre-imbalanced (even i -> variant 0, so mean pre
        # differs by 1 between variants): the RAW diff is confounded by
        # 2*1 of covariate imbalance; CUPED removes exactly that and
        # recovers the injected +5 effect
        raw_diff = got[1].mean_post - got[0].mean_post
        adj_diff = got[1].mean_adjusted - got[0].mean_adjusted
        assert raw_diff == pytest.approx(7.0, abs=0.2)   # confounded
        assert adj_diff == pytest.approx(5.0, abs=0.2)   # true effect

    def test_uncorrelated_covariate_changes_nothing_much(self, spark):
        from azure_data_engineering_spark.operators.stats import cuped_adjust

        rows = [(i % 2, float(i % 7), float((i * 11) % 5)) for i in range(100)]
        df = spark.createDataFrame(rows, "variant int, pre double, post double")
        got = {r.variant: r for r in cuped_adjust(df, "variant", "pre", "post").collect()}
        for v in (0, 1):
            assert got[v].var_adjusted == pytest.approx(got[v].var_post, rel=0.2)


class TestBhFdr:
    def test_textbook_example(self, spark):
        from azure_data_engineering_spark.operators.stats import bh_fdr

        pv = spark.createDataFrame(
            [("a", 0.001), ("b", 0.04), ("c", 0.03), ("d", 0.9), ("e", 0.2)],
            "k string, p double",
        )
        got = {r.key: r for r in bh_fdr(pv, "k", "p").collect()}
        assert got["a"].bh_q == pytest.approx(0.005)
        assert got["c"].bh_q == pytest.approx(0.066667, abs=1e-6)
        assert got["b"].bh_q == pytest.approx(0.066667, abs=1e-6)  # tail min
        assert got["e"].bh_q == pytest.approx(0.25)
        assert got["d"].bh_q == pytest.approx(0.9)
        assert got["a"].reject == 1
        assert sum(r.reject for r in got.values()) == 1

    def test_monotone_in_rank(self, spark):
        from azure_data_engineering_spark.operators.stats import bh_fdr

        pv = spark.createDataFrame(
            [(f"k{i}", float((i * 37 % 100) + 1) / 200.0) for i in range(20)],
            "k string, p double",
        )
        rows = sorted(bh_fdr(pv, "k", "p").collect(), key=lambda r: r.bh_rank)
        for a, b in zip(rows, rows[1:]):
            assert a.bh_q <= b.bh_q + 1e-12


class TestGopherRules:
    def test_counts_and_flags(self, spark):
        from azure_data_engineering_spark.operators.quality import gopher_quality_rules

        good = "the quick brown results are good and that they have come with " * 6
        short = "too short to pass the gate with that have"
        symbols = ("the and of that have with " + "#tag " * 20) * 4
        df = spark.createDataFrame(
            [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in gopher_quality_rules(df, "text", "doc_id", min_words=50).collect()}
        assert got[1].keep == 1
        assert got[2].rule_n_words == 0 and got[2].keep == 0
        assert got[3].rule_symbol_ratio == 0 and got[3].keep == 0
        # hand-check counts on the short doc
        assert got[2].n_words == 9
        assert got[2].stop_hits == 5  # to, the, with, that, have
        assert got[2].alpha_words == 9

    def test_mean_word_len_rule_integer_exact(self, spark):
        from azure_data_engineering_spark.operators.quality import gopher_quality_rules

        # 50 words of length exactly 2 -> mean 2 < 3 -> fails mean_len only
        text = " ".join(["ab"] * 25 + ["the", "to", "of", "and"] * 6 + ["xy"])
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = gopher_quality_rules(df, "text", "doc_id", min_words=40).collect()[0]
        assert r.rule_mean_len == 0 and r.rule_n_words == 1 and r.rule_stopwords == 1


class TestTextRank:
    def test_hub_word_ranks_first(self, spark):
        from azure_data_engineering_spark.operators.keywords import textrank_keywords

        # 'spark' is adjacent to every other content word
        docs = [
            (1, "spark engine spark cluster spark shuffle"),
            (2, "spark catalyst spark tungsten"),
            (3, "engine cluster shuffle catalyst tungsten"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = textrank_keywords(df, "doc_id", "text", top_n=10).collect()
        by_pos = sorted(rows, key=lambda r: r.position)
        assert by_pos[0].word == "spark"
        total = sum(r.rank for r in rows)
        assert total == pytest.approx(1.0, abs=0.01)  # rank mass conserved

    def test_stopwords_and_short_tokens_excluded(self, spark):
        from azure_data_engineering_spark.operators.keywords import textrank_word_edges

        df = spark.createDataFrame(
            [(1, "the cat sat on a mat with it")], "doc_id long, text string"
        )
        edges = {(r.src, r.dst) for r in textrank_word_edges(df, "doc_id", "text").collect()}
        words = {w for e in edges for w in e}
        assert "the" not in words and "on" not in words and "it" not in words
        assert ("cat", "sat") in edges and ("sat", "cat") in edges


class TestMapAtK:
    def test_perfect_and_worst_ranking(self, spark):
        from azure_data_engineering_spark.operators.retrieval_eval import map_at_k

        truth = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        got = {r.k: r.map for r in map_at_k(truth, truth, ks=(1, 3)).collect()}
        assert got[1] == pytest.approx(1.0)
        assert got[3] == pytest.approx(1.0)
        # candidate list with zero overlap scores 0
        miss = spark.createDataFrame(
            [(1, 99, 1), (1, 98, 2), (1, 97, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        got = {r.k: r.map for r in map_at_k(miss, truth, ks=(3,)).collect()}
        assert got[3] == pytest.approx(0.0)

    def test_hand_computed_ap(self, spark):
        from azure_data_engineering_spark.operators.retrieval_eval import map_at_k

        truth = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        # candidate: rel at ranks 2 and 3 only -> AP@3 = (1/2 + 2/3)/3
        ann = spark.createDataFrame(
            [(1, 99, 1), (1, 10, 2), (1, 11, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        got = {r.k: r.map for r in map_at_k(ann, truth, ks=(3,)).collect()}
        assert got[3] == pytest.approx((0.5 + 2 / 3) / 3, abs=1e-6)


class TestReciprocalRankFusion:
    def test_agreement_wins(self, spark):
        from azure_data_engineering_spark.operators.retrieval_eval import (
            reciprocal_rank_fusion,
        )

        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (1, 10, 2), (1, 13, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        rows = sorted(
            reciprocal_rank_fusion([a, b], k0=60, top_k=4).collect(),
            key=lambda r: r.fused_rank,
        )
        # 10: 1/61+1/62 ; 11: 1/62+1/61 (tie, id order) ; 12: 1/63 ; 13: 1/63
        assert [r.neighbor_id for r in rows] == [10, 11, 12, 13]
        assert rows[0].n_lists == 2 and rows[2].n_lists == 1
        assert rows[0].rrf_score == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)


class TestTCloseness:
    def test_skewed_group_flagged(self, spark):
        from azure_data_engineering_spark.operators.privacy import t_closeness_audit

        rows = []
        # group A mirrors the global distribution; group B is all-0
        for i in range(60):
            rows.append(("A", i % 3))
        for i in range(30):
            rows.append(("B", 0))
        df = spark.createDataFrame(rows, "g string, s int")
        got = {r.g: r for r in t_closeness_audit(df, ["g"], "s", t=0.2).collect()}
        assert got["B"].emd > got["A"].emd
        assert got["B"].t_ok == 0
        # hand EMD for B: global q = (40+30)/90, 20/90, 20/90; p = (1,0,0)
        q0 = 50 / 90
        r1 = 1 - q0
        r2 = r1 - 20 / 90
        want = (abs(r1) + abs(r2) + 0.0) / 2  # cum after last value is 0
        assert got["B"].emd == pytest.approx(want, abs=1e-5)

    def test_identical_distribution_zero(self, spark):
        from azure_data_engineering_spark.operators.privacy import t_closeness_audit

        rows = [("A", i % 4) for i in range(40)] + [("B", i % 4) for i in range(80)]
        df = spark.createDataFrame(rows, "g string, s int")
        for r in t_closeness_audit(df, ["g"], "s", t=0.01).collect():
            assert r.emd == pytest.approx(0.0, abs=1e-9)
            assert r.t_ok == 1


class TestSeasonalDecompose:
    def test_pure_seasonal_recovered(self, spark):
        from azure_data_engineering_spark.operators.timeseries import (
            seasonal_decompose_ma,
        )

        # constant trend 100 + weekly pattern [-3..3] (sums to 0 over 7)
        pat = [-3, -1, 0, 1, 3, 2, -2]
        rows = [(f"d{i:03d}", 100 + pat[i % 7]) for i in range(28)]
        df = spark.createDataFrame(rows, "t string, v long")
        got = {r.t: r for r in seasonal_decompose_ma(df, "t", "v", period=7).collect()}
        # interior rows: trend == 100, seasonal == pattern, residual == 0
        r = got["d010"]
        assert r.trend == pytest.approx(100.0, abs=1e-6)
        assert r.seasonal == pytest.approx(pat[10 % 7], abs=1e-6)
        assert r.residual == pytest.approx(0.0, abs=1e-6)
        # edges have no full window
        assert got["d000"].trend is None and got["d027"].trend is None

    def test_even_period_rejected(self, spark):
        from azure_data_engineering_spark.operators.timeseries import (
            seasonal_decompose_ma,
        )

        df = spark.createDataFrame([("a", 1)], "t string, v long")
        with pytest.raises(ValueError):
            seasonal_decompose_ma(df, "t", "v", period=6)


class TestTrajectorySpeedScreen:
    def test_jump_flagged(self, spark):
        import datetime as dt

        from azure_data_engineering_spark.operators.spatial import (
            trajectory_speed_screen,
        )

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            # user 1: 3 fixes, ~1.11 km apart (0.01 deg lat), 1 hour gaps
            (1, base, 40.00, -100.0),
            (1, base + dt.timedelta(hours=1), 40.01, -100.0),
            (1, base + dt.timedelta(hours=2), 40.02, -100.0),
            # user 2: teleports ~550 km in one minute -> jump
            (2, base, 40.0, -100.0),
            (2, base + dt.timedelta(minutes=1), 45.0, -100.0),
        ]
        df = spark.createDataFrame(rows, "u long, ts timestamp, lat double, lon double")
        got = {
            r.entity: r
            for r in trajectory_speed_screen(df, "u", "ts", "lat", "lon").collect()
        }
        assert got[1].n_legs == 2 and got[1].n_jumps == 0
        assert got[1].max_speed_kmh < 2.0
        assert got[2].n_legs == 1 and got[2].n_jumps == 1
        assert got[2].max_speed_kmh > 30000
        # 0.01 deg latitude ~ 1.112 km
        assert got[1].total_km == pytest.approx(2 * 1.112, abs=0.01)

    def test_zero_dt_legs_dropped(self, spark):
        import datetime as dt

        from azure_data_engineering_spark.operators.spatial import (
            trajectory_speed_screen,
        )

        base = dt.datetime(2024, 1, 1)
        rows = [(1, base, 40.0, -100.0), (1, base, 41.0, -100.0),
                (1, base + dt.timedelta(hours=1), 41.0, -100.0)]
        df = spark.createDataFrame(rows, "u long, ts timestamp, lat double, lon double")
        r = trajectory_speed_screen(df, "u", "ts", "lat", "lon").collect()[0]
        assert r.n_legs == 1  # the duplicate-timestamp leg is excluded


class TestPreferencePairs:
    def test_argmax_argmin_and_margin_gate(self, spark):
        from azure_data_engineering_spark.operators.preference import preference_pairs

        rows = [
            ("g1", 1, 0.9), ("g1", 2, 0.1), ("g1", 3, 0.5),
            ("g2", 4, 0.5), ("g2", 5, 0.45),      # margin 0.05 < 0.2 -> gated
            ("g3", 6, 0.7),                        # singleton -> no pair
        ]
        df = spark.createDataFrame(rows, "g string, id long, score double")
        got = {r.group: r for r in preference_pairs(df, "g", "id", "score", min_margin=0.2).collect()}
        assert list(got) == ["g1"]
        assert (got["g1"].chosen_id, got["g1"].rejected_id) == (1, 2)
        assert got["g1"].margin == pytest.approx(0.8)

    def test_tie_breaks_to_smallest_id(self, spark):
        from azure_data_engineering_spark.operators.preference import preference_pairs

        rows = [("g", 7, 1.0), ("g", 3, 1.0), ("g", 9, 0.0), ("g", 5, 0.0)]
        df = spark.createDataFrame(rows, "g string, id long, score double")
        r = preference_pairs(df, "g", "id", "score").collect()[0]
        assert (r.chosen_id, r.rejected_id) == (3, 5)


class TestSpanCorruption:
    def test_spans_and_sentinels(self, spark):
        from azure_data_engineering_spark.operators.chunking import span_corruption

        text = " ".join(f"t{i}" for i in range(25))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = span_corruption(df, "doc_id", "text", span_len=3, stride=10).collect()[0]
        assert r.n_tokens == 25 and r.n_spans == 3
        # corrupted + targets together reconstruct the token multiset
        corr_toks = [t for t in r.corrupted.split() if not t.startswith("<extra")]
        targ_toks = [t for t in r.targets.split() if not t.startswith("<extra")]
        assert sorted(corr_toks + targ_toks) == sorted(text.split())
        # sentinels are ordinal and matched across the two strings
        assert r.corrupted.count("<extra_id_") == 3
        assert r.targets.count("<extra_id_") == 3
        for k in range(3):
            assert f"<extra_id_{k}>" in r.corrupted and f"<extra_id_{k}>" in r.targets

    def test_short_doc_untouched(self, spark):
        from azure_data_engineering_spark.operators.chunking import span_corruption

        df = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
        r = span_corruption(df, "doc_id", "text", span_len=3, stride=10).collect()[0]
        assert r.n_spans in (0, 1)  # depends on the md5 offset
        if r.n_spans == 0:
            assert r.corrupted == "a b c" and r.targets == ""

    def test_stride_guard(self, spark):
        from azure_data_engineering_spark.operators.chunking import span_corruption

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            span_corruption(df, "doc_id", "text", span_len=5, stride=5)


class TestKTruss:
    def test_triangle_clique_survives_bridge_dropped(self, spark):
        from azure_data_engineering_spark.operators.graph import k_truss_prune

        # K4 clique {1,2,3,4} (every edge in 2 triangles) + bridge 4-5
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r.a, r.b): r.support for r in k_truss_prune(df, k=4, rounds=2).collect()}
        assert (4, 5) not in got           # bridge: support 0
        assert set(got) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
        assert all(s == 2 for s in got.values())

    def test_k_core_keeps_what_truss_rejects(self, spark):
        """A 4-cycle is a 2-core everywhere but has NO triangles, so a
        4-truss (support>=2) drops it entirely — the star/bridge
        rejection that makes truss strictly stronger."""
        from azure_data_engineering_spark.operators.graph import k_core_prune, k_truss_prune

        cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
        df = spark.createDataFrame(cyc, "src long, dst long")
        core = k_core_prune(df, k=2, rounds=2).collect()
        truss = k_truss_prune(df, k=3, rounds=2).collect()
        assert len(core) == 4 and len(truss) == 0


class TestWindowFunnel:
    def test_deadline_respected(self, spark):
        import datetime as dt

        from azure_data_engineering_spark.operators.funnel import window_funnel

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            # user 1: view -> purchase after 10 min (converts)
            (1, base, "view"),
            (1, base + dt.timedelta(minutes=10), "purchase"),
            # user 2: view -> purchase after 45 min (misses the 30-min window)
            (2, base, "view"),
            (2, base + dt.timedelta(minutes=45), "purchase"),
            # user 3: purchase BEFORE the view only (no conversion)
            (3, base - dt.timedelta(minutes=5), "purchase"),
            (3, base, "view"),
            # user 4: two views, one purchase between them
            (4, base, "view"),
            (4, base + dt.timedelta(minutes=5), "purchase"),
            (4, base + dt.timedelta(minutes=20), "view"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        r = window_funnel(df, "user_id", "ts", "event_type", "view", "purchase", 1800).collect()[0]
        assert r.n_source == 5
        assert r.n_converted == 2  # user 1 and user 4's first view
        assert r.conv_rate == pytest.approx(0.4)
        # latencies of converted: 600s and 300s -> median 450s
        assert r.median_latency_us == pytest.approx(450 * 1e6)

    def test_no_conversions_null_median(self, spark):
        import datetime as dt

        from azure_data_engineering_spark.operators.funnel import window_funnel

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, base, "view"), (2, base, "view")],
            "user_id long, ts timestamp, event_type string",
        )
        r = window_funnel(df, "user_id", "ts", "event_type", "view", "purchase", 60).collect()[0]
        assert r.n_converted == 0 and r.median_latency_us is None


class TestSoftmaxGd:
    def test_separable_three_classes(self, spark):
        from azure_data_engineering_spark.operators.mlplan import softmax_gd

        # linearly separable: x1 orders class 0 vs 2, x2 marks class 1
        rows = []
        for i in range(120):
            cls = i % 3
            x1 = float((cls - 1) * 4 + (i * 7 % 5) * 0.2)
            x2 = 1.0 if cls == 1 else 0.0
            rows.append((x1, x2, cls))
        df = spark.createDataFrame(rows, "x1 double, x2 double, cls long")
        r = softmax_gd(df, "x1", "x2", "cls", k_classes=3, iterations=30, lr=1.0).collect()[0]
        assert r.accuracy >= 0.95
        assert r.log_loss < 0.6
        # slope for the high class exceeds the low class (ordered boundary)
        assert r.w2_1 > r.w0_1
        # the middle class leans on its marker feature
        assert r.w1_2 > max(r.w0_2, r.w2_2)

    def test_two_class_reduces_to_logistic_shape(self, spark):
        from azure_data_engineering_spark.operators.mlplan import softmax_gd

        rows = [(float(i % 10), 0.0, int(i % 10 >= 5)) for i in range(100)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, cls long")
        r = softmax_gd(df, "x1", "x2", "cls", k_classes=2, iterations=60, lr=2.0).collect()[0]
        assert r.accuracy >= 0.9


class TestCrossCorrelation:
    def test_known_lead_lag(self, spark):
        from azure_data_engineering_spark.operators.timeseries import cross_correlation

        # y is x shifted 2 periods later: ccf peaks at lag +2
        xs = [float((i * 7) % 13) for i in range(40)]
        rows = [(f"t{i:02d}", xs[i], xs[i - 2] if i >= 2 else 0.0) for i in range(40)]
        df = spark.createDataFrame(rows, "t string, x double, y double")
        got = {r.lag: r.ccf for r in cross_correlation(df, "t", "x", "y", max_lag=3).collect()}
        assert got[2] == max(got.values())
        assert got[2] > 0.8

    def test_lag_zero_is_pearson(self, spark):
        from azure_data_engineering_spark.operators.stats import pearson_matrix
        from azure_data_engineering_spark.operators.timeseries import cross_correlation

        rows = [(f"t{i:02d}", float(i % 9), float((i * 3) % 7)) for i in range(30)]
        df = spark.createDataFrame(rows, "t string, x double, y double")
        ccf0 = {r.lag: r.ccf for r in cross_correlation(df, "t", "x", "y", max_lag=1).collect()}[0]
        corr = pearson_matrix(df, ["x", "y"]).collect()[0].corr
        assert ccf0 == pytest.approx(corr, abs=1e-6)


class TestLogrank:
    def test_identical_groups_not_significant(self, spark):
        from azure_data_engineering_spark.operators.stats import logrank_test

        rows = []
        for g in (0, 1):
            for i in range(40):
                rows.append((g, i % 8 + 1, int(i % 3 != 0)))
        df = spark.createDataFrame(rows, "g int, duration long, ev int")
        r = logrank_test(df, "g", "duration", "ev").collect()[0]
        assert r.chi2 == pytest.approx(0.0, abs=1e-6)
        assert r.p_value > 0.9
        assert r.observed1 == pytest.approx(r.expected1, abs=1e-4)

    def test_separated_groups_significant(self, spark):
        from azure_data_engineering_spark.operators.stats import logrank_test

        rows = []
        for i in range(40):
            rows.append((0, i % 3 + 1, 1))    # group 0 dies early
            rows.append((1, i % 3 + 20, 1))   # group 1 survives long
        df = spark.createDataFrame(rows, "g int, duration long, ev int")
        r = logrank_test(df, "g", "duration", "ev").collect()[0]
        assert r.chi2 > 10
        assert r.p_value < 0.01

    def test_three_groups_rejected(self, spark):
        from azure_data_engineering_spark.operators.stats import logrank_test

        df = spark.createDataFrame(
            [(0, 1, 1), (1, 2, 1), (2, 3, 1)], "g int, duration long, ev int"
        )
        with pytest.raises(ValueError):
            logrank_test(df, "g", "duration", "ev")
