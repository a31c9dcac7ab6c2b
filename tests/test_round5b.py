"""Closed-form fixture tests for the round-5b analytics additions:
Kaplan-Meier survival, Benford screen, CUSUM change-point, ROC AUC,
BFS hops, label propagation, containment pairs, feature hashing,
target encoding, association rules, phonetic blocking key, OHLC
resample, and RFM scores. The oracle gate checks these against
DuckDB at data scale; these pin the semantics on hand-built inputs
with known answers."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.affinity import association_rules
from azure_data_engineering_spark.operators.dedup import containment_pairs
from azure_data_engineering_spark.operators.features import (
    feature_hashing,
    target_encode,
)
from azure_data_engineering_spark.operators.graph import bfs_hops, label_propagation
from azure_data_engineering_spark.operators.linkage import consonant_skeleton_key
from azure_data_engineering_spark.operators.stats import (
    benford_digit_test,
    cusum_changepoint,
    kaplan_meier,
    roc_auc,
)
from azure_data_engineering_spark.operators.window_ops import ohlc_resample, rfm_scores


class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        """3 subjects: event@1, censored@2, event@3.
        S(1)=2/3; S(2)=2/3 (censoring leaves the curve flat);
        S(3)=0 (last at-risk subject dies: d=n)."""
        df = spark.createDataFrame(
            [(1, 1), (2, 0), (3, 1)], "duration long, churned int"
        )
        rows = {r.duration: r for r in kaplan_meier(df, "duration", "churned").collect()}
        assert rows[1].n_risk == 3 and rows[1].n_events == 1
        assert rows[1].survival == pytest.approx(2 / 3, abs=1e-6)
        assert rows[2].n_censored == 1 and rows[2].survival == pytest.approx(2 / 3, abs=1e-6)
        assert rows[3].n_risk == 1 and rows[3].survival == 0.0

    def test_no_events_flat_curve(self, spark):
        df = spark.createDataFrame([(5, 0), (9, 0)], "duration long, churned int")
        out = kaplan_meier(df, "duration", "churned").collect()
        assert all(r.survival == 1.0 for r in out)


class TestBenford:
    def test_digit_histogram(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (1.5,), (20.0,), (300.0,), (-4.0,), (0.0,)], "v double"
        )
        out = {r.digit: r for r in benford_digit_test(df, "v").collect()}
        assert len(out) == 9  # dense 1..9 even when unobserved
        # -4 and 0 excluded: n = 4 positive values
        assert sum(r.n_obs for r in out.values()) == 4
        assert out[1].n_obs == 2 and out[1].obs_p == pytest.approx(0.5)
        assert out[2].exp_p == pytest.approx(0.176091, abs=1e-6)
        assert out[9].n_obs == 0 and out[9].chi_cell > 0

    def test_first_digit_is_lexical_not_log(self, spark):
        """0.042 -> 4; 1000.0 -> 1 (no log10 boundary hazard)."""
        df = spark.createDataFrame([(0.042,), (1000.0,)], "v double")
        out = {r.digit: r.n_obs for r in benford_digit_test(df, "v").collect()}
        assert out[4] == 1 and out[1] == 1


class TestCusumChangepoint:
    def test_level_shift_located(self, spark):
        """[1,1,1,5,5,5]: mean 3, C = [-2,-4,-6,-4,-2,0] -> argmax |C|
        at the 3rd point, the last pre-shift observation."""
        df = spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate([1.0, 1.0, 1.0, 5.0, 5.0, 5.0])],
            "k int, v double",
        )
        r = cusum_changepoint(df, "k", "v").collect()[0]
        assert r.cp_key == 3
        assert r.max_abs_cusum == pytest.approx(6.0)
        assert r.n_points == 6
        # z = 6 / (stddev_pop=2 * sqrt(6))
        assert r.z_stat == pytest.approx(1.2247, abs=1e-4)

    def test_tie_breaks_to_earliest(self, spark):
        """Symmetric series: |C| ties resolve to the earliest point."""
        df = spark.createDataFrame(
            [(1, 1.0), (2, 3.0), (3, 1.0), (4, 3.0)], "k int, v double"
        )
        r = cusum_changepoint(df, "k", "v").collect()[0]
        assert r.cp_key == 1  # |C|=1 at k=1 and k=3; earliest wins


class TestRocAuc:
    def test_hand_counted_auc(self, spark):
        """neg scores {1,2}, pos scores {2,3}: U = 1 + 0.5 + 1 + 1 =
        3.5 -> AUC = 3.5/4 = 0.875 (midrank tie handling)."""
        df = spark.createDataFrame(
            [(1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1)], "score double, label int"
        )
        r = roc_auc(df, "score", "label").collect()[0]
        assert (r.n_pos, r.n_neg) == (2, 2)
        assert r.auc == pytest.approx(0.875)

    def test_perfect_and_inverted(self, spark):
        perfect = spark.createDataFrame(
            [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "score double, label int"
        )
        assert roc_auc(perfect, "score", "label").collect()[0].auc == 1.0
        inverted = spark.createDataFrame(
            [(4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)], "score double, label int"
        )
        assert roc_auc(inverted, "score", "label").collect()[0].auc == 0.0


class TestBfsHops:
    def test_path_graph_bounded(self, spark):
        """0-1-2-3-4 path (both directions), source 0, max_hops 3:
        node 4 unreached."""
        und = [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)]
        df = spark.createDataFrame(und, "src long, dst long")
        got = {r.node: r.hop for r in bfs_hops(df, 0, max_hops=3).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_min_hop_on_shortcut(self, spark):
        """Triangle 0-1-2 plus chain 0-3-2: node 2 is hop 1 via the
        direct edge, not 2 via the chain."""
        edges = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 2)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.hop for r in bfs_hops(df, 0, max_hops=3).collect()}
        assert got[2] == 1 and got[3] == 1

    def test_early_stop_on_empty_frontier(self, spark):
        df = spark.createDataFrame([(0, 1)], "src long, dst long")
        got = {r.node: r.hop for r in bfs_hops(df, 0, max_hops=10).collect()}
        assert got == {0: 0, 1: 1}


class TestLabelPropagation:
    def test_two_components_two_communities(self, spark):
        """Two disjoint triangles converge to one label each."""
        tri = lambda o: [(o + a, o + b) for a in range(3) for b in range(3) if a != b]
        df = spark.createDataFrame(tri(0) + tri(10), "src long, dst long")
        out = label_propagation(df, iterations=3).collect()
        by_label = {}
        for r in out:
            by_label.setdefault(r.label, set()).add(r.node)
        assert len(by_label) == 2
        assert {frozenset(v) for v in by_label.values()} == {
            frozenset({0, 1, 2}),
            frozenset({10, 11, 12}),
        }

    def test_pendant_absorbed(self, spark):
        """Triangle 0,1,2 with pendant 3-2 (both directions): all four
        nodes converge to label 0 after 3 deterministic rounds."""
        e = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (2, 3), (3, 2)]
        df = spark.createDataFrame(e, "src long, dst long")
        out = label_propagation(df, iterations=3).collect()
        assert {r.label for r in out} == {0}
        assert len(out) == 4


class TestContainmentPairs:
    def test_full_containment_oriented(self, spark):
        docs = [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta"),  # subset of 1
            (3, "iota kappa lam mu"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = containment_pairs(df, "text", "doc_id", threshold=0.9, k=1).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.id_small, r.id_big) == (2, 1)
        assert r.containment == 1.0

    def test_asymmetry_vs_jaccard(self, spark):
        """Small-in-big pair passes containment but has low Jaccard."""
        big = " ".join(f"w{i}" for i in range(40))
        docs = [(1, big), (2, "w0 w1 w2 w3")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = containment_pairs(df, "text", "doc_id", threshold=0.9, k=1).collect()
        assert len(out) == 1 and out[0].containment == 1.0  # jaccard would be 0.1

    def test_stop_shingle_guard_drops_hot_tokens(self, spark):
        """With max_df=1 every shared token is stopped: no pairs."""
        docs = [(1, "a b c"), (2, "a b c")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = containment_pairs(df, "text", "doc_id", threshold=0.5, k=1, max_df=1)
        assert out.count() == 0


class TestFeatures:
    def test_feature_hashing_conservation(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "a", 10)], "id long, c1 string, c2 long"
        )
        out = feature_hashing(df, "id", ["c1", "c2"], n_buckets=8).collect()
        assert sum(r.n_rows for r in out) == 6  # 3 rows x 2 columns
        assert all(0 <= r.bucket < 8 for r in out)
        # 4 distinct (col,value) features total
        assert sum(r.n_distinct_values for r in out) >= 4

    def test_target_encode_shrinks_to_prior(self, spark):
        """cats a:[1,1], b:[3]; m=1 -> gm=5/3;
        enc(a)=(2+5/3)/3, enc(b)=(3+5/3)/2."""
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 3.0)], "cat string, y double"
        )
        out = {r.category: r for r in target_encode(df, "cat", "y", m=1.0).collect()}
        assert out["a"].raw_mean == pytest.approx(1.0)
        assert out["a"].encoded == pytest.approx(round((2 + 5 / 3) / 3, 4))
        assert out["b"].encoded == pytest.approx(round((3 + 5 / 3) / 2, 4))
        # rare category pulled toward gm more than the frequent one
        assert abs(out["b"].encoded - out["b"].raw_mean) > abs(
            out["a"].encoded - out["a"].raw_mean
        )


class TestAssociationRules:
    def test_support_confidence_lift(self, spark):
        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")]
        df = spark.createDataFrame(rows, "bk long, item string")
        out = {
            (r.antecedent, r.consequent): r
            for r in association_rules(df, "bk", "item", min_pair_count=2).collect()
        }
        assert set(out) == {("x", "y"), ("y", "x")}
        xy = out[("x", "y")]
        assert xy.support == pytest.approx(round(2 / 3, 6))
        assert xy.confidence == pytest.approx(round(2 / 3, 6))
        assert xy.lift == pytest.approx(1.0)
        yx = out[("y", "x")]
        assert yx.confidence == pytest.approx(1.0) and yx.lift == pytest.approx(1.0)

    def test_multiplicity_within_basket_ignored(self, spark):
        rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
        df = spark.createDataFrame(rows, "bk long, item string")
        out = association_rules(df, "bk", "item", min_pair_count=2).collect()
        assert {r.n_pair for r in out} == {2}


class TestPhoneticKey:
    def test_variants_collapse(self, spark):
        df = spark.createDataFrame(
            [("Jonathan",), ("Jonothon",), ("smith",), ("smyth",), ("widget",)],
            "name string",
        )
        out = df.select(
            "name", consonant_skeleton_key(F.col("name")).alias("k")
        ).collect()
        keys = {r.name: r.k for r in out}
        assert keys["Jonathan"] == keys["Jonothon"]
        assert keys["smith"] == keys["smyth"] == "smt"  # h/y in drop class
        assert keys["widget"] != keys["smith"]


class TestOhlcResample:
    def test_total_order_tiebreak(self, spark):
        """Two ticks at the identical timestamp: the lower event id is
        the open, the higher the close."""
        t = datetime.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            ("k", t, 5.0, 2),
            ("k", t, 9.0, 1),
            ("k", t + datetime.timedelta(hours=1), 1.0, 3),
        ]
        df = spark.createDataFrame(rows, "key string, ts timestamp, v double, id long")
        r = ohlc_resample(df, "key", "ts", "v", "id").collect()[0]
        assert (r.open, r.close) == (9.0, 1.0)  # id 1 first, id 3 last
        assert (r.high, r.low) == (9.0, 1.0)
        assert r.n == 3 and r.total == pytest.approx(15.0)

    def test_pre_epoch_timestamp_fails_loudly(self, spark):
        """ADVICE r5: the zero-pad order key silently mis-sorts
        pre-1970 timestamps (negative unix_micros) — the shared
        total_order_key now asserts the precondition in-plan."""
        t = datetime.datetime(1969, 12, 31, 23, 0, 0)
        df = spark.createDataFrame(
            [("k", t, 1.0, 1)], "key string, ts timestamp, v double, id long"
        )
        with pytest.raises(Exception, match="total_order_key"):
            ohlc_resample(df, "key", "ts", "v", "id").collect()

    def test_overlong_id_fails_loudly(self, spark):
        """lpad TRUNCATES ids beyond 20 chars, collapsing distinct
        keys — asserted instead of silently nondeterministic."""
        t = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("k", t, 1.0, "x" * 21)],
            "key string, ts timestamp, v double, id string",
        )
        with pytest.raises(Exception, match="total_order_key"):
            ohlc_resample(df, "key", "ts", "v", "id").collect()


class TestRfmScores:
    def test_quintile_orientation(self, spark):
        """5 customers with strictly increasing recency/frequency/
        monetary: the best customer scores 5-5-5."""
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for c in range(5):
            # customer c: c+1 orders, last order c days before the ref
            for i in range(c + 1):
                rows.append((c, base + datetime.timedelta(days=c - 4 + i * 0), 100.0 * (c + 1)))
        df = spark.createDataFrame(rows, "cust long, ts timestamp, amt double")
        out = {r.entity: r for r in rfm_scores(df, "cust", "ts", "amt").collect()}
        best = out[4]  # most orders, most recent, biggest spend
        assert (best.r_score, best.f_score, best.m_score) == (5, 5, 5)
        assert best.segment == "5-5-5"
        worst = out[0]
        assert (worst.r_score, worst.f_score, worst.m_score) == (1, 1, 1)


from azure_data_engineering_spark.operators.graph import k_core_prune
from azure_data_engineering_spark.operators.similarity import knn_classify
from azure_data_engineering_spark.operators.window_ops import path_ngrams


class TestKCore:
    def test_pendant_chain_peeled(self, spark):
        """Triangle 0,1,2 + chain 2-3-4: degree-1 nodes peel away
        round by round; the 2-core is exactly the triangle."""
        e = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
        df = spark.createDataFrame(e, "src long, dst long")
        out = {r.node: r.degree for r in k_core_prune(df, k=2, rounds=3).collect()}
        assert out == {0: 2, 1: 2, 2: 2}

    def test_fixed_rounds_stop_early_peels_only(self, spark):
        """Path 0-1-2-3-4-5 with k=2: each round removes the two
        endpoints; after exactly 1 round nodes 0 and 5 are gone but
        1 and 4 (now degree-1) remain."""
        e = [(i, i + 1) for i in range(5)]
        df = spark.createDataFrame(e, "src long, dst long")
        out = {r.node for r in k_core_prune(df, k=2, rounds=1).collect()}
        assert out == {1, 2, 3, 4}
        # full peel empties the path (no 2-core exists)
        assert k_core_prune(df, k=2, rounds=3).count() == 0

    def test_direction_duplicates_canonicalized(self, spark):
        e = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 1)]
        df = spark.createDataFrame(e, "src long, dst long")
        out = {r.node: r.degree for r in k_core_prune(df, k=2, rounds=2).collect()}
        assert out == {0: 2, 1: 2, 2: 2}


class TestPathNgrams:
    def test_trigram_counts_with_total_order(self, spark):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "a"),
            (1, t0, 2, "b"),  # same ts: id breaks the tie
            (1, t0 + datetime.timedelta(seconds=1), 3, "c"),
            (1, t0 + datetime.timedelta(seconds=2), 4, "a"),
            (2, t0, 5, "a"),
            (2, t0 + datetime.timedelta(seconds=1), 6, "b"),
        ]
        df = spark.createDataFrame(rows, "u long, ts timestamp, id long, s string")
        out = {
            (r.s1, r.s2, r.s3): r.n_paths
            for r in path_ngrams(df, "u", "ts", "id", "s", n=3).collect()
        }
        # user 1 sequence a,b,c,a -> trigrams (a,b,c), (b,c,a);
        # user 2 has only 2 events -> none
        assert out == {("a", "b", "c"): 1, ("b", "c", "a"): 1}

    def test_bigram_matches_markov_shape(self, spark):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = [(1, t0 + datetime.timedelta(seconds=i), i, s)
                for i, s in enumerate(["x", "y", "x", "y"])]
        df = spark.createDataFrame(rows, "u long, ts timestamp, id long, s string")
        out = {
            (r.s1, r.s2): r.n_paths
            for r in path_ngrams(df, "u", "ts", "id", "s", n=2).collect()
        }
        assert out == {("x", "y"): 2, ("y", "x"): 1}


class TestKnnClassify:
    def test_majority_vote_and_tiebreak(self, spark):
        """Query at origin-ish; 2 neighbors labeled 1, 2 labeled 0 at
        equal distance -> 2-2 vote tie at k=4 resolves to label 0."""
        rows = [
            (100, [1.0, 0.0], 9),  # query; own label irrelevant
            (1, [1.0, 0.1], 1),
            (2, [1.0, -0.1], 1),
            (3, [1.0, 0.1], 0),
            (4, [1.0, -0.1], 0),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        q = df.filter(F.col("vec_id") == 100)
        c = df.filter(F.col("vec_id") != 100)
        r = knn_classify(q, c, "label", k=4).collect()[0]
        assert r.predicted_label == 0  # tie -> smallest label
        assert r.n_votes == 2

    def test_clear_majority(self, spark):
        rows = [
            (100, [1.0, 0.0], 9),
            (1, [0.9, 0.1], 1),
            (2, [0.9, -0.1], 1),
            (3, [-1.0, 0.0], 0),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        q = df.filter(F.col("vec_id") == 100)
        c = df.filter(F.col("vec_id") != 100)
        r = knn_classify(q, c, "label", k=2).collect()[0]
        assert r.predicted_label == 1 and r.n_votes == 2


class TestStreamingOhlc:
    def test_stream_matches_batch_bars(self, spark, sf_dir):
        """ohlc_bars on the real incremental engine == the same
        transform on the batch frame (stream/batch contract),
        including same-timestamp tie resolution."""
        import os

        from azure_data_engineering_spark.catalog import load_table
        from azure_data_engineering_spark.streaming.windows import (
            ohlc_bars,
            run_stream_to_table,
        )

        streamed = run_stream_to_table(
            spark,
            os.path.join(sf_dir, "events.parquet"),
            lambda s: ohlc_bars(s, window_len="1 day", watermark="2 hours"),
            table_name="t_stream_ohlc_test",
            output_mode="complete",
        )
        batch = ohlc_bars(load_table(spark, sf_dir, "events"), window_len="1 day")
        got = {tuple(r) for r in streamed.collect()}
        want = {tuple(r) for r in batch.collect()}
        assert got == want and len(got) > 0


from azure_data_engineering_spark.functions.text import (
    flesch_reading_ease,
    sentence_count,
    syllable_count,
)
from azure_data_engineering_spark.operators.affinity import item_similarity
from azure_data_engineering_spark.operators.graph import hits
from azure_data_engineering_spark.operators.linkage import golden_record
from azure_data_engineering_spark.operators.quality import novelty_score
from azure_data_engineering_spark.operators.stats import winsorize


class TestNoveltyScore:
    def test_fractions(self, spark):
        ref = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        docs = spark.createDataFrame(
            [(10, "a b c d"), (11, "x y z w")], "doc_id long, text string"
        )
        out = {r.id: r for r in novelty_score(docs, "text", "doc_id", ref, "text", k=2).collect()}
        assert out[10].novelty == 0.0  # every 2-gram seen in ref
        assert out[11].novelty == 1.0  # nothing shared
        assert out[10].n_grams == 3 and out[10].n_seen == 3


class TestWinsorize:
    def test_clip_bounds_and_flags(self, spark):
        rows = [("g", float(v)) for v in range(1, 11)]  # 1..10
        df = spark.createDataFrame(rows, "g string, v double")
        out = winsorize(df, "g", "v", lo=0.1, hi=0.9).collect()
        # p10 = 1.9, p90 = 9.1 (linear interpolation at p*(n-1))
        assert out[0].p_lo == pytest.approx(1.9)
        assert out[0].p_hi == pytest.approx(9.1)
        clipped = {r.v: (r.v_wins, r.is_clipped) for r in out}
        assert clipped[1.0] == (pytest.approx(1.9), True)
        assert clipped[10.0] == (pytest.approx(9.1), True)
        assert clipped[5.0] == (5.0, False)
        assert len(out) == 10  # no rows dropped


class TestItemSimilarity:
    def test_cosine_values(self, spark):
        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x")]
        df = spark.createDataFrame(rows, "bk long, item string")
        out = item_similarity(df, "bk", "item", min_pair_count=2).collect()
        assert len(out) == 1
        r = out[0]
        # n_xy=2, n_x=3, n_y=2 -> 2/sqrt(6)
        assert (r.item_a, r.item_b) == ("x", "y")
        assert r.cosine == pytest.approx(round(2 / (6 ** 0.5), 6))


class TestReadability:
    def test_counts_and_formula(self, spark):
        df = spark.createDataFrame([("The cat sat. It ran!",)], "t string")
        r = df.select(
            syllable_count(F.col("t")).alias("syl"),
            sentence_count(F.col("t")).alias("sen"),
            F.round(flesch_reading_ease(F.col("t")), 4).alias("f"),
        ).collect()[0]
        # vowel groups: e(The) a(cat) a(sat) i(It) a(ran) = 5; 2 sentences
        assert r.syl == 5
        assert r.sen == 2
        words = 5
        expect = 206.835 - 1.015 * (words / 2) - 84.6 * (5 / words)
        assert r.f == pytest.approx(round(expect, 4))

    def test_unpunctuated_is_one_sentence(self, spark):
        df = spark.createDataFrame([("no punctuation here",)], "t string")
        assert df.select(sentence_count(F.col("t")).alias("s")).collect()[0].s == 1


class TestHits:
    def test_bipartite_authority_ordering(self, spark):
        """Two hubs both point at part 100; only one points at 101:
        100 must out-rank 101 in authority; scores sum to ~1."""
        e = [(1, 100), (2, 100), (2, 101)]
        df = spark.createDataFrame(e, "src long, dst long")
        out = {r.node: r for r in hits(df, iterations=3).collect()}
        assert out[100].authority > out[101].authority
        a_sum = sum(r.authority for r in out.values())
        h_sum = sum(r.hub for r in out.values())
        assert a_sum == pytest.approx(1.0) and h_sum == pytest.approx(1.0)
        # pure-source nodes have authority 0
        assert out[1].authority == 0.0


class TestGoldenRecord:
    def test_survivorship_rules(self, spark):
        rows = [
            (1, "Ann", "AUTO", 50.0),
            (1, "Ann", "AUTO", 40.0),   # stale dup: same segment, lower bal
            (1, "Ann", "X-AUTO", 45.0), # corrupted dup: 1 vote loses 2-1
            (2, "Bob", None, 10.0),     # NULL never beats a non-null...
            (2, "Bob", "BIKE", 9.0),
        ]
        df = spark.createDataFrame(rows, "ck long, name string, seg string, bal double")
        out = {r.cluster: r for r in golden_record(df, "ck", ["seg", "name"], ["bal"]).collect()}
        assert out[1].seg == "AUTO" and out[1].bal == 50.0 and out[1].n_members == 3
        assert out[2].seg == "BIKE" and out[2].name == "Bob"

    def test_mode_tie_breaks_to_smallest(self, spark):
        rows = [(1, "B"), (1, "A")]
        df = spark.createDataFrame(rows, "ck long, seg string")
        out = golden_record(df, "ck", ["seg"]).collect()[0]
        assert out.seg == "A"


from azure_data_engineering_spark.operators.nbayes import naive_bayes_predict


class TestNaiveBayes:
    def test_separable_classes(self, spark):
        train = spark.createDataFrame(
            [
                (1, "apple banana apple", "fruit"),
                (2, "banana apple fruit salad", "fruit"),
                (3, "bolt wrench hammer", "tool"),
                (4, "hammer bolt screwdriver", "tool"),
            ],
            "doc_id long, text string, lbl string",
        )
        test = spark.createDataFrame(
            [(10, "apple banana"), (11, "hammer bolt bolt")],
            "doc_id long, text string",
        )
        out = {
            r.id: r.predicted_label
            for r in naive_bayes_predict(train, test, "text", "lbl", "doc_id").collect()
        }
        assert out == {10: "fruit", 11: "tool"}

    def test_unseen_tokens_back_off_not_crash(self, spark):
        train = spark.createDataFrame(
            [(1, "aa bb", "x"), (2, "cc dd cc", "y")], "doc_id long, text string, lbl string"
        )
        test = spark.createDataFrame(
            [(10, "zz qq")], "doc_id long, text string"
        )
        out = naive_bayes_predict(train, test, "text", "lbl", "doc_id").collect()
        # all tokens unseen: likelihoods equal per token count, prior
        # ties (1 doc each) -> deterministic smallest label wins
        assert out[0].predicted_label == "x"

    def test_prior_breaks_blank_likelihood(self, spark):
        """Class imbalance shows up through the prior when the
        likelihoods tie."""
        train = spark.createDataFrame(
            [(1, "aa", "maj"), (2, "aa", "maj"), (3, "aa", "min")],
            "doc_id long, text string, lbl string",
        )
        test = spark.createDataFrame([(10, "aa")], "doc_id long, text string")
        out = naive_bayes_predict(train, test, "text", "lbl", "doc_id").collect()
        assert out[0].predicted_label == "maj"
