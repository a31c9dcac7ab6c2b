"""Round-9 wave-L operators: nearest-direction as-of join, degree
assortativity, script-mixing screen, expected reciprocal rank."""

from __future__ import annotations

import pytest


class TestAsofNearest:
    def _run(self, spark, left_rows, right_rows):
        from azure_data_engineering_spark.operators.relational import asof_join_big

        left = spark.createDataFrame(left_rows, "k string, t long, lv string")
        right = spark.createDataFrame(right_rows, "k string, rt long, rv string")
        out = asof_join_big(left, right, "t", "rt", ["k"], direction="nearest")
        return {(r.k, r.t): r.rv for r in out.collect()}

    def test_picks_closer_side(self, spark):
        got = self._run(
            spark,
            [("a", 10, "x"), ("a", 19, "y")],
            [("a", 5, "early"), ("a", 20, "late")],
        )
        assert got[("a", 10)] == "early"  # dist 5 vs 10
        assert got[("a", 19)] == "late"  # dist 14 vs 1

    def test_tie_prefers_backward(self, spark):
        got = self._run(spark, [("a", 10, "x")], [("a", 5, "b"), ("a", 15, "f")])
        assert got[("a", 10)] == "b"

    def test_one_sided(self, spark):
        got = self._run(
            spark,
            [("a", 1, "x"), ("a", 100, "y")],
            [("a", 50, "only")],
        )
        assert got[("a", 1)] == "only" and got[("a", 100)] == "only"

    def test_exact_match_wins(self, spark):
        got = self._run(spark, [("a", 10, "x")], [("a", 10, "here"), ("a", 11, "next")])
        assert got[("a", 10)] == "here"


class TestAssortativity:
    def _run(self, spark, edge_list):
        from azure_data_engineering_spark.operators.graph import degree_assortativity

        both = sorted(set(edge_list + [(d, s) for s, d in edge_list]))
        df = spark.createDataFrame(both, "src long, dst long")
        return degree_assortativity(df).collect()[0]

    def test_star_disassortative(self, spark):
        # star: hub degree k links only to degree-1 leaves -> r = -1
        r = self._run(spark, [(0, i) for i in range(1, 6)])
        assert r.assortativity == -1.0
        assert r.n_nodes == 6 and r.n_edges == 10

    def test_regular_graph_undefined(self, spark):
        # cycle: every degree 2 -> zero variance -> NULL (guarded)
        r = self._run(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
        assert r.assortativity is None

    def test_two_cliques_bridge(self, spark):
        # two triangles joined by a bridge: mildly disassortative
        edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        r = self._run(spark, edges)
        assert r.assortativity is not None and r.assortativity < 0


class TestScriptMixing:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.quality import script_mixing_stats

        df = spark.createDataFrame(rows, "g string, text string")
        return {r.group: r for r in script_mixing_stats(df, "text", "g").collect()}

    def test_homoglyph_flagged(self, spark):
        rows = [
            ("s", "pure latin text"),
            ("s", "mixed раyраl spoof"),  # Cyrillic а/р inside latin
            ("s", "все кириллица"),  # pure Cyrillic: NOT mixed (no latin)
        ]
        got = self._run(spark, rows)["s"]
        assert got.n_docs == 3 and got.n_mixed_script == 1

    def test_invisible_chars_counted(self, spark):
        rows = [
            ("s", "clean"),
            ("s", "zero​width"),
            ("s", "bidi ‮ attack"),
        ]
        got = self._run(spark, rows)["s"]
        assert got.n_zero_width == 1 and got.n_bidi == 1
        assert abs(got.pct_clean - round(1 / 3, 6)) < 1e-6

    def test_greek_counts_as_confusable(self, spark):
        rows = [("s", "omicron ο inside latin")]
        got = self._run(spark, rows)["s"]
        assert got.n_mixed_script == 1


class TestErr:
    def _frames(self, spark, truth_rows, ann_rows):
        t = spark.createDataFrame(truth_rows, "query_id long, neighbor_id long, rank long")
        a = spark.createDataFrame(ann_rows, "query_id long, neighbor_id long, rank long")
        return a, t

    def test_perfect_ranking_closed_form(self, spark):
        from azure_data_engineering_spark.operators.retrieval_eval import err_at_k

        truth = [(1, 10 + i, i + 1) for i in range(5)]
        ann, t = self._frames(spark, truth, truth)
        r = err_at_k(ann, t, k=5, gmax=4).collect()[0]
        # grades 4,3,2,1,0 -> R = 15/16, 7/16, 3/16, 1/16, 0
        rs = [15 / 16, 7 / 16, 3 / 16, 1 / 16, 0.0]
        err, surv = 0.0, 1.0
        for i, rr in enumerate(rs, start=1):
            err += round(rr / i * surv, 9)
            surv *= 1 - rr
        assert abs(r.err - round(err, 6)) < 1e-5

    def test_top_heavy_beats_tail(self, spark):
        from azure_data_engineering_spark.operators.retrieval_eval import err_at_k

        truth = [(1, 10 + i, i + 1) for i in range(5)]
        # ranking A: true best first; ranking B: true best last
        ann_a = [(1, 10, 1), (1, 14, 2), (1, 13, 3), (1, 12, 4), (1, 11, 5)]
        ann_b = [(1, 14, 1), (1, 13, 2), (1, 12, 3), (1, 11, 4), (1, 10, 5)]
        a1, t1 = self._frames(spark, truth, ann_a)
        ra = err_at_k(a1, t1, k=5, gmax=4).collect()[0].err
        a2, t2 = self._frames(spark, truth, ann_b)
        rb = err_at_k(a2, t2, k=5, gmax=4).collect()[0].err
        assert ra > rb

    def test_irrelevant_ranking_zero(self, spark):
        from azure_data_engineering_spark.operators.retrieval_eval import err_at_k

        truth = [(1, 10, 1)]
        ann = [(1, 99, 1), (1, 98, 2)]
        a, t = self._frames(spark, truth, ann)
        r = err_at_k(a, t, k=5, gmax=4).collect()[0]
        assert r.err == 0.0
