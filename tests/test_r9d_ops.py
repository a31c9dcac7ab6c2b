"""Round-9 wave-E operators: k-source betweenness centrality,
Neyman stratified allocation, Cochran-Mantel-Haenszel test."""

from __future__ import annotations

from collections import deque

import pytest


def _brandes_reference(edges, sources, max_depth):
    """Pure-python Brandes with depth truncation — the operator's
    exact contract, used as the test oracle."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    btw = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = {0: [s]}
        for lvl in range(1, max_depth + 1):
            levels[lvl] = []
            for u in levels[lvl - 1]:
                for w in adj.get(u, []):
                    if w not in dist:
                        dist[w] = lvl
                        sigma[w] = 0
                        levels[lvl].append(w)
                    if dist[w] == lvl:
                        sigma[w] += sigma[u]
            levels[lvl] = sorted(set(levels[lvl]))
        delta = {v: 0.0 for v in dist}
        for lvl in range(max_depth - 1, -1, -1):
            for v in levels.get(lvl, []):
                acc = 0.0
                for w in adj.get(v, []):
                    if dist.get(w) == lvl + 1:
                        acc += sigma[v] / sigma[w] * (1.0 + delta[w])
                delta[v] = acc
        for v, dv in delta.items():
            if v != s and dv > 0:
                btw[v] = btw.get(v, 0.0) + dv
    return btw


class TestBetweenness:
    def _run(self, spark, edge_list, k_sources=99, max_depth=3):
        from azure_data_engineering_spark.operators.graph import betweenness_ksource

        both = edge_list + [(d, s) for s, d in edge_list]
        df = spark.createDataFrame(sorted(set(both)), "src long, dst long")
        got = {
            r.node: r.betweenness
            for r in betweenness_ksource(
                df, k_sources=k_sources, max_depth=max_depth
            ).collect()
        }
        return got, sorted(set(both))

    def test_star_center_dominates(self, spark):
        edges = [(0, i) for i in range(1, 6)]
        got, _ = self._run(spark, edges, max_depth=2)
        assert got[0] == max(got.values())
        # center lies on every leaf-leaf shortest path: delta_s(0) = 4
        # for each of the 5 leaf sources
        assert got[0] == pytest.approx(20.0, abs=1e-4)

    def test_path_graph_matches_reference(self, spark):
        from pyspark.sql import functions as F

        edges = [(i, i + 1) for i in range(5)]
        both = edges + [(d, s) for s, d in edges]
        got, all_edges = self._run(spark, edges, max_depth=3)
        # reference uses the same md5 source selection: all 6 nodes
        import hashlib

        nodes = sorted({n for e in all_edges for n in e})
        srcs = sorted(
            nodes, key=lambda n: hashlib.md5(f"{n}btw".encode()).hexdigest()
        )[:99]
        ref = _brandes_reference(all_edges, srcs, 3)
        assert set(got) == set(ref)
        for n in ref:
            assert got[n] == pytest.approx(ref[n], abs=1e-4)

    def test_bridge_node_scores_high(self, spark):
        # two triangles joined by node 9: 9 is the bridge
        edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 9), (9, 3)]
        got, all_edges = self._run(spark, edges, max_depth=3)
        assert got[9] == max(got.values())


class TestNeyman:
    def test_variable_stratum_gets_more(self, spark):
        from azure_data_engineering_spark.operators.sampling import neyman_allocation

        rows = []
        for i in range(100):
            rows.append(("flat", 50.0))                 # zero variance
            rows.append(("wild", float((i * 37) % 100)))  # high variance
        df = spark.createDataFrame(rows, "s string, v double")
        out = {r.stratum: r for r in neyman_allocation(df, "s", "v", 60).collect()}
        assert out["flat"].n_alloc == 0
        assert out["wild"].n_alloc == 60
        assert out["flat"].stddev == pytest.approx(0.0)

    def test_seats_sum_to_total_largest_remainder(self, spark):
        from azure_data_engineering_spark.operators.sampling import neyman_allocation

        rows = []
        for i in range(300):
            rows.append((f"s{i % 3}", float((i * (7 + i % 3)) % 50)))
        df = spark.createDataFrame(rows, "s string, v double")
        out = neyman_allocation(df, "s", "v", 47).collect()
        assert sum(r.n_alloc for r in out) == 47

    def test_cap_at_stratum_size(self, spark):
        from azure_data_engineering_spark.operators.sampling import neyman_allocation

        rows = [("tiny", float(i)) for i in range(5)] + [
            ("big", 10.0) for _ in range(100)
        ]
        df = spark.createDataFrame(rows, "s string, v double")
        out = {r.stratum: r for r in neyman_allocation(df, "s", "v", 50).collect()}
        assert out["tiny"].n_alloc <= 5


class TestCmh:
    def test_simpsons_paradox_resolved(self, spark):
        from azure_data_engineering_spark.operators.stats import cmh_test

        # within each stratum the exposed arm is BETTER (OR > 1)
        rows = []
        # stratum A: exposed 80/100 success, control 60/100
        rows += [("A", 1, 1)] * 80 + [("A", 1, 0)] * 20
        rows += [("A", 0, 1)] * 60 + [("A", 0, 0)] * 40
        # stratum B: exposed 30/100, control 10/100
        rows += [("B", 1, 1)] * 30 + [("B", 1, 0)] * 70
        rows += [("B", 0, 1)] * 10 + [("B", 0, 0)] * 90
        df = spark.createDataFrame(rows, "h string, e int, y int")
        r = cmh_test(df, "h", "e", "y").collect()[0]
        assert r.k_strata == 2 and r.n == 400
        # MH OR: (80*40/200 + 30*90/200) / (20*60/200 + 70*10/200)
        expect_or = (80 * 40 / 200 + 30 * 90 / 200) / (20 * 60 / 200 + 70 * 10 / 200)
        assert r.or_mh == pytest.approx(expect_or, abs=1e-4)
        assert r.p_value < 0.01

    def test_null_association(self, spark):
        from azure_data_engineering_spark.operators.stats import cmh_test

        rows = []
        for h in ("x", "y"):
            for e in (0, 1):
                rows += [(h, e, 1)] * 30 + [(h, e, 0)] * 70
        df = spark.createDataFrame(rows, "h string, e int, y int")
        r = cmh_test(df, "h", "e", "y").collect()[0]
        assert r.or_mh == pytest.approx(1.0, abs=1e-6)
        assert r.chi2 == pytest.approx(0.0, abs=1e-6)
        assert r.p_value == pytest.approx(1.0, abs=1e-4)
