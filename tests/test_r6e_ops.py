"""Behavioral tests for the round-6e additions: personalized
PageRank, term burstiness, join-cardinality pre-flight, Bloom audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.bloomfilter import (
    bloom_build,
    bloom_fp_audit,
)
from azure_data_engineering_spark.operators.diagnostics import (
    join_cardinality_estimate,
)
from azure_data_engineering_spark.operators.graph import personalized_pagerank
from azure_data_engineering_spark.operators.quality import term_burstiness


class TestPersonalizedPagerank:
    def test_mass_conserved_and_seed_biased(self, spark):
        # star: hub 0 <-> leaves 1..4, plus a detached pair 10 <-> 11
        edges = [(0, i) for i in (1, 2, 3, 4)] + [(i, 0) for i in (1, 2, 3, 4)]
        edges += [(10, 11), (11, 10)]
        e = spark.createDataFrame(edges, "src long, dst long")
        seeds = spark.createDataFrame([(0,)], "node long")
        r = {row.node: row.rank for row in personalized_pagerank(e, seeds).collect()}
        assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
        # all mass stays in the seed's component
        assert r[10] == 0.0 and r[11] == 0.0
        assert r[0] > r[1] > 0

    def test_uniform_seed_over_all_nodes_matches_pagerank(self, spark):
        from azure_data_engineering_spark.operators.graph import pagerank

        edges = [(1, 2), (2, 3), (3, 1), (3, 2)]
        e = spark.createDataFrame(edges, "src long, dst long")
        all_nodes = spark.createDataFrame([(1,), (2,), (3,)], "node long")
        pr = {r.node: round(r.rank, 9) for r in pagerank(e).collect()}
        ppr = {r.node: round(r.rank, 9)
               for r in personalized_pagerank(e, all_nodes).collect()}
        for n in pr:
            assert ppr[n] == pytest.approx(pr[n], abs=1e-9)


class TestTermBurstiness:
    def test_bursty_vs_uniform(self, spark):
        # 'even' once in every doc (Poisson-flat); 'burst' 10x in one doc
        rows = [(d, "even") for d in range(10)]
        rows += [(0, "burst")] * 10
        toks = spark.createDataFrame(rows, "doc_id long, term string")
        nd = spark.createDataFrame([(10,)], "n long")
        out = {r.term: r for r in
               term_burstiness(toks, "doc_id", "term", nd, min_df=1, top_k=10).collect()}
        assert out["even"].vmr == 0.0  # constant 1 per doc: zero variance
        assert out["burst"].vmr > 5
        assert out["burst"].rank == 1
        assert out["burst"].df == 1 and out["burst"].total == 10

    def test_min_df_filter(self, spark):
        rows = [(0, "rare")] + [(d, "common") for d in range(5)]
        toks = spark.createDataFrame(rows, "doc_id long, term string")
        nd = spark.createDataFrame([(5,)], "n long")
        terms = [r.term for r in
                 term_burstiness(toks, "doc_id", "term", nd, min_df=2, top_k=10).collect()]
        assert terms == ["common"]


class TestJoinCardinality:
    def test_exact_self_join_count(self, spark):
        # keys: a x3, b x2 -> self-join = 9 + 4 = 13
        df = spark.createDataFrame(
            [("a",), ("a",), ("a",), ("b",), ("b",)], "k string"
        )
        r = join_cardinality_estimate(df, df, "k", "k").collect()[0]
        assert (r.rows_l, r.keys_l, r.n_common_keys) == (5, 2, 2)
        assert r.est_rows == 13 and r.max_key_rows == 9
        assert r.expansion_factor == 2.6
        # ground truth
        assert df.alias("x").join(df.alias("y"), "k").count() == 13

    def test_disjoint_keys(self, spark):
        a = spark.createDataFrame([("a",)], "k string")
        b = spark.createDataFrame([("b",)], "k string")
        r = join_cardinality_estimate(a, b, "k", "k").collect()[0]
        assert r.est_rows == 0 and r.n_common_keys == 0


class TestBloomAudit:
    def test_no_false_negatives_by_construction(self, spark):
        keys = spark.createDataFrame([(i,) for i in range(100)], "k long")
        # probing the SAME keys must all hit (they are true positives)
        audit = bloom_fp_audit(keys, keys, "k", "k", n_bits=4096, n_hashes=4).collect()[0]
        assert audit.n_false_positives == audit.n_probes == 100

    def test_sparse_filter_low_fp(self, spark):
        keys = spark.createDataFrame([(i,) for i in range(50)], "k long")
        probes = spark.createDataFrame([(i + 10**9,) for i in range(200)], "p long")
        r = bloom_fp_audit(keys, probes, "k", "p", n_bits=65536, n_hashes=4).collect()[0]
        assert r.n_keys == 50 and r.n_probes == 200
        assert r.fill_ratio < 0.01
        assert r.fp_rate <= 0.01
        assert r.fp_rate_theoretical < 1e-7

    def test_filter_is_deterministic(self, spark):
        keys = spark.createDataFrame([(i,) for i in range(30)], "k long")
        a = sorted(r.pos for r in bloom_build(keys, "k", 1024, 3).collect())
        b = sorted(r.pos for r in bloom_build(keys, "k", 1024, 3).collect())
        assert a == b and len(a) <= 90
