"""PageRank fixed-point operator (operators/graph.py)."""

from __future__ import annotations

import pytest

from azure_data_engineering_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


class TestPageRank:
    def test_mass_conserved_with_dangling(self, spark):
        # node 3 is dangling (no out-edges): its mass must redistribute,
        # keeping total rank 1 every round
        r = _ranks(pagerank(_edges(spark, [(1, 2), (2, 3), (1, 3)]), iterations=5))
        assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)

    def test_hub_of_star_ranks_highest(self, spark):
        # all spokes point at the hub 0
        spokes = [(i, 0) for i in range(1, 8)]
        back = [(0, i) for i in range(1, 8)]  # keep 0 non-dangling
        r = _ranks(pagerank(_edges(spark, spokes + back), iterations=6))
        assert r[0] == max(r.values())
        assert r[0] > 3 * min(r.values())

    def test_symmetric_cycle_is_uniform(self, spark):
        cyc = [(i, (i + 1) % 5) for i in range(5)]
        r = _ranks(pagerank(_edges(spark, cyc), iterations=8))
        assert max(r.values()) == pytest.approx(min(r.values()), abs=1e-12)
        assert r[0] == pytest.approx(0.2, abs=1e-12)

    def test_partitioning_invariant(self, spark):
        pairs = [(i, (i * 7) % 11) for i in range(11) if i != (i * 7) % 11]
        e = _edges(spark, pairs)
        a = _ranks(pagerank(e, iterations=4))
        b = _ranks(pagerank(e.repartition(13), iterations=4))
        assert set(a) == set(b)
        assert all(a[k] == pytest.approx(b[k], abs=1e-12) for k in a)
