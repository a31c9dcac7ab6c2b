"""pareto_frontier_2d vs brute-force dominance, including tie cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_data_engineering_spark.catalog import load_table
from azure_data_engineering_spark.operators.skyline import pareto_frontier_2d


def _brute(rows, x, y):
    out = []
    for r in rows:
        dominated = any(
            (o[x] <= r[x] and o[y] >= r[y]) and (o[x] < r[x] or o[y] > r[y])
            for o in rows
        )
        if not dominated:
            out.append(r)
    return out


class TestPareto:
    def test_matches_brute_force_on_part(self, spark, sf_dir):
        p = load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_retailprice", "p_size"
        )
        rows = [r.asDict() for r in p.collect()]
        expected = {r["p_partkey"] for r in _brute(rows, "p_retailprice", "p_size")}
        got = {
            r.p_partkey
            for r in pareto_frontier_2d(p, "p_retailprice", "p_size").collect()
        }
        assert got == expected and got

    def test_ties_all_kept_and_duplicates_survive(self, spark):
        # (1.0, 5) twice: neither dominates the other (no strict part),
        # both on frontier; (1.0, 4) dominated by same-price larger y;
        # (2.0, 5) dominated by cheaper equal-y; (0.5, 1) frontier.
        df = spark.createDataFrame(
            [(1, 1.0, 5), (2, 1.0, 5), (3, 1.0, 4), (4, 2.0, 5), (5, 0.5, 1)],
            "id long, x double, y int",
        )
        got = {r.id for r in pareto_frontier_2d(df, "x", "y").collect()}
        assert got == {1, 2, 5}

    def test_single_distinct_x(self, spark):
        df = spark.createDataFrame(
            [(1, 3.0, 1), (2, 3.0, 9)], "id long, x double, y int"
        )
        got = {r.id for r in pareto_frontier_2d(df, "x", "y").collect()}
        assert got == {2}

    def test_no_corpus_sized_serial_window(self, spark, sf_dir):
        """The only unpartitioned window must run over the bands frame
        (grouped by __band), never over per-row data: check the plan has
        a partial agg on the x column before any Window."""
        p = load_table(spark, sf_dir, "part")
        plan = pareto_frontier_2d(p, "p_retailprice", "p_size")._jdf.queryExecution().executedPlan().toString()
        # the corpus reaches a Window only via the distinct-x aggregate
        assert "HashAggregate" in plan
