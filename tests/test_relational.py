"""Relational operator library tests."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from azure_data_engineering_spark.operators.relational import (
    asof_join,
    asof_join_big,
    dedup_keep_first,
    string_agg,
    top_k,
    top_k_per_group,
)


def _events(spark):
    return spark.createDataFrame(
        [(1, 10, "x"), (2, 25, "y"), (3, 4, "z")], "eid int, t int, payload string"
    )


def _dim(spark):
    return spark.createDataFrame([(0, "v0"), (20, "v20"), (30, "v30")], "eff int, ver string")


class TestAsofJoin:
    def test_backward(self, spark):
        out = asof_join(_events(spark), _dim(spark), "eid", "t", "eff")
        got = {r["eid"]: r["ver"] for r in out.collect()}
        assert got == {1: "v0", 2: "v20", 3: "v0"}

    def test_forward(self, spark):
        out = asof_join(_events(spark), _dim(spark), "eid", "t", "eff", direction="forward")
        got = {r["eid"]: r["ver"] for r in out.collect()}
        assert got == {1: "v20", 2: "v30", 3: "v20"}

    def test_no_match_survives_with_null(self, spark):
        dim = spark.createDataFrame([(100, "late")], "eff int, ver string")
        out = asof_join(_events(spark), dim, "eid", "t", "eff")
        rows = out.collect()
        assert len(rows) == 3 and all(r["ver"] is None for r in rows)

    def test_partition_keys(self, spark):
        ev = spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], "eid int, t int, g string")
        dim = spark.createDataFrame([(5, "a", "da"), (5, "b", "db")], "eff int, g string, v string")
        out = asof_join(ev, dim, "eid", "t", "eff", partition_keys=["g"])
        got = {r["eid"]: r["v"] for r in out.collect()}
        assert got == {1: "da", 2: "db"}


class TestAsofJoinBig:
    """Fact x fact as-of via the union-merge plan."""

    def _sides(self, spark):
        left = spark.createDataFrame(
            [("a", 10, 1.0), ("a", 25, 2.0), ("a", 4, 3.0), ("b", 10, 4.0)],
            "g string, t int, val double",
        )
        right = spark.createDataFrame(
            [("a", 0, "v0"), ("a", 20, "v20"), ("a", 25, "v25"), ("b", 30, "v30")],
            "g string, rt int, ver string",
        )
        return left, right

    def test_backward_matches_asof_join(self, spark):
        left, right = self._sides(spark)
        out = asof_join_big(left, right, "t", "rt", ["g"])
        got = {(r["g"], r["t"]): r["ver"] for r in out.collect()}
        # exact-equal right timestamp matches (t=25 -> v25); no earlier
        # right row for b -> null
        assert got == {("a", 10): "v0", ("a", 25): "v25", ("a", 4): "v0", ("b", 10): None}

    def test_forward(self, spark):
        left, right = self._sides(spark)
        out = asof_join_big(left, right, "t", "rt", ["g"], direction="forward")
        got = {(r["g"], r["t"]): r["ver"] for r in out.collect()}
        assert got == {("a", 10): "v20", ("a", 25): "v25", ("a", 4): "v20", ("b", 10): "v30"}

    def test_plan_has_no_join(self, spark):
        """The whole point of the big-big variant: the physical plan
        must contain NO join operator at all (in particular no
        BroadcastNestedLoopJoin) — just one shuffle for the window."""
        left, right = self._sides(spark)
        plan = asof_join_big(left, right, "t", "rt", ["g"])._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan
        assert "Join" not in plan
        assert "Window" in plan

    def test_rejects_empty_partition_keys_and_collisions(self, spark):
        left, right = self._sides(spark)
        with pytest.raises(ValueError, match="partition_keys"):
            asof_join_big(left, right, "t", "rt", [])
        with pytest.raises(ValueError, match="collide"):
            asof_join_big(left, right.withColumnRenamed("ver", "val"), "t", "rt", ["g"])


class TestDedupAndRank:
    def test_dedup_keep_first_deterministic(self, spark):
        df = spark.createDataFrame([(1, 5), (1, 9), (2, 3)], "k int, v int")
        out = dedup_keep_first(df, ["k"], [F.col("v").desc()])
        assert {r["k"]: r["v"] for r in out.collect()} == {1: 9, 2: 3}

    def test_top_k_total_order(self, spark):
        df = spark.createDataFrame([(i, i % 3) for i in range(10)], "id int, grp int")
        out = top_k(df, [F.col("grp").asc(), F.col("id").asc()], 3).collect()
        assert [(r["id"], r["grp"]) for r in out] == [(0, 0), (3, 0), (6, 0)]

    def test_top_k_per_group(self, spark):
        df = spark.createDataFrame([(i, i % 2, i * 10) for i in range(6)], "id int, g int, score int")
        out = top_k_per_group(df, ["g"], [F.col("score").desc()], 2)
        got = sorted((r["g"], r["id"]) for r in out.collect())
        assert got == [(0, 2), (0, 4), (1, 3), (1, 5)]

    def test_string_agg_sorted(self, spark):
        df = spark.createDataFrame([("g", "b"), ("g", "a"), ("g", "c")], "k string, v string")
        out = string_agg(df, ["k"], "v").collect()
        assert out[0]["agg"] == "a,b,c"


class TestApproxDistinct:
    def test_within_tolerance_of_exact(self, spark, sf_dir):
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        exact = l.select(F.countDistinct("l_orderkey")).collect()[0][0]
        approx = l.select(F.approx_count_distinct("l_orderkey", 0.02)).collect()[0][0]
        assert abs(approx - exact) / exact < 0.05


class TestSaltedJoin:
    def _skewed(self, spark):
        # key 1 owns half of all fact rows — the melt-one-reducer case
        rows = [(1 if i % 2 == 0 else i % 50 + 2, float(i)) for i in range(2000)]
        fact = spark.createDataFrame(rows, "k bigint, v double")
        dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 40)], "k bigint, attr string")
        return fact, dim

    def test_inner_equals_plain_join(self, spark):
        from azure_data_engineering_spark.operators.relational import salted_join

        fact, dim = self._skewed(spark)
        got = salted_join(fact, dim, ["k"], "inner", salt_buckets=8)
        want = fact.join(dim, ["k"], "inner")
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    def test_left_keeps_unmatched_fact_rows(self, spark):
        from azure_data_engineering_spark.operators.relational import salted_join

        fact, dim = self._skewed(spark)
        got = salted_join(fact, dim, ["k"], "left", salt_buckets=8)
        want = fact.join(dim, ["k"], "left")
        assert got.count() == want.count() == fact.count()
        assert got.exceptAll(want).count() == 0

    def test_rejects_right_join(self, spark):
        import pytest

        from azure_data_engineering_spark.operators.relational import salted_join

        fact, dim = self._skewed(spark)
        with pytest.raises(ValueError):
            salted_join(fact, dim, ["k"], "right")
