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


class TestChunkOverlap:
    def test_coverage_and_overlap(self, spark):
        """window 5 / stride 2 over 10 tokens: 4 chunks at starts
        0,2,4,6; every token covered; adjacent chunks share 3."""
        from azure_data_engineering_spark.operators.chunking import (
            chunk_by_tokens_overlap,
        )

        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = (
            chunk_by_tokens_overlap(df, "doc_id", "text", max_tokens=5, stride=2)
            .orderBy("chunk_id")
            .collect()
        )
        assert [r.token_start for r in rows] == [0, 2, 4, 6]
        assert [r.token_len for r in rows] == [5, 5, 5, 4]
        covered = set()
        for r in rows:
            covered.update(range(r.token_start, r.token_start + r.token_len))
        assert covered == set(range(10))
        assert rows[0].chunk_text.split()[2:] == rows[1].chunk_text.split()[:3]

    def test_short_and_empty_docs_one_chunk(self, spark):
        from azure_data_engineering_spark.operators.chunking import (
            chunk_by_tokens_overlap,
        )

        df = spark.createDataFrame(
            [(1, "a b"), (2, "")], "doc_id long, text string"
        )
        rows = chunk_by_tokens_overlap(df, "doc_id", "text", 5, 2).collect()
        got = {r.doc_id: (r.n_chunks, r.token_len) for r in rows}
        assert got == {1: (1, 2), 2: (1, 0)}

    def test_stride_equal_window_matches_disjoint(self, spark):
        """stride == window degenerates to chunk_by_tokens geometry."""
        from azure_data_engineering_spark.operators.chunking import (
            chunk_by_tokens,
            chunk_by_tokens_overlap,
        )

        text = " ".join(f"w{i}" for i in range(23))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        a = sorted(
            (r.chunk_id, r.token_start, r.token_len)
            for r in chunk_by_tokens_overlap(df, "doc_id", "text", 5, 5).collect()
        )
        b = sorted(
            (r.chunk_id, r.token_start, r.token_len)
            for r in chunk_by_tokens(df, "doc_id", "text", 5).collect()
        )
        assert a == b


class TestAttribution:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double, ts_s string"
        ).select("event_id", "user_id", "event_type", "value",
                 F.to_timestamp("ts_s").alias("ts"))

    def test_three_models_credit_correctly(self, spark):
        from azure_data_engineering_spark.operators.window_ops import (
            multi_touch_attribution,
        )

        rows = [
            (1, 7, "click", 0.0, "2024-01-01 00:00:00"),
            (2, 7, "view", 0.0, "2024-01-01 10:00:00"),
            (3, 7, "click", 0.0, "2024-01-02 00:00:00"),
            (4, 7, "purchase", 30.0, "2024-01-02 12:00:00"),
            (5, 8, "view", 0.0, "2024-01-05 00:00:00"),
            (6, 8, "purchase", 10.0, "2024-01-05 01:00:00"),
            # out-of-window touch: 100h before its user's purchase
            (7, 9, "click", 0.0, "2024-01-01 00:00:00"),
            (8, 9, "purchase", 99.0, "2024-01-05 04:00:00"),
        ]
        r = {
            x.touch_type: x
            for x in multi_touch_attribution(
                self._events(spark, rows), "purchase", ["click", "view"], 72
            ).collect()
        }
        # purchase 4: first=click#1, last=click#3, linear 10 each
        # purchase 6: view only; purchase 8: unattributed
        assert r["click"].first_touch_value == 30.0
        assert r["click"].last_touch_value == 30.0
        assert r["click"].linear_value == pytest.approx(20.0)
        assert r["view"].first_touch_value == 10.0
        assert r["view"].last_touch_value == 10.0
        assert r["view"].linear_value == pytest.approx(20.0)
        assert r["click"].n_conversions == 1 and r["view"].n_conversions == 2

    def test_linear_credit_sums_to_conversion_value(self, spark):
        """Conservation: total linear credit across channels equals
        the total value of attributed conversions."""
        from azure_data_engineering_spark.operators.window_ops import (
            multi_touch_attribution,
        )

        rows = []
        eid = 0
        for u in range(20):
            for i in range(u % 5 + 1):
                eid += 1
                rows.append((eid, u, "click" if i % 2 else "view", 0.0,
                             f"2024-01-01 0{i}:00:00"))
            eid += 1
            rows.append((eid, u, "purchase", 7.0, "2024-01-01 09:00:00"))
        r = multi_touch_attribution(
            self._events(spark, rows), "purchase", ["click", "view"], 72
        )
        total = r.agg(F.sum("linear_value")).first()[0]
        assert total == pytest.approx(20 * 7.0)
