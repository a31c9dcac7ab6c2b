"""Misra-Gries heavy hitters: error bound, guarantee, and exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_data_engineering_spark.functions.text import normalize_text
from azure_data_engineering_spark.operators.heavy_hitters import (
    heavy_hitters,
    misra_gries_partials,
)


def _tokens(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.explode(
            F.filter(F.split(normalize_text(F.col("text")), " "), lambda w: w != "")
        ).alias("token")
    )


class TestMisraGries:
    def test_partial_size_bound(self, spark, sf_dir):
        toks = _tokens(spark, sf_dir).repartition(4)
        partials = misra_gries_partials(toks, "token", k=5)
        per_part = (
            partials.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert per_part <= 5

    def test_error_bound_per_partition(self, spark, sf_dir):
        """MG invariant on a single partition: for every surfaced item,
        true_count - lower_bound <= N_p / (k+1), the documented epsilon."""
        k = 8
        toks = _tokens(spark, sf_dir).coalesce(1)
        n = toks.count()
        exact = {r.token: r.cnt for r in
                 toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
        partial = misra_gries_partials(toks, "token", k=k).collect()
        eps = n / (k + 1)
        for r in partial:
            true = exact[r.token]
            assert r.lower_bound <= true
            assert true - r.lower_bound <= eps, (r.token, true, r.lower_bound, eps)

    def test_no_false_negatives_above_threshold(self, spark, sf_dir):
        """Every token with global count > N/(k+1) must appear in the
        candidate union regardless of partitioning."""
        k = 40
        toks = _tokens(spark, sf_dir).repartition(8)
        n = toks.count()
        exact = toks.groupBy("token").agg(F.count("*").alias("cnt"))
        must_have = {r.token for r in exact.filter(F.col("cnt") > n / (k + 1)).collect()}
        candidates = {
            r.token
            for r in misra_gries_partials(toks, "token", k=k)
            .select("token").distinct().collect()
        }
        assert must_have <= candidates, must_have - candidates

    def test_heavy_hitters_exact_and_partition_independent(self, spark, sf_dir):
        """The verified output equals the exact HAVING cnt*k > N set, and
        is identical under different partitionings (MG is only a pruner)."""
        k = 40
        toks = _tokens(spark, sf_dir)
        n = toks.count()
        expected = {
            (r.token, r.cnt)
            for r in toks.groupBy("token").agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") * k > n).collect()
        }
        for parts in (1, 7):
            got = {
                (r.token, r.cnt)
                for r in heavy_hitters(toks.repartition(parts), "token", k=k).collect()
            }
            assert got == expected


class TestCountMin:
    def test_never_undercounts_and_epsilon_bound(self, spark, sf_dir):
        """CMS guarantees: est >= true always; est <= true + eps*N with
        width=256 -> eps = e/256 ~ 0.0106 per-row, and the min over
        depth=3 rows makes the bound hold comfortably on this corpus —
        assert the deterministic per-row Markov bound eps*N directly."""
        from azure_data_engineering_spark.operators.heavy_hitters import (
            cms_build,
            cms_estimate,
        )

        toks = _tokens(spark, sf_dir)
        n = toks.count()
        sketch = cms_build(toks, "token", width=256, depth=3)
        est = cms_estimate(sketch, toks.distinct(), "token", width=256, depth=3)
        exact = toks.groupBy("token").agg(F.count("*").alias("c"))
        joined = est.join(exact, "token").collect()
        eps_n = 2.718281828 / 256 * n
        for r in joined:
            assert r.est_cnt >= r.c, (r.token, r.est_cnt, r.c)
            assert r.est_cnt <= r.c + eps_n, (r.token, r.est_cnt, r.c, eps_n)

    def test_sketches_merge(self, spark, sf_dir):
        """Union + re-sum of two half-corpus sketches == the sketch of
        the whole corpus (the mergeability contract)."""
        from azure_data_engineering_spark.operators.heavy_hitters import cms_build

        toks = _tokens(spark, sf_dir)
        t1 = toks.filter(F.crc32("token") % 2 == 0)
        t2 = toks.filter(F.crc32("token") % 2 == 1)
        s1 = cms_build(t1, "token", width=64, depth=2)
        s2 = cms_build(t2, "token", width=64, depth=2)
        merged = (
            s1.unionByName(s2)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = cms_build(toks, "token", width=64, depth=2)
        diff = merged.join(whole, ["row", "bucket"], "full_outer").filter(
            ~merged["cnt"].eqNullSafe(whole["cnt"])
        )
        assert diff.count() == 0
