"""Similarity-search tests: brute-force exactness, LSH recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_data_engineering_spark.functions.vectors import cosine_similarity, dot, l2_norm
from azure_data_engineering_spark.operators.similarity import brute_force_top_k, lsh_bucketed_top_k


class TestVectorMath:
    def test_dot_and_norm(self, spark):
        df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], "a array<float>, b array<float>")
        row = df.select(
            dot(F.col("a"), F.col("b")).alias("d"), l2_norm(F.col("a")).alias("n")
        ).collect()[0]
        assert row["d"] == 4.0
        assert row["n"] == 3.0

    def test_cosine_zero_vector_is_zero_not_nan(self, spark):
        df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>")
        assert df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] == 0.0


class TestBruteForce:
    def test_identical_vector_ranks_first(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # plant an exact copy of vec 0 with a new id
        copy = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(999_999))
        corpus = emb.unionByName(copy)
        out = brute_force_top_k(emb.filter(F.col("vec_id") == 0), corpus, k=1)
        top = out.collect()[0]
        assert top["neighbor_id"] == 999_999
        assert abs(top["cosine"] - 1.0) < 1e-6

    def test_excludes_self(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = brute_force_top_k(emb.filter(F.col("vec_id") < 3), emb, k=5)
        assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0

    def test_k_rows_per_query(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = brute_force_top_k(emb.filter(F.col("vec_id") < 3), emb, k=5)
        counts = {r["query_id"]: r["n"] for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
        assert counts == {0: 5, 1: 5, 2: 5}


class TestLshAnn:
    def test_recall_vs_brute_force(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r["query_id"], r["neighbor_id"]) for r in brute_force_top_k(q, emb, k=3).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_bucketed_top_k(q, emb, dim=64, k=3, planes=2).collect()
        }
        recall = len(exact & approx) / len(exact)
        # 2 hyperplanes = 4 coarse buckets; same-bucket neighbors
        # should cover a solid fraction of the true top-3
        assert recall >= 0.5, f"ANN recall {recall}"
