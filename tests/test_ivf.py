"""IVF-Flat ANN tests: determinism, recall vs brute force."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from azure_data_engineering_spark.catalog import load_table
from azure_data_engineering_spark.operators.ivf import ivf_top_k, train_centroids
from azure_data_engineering_spark.operators.similarity import brute_force_top_k


@pytest.fixture(scope="module")
def centroids(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    return train_centroids(emb, "embedding", nlist=8)


class TestIvf:
    def test_centroids_deterministic(self, spark, sf_dir, centroids):
        again = train_centroids(load_table(spark, sf_dir, "embeddings"), "embedding", nlist=8)
        assert centroids == again

    def test_recall_vs_brute_force(self, spark, sf_dir, centroids):
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r["query_id"], r["neighbor_id"]) for r in brute_force_top_k(q, emb, k=3).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_top_k(q, emb, centroids, k=3, nprobe=4).collect()
        }
        recall = len(exact & approx) / len(exact)
        # nprobe=4 of nlist=8 probes half the cells
        assert recall >= 0.7, f"IVF recall {recall}"

    def test_probing_fewer_cells_reduces_candidates(self, spark, sf_dir, centroids):
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        wide = ivf_top_k(q, emb, centroids, k=500, nprobe=8).count()
        narrow = ivf_top_k(q, emb, centroids, k=500, nprobe=1).count()
        assert narrow < wide
