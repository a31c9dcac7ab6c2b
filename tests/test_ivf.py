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


class TestIvfPq:
    @pytest.fixture(scope="class")
    def books(self, spark, sf_dir):
        from azure_data_engineering_spark.operators.ivf import train_pq_codebooks

        emb = load_table(spark, sf_dir, "embeddings")
        return train_pq_codebooks(
            emb, "embedding", dim=64, id_col="vec_id", m=16, ksub=32
        )

    def test_codebook_shape_and_determinism(self, spark, sf_dir, books):
        from azure_data_engineering_spark.operators.ivf import train_pq_codebooks

        assert len(books) == 16
        assert all(len(b) == 32 and all(len(c) == 4 for c in b) for b in books)
        again = train_pq_codebooks(
            load_table(spark, sf_dir, "embeddings"),
            "embedding", dim=64, id_col="vec_id", m=16, ksub=32,
        )
        assert books == again

    def test_codes_are_m_bytes(self, spark, sf_dir, books):
        """The index artifact per vector is exactly m small ints —
        the 16x compression claim for dim=64 float32."""
        from azure_data_engineering_spark.functions.vectors import l2_normalize
        from azure_data_engineering_spark.operators.ivf import _pq_encode_udf

        emb = load_table(spark, sf_dir, "embeddings").limit(50)
        enc = _pq_encode_udf(books)
        rows = emb.select(enc(l2_normalize(F.col("embedding"))).alias("codes")).collect()
        for r in rows:
            assert len(r.codes) == 16
            assert all(0 <= c < 32 for c in r.codes)

    def test_recall_vs_brute_force(self, spark, sf_dir, centroids, books):
        from azure_data_engineering_spark.operators.ivf import ivfpq_top_k

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_top_k(q, emb, k=3).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_top_k(
                q, emb, centroids, books, k=3, nprobe=4, refine_factor=8
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.6, f"IVF-PQ recall {recall}"

    def test_refine_reranks_exactly(self, spark, sf_dir, centroids, books):
        """Output cosine must equal the TRUE rounded cosine (the
        refine step uses full-precision vectors, not ADC scores)."""
        from azure_data_engineering_spark.functions.vectors import cosine_similarity
        from azure_data_engineering_spark.operators.ivf import ivfpq_top_k

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        got = ivfpq_top_k(q, emb, centroids, books, k=3, nprobe=4).collect()
        vecs = {r.vec_id: r.embedding for r in emb.collect()}
        df2 = spark.createDataFrame(
            [(r.query_id, r.neighbor_id, r.cosine,
              vecs[r.query_id], vecs[r.neighbor_id]) for r in got],
            "qid long, nid long, cosine double, qv array<float>, nv array<float>",
        )
        chk = df2.select(
            "cosine",
            F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6).alias("truth"),
        ).collect()
        for r in chk:
            assert r.cosine == r.truth
