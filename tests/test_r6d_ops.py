"""Behavioral tests for the round-6d additions: RAKE keywords,
item-CF recommendations, embedding outliers, MMR re-ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.affinity import (
    item_similarity,
    recommend_top_n,
)
from azure_data_engineering_spark.operators.keywords import (
    rake_keywords,
    rake_phrases,
)
from azure_data_engineering_spark.operators.similarity import (
    embedding_outliers,
    mmr_select,
)


class TestRakePhrases:
    def test_stopwords_split_phrases(self, spark):
        df = spark.createDataFrame(
            [(1, "Deep learning models and transfer learning for the win")],
            "doc_id long, text string",
        )
        got = sorted(r.phrase for r in rake_phrases(df, "doc_id", "text").collect())
        assert got == ["deep learning models", "transfer learning", "win"]

    def test_punctuation_breaks_nothing_extra(self, spark):
        df = spark.createDataFrame(
            [(1, "Neural networks; the gradient-descent optimizer!")],
            "doc_id long, text string",
        )
        got = sorted(r.phrase for r in rake_phrases(df, "doc_id", "text").collect())
        # '-' and ';' normalize to spaces; 'the' splits
        assert got == ["gradient descent optimizer", "neural networks"]

    def test_keyword_scores_favor_long_recurring_phrases(self, spark):
        rows = [(i, "machine learning pipelines") for i in range(5)]
        rows += [(10 + i, "data quality") for i in range(5)]
        rows += [(20, "singleton phrase never repeated")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = rake_keywords(df, "doc_id", "text", top_k=10, min_count=2).collect()
        phrases = [r.phrase for r in out]
        assert "singleton phrase never repeated" not in phrases
        assert out[0].phrase == "machine learning pipelines"  # 3 words beat 2
        assert out[0].rank == 1 and out[0].n_occurrences == 5
        # every member word appears only in 3-word phrases: score = 3+3+3
        assert out[0].score == 9.0


class TestRecommendTopN:
    def test_also_bought(self, spark):
        # baskets: {1,2} x3 times, {1,3} once -> sim(1,2) strong
        rows = [(b, i) for b, items in enumerate([(1, 2), (1, 2), (1, 2), (1, 3)])
                for i in items]
        baskets = spark.createDataFrame(rows, "bk long, item long")
        sims = item_similarity(baskets, "bk", "item", min_pair_count=1)
        hist = spark.createDataFrame([(100, 1)], "u long, item long")
        recs = recommend_top_n(hist, "u", "item", sims, n=2).collect()
        assert [r.item for r in recs] == [2, 3]
        assert recs[0].rec_rank == 1

    def test_seen_items_excluded(self, spark):
        rows = [(b, i) for b in range(3) for i in (1, 2)]
        baskets = spark.createDataFrame(rows, "bk long, item long")
        sims = item_similarity(baskets, "bk", "item", min_pair_count=1)
        hist = spark.createDataFrame([(7, 1), (7, 2)], "u long, item long")
        assert recommend_top_n(hist, "u", "item", sims, n=3).count() == 0


class TestEmbeddingOutliers:
    def test_far_point_ranks_first(self, spark):
        rows = [(i, [0.0, 0.0]) for i in range(20)] + [(99, [10.0, 10.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = embedding_outliers(df, top_k=3).collect()
        assert out[0].vec_id == 99 and out[0].rank == 1
        assert out[0].zscore > 3

    def test_deterministic(self, spark):
        rows = [(i, [float(i % 5), float(i % 3)]) for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = [(r.vec_id, r.zscore) for r in embedding_outliers(df, top_k=5).collect()]
        b = [(r.vec_id, r.zscore) for r in embedding_outliers(df, top_k=5).collect()]
        assert a == b


class TestMmrSelect:
    def test_diversity_beats_pure_relevance(self, spark):
        # cands 1,2 nearly identical high-rel; cand 3 lower rel, dissimilar.
        pool = spark.createDataFrame(
            [(1, 0.95), (2, 0.94), (3, 0.5)], "cand long, rel double"
        )
        sims = spark.createDataFrame(
            [(1, 2, 0.99), (2, 1, 0.99), (1, 3, 0.0), (3, 1, 0.0),
             (2, 3, 0.0), (3, 2, 0.0)],
            "a long, b long, sim double",
        )
        out = mmr_select(pool, sims, k=3, lam=0.5)
        picks = [r.cand for r in out.orderBy("rank").collect()]
        # 1 first (rel); at lam=0.5 cand 2's redundancy with 1
        # (0.5*0.94 - 0.5*0.99 < 0) loses to the dissimilar cand 3
        assert picks == [1, 3, 2]

    def test_k_capped_by_pool(self, spark):
        pool = spark.createDataFrame([(1, 0.9), (2, 0.8)], "cand long, rel double")
        sims = spark.createDataFrame(
            [(1, 2, 0.5), (2, 1, 0.5)], "a long, b long, sim double"
        )
        assert mmr_select(pool, sims, k=10).count() == 2
