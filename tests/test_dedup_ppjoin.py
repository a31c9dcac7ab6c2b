"""PPJoin prefix-filtered set-similarity join: output equivalence to
the full inverted index, and the candidate-volume reduction that is
its whole reason to exist at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ppjoin_pairs,
    shingles,
)


def _corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    near = (
        d.filter((F.col("doc_id") % 7 == 0) & (F.col("n_chars") > 120))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tiny tail")))
    )
    return d.unionByName(near)


class TestPpjoinEquivalence:
    def test_same_pairs_as_full_inverted_index(self, spark, sf_dir):
        corpus = _corpus(spark, sf_dir)
        full = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(corpus, "text", "doc_id", 0.6, k=3).collect()
        }
        pp = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ppjoin_pairs(corpus, "text", "doc_id", 0.6, k=3).collect()
        }
        assert pp == full
        assert len(pp) > 0  # the planted near-dups are actually found

    def test_prefix_posts_fraction_of_full_index(self, spark, sf_dir):
        """The scale claim, measured: PPJoin posts only the
        p = n - ceil(t*n) + 1 rarest shingles per doc — at t=0.6 that
        is <= ~40% of postings (and the rare-end ones at that), vs
        100% for the full inverted index."""
        corpus = _corpus(spark, sf_dir)
        base = corpus.select(
            F.col("doc_id"), shingles(F.col("text"), 3).alias("sh")
        ).withColumn("n_sh", F.size("sh"))
        full_postings = base.agg(F.sum("n_sh")).collect()[0][0]
        prefix_postings = base.select(
            (
                F.col("n_sh") - F.ceil(F.lit(0.6) * F.col("n_sh") - 1e-6) + 1
            ).alias("p")
        ).agg(F.sum("p")).collect()[0][0]
        assert prefix_postings < 0.45 * full_postings

    def test_threshold_one_returns_only_exact_set_matches(self, spark):
        rows = [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma delta zeta"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.id_a, r.id_b) for r in ppjoin_pairs(df, "text", "doc_id", 1.0, k=3).collect()}
        assert got == {(1, 2)}
