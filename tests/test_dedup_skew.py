"""Skew stress for the LSH banding path: a deliberately hot bucket
(thousands of byte-identical docs — the 100 TB boilerplate scenario:
license headers, SEO spam, crawler error pages) must NOT quadratically
explode the in-bucket pair expansion or pile the work onto one
straggler partition. The stop-bucket guard (operators/dedup.py
minhash_lsh_candidates max_bucket) is the mechanism under test."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.dedup import minhash_lsh_candidates

BASE = (
    "the quick brown fox jumps over the lazy dog while seventy silent "
    "sailors sing sea shanties beside the southern shore every evening "
    "and the golden harvest moon rises slowly over quiet wheat fields "
    "as distant church bells ring across the sleeping village below"
)


def _corpus(spark, n_hot=5000, n_pairs=40):
    """n_hot byte-identical docs (ids 0..n_hot) + n_pairs planted
    near-dup pairs (one word of ~42 changed => 3-gram Jaccard ~0.87,
    so P[miss] per pair ~= (1-J^4)^16 ~ 3e-6 — deterministic at test
    scale) on distinct texts, ids 100000+2i / 100000+2i+1."""
    hot = [(i, BASE) for i in range(n_hot)]
    planted = []
    for i in range(n_pairs):
        words = BASE.replace("fox", f"animal{i}").split()
        a = " ".join(words)
        # vary the edit position so band outcomes decorrelate across
        # pairs (a fixed position would make every pair share the same
        # differing shingles — one unlucky band then misses them all)
        words[8 + (i % 30)] = f"changed{i}"
        b = " ".join(words)
        planted.append((100000 + 2 * i, a))
        planted.append((100000 + 2 * i + 1, b))
    return spark.createDataFrame(hot + planted, ["doc_id", "text"])


class TestStopBucketGuard:
    def test_hot_bucket_candidates_stay_linear(self, spark):
        """5000 identical docs would emit C(5000,2) = 12.5M pairs per
        band without the guard; with max_bucket=100 the mega-buckets
        are dropped as stop-buckets and the candidate set stays tiny
        (only the planted near-dup structure survives)."""
        corpus = _corpus(spark)
        cands = minhash_lsh_candidates(
            corpus, "text", "doc_id", max_bucket=100
        ).cache()
        try:
            n = cands.count()
            # linear bound: far below even 1% of the quadratic blow-up
            assert n < 10_000, f"stop-bucket guard leaked {n} candidates"
            # the guard must not cost recall on the NON-hot structure:
            # the planted pairs (J ~ 0.87, far above the ~0.5 S-curve
            # threshold) still surface at the operator's recall gate
            got = {
                (r.id_a, r.id_b)
                for r in cands.filter(F.col("id_a") >= 100000).collect()
            }
            want = {(100000 + 2 * i, 100000 + 2 * i + 1) for i in range(40)}
            recall = len(want & got) / len(want)
            assert recall >= 0.9, f"recall {recall} on planted pairs"
        finally:
            cands.unpersist()

    def test_no_straggler_partition(self, spark):
        """The surviving candidate work must spread: no output
        partition may hold >10x the median partition's rows (straggler
        = the single task the whole 1000-executor stage waits on)."""
        corpus = _corpus(spark)
        cands = minhash_lsh_candidates(corpus, "text", "doc_id", max_bucket=100)
        per_part = [
            r["cnt"]
            for r in cands.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ]
        nonzero = [c for c in per_part if c > 0]
        assert nonzero, "no candidates produced"
        med = statistics.median(nonzero)
        assert max(nonzero) <= max(10 * med, 50), (
            f"straggler partition: max={max(nonzero)} median={med}"
        )

    def test_guard_off_shows_the_quadratic_risk(self, spark):
        """Sanity check that the fixture is genuinely hot: raising
        max_bucket above the hot-group size reintroduces the quadratic
        pair set (small n here, but the growth factor is the point)."""
        corpus = _corpus(spark, n_hot=200, n_pairs=0)
        guarded = minhash_lsh_candidates(corpus, "text", "doc_id", max_bucket=100).count()
        unguarded = minhash_lsh_candidates(corpus, "text", "doc_id", max_bucket=100000).count()
        assert guarded == 0
        assert unguarded == 200 * 199 // 2


class TestPpjoinStopShingle:
    """Same 100 TB boilerplate scenario for the PPJoin path: 5000
    byte-identical docs make even each doc's RAREST shingles hot, so
    the shared prefix buckets would emit C(5000,2) pairs through the
    self-join. The stop-shingle guard (ppjoin_pairs max_bucket) drops
    oversized prefix buckets; exact copies are exact_dedup's job."""

    def test_hot_corpus_bounded_and_planted_pairs_survive(self, spark):
        from azure_data_engineering_spark.operators.dedup import ppjoin_pairs

        corpus = _corpus(spark)
        pairs = ppjoin_pairs(
            corpus, "text", "doc_id", threshold=0.8, max_bucket=100
        ).cache()
        try:
            hot_hot = pairs.filter(
                (F.col("id_a") < 100000) & (F.col("id_b") < 100000)
            ).count()
            assert hot_hot == 0, (
                f"guard leaked {hot_hot} hot-pair outputs (quadratic path)"
            )
            assert pairs.count() < 10_000
            # planted near-dups (J ~ 0.86 via df=2 'animal{i}' shingles,
            # which sit in size-2 prefix buckets) must be UNAFFECTED:
            # PPJoin is exact, so unlike the LSH probabilistic gate we
            # require ALL 40 pairs, not recall >= 0.9
            got = {
                (r.id_a, r.id_b)
                for r in pairs.filter(F.col("id_a") >= 100000).collect()
            }
            want = {(100000 + 2 * i, 100000 + 2 * i + 1) for i in range(40)}
            assert want <= got, f"guard cost planted pairs: {sorted(want - got)[:5]}"
        finally:
            pairs.unpersist()

    def test_guard_is_identity_on_unskewed_corpus(self, spark):
        """On a corpus with no oversized prefix buckets the guarded
        output is byte-identical to the unguarded one."""
        from azure_data_engineering_spark.operators.dedup import ppjoin_pairs

        rows = []
        for i in range(30):
            words = BASE.replace("fox", f"animal{i}").split()
            rows.append((2 * i, " ".join(words)))
            words[10 + (i % 20)] = f"changed{i}"
            rows.append((2 * i + 1, " ".join(words)))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        plain = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ppjoin_pairs(df, "text", "doc_id", threshold=0.7).collect()
        }
        guarded = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ppjoin_pairs(
                df, "text", "doc_id", threshold=0.7, max_bucket=100
            ).collect()
        }
        assert plain == guarded and plain
