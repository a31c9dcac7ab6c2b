"""Partition-count independence: at 100 TB the planner picks partition
counts you never chose (AQE coalescing, cluster width, input splits),
so any operator whose RESULT depends on partitioning is silently
broken at scale. This sweep runs representative registry queries under
two different shuffle-partition settings and requires byte-identical
row sets — catching nondeterministic sampling, unordered collect_list
aggregation, tie-broken-by-partition ranking, and friends."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as em

# deterministic-by-contract queries spanning the operator families:
# hash sampling, weighted sampling, global ordering, dedup, windows,
# aggregation, string_agg (array_sort'd), packing, set ops
SWEEP = [
    "q_hash_sample",
    "q_weighted_sample",
    "q_dataset_split",
    "q_stratified_sample",
    "q_train_order",
    "q_dedup_pk",
    "q_string_agg",
    "q_topk_per_group",
    "q_pack_sequences",
    "q_domain_cap",
    "q_mix_corpora",
    # argmax ties are the canonical partition-order-dependent result:
    # guarded since the struct-extreme tie-break fix
    "q_maxby_aggregates",
    # round-3 additions with explicit determinism mechanisms under
    # test: RANGE-frame tie grouping (time decay), event_id tiebreak
    # (markov), prefix-rank candidate set + exact verify (ppjoin),
    # min-struct nearest tie-break (spatial), wedge/corner counting
    # (triangle)
    "q_time_decay",
    "q_markov_chain",
    "q_ppjoin",
    "q_spatial_join",
    "q_triangle_count",
    "q_source_drift",
    # rounded-centroid rounds (kmeans), exact signatures (phash),
    # count-ratio scoring (bigram LM), filtered-postings ranking (bm25)
    "q_kmeans",
    "q_image_phash",
    "q_bigram_logprob",
    "q_bm25_search",
    # round-11: the unigram trainer's whole trajectory (seed top-k,
    # exact-decimal Viterbi argmaxes, backwalk tiebreaks) must be a
    # pure function of the corpus; Shapley's mask histogram and the
    # QL ranking are the other new order-sensitive shapes
    "q_unigram_train",
    "q_shapley_attribution",
    "q_ql_search",
]


def _rows(spark, name, n_parts, sf_dir):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        df = em.queries()[name](spark, sf_dir)
        cols = sorted(df.columns)
        out = []
        for r in df.select(*cols).collect():
            out.append(tuple(_c(v) for v in r))
        return sorted(out, key=lambda t: tuple(str(x) for x in t))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def _c(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, list):
        return tuple(_c(x) for x in v)
    return v


@pytest.mark.parametrize("name", SWEEP)
def test_result_is_partition_count_independent(spark, sf_dir, name):
    a = _rows(spark, name, 3, sf_dir)
    b = _rows(spark, name, 17, sf_dir)
    assert a == b, f"{name} result depends on shuffle partition count"
