from azure_data_engineering_spark.operators.relational import (
    asof_join,
    range_join,
    top_k,
    top_k_per_group,
    dedup_keep_first,
    string_agg,
)
from azure_data_engineering_spark.operators.upsert import apply_cdc, merge_upsert
from azure_data_engineering_spark.operators.relational import salted_aggregate, salted_join
from azure_data_engineering_spark.operators.expectations import Suite, check
from azure_data_engineering_spark.operators.incremental import (
    finalize_avg,
    merge_partials,
    partial_agg,
)
from azure_data_engineering_spark.operators.profiling import profile
from azure_data_engineering_spark.operators.scd import scd2_apply
from azure_data_engineering_spark.operators.sampling import weighted_bernoulli
from azure_data_engineering_spark.operators.dedup import (
    exact_dedup,
    shingles,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from azure_data_engineering_spark.operators.similarity import brute_force_top_k, lsh_bucketed_top_k
from azure_data_engineering_spark.operators.window_ops import sessionize, running_aggregates

__all__ = [
    "asof_join",
    "range_join",
    "top_k",
    "top_k_per_group",
    "dedup_keep_first",
    "string_agg",
    "merge_upsert",
    "apply_cdc",
    "salted_aggregate",
    "salted_join",
    "Suite",
    "check",
    "partial_agg",
    "merge_partials",
    "finalize_avg",
    "profile",
    "scd2_apply",
    "weighted_bernoulli",
    "exact_dedup",
    "shingles",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash",
    "brute_force_top_k",
    "lsh_bucketed_top_k",
    "sessionize",
    "running_aggregates",
]
