"""DSIR-style data selection via importance resampling.

Public method: Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023). A small TARGET corpus defines
the distribution you want more of; every raw document gets an
importance weight = log-likelihood ratio of its hashed n-gram
features under the target vs the raw feature distributions; documents
are then resampled proportionally to that weight.

Spark-first design, sized for 100 TB:
- features are hashed unigrams+bigrams folded into ``n_buckets``
  counters, so BOTH distribution estimates are tiny (n_buckets rows)
  regardless of corpus size, and the per-document scoring join is a
  BROADCAST of the n_buckets-row delta table — the raw corpus is
  scanned twice (once to estimate, once to score) and shuffled once
  (doc-id aggregation of per-bucket contributions);
- the bucket hash is the repo's portable md5 primitive
  (sampling.hash_unit's arithmetic), so the whole weight computation
  — including the smoothing and the log-ratio — replays exactly in
  ANSI SQL: the operator is oracle-checkable, not just plausible;
- the resampling step reuses the deterministic md5-unit-interval
  draw: selection is a pure function of (doc_id, salt), stable under
  repartitioning, retries, and engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(2**32)


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Portable feature hash: first 8 md5 hex chars mod n_buckets.
    DuckDB twin: CAST('0x' || substr(md5(g),1,8) AS BIGINT) % B."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint") % n_buckets


def _doc_bucket_counts(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(doc_id, bucket, c) — hashed unigram+bigram counts per doc.
    Tokenization, n-gram construction, and hashing are all codegen
    column expressions; the only wide operation is the final count."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"), t.alias("t")
    )
    unigrams = F.col("t")
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select("doc_id", F.explode(F.concat(unigrams, bigrams)).alias("g"))
        .select("doc_id", _bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    rate: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """Score every document with the DSIR hashed-n-gram log-likelihood
    ratio and resample with probability ``rate * sigmoid(score)``.

    Returns (doc_id, dsir_score, selected):
    - ``dsir_score`` = sum over the doc's feature buckets of
      c_doc(b) * [ln p_target(b) - ln p_raw(b)], add-1 smoothed —
      positive means "looks like the target corpus";
    - ``selected`` = deterministic importance-weighted draw
      (md5-unit(doc_id) < rate * sigmoid(score)).

    The target estimate comes from the rows matching ``target_pred``
    INSIDE df (the usual DSIR setup scores a raw pool against a small
    curated target); both estimates are n_buckets-row aggregates that
    broadcast to the scoring pass.
    """
    counts = _doc_bucket_counts(df, text_col, id_col, n_buckets)
    ids = df.select(F.col(id_col).alias("doc_id"), target_pred.alias("is_target"))
    # BOTH distribution estimates in ONE conditional-aggregate pass
    # over the doc-bucket counts (not a pass per distribution — the
    # gram explosion is the expensive subtree and Spark re-executes
    # unreferenced subtrees per consumer); totals then derive from the
    # n_buckets-row frame, not from another corpus pass
    bucket_stats = (
        counts.join(ids, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum("c").alias("c_q"),
            F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(F.lit(0))).alias("c_t"),
        )
    )
    totals = bucket_stats.agg(
        F.sum("c_t").alias("tot_t"), F.sum("c_q").alias("tot_q")
    )
    # every observed bucket appears in bucket_stats (seeded from the
    # raw side); add-1 smoothing gives target-unseen buckets mass
    delta = bucket_stats.join(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(
                (F.col("c_t") + 1).cast("double")
                / (F.col("tot_t") + n_buckets).cast("double")
            )
            - F.log(
                (F.col("c_q") + 1).cast("double")
                / (F.col("tot_q") + n_buckets).cast("double")
            )
        ).alias("log_ratio"),
    )
    scores = (
        counts.join(F.broadcast(delta), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("log_ratio")).alias("score"))
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(HASH_SPACE)
    )
    p_sel = rate * (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))))
    return scores.select(
        "doc_id",
        F.round("score", 4).alias("dsir_score"),
        (u < p_sel).alias("selected"),
    )
