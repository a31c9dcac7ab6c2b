"""Heavy hitters: Misra-Gries candidate generation + exact verification.

The one standard mergeable sketch the engine lacked next to HLL / KLL /
theta (`q_sketches`): frequent-item detection over a 100 TB token or URL
stream without an exact full-vocabulary aggregation. (Misra & Gries,
"Finding Repeated Elements", Sci. Comput. Program. 1982; the weighted
update rule is the Space-Saving-family generalization from Metwally et
al., ICDT 2005.)

Spark-first shape — a two-stage plan whose FINAL OUTPUT is exact and
partitioning-independent, which is what makes it oracle-checkable:

1. per-partition Misra-Gries with k counters (mapInPandas; batches are
   pre-reduced with vectorized value_counts, so the Python loop touches
   distinct items per batch, not rows). Each summary is <= k rows.
   Guarantee: any item whose weight within the partition exceeds
   W_p/(k+1) is present in that partition's summary.
2. the union of summaries (<= num_partitions * k rows — KBs, not the
   corpus) is deduplicated into a broadcast candidate set; summed
   partition thresholds give the global guarantee SUM W_p/(k+1) =
   N/(k+1), so every item with global count > N/(k+1) survives into
   the candidates (no false negatives above the threshold).
3. exact verification: one aggregation over ONLY the candidate tokens
   (broadcast semi-join prunes the shuffle to candidate rows), filtered
   to true count > N/k >= N/(k+1). False positives drop out; the
   result is EXACTLY {item : count(item) > N/k}, independent of
   partitioning — MG is a pruner, never the source of truth.

At 100 TB the win is step 3's shuffle carrying only candidate tokens
(bounded by partitions * k) instead of the full web-scale vocabulary;
steps 1-2 are map-side + a KB-scale union. tests/test_heavy_hitters.py
asserts the MG error bound (true - lower_bound <= N_p/(k+1)) and the
no-false-negative guarantee against exact counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (item, lower-bound count),
    <= k rows per partition. Weighted updates (batch value_counts feed
    counts, not single occurrences): present -> add; space -> insert;
    else decrement-all by min(w, min counter), evicting zeros —
    each unit of decrement hits k+1 distinct items at once, which is
    where the W_p/(k+1) error bound comes from."""
    out_schema = f"{col} string, lower_bound long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item, w in pdf[col].value_counts().items():
                w = int(w)
                if item in counters:
                    counters[item] += w
                elif len(counters) < k:
                    counters[item] = w
                else:
                    while w > 0 and item not in counters:
                        m = min(counters.values())
                        d = min(w, m)
                        counters = {
                            i: c - d for i, c in counters.items() if c - d > 0
                        }
                        w -= d
                        if len(counters) < k and w > 0:
                            counters[item] = w
                            w = 0
        yield pd.DataFrame(
            {col: list(counters), "lower_bound": list(counters.values())}
        )

    return tokens.select(col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Exact set of items with count > N/k, found without a full-vocab
    aggregation: MG candidates (no false negatives above N/(k+1) <
    N/k), then exact counts of the candidate set only. Returns
    (col, cnt, n_total) sorted nowhere — callers order."""
    partials = misra_gries_partials(tokens, col, k)
    candidates = partials.select(col).distinct()
    exact = (
        tokens.select(col)
        .join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = tokens.select(F.count(F.lit(1)).alias("n_total"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(col, "cnt", "n_total")
    )


# --------------------------------------------------- count-min sketch


def _cms_bucket(col, row: int, width: int):
    """Portable bucket hash for CMS row `row`: first 8 hex chars of
    md5(row|item) as an integer, mod width — md5 (not murmur/xxhash)
    so a persisted sketch is reproducible across engines, the same
    convention as sampling.hash_unit (DuckDB:
    CAST('0x'||substr(md5(...),1,8) AS BIGINT) % width)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}|"), col)), 1, 8), 16, 10)
    return (h.cast("long") % width).alias(f"b{row}")


def cms_build(tokens: DataFrame, col: str, width: int, depth: int) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
    as a DataFrame of (row, bucket, cnt): depth hash rows of width
    buckets each. ONE corpus pass — the depth buckets per item are
    computed map-side and exploded before a single groupBy, so the
    shuffle carries at most depth*width distinct keys regardless of
    vocabulary size (the whole point vs an exact full-vocab agg: a
    web-scale URL column aggregates into depth*width cells, KBs).
    Sketches over different corpora MERGE by unioning and re-summing
    (row, bucket) — the mergeability the sketch family promises."""
    pairs = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return (
        pairs.select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, width: int, depth: int
) -> DataFrame:
    """Point-frequency estimates for `probes[col]` from a built
    sketch: min over the depth rows of the addressed bucket counts.
    The sketch is depth*width rows — broadcast; estimating N probes
    is N*depth lookups via an equi-join, never a scan of the corpus.
    Guarantee: estimate >= true count always (only overcounts from
    collisions); estimate <= true + eps*N with probability 1-delta
    for width = ceil(e/eps), depth = ceil(ln 1/delta) — asserted
    against exact counts in tests/test_heavy_hitters.py."""
    addressed = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(col, "rb.row", "rb.bucket")
    return (
        addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna({"cnt": 0})
        .groupBy(col)
        .agg(F.min("cnt").alias("est_cnt"))
    )
