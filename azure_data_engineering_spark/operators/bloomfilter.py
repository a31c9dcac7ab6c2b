"""Portable Bloom-filter build + false-positive audit, relationally
(Bloom, CACM 1970; Broder & Mitzenmacher 2004 survey).

Spark has an internal Bloom filter (the runtime bloom-join pruning the
engine already asserts in q_runtime_bloom_join), but that bitset is
engine-private. A data PLATFORM needs the opposite: a filter whose
bit positions are a pure, portable function of the key — buildable in
Spark, shippable to any other system (a streaming dedup gate, an edge
cache, a different engine), and rebuildable bit-for-bit anywhere. The
engine's md5 discipline gives exactly that:

    pos_i(key) = md5(key || '#' || i)[:8 hex] mod m,  i = 1..k

The SET of positions IS the filter (a relational bitset — at any
scale it is min(n·k, m) rows, and m is chosen ~10n so it's key-sized,
not row-sized). Membership: a probe is positive iff ALL k of its
positions are present — one equi-join on position + one count-per-
probe == k. The audit measures the observed false-positive rate on a
DISJOINT probe set against the theoretical (fill_ratio)^k.

Everything is exact integers / md5 arithmetic — the whole audit
replays identically in SQL, including the filter itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 4294967296  # 2^32: md5-prefix unit space, engine-portable


def _chain_pow(base: Column, n: int) -> Column:
    """base^n as left-assoc multiplication ((b·b)·b)·… — mirror the
    same association order in SQL."""
    out = base
    for _ in range(n - 1):
        out = out * base
    return out


def _positions(key: Column, n_bits: int, n_hashes: int) -> Column:
    """Array of the k bit positions for a key (exploded by callers)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 8
                ),
                16,
                10,
            )
            .cast("bigint")
            % n_bits
            for i in range(1, n_hashes + 1)
        ]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str | Column,
    n_bits: int = 16384,
    n_hashes: int = 4,
) -> DataFrame:
    """The filter as a one-column frame of DISTINCT set bit positions."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        keys.select(
            F.explode(_positions(key, n_bits, n_hashes)).alias("pos")
        )
        .distinct()
    )


def bloom_fp_audit(
    keys: DataFrame,
    probes: DataFrame,
    key_col: str | Column,
    probe_col: str | Column,
    n_bits: int = 16384,
    n_hashes: int = 4,
    out_decimals: int = 6,
) -> DataFrame:
    """ONE-row audit: build the filter from `keys`, test every probe
    in `probes` (caller guarantees disjoint from keys — hits would be
    true positives, not false), report n_keys / n_bits_set /
    fill_ratio / n_probes / n_false_positives / observed fp_rate /
    theoretical fp_rate = fill_ratio^k. Run this BEFORE sizing a
    production filter: the observed/theoretical gap is the md5-
    uniformity check, and fill_ratio tells you whether m was big
    enough for the key volume."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    probe = F.col(probe_col) if isinstance(probe_col, str) else probe_col
    bits = bloom_build(keys, key, n_bits, n_hashes).localCheckpoint(eager=True)
    n_set = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    n_keys = keys.agg(F.countDistinct(key).cast("long").alias("n_keys"))
    ph = probes.select(
        probe.cast("string").alias("p"),
        F.explode(_positions(probe, n_bits, n_hashes)).alias("pos"),
    ).distinct()
    hits = (
        ph.join(bits, "pos")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(
            ph.groupBy("p").agg(F.count(F.lit(1)).alias("n_pos")), "p"
        )
        .filter(F.col("n_hit") == F.col("n_pos"))
    )
    n_probes = probes.agg(
        F.countDistinct(probe).cast("long").alias("n_probes")
    )
    n_fp = hits.agg(F.count(F.lit(1)).cast("long").alias("n_false_positives"))
    fill = F.col("n_bits_set").cast("double") / F.lit(float(n_bits))
    return (
        n_keys.crossJoin(F.broadcast(n_set))
        .crossJoin(F.broadcast(n_probes))
        .crossJoin(F.broadcast(n_fp))
        .select(
            "n_keys",
            "n_bits_set",
            F.round(fill, out_decimals).alias("fill_ratio"),
            "n_probes",
            "n_false_positives",
            F.round(
                F.col("n_false_positives").cast("double")
                / F.col("n_probes").cast("double"),
                out_decimals,
            ).alias("fp_rate"),
            # fill^k via chained multiplication: pow() is not
            # correctly-rounded and may differ across libm builds;
            # a fixed product tree of identical doubles cannot
            F.round(
                _chain_pow(fill, n_hashes), out_decimals
            ).alias("fp_rate_theoretical"),
        )
    )
