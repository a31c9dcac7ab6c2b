"""Deterministic sampling and dataset splitting — training-data
pipeline surface beyond the reference (SURVEY.md §2B "LLM-pipeline
extensions"; the reference's closest analog is its row-subset SQL,
PGHelperFunction.py:53-56).

Everything here derives from one primitive: a reproducible uniform
hash in [0, 1) computed as the first 8 hex chars of md5(id || salt).
Unlike `df.sample()` (seeded per-partition RNG — resample on every
repartition and engine-specific), this is a pure column expression:
- stable under repartitioning, retries, and AQE re-planning;
- portable — any engine with md5 reproduces the exact row set, which
  is what makes these operators oracle-checkable cross-engine;
- streaming-safe (a row's fate depends only on its key).

Scale: all operators are narrow (filter / projection) or one window
per stratum; nothing shuffles except stratified exact-k (one shuffle
on the strata keys). At 100 TB the filters push to the scan and the
hash runs in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(2**32)  # 8 hex chars of md5


def hash_unit(col: Column, salt: str = "") -> Column:
    """Deterministic uniform double in [0, 1) from a key column.
    DuckDB twin of the arithmetic:
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || salt), 1, 8) AS BIGINT)
      / 4294967296.0"""
    s = F.concat(col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint") / F.lit(HASH_SPACE)


def deterministic_sample(df: DataFrame, id_col: str | Column, fraction: float, salt: str = "") -> DataFrame:
    """Bernoulli(fraction) sample that is a pure function of the key:
    the same rows are selected on every run, engine, and partitioning.
    Change `salt` to draw an independent sample."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return df.filter(hash_unit(col, salt) < fraction)


def split_assign(
    df: DataFrame,
    id_col: str | Column,
    weights: Mapping[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test/...) by
    cumulative hash thresholds — deterministic, disjoint, exhaustive.
    Weights must sum to 1 (small float tolerance)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    u = hash_unit(col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def mix_corpora(
    sources: Mapping[str, tuple[DataFrame, float]],
    id_col: str,
    salt: str = "",
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mixture: keep each source's rows at its own
    rate (deterministic per-source Bernoulli; the source name salts
    the hash so draws are independent across sources), tag with the
    source name, union by name. The standard recipe for blending
    training corpora at fixed sampling rates; fully reproducible, so
    a re-run (or another engine) yields the identical mixture."""
    out = None
    for name, (df, rate) in sources.items():
        part = deterministic_sample(df, id_col, rate, salt=salt + name).withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("mix_corpora needs at least one source")
    return out


def stratified_sample_exact(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order
    (deterministic, uniform within the stratum, id tiebreak). One
    shuffle on the strata keys; WindowGroupLimit keeps only k rows per
    stratum per partition during the sort."""
    w = Window.partitionBy(*strata).orderBy(
        hash_unit(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
