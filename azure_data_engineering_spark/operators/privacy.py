"""Privacy audits as aggregation plans.

k-anonymity (Sweeney 2002): a release is k-anonymous when every
combination of quasi-identifier values is shared by at least k rows —
the audit a data-engineering team runs BEFORE shipping a 100 TB
extract, because re-identification risk lives in the small groups.
l-diversity (Machanavajjhala et al., ICDE 2006) extends it: a
k-anonymous group still leaks if everyone in it shares the same
sensitive value, so the audit also reports the minimum number of
DISTINCT sensitive values per group.

Both are ONE groupBy over the quasi-identifier tuple followed by a
1-row summary aggregate — map-side combinable, no joins, the cheapest
possible shape at any scale. The reference pipeline
(ref adffunction/__init__.py:57-117) ships extracts with no such
audit; this is the guardrail it was missing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    out_decimals: int = 6,
) -> DataFrame:
    """Audit a frame's re-identification risk under the given
    quasi-identifier columns. Returns ONE row:

    - n_rows, n_groups: corpus size and distinct QI combinations
    - k_min: the smallest group (the release is k_min-anonymous)
    - n_singletons: groups of size 1 (directly re-identifiable rows)
    - rows_below_k / pct_below_k: rows in groups smaller than k — the
      population that must be suppressed or generalized before release
    - min_l_diversity: the minimum count of distinct sensitive values
      across groups (1 means some group's sensitive attribute is
      fully disclosed even if k-anonymous)

    NULL quasi-identifier values form their own group (Spark and SQL
    GROUP BY both treat NULLs as equal), which is the conservative
    choice: missingness patterns are themselves identifying."""
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("g_n"),
        F.countDistinct(F.col(sensitive_col)).alias("g_l"),
    )
    return groups.agg(
        F.sum("g_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("g_n").cast("long").alias("k_min"),
        F.sum((F.col("g_n") == 1).cast("long")).cast("long").alias("n_singletons"),
        F.sum(F.when(F.col("g_n") < k, F.col("g_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_k"),
        F.round(
            F.sum(F.when(F.col("g_n") < k, F.col("g_n")).otherwise(F.lit(0)))
            / F.sum("g_n"),
            out_decimals,
        ).alias("pct_below_k"),
        F.min("g_l").cast("long").alias("min_l_diversity"),
    )
