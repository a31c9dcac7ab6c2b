"""Fixed-width text files — the mainframe/legacy-feed format the
reference's CSV path implies but never covers.

Read = `spark.read.text` + substring/trim/cast projections: the parse
is pure Column expressions inside whole-stage codegen over the line
scan, so a 100 TB feed parses at scan speed with full column pruning
(unreferenced fields are never materialized). Write = rpad/concat,
also codegen. No Python touches a row in either direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# colspec: (name, start [1-based], length, spark_type)
ColSpec = tuple[str, int, int, str]


def read_fixed_width(spark: SparkSession, path: str, colspecs: list[ColSpec]) -> DataFrame:
    """Parse a fixed-width file into typed columns. Fields are
    right-padded by convention; trim before cast. `try_cast` keeps the
    parse permissive under ANSI mode — a malformed numeric field
    becomes NULL (mirroring permissive CSV) instead of failing the
    whole 100 TB scan on one bad byte."""
    lines = spark.read.text(path)
    return lines.select(
        *[
            F.trim(F.substring(F.col("value"), start, length)).try_cast(dtype).alias(name)
            for name, start, length, dtype in colspecs
        ]
    )


def write_fixed_width(df: DataFrame, path: str, widths: dict[str, int], mode: str = "error") -> None:
    """Write each row as one fixed-width line (columns in df order,
    each value cast to string, right-padded and HARD-TRUNCATED to its
    width — a value wider than its field cannot shift the columns that
    follow it)."""
    cols = [
        F.substring(F.rpad(F.col(c).cast("string"), widths[c], " "), 1, widths[c])
        for c in df.columns
    ]
    df.select(F.concat(*cols).alias("value")).write.mode(mode).text(path)
