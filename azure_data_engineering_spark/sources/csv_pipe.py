"""Pipe-delimited CSV source/sink.

The reference's intermediate format: headerless, pipe-separated,
all-string UTF-8 CSV, one file per (workbook, sheet)
(SharedCode/HelperFunction.py:30-32; consumed with sep='|' at
adffunction/__init__.py:167-168, 172).

The reference reads these one file at a time in a Python loop
(adffunction/__init__.py:150-178); here a whole folder is a single
distributed scan — the biggest structural win over the reference
(SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_pipe_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = False,
    infer: bool = False,
) -> DataFrame:
    """Read reference-style pipe CSV. Default matches the reference:
    headerless and all-string (types are the *sink's* concern there —
    Postgres COPY coerces; SURVEY.md §1.1). Pass a schema or
    infer=True to opt into typing at the ingest boundary."""
    reader = spark.read.option("sep", "|").option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_pipe_csv(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    header: bool = False,
) -> None:
    """Write pipe CSV. mode='overwrite' reproduces the reference's
    pre-truncate remove_file_in_to_blob behavior
    (adffunction/__init__.py:78-80) as an atomic overwrite; partition_by
    gives the per-group file naming (one directory per key) that the
    reference emulates with `{basename}_{sheet}.csv` names
    (HelperFunction.py:30-31)."""
    writer = df.write.option("sep", "|").option("header", str(header).lower()).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)
