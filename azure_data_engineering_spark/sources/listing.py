"""File-listing scan: a DataFrame over (path, name, size, mtime).

The reference's unit of work is a blob listing under a
(container, folder-prefix) pair (adffunction/__init__.py:82,148;
SharedCode/HelperFunction.py:88,115). Here a listing is itself a
DataFrame — name predicates (skip placeholder.txt, non-xls files,
retention windows) become pushed-down filters instead of Python loop
guards (adffunction/__init__.py:97-102).

Implementation: `binaryFile` format with a path glob reads metadata
columns; `recursiveFileLookup` handles nested "virtual folders". The
content column is dropped unless requested, so Spark only stats the
files (column pruning avoids reading bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    with_content: bool = False,
) -> DataFrame:
    """DataFrame of files under `path`: (path, name, length, mtime
    [, content])."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    cols = [
        F.col("path"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
        F.col("length"),
        F.col("modificationTime").alias("mtime"),
    ]
    if with_content:
        cols.append(F.col("content"))
    return df.select(*cols)
