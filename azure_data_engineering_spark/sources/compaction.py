"""Small-file compaction for parquet tables.

Streaming sinks, frequent upserts, and over-parallel writers leave
tables as thousands of KB-scale files; at 100 TB the resulting task
explosion and NameNode/listing pressure dominate scan cost long before
CPU does. Compaction rewrites a table (or one partition directory of
it) into files near a target size, using the same
write-to-temp + atomic-rename commit as the CDC sink
(streaming/sinks.py:49), so readers never observe a half-written table
and a crash mid-compact is recoverable.

Reference parity: the reference's maintenance step is its retention
sweep (adffunction/__init__.py:188-199, delete-by-age); compaction is
the second standard maintenance job a parquet lake needs.

Sizing: target file count = ceil(on-disk bytes / target_bytes),
clamped to ≥1. Uses coalesce() when shrinking (no shuffle — the usual
case) and repartition() only when file count must grow.
"""

from __future__ import annotations

import glob
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(glob.escape(path), "**", "*"), recursive=True)
        if os.path.isfile(f)
    )


def plan_file_count(path: str, target_bytes: int = 128 * 1024 * 1024) -> int:
    """Files needed to hit ~target_bytes each (HDFS-block-sized by
    default). On object stores pass 256-512 MB."""
    return max(1, math.ceil(_dir_bytes(path) / target_bytes))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite `path` to ~target_bytes files; returns the new file
    count. Optional sort_cols gives clustered files (sortWithinPartitions
    after a range repartition) so min/max footer stats prune reads —
    the poor man's Z-order for single-column predicates."""
    n = plan_file_count(path, target_bytes)
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        current = len(df.inputFiles())
        df = df.coalesce(n) if n <= current else df.repartition(n)
    tmp = path.rstrip("/") + ".__compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".__compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(spark.read.parquet(path).inputFiles())


def recover_compaction(path: str) -> None:
    """Roll back an interrupted compaction: restore the `.__compact_old`
    backup if the live directory vanished mid-rename; drop leftovers."""
    old = path.rstrip("/") + ".__compact_old"
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(path.rstrip("/") + ".__compact_tmp", ignore_errors=True)
