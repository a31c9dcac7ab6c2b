"""Time-partitioned archive sink.

The reference archives processed blobs into
`{folder}_{yyyyMMddHHmm}/{file}` paths then deletes the originals
(move — SharedCode/HelperFunction.py:51-60). The Spark-first version
is a partitioned write: the archive timestamp is a partition column,
so retention sweeps and re-reads become partition pruning instead of
name parsing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def archive_write(
    df: DataFrame,
    path: str,
    archive_ts: Column | None = None,
    fmt: str = "parquet",
    mode: str = "append",
) -> None:
    """Write df under path partitioned by archive_date=yyyyMMddHHmm
    (reference naming, HelperFunction.py:52-55). archive_ts defaults to
    current_timestamp; pass a literal for deterministic tests."""
    ts = archive_ts if archive_ts is not None else F.current_timestamp()
    out = df.withColumn("archive_date", F.date_format(ts, "yyyyMMddHHmm"))
    out.write.partitionBy("archive_date").format(fmt).mode(mode).save(path)


def archive_prune(spark, path: str, lo: str, hi: str, fmt: str = "parquet") -> DataFrame:
    """Read only the archive partitions in [lo, hi] — the retention
    window as partition pruning (vs the reference's regex-on-names,
    HelperFunction.py:96-106)."""
    df = spark.read.format(fmt).load(path)
    return df.filter(F.col("archive_date").between(lo, hi))
