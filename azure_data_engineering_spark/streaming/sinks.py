"""Streaming sinks beyond the built-ins: CDC-style upsert.

The reference's load path is batch COPY/upsert per blob folder
(adffunction/__init__.py:117-194). The streaming twin is foreachBatch:
each micro-batch MERGEs into the target with the same PK semantics
(operators/upsert.merge_upsert = PGHelperFunction.py:44-67 semantics).
On Delta/Iceberg the merge is transactional `MERGE INTO`; on plain
parquet (this environment) the batch merge rewrites the target — the
orchestration shape (exactly-once per epoch via checkpointed batch
ids) is what carries to production.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.upsert import merge_upsert


def stream_upsert_to_parquet(
    stream: DataFrame,
    target_path: str,
    pk: Sequence[str],
    dedup_order: Sequence | None = None,
    query_name: str = "stream_upsert",
):
    """Run a streaming query that MERGEs every micro-batch into the
    parquet table at target_path (update-matched / insert-unmatched /
    batch deduped on PK). Returns the StreamingQuery; caller awaits."""
    spark = stream.sparkSession

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        order = dedup_order if dedup_order is not None else [F.col(c) for c in pk]
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch_df.select(*target.columns), pk, dedup_order=order)
        else:
            from azure_data_engineering_spark.operators.relational import dedup_keep_first

            merged = dedup_keep_first(batch_df, pk, order)
        # plain-parquet rewrite: materialize before overwriting the
        # files being read (Delta/Iceberg make this a transactional
        # MERGE instead)
        rows = merged.collect()
        spark.createDataFrame(rows, merged.schema).write.mode("overwrite").parquet(target_path)

    return (
        stream.writeStream.foreachBatch(upsert_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
