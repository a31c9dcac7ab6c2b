"""Streaming near-dup dedup against a PERSISTED signature store — the
continuous-crawl shape: every micro-batch of documents is checked
against the minhash/LSH band buckets of everything previously kept,
survivors are emitted AND their buckets are committed back to the
store, so duplicates of last week's corpus are dropped this week.

Why not dropDuplicatesWithinWatermark? That is exact-key state with a
time horizon; corpus dedup needs NEAR-duplicate matching (LSH) with
UNBOUNDED history, and the history must be a queryable table, not
opaque state-store files. So the operator keeps its state in a
manifest-committed snapshot table (sources/snapshot.py): one atomic
commit per micro-batch, time-travelable, vacuumable, and shared with
batch jobs.

Store layout: (id, band, band_hash) — signatures EXPLODED to one row
per band. The history probe is then a plain equi-join on
(band, band_hash): no array ops, broadcast-able when the batch is
small, and at 100 TB the store is just a big parquet table the join
shuffles on its bucket key (optionally bucketed-by band_hash for a
shuffle-free probe). Candidate semantics inherit the LSH S-curve of
minhash_lsh_candidates (num_hashes/bands): ~0.5 Jaccard threshold at
64/16.

Scale notes:
- per batch: one signature pipeline (explode→hash→64 codegen min-aggs,
  operators/dedup.py), one join against the store, one append-only
  snapshot commit of the survivors' bucket rows (O(batch), never
  rewrites history);
- intra-batch duplicates resolve deterministically (min id wins) via
  minhash_lsh_candidates on the batch alone, so a batch full of copies
  admits exactly one;
- exact copies share identical signatures, hence all bands collide —
  exact dedup is subsumed;
- crash safety = the snapshot commit protocol: a batch that dies
  before its pointer swap leaves the store on the previous version and
  the checkpoint replays the batch (tests/test_stream_recovery.py
  proves the pattern for the CDC sink);
- maintenance: append commits add O(1) files per batch, so after many
  batches the store accumulates small files and old manifests — run
  sources/compaction.compact_parquet on a re-snapshot plus
  sources/snapshot.vacuum(keep_last=N) periodically, exactly like any
  log-structured table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.dedup import (
    band_buckets,
    minhash_lsh_candidates,
)
from azure_data_engineering_spark.sources.snapshot import (
    current_version,
    snapshot_read,
    snapshot_write,
)


def dedup_batch_against_store(
    batch: DataFrame,
    store_table: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """One round of continuous dedup: drop batch docs that (a) share
    any band bucket with the persisted store, or (b) are intra-batch
    near-dups of a lower-id batch doc; append the SURVIVORS' buckets
    to the store as one atomic snapshot commit. Returns the surviving
    rows of `batch` (all original columns)."""
    spark = batch.sparkSession
    buckets = band_buckets(batch, text_col, id_col, num_hashes, bands, k)

    # (a) history collisions: semi-join on the bucket key
    if current_version(store_table) is not None:
        store = snapshot_read(spark, store_table)
        hist_dupes = (
            buckets.join(store, ["band", "band_hash"], "left_semi").select("id").distinct()
        )
    else:
        hist_dupes = spark.createDataFrame([], "id long")

    # (b) intra-batch near-dups: keep the min id of each candidate pair
    intra = minhash_lsh_candidates(batch, text_col, id_col, num_hashes, bands, k).select(
        F.col("id_b").alias("id")
    )

    doomed = hist_dupes.unionByName(intra).distinct()
    survivors = batch.join(
        doomed.withColumnRenamed("id", id_col), [id_col], "left_anti"
    )

    # persist survivors' buckets — O(batch) append, atomic commit
    surv_buckets = buckets.join(
        survivors.select(F.col(id_col).alias("id")), ["id"], "left_semi"
    )
    snapshot_write(surv_buckets, store_table, mode="append")
    return survivors


def stream_neardup_filter(
    stream: DataFrame,
    store_table: str,
    out_table: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    checkpoint: str | None = None,
    query_name: str = "stream_neardup",
):
    """Continuous near-dup filtering: each micro-batch flows through
    dedup_batch_against_store, survivors are appended to the parquet
    folder `out_table`, and the signature store advances one snapshot
    version per batch. availableNow + checkpoint → exactly-once batch
    replay on restart."""

    def dedup_and_emit(batch_df: DataFrame, batch_id: int) -> None:
        survivors = dedup_batch_against_store(
            batch_df, store_table, text_col, id_col, num_hashes, bands, k
        )
        survivors.write.mode("append").parquet(out_table)

    writer = stream.writeStream.foreachBatch(dedup_and_emit).queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()
