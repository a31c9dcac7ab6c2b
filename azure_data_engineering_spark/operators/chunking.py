"""Token-window document chunking — sequence-length shaping for a
training-data pipeline (SURVEY.md §2B "LLM-pipeline extensions"; no
reference analog — the reference ships rows, not token streams).

A document becomes ceil(n_tokens / max_tokens) contiguous chunks; the
last chunk keeps the remainder. Chunking is a projection + one
`explode` over a generated index sequence — a narrow, codegen-friendly
plan with no shuffle and no Python: at 100 TB it streams through the
scan stage. Token boundaries are single-space splits of the
(pre-normalized) text, so the operation is exactly reproducible in
ANSI SQL (list_slice / array_to_string in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int,
    chunk_text: bool = True,
) -> DataFrame:
    """Explode each document into token windows of max_tokens.

    Output: (id, chunk_id, n_chunks, token_start, token_len
    [, chunk_text]) — token_start is 0-based; empty/blank documents
    yield a single empty chunk so no document silently disappears.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.greatest(F.ceil(n / F.lit(max_tokens)), F.lit(1)).cast("int").alias("n_chunks"),
    )
    exploded = base.select(
        id_col,
        "__toks",
        "__n",
        "n_chunks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * max_tokens
    length = F.least(F.lit(max_tokens), F.col("__n") - start)
    out = exploded.select(
        id_col,
        "chunk_id",
        "n_chunks",
        start.cast("int").alias("token_start"),
        F.greatest(length, F.lit(0)).cast("int").alias("token_len"),
        *(
            [
                F.array_join(
                    F.slice(F.col("__toks"), start + 1, F.greatest(length, F.lit(0))), " "
                ).alias("chunk_text")
            ]
            if chunk_text
            else []
        ),
    )
    return out


def pack_sequences(
    chunks: DataFrame,
    id_col: str,
    order_col: str,
    token_len_col: str,
    max_tokens: int,
    buckets: int = 64,
    bucket_expr=None,
) -> DataFrame:
    """Token-budget sequence packing: assign chunks to training
    sequences of ~max_tokens by running token count.

    seq = floor(tokens_before / max_tokens) within a bucket, where
    tokens_before is the running sum over a deterministic (id, order)
    order — budget binning: a chunk whose tokens straddle a boundary
    joins the earlier sequence, so sequences can overflow by at most
    one chunk (the standard streaming approximation; exact greedy
    packing is sequential by nature).

    Scale: packing is per-BUCKET (deterministic hash of the doc id into
    `buckets` groups), so the running-sum window shuffles once on the
    bucket key and every bucket packs in parallel — never a global
    single-partition window. Sequence ids are (bucket, seq_in_bucket),
    unique across the corpus. bucket_expr overrides the default
    xxhash64 bucketing (e.g. an md5-based bucket when the result must
    be reproducible outside the JVM).
    """
    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(buckets))
    bucket = bucket_expr.alias("bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc(), F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_run = chunks.withColumn("bucket", bucket).withColumn(
        "__tokens_through", F.sum(token_len_col).over(w)
    )
    tokens_before = F.col("__tokens_through") - F.col(token_len_col)
    return with_run.withColumn(
        "seq_id", F.floor(tokens_before / F.lit(max_tokens)).cast("long")
    ).drop("__tokens_through")
