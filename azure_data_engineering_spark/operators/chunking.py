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


def chunk_by_content(
    df: DataFrame,
    id_col: str,
    text_col: str,
    boundary_mod: int = 32,
) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER every
    token whose hash ≡ 0 (mod boundary_mod), giving chunks of
    boundary_mod expected tokens whose boundaries are a function of
    the CONTENT, not the position — inserting one token early in a
    document shifts every fixed-window chunk but leaves all later
    content-defined chunks byte-identical, which is what makes CDC
    the standard chunking for dedup stores and incremental sync
    (Muthitacharoen et al., "A Low-Bandwidth Network File System",
    SOSP 2001 — the rolling-hash anchoring idea; a per-token hash is
    its whitespace-tokenized analog).

    Plan: posexplode tokens → codegen md5-derived boundary flag → ONE
    per-document running-sum window assigns chunk ids → groupBy
    (doc, chunk) reassembles. Both shuffles are keyed by doc id; the
    window is per-document so its state is bounded by document
    length. The boundary hash is the repo's portable md5 arithmetic —
    the whole chunking replays exactly in ANSI SQL.

    Output: (id, chunk_id, chunk_tokens, chunk_md5) with chunk_id
    0-based in document order.
    """
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"), F.posexplode(t).alias("pos", "tok")
    )
    is_boundary = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
        % boundary_mod
        == 0
    ).cast("int")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(F.sum(is_boundary).over(w), F.lit(0)).alias("chunk_id"),
    )
    return (
        assigned.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("chunk_tokens"),
            F.md5(F.concat_ws(" ", F.array_sort(
                F.collect_list(F.struct("pos", "tok"))
            ).getField("tok"))).alias("chunk_md5"),
        )
    )


def chunk_by_tokens_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int,
    stride: int,
    chunk_text: bool = True,
) -> DataFrame:
    """Overlapping (sliding-window) token chunking — the retrieval/RAG
    chunking mode, where adjacent chunks share max_tokens - stride
    tokens so no semantic unit is split across a hard boundary.
    Windows start at 0, stride, 2*stride, ... up to the first start
    that still reaches the end of the document:
    n_chunks = ceil(max(n - max_tokens, 0) / stride) + 1 (empty and
    short documents yield exactly one chunk), so every token is
    covered and only the final window may be short.

    Same plan shape as chunk_by_tokens: projection + one explode over
    a generated index sequence — narrow, shuffle-free, codegen; at
    100 TB it streams through the scan stage. The overlap multiplies
    output tokens by ~max_tokens/stride — that redundancy is the
    caller's explicit retrieval-recall budget, visible in the plan as
    plain row expansion rather than hidden state.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 < stride <= max_tokens:
        raise ValueError("stride must be in [1, max_tokens]")
    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    n_chunks = (
        F.ceil(F.greatest(n - F.lit(max_tokens), F.lit(0)) / F.lit(stride)) + 1
    ).cast("int")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        n_chunks.alias("n_chunks"),
    )
    exploded = base.select(
        id_col,
        "__toks",
        "__n",
        "n_chunks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    length = F.least(F.lit(max_tokens), F.col("__n") - start)
    return exploded.select(
        id_col,
        "chunk_id",
        "n_chunks",
        start.cast("int").alias("token_start"),
        F.greatest(length, F.lit(0)).cast("int").alias("token_len"),
        *(
            [
                F.array_join(
                    F.slice(
                        F.col("__toks"), start + 1, F.greatest(length, F.lit(0))
                    ),
                    " ",
                ).alias("chunk_text")
            ]
            if chunk_text
            else []
        ),
    )


def fim_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 8,
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): split each
    document into prefix | middle | suffix at two DETERMINISTIC
    pivots and re-serialize as <PRE>prefix<SUF>suffix<MID>middle —
    the PSM order FIM-trained code models consume.

    Pivots come from the engine's md5 unit-interval draw
    (operators/sampling.hash_unit) keyed on the document id, so the
    transform is a pure function of the row — identical on every
    run, partitioning, and engine (the oracle replays the same md5
    arithmetic). Text is first canonicalized to printable ASCII so
    both engines index the same character positions. Shuffle-free:
    one narrow projection, embarrassingly parallel at any scale.

    Output is schema-stable and scalar-only: (id, n_chars, split_a,
    split_b, fim_md5) with the reassembled string carried as an md5
    fingerprint, matching the registry's scalar-output contract.
    """
    from azure_data_engineering_spark.operators.sampling import hash_unit

    s = F.regexp_replace(F.col(text_col), "[^ -~]", "")
    d = df.select(
        F.col(id_col).alias("id"), s.alias("s"), F.length(s).alias("n")
    ).filter(F.col("n") >= min_len)
    u1 = hash_unit(F.col("id"), "fim-a")
    u2 = hash_unit(F.col("id"), "fim-b")
    a = (F.lit(1) + F.floor(u1 * (F.col("n") - 2))).cast("long")
    d = d.select("id", "s", "n", a.alias("a"))
    b = (F.col("a") + 1 + F.floor(u2 * (F.col("n") - F.col("a") - 1))).cast("long")
    d = d.select("id", "s", "n", "a", b.alias("b"))
    fim = F.concat(
        F.lit("<PRE>"),
        F.substring(F.col("s"), F.lit(1), F.col("a")),
        F.lit("<SUF>"),
        F.substring(F.col("s"), F.col("b") + 1, F.col("n") - F.col("b")),
        F.lit("<MID>"),
        F.substring(F.col("s"), F.col("a") + 1, F.col("b") - F.col("a")),
    )
    return d.select(
        "id",
        F.col("n").alias("n_chars"),
        F.col("a").alias("split_a"),
        F.col("b").alias("split_b"),
        F.md5(fim).alias("fim_md5"),
    )


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 3,
    stride: int = 10,
) -> DataFrame:
    """T5-style span corruption (Raffel et al., JMLR 2020): replace
    token spans with ordinal sentinels and emit the (corrupted input,
    target) pair — the denoising objective's data transform. Spans are
    chosen DETERMINISTICALLY: each document draws one offset r from
    the portable md5 primitive (the engine's standard cross-engine
    unit draw) and corrupts the complete spans starting at token
    positions ≡ r (mod stride); stride > span_len makes them
    non-overlapping by construction, and determinism makes the whole
    transform replayable (retry-safe, oracle-checkable) — no RNG state
    anywhere.

        input : tokens with each span collapsed to <extra_id_K>
        target: <extra_id_K> followed by that span's tokens, in order

    Scale shape: pure in-row Column HOFs over the token array — zero
    shuffles, the transform runs as a scan. Whitespace is normalized
    to single spaces (the tokenizer's view, same as chunk_by_tokens).
    Returns (id, n_tokens, n_spans, corrupted, targets)."""
    if stride <= span_len:
        raise ValueError("stride must exceed span_len (non-overlap)")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    r = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(stride),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        n.cast("long").alias("n_tokens"),
        r.alias("r"),
    )

    def is_start(i):
        return (
            (i >= F.col("r"))
            & ((i - F.col("r")) % stride == 0)
            & (i + span_len <= F.col("n_tokens"))
        )

    def in_span(i):
        # start of the span i would belong to, if any
        s = i - F.pmod(i - F.col("r"), F.lit(stride))
        return (
            (i >= F.col("r"))
            & (F.pmod(i - F.col("r"), F.lit(stride)) < span_len)
            & (s + span_len <= F.col("n_tokens"))
        )

    def k_of(i):
        return ((i - F.col("r")) / stride).cast("long")

    corrupted_arr = F.filter(
        F.transform(
            F.col("toks"),
            lambda x, i: F.when(
                is_start(i), F.concat(F.lit("<extra_id_"), k_of(i), F.lit(">"))
            )
            .when(in_span(i), F.lit(""))
            .otherwise(x),
        ),
        lambda x: x != "",
    )
    target_arr = F.filter(
        F.transform(
            F.col("toks"),
            lambda x, i: F.when(
                is_start(i),
                F.concat(F.lit("<extra_id_"), k_of(i), F.lit("> "), x),
            )
            .when(in_span(i), x)
            .otherwise(F.lit("")),
        ),
        lambda x: x != "",
    )
    n_spans = F.size(
        F.filter(
            F.transform(F.col("toks"), lambda x, i: is_start(i).cast("int")),
            lambda f: f == 1,
        )
    ).cast("long")
    return base.select(
        "id",
        "n_tokens",
        n_spans.alias("n_spans"),
        F.array_join(corrupted_arr, " ").alias("corrupted"),
        F.array_join(target_arr, " ").alias("targets"),
    )


def packing_efficiency(
    packed: DataFrame,
    seq_cols,
    token_len_col: str,
    capacity: int,
    round_digits: int = 6,
) -> DataFrame:
    """Packing-efficiency audit of a pack_sequences result — the
    acceptance gate a training-batch pipeline runs before shipping:
    wasted pad tokens ARE wasted accelerator hours, and a fill ratio
    that drifts down signals the chunker and the packer have come
    apart. Per packed sequence (keyed by `seq_cols`): item count,
    used tokens, fill ratio vs `capacity`, overflow flag (the
    streaming packer admits at most one straddling chunk past the
    budget — anything overflowing by MORE than that is a packing
    bug), and pad waste (0 for overflowed sequences). One aggregate
    on the sequence key; output is sequence-count-sized."""
    gcols = list(seq_cols)
    agg = packed.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.col(token_len_col).cast("long")).cast("long").alias("used_tokens"),
        F.max(F.col(token_len_col).cast("long")).cast("long").alias("max_item"),
    )
    cap = F.lit(int(capacity))
    return agg.select(
        *gcols,
        "n_items",
        "used_tokens",
        cap.cast("long").alias("capacity"),
        F.round(F.col("used_tokens").cast("double") / cap, round_digits).alias(
            "fill_ratio"
        ),
        (F.col("used_tokens") > cap).cast("int").alias("overflowed"),
        F.greatest(cap - F.col("used_tokens"), F.lit(0)).cast("long").alias(
            "pad_waste"
        ),
    )
