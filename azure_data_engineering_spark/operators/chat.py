"""Chat-transcript shaping for SFT/RLHF data pipelines.

Instruction-tuning corpora arrive as role-tagged transcripts
("user: ...\\nassistant: ..."); before they become training batches a
pipeline must (a) validate the conversation structure — turn counts,
role balance, alternation discipline, who speaks first — and (b)
derive the loss mask: which token positions of the flattened sequence
belong to assistant turns (the only positions SFT trains on;
user/system tokens are context). Both are pure line-parse +
window-aggregate problems: one explode, one per-doc window, metadata-
sized output. No UDFs — the parse is regexp/split codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ROLES = ("user", "assistant", "system")


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, line_idx, role, content_tokens) — one row per transcript
    line; role '' for a line without a known 'role: ' prefix."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    role = F.regexp_extract(F.col("line"), r"^(user|assistant|system): ", 1)
    content = F.regexp_replace(
        F.col("line"), r"^(user|assistant|system): ", ""
    )
    return lines.select(
        "id",
        "line_idx",
        role.alias("role"),
        F.size(F.filter(F.split(content, " "), lambda t: t != "")).alias(
            "n_toks"
        ),
    )


def chat_turn_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-transcript structure report: (id, n_turns, n_user,
    n_assistant, n_system, n_malformed, starts_with_user,
    alternation_violations, total_tokens, assistant_tokens,
    assistant_share). A violation is two consecutive lines with the
    same non-system role — the structural bug that silently doubles
    context in naive concatenation; malformed lines (no role prefix)
    are counted, not dropped, so the quarantine decision is the
    caller's."""
    w = Window.partitionBy("id").orderBy("line_idx")
    lined = _lines(df, id_col, text_col).withColumn(
        "prev_role", F.lag("role").over(w)
    )
    return (
        lined.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long")).alias(
                "n_assistant"
            ),
            F.sum((F.col("role") == "system").cast("long")).alias("n_system"),
            F.sum((F.col("role") == "").cast("long")).alias("n_malformed"),
            F.max(
                F.when(F.col("line_idx") == 0, (F.col("role") == "user").cast("int"))
            ).alias("starts_with_user"),
            F.sum(
                (
                    (F.col("role") == F.col("prev_role"))
                    & (F.col("role") != "system")
                    & (F.col("role") != "")
                ).cast("long")
            ).alias("alternation_violations"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum(
                F.when(F.col("role") == "assistant", F.col("n_toks")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("assistant_tokens"),
        )
        .withColumn(
            "assistant_share",
            F.round(
                F.when(
                    F.col("total_tokens") > 0,
                    F.col("assistant_tokens").cast("double")
                    / F.col("total_tokens"),
                ),
                round_digits,
            ),
        )
    )


def assistant_loss_mask(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Loss-mask summary over the flattened token sequence (role
    prefixes excluded — they are template, not content): token
    positions covered by assistant turns, with ADJACENT assistant
    turns merged into one span (the island construction shared with
    relational.interval_union_length). Returns per transcript: (id,
    n_tokens, n_loss_tokens, n_spans, first_span_start,
    last_span_end, loss_ratio). first/last are 0-based token offsets;
    NULL when the transcript has no assistant content."""
    w = Window.partitionBy("id").orderBy("line_idx")
    wcum = w.rowsBetween(Window.unboundedPreceding, -1)
    lined = _lines(df, id_col, text_col).withColumn(
        "start_pos", F.coalesce(F.sum("n_toks").over(wcum), F.lit(0))
    )
    flagged = lined.withColumn(
        "is_a", (F.col("role") == "assistant").cast("int")
    ).withColumn(
        "new_span",
        (
            (F.col("is_a") == 1)
            & (F.coalesce(F.lag("is_a").over(w), F.lit(0)) == 0)
        ).cast("int"),
    )
    spans = flagged.withColumn(
        "span_id",
        F.when(F.col("is_a") == 1, F.sum("new_span").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )),
    )
    return (
        spans.groupBy("id")
        .agg(
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("is_a") == 1, F.col("n_toks")).otherwise(0))
            .cast("long")
            .alias("n_loss_tokens"),
            F.countDistinct("span_id").cast("long").alias("n_spans"),
            F.min(F.when(F.col("is_a") == 1, F.col("start_pos")))
            .cast("long")
            .alias("first_span_start"),
            F.max(
                F.when(F.col("is_a") == 1, F.col("start_pos") + F.col("n_toks"))
            )
            .cast("long")
            .alias("last_span_end"),
        )
        .withColumn(
            "loss_ratio",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("n_loss_tokens").cast("double") / F.col("n_tokens"),
                ),
                round_digits,
            ),
        )
    )
