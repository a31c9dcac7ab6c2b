"""Benchmark decontamination: drop training documents that share any
word n-gram with an evaluation set.

Standard LLM pretraining hygiene (GPT-3 appendix C / PaLM §6 style):
a training document is contaminated when any of its n-grams (n≈8-13
words) also occurs in a benchmark/eval document. Implementation is
Spark-first and asymmetric by design:

- The EVAL side is small (benchmarks are KBs-MBs); its distinct shingle
  set is broadcast, so the 100 TB training corpus is scanned once with
  a broadcast semi-join — no shuffle of corpus bytes, no all-pairs.
- Shingles are the existing zip_with O(len) construction
  (operators/dedup.py:69) on normalized text, so tokenization matches
  the dedup/minhash stack exactly.
- Matching is on the shingle STRING (not a hash) so the operator is
  false-positive-free; swap in xxhash64(shingle) on both sides if the
  eval shingle set ever outgrows broadcast range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def _shingle_sets(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("shingle"))


def contaminated_ids(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Distinct ids of training docs sharing ≥1 word k-gram with any
    eval doc. Short docs (< k words) still emit one partial shingle
    (dedup.shingles semantics), so verbatim short overlaps are caught."""
    eval_shingles = eval_set.select(F.explode(shingles(F.col(text_col), k)).alias("shingle")).distinct()
    train_shingles = _shingle_sets(train, text_col, id_col, k)
    return (
        train_shingles.join(F.broadcast(eval_shingles), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """The filtered corpus: train minus contaminated docs (left anti on
    the id set, which arrives pre-distinct so the anti-join build side
    is one row per contaminated doc)."""
    bad = contaminated_ids(train, eval_set, text_col, id_col, k)
    return train.join(bad, id_col, "left_anti")
