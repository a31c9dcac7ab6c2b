"""PII detection and redaction for training-data pipelines.

A 100 TB pretraining corpus must be scrubbed of emails, phone numbers,
government IDs, and host addresses before the text reaches a tokenizer.
Everything here is JVM-side `regexp_replace` / `regexp_extract_all`
chains — whole-stage codegen over the projected text column, no Python
in the hot path, linear in bytes scanned.

The patterns are deliberately restricted to the regex subset with
identical semantics in Java's engine (Spark) and RE2 (DuckDB, used by
the correctness oracle): no backreferences, no lookaround. Redaction
applies the patterns in a FIXED order (email, ssn, phone, ipv4) so the
output is deterministic even where patterns could overlap (a dotted
phone number must be consumed before the IPv4 pattern sees it).

Reference parity: the reference repo sanitizes free-text fields
character-by-character before loading (SharedCode/HelperFunction.py:36-41);
this module is the same scrub-before-load stage generalized to PII
classes for LLM corpus prep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: earlier patterns are redacted first and counted on the raw
# text. SSN before PHONE (both are dashed digit runs), PHONE before IP
# (dotted phones).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a typed placeholder like <EMAIL>."""
    out = col
    for name, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{name.upper()}>")
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-class match counts on the raw text (pre-redaction), for
    corpus audit dashboards and filter thresholds."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))
        for name, pattern in PII_PATTERNS
    }


def has_pii(col: Column) -> Column:
    """True when any PII class matches — the cheap filter predicate
    form (short-circuits per row, no counting)."""
    pred = F.lit(False)
    for _, pattern in PII_PATTERNS:
        pred = pred | (col.rlike(pattern))
    return pred
