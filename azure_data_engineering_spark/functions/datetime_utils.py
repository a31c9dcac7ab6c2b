"""Timestamp-in-name predicates and archive-path helpers.

The reference encodes time in *names*: archive folders get a
``yyyyMMddHHmm`` suffix (SharedCode/HelperFunction.py:52-55) and the
HDInsight retention sweep parses a 14-digit ``yyyyMMddHHmmss`` out of
container names and compares it as an integer window
(SharedCode/HelperFunction.py:94-109). Both are re-expressed here as
Column expressions so they run distributed and push down.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def retention_match(
    name: Column,
    linkedservice: str,
    datafactory: str,
    reference_date: Column,
    daydiff: int,
    window_days: int = 60,
) -> Column:
    """CheckHDInsightContainer (HelperFunction.py:94-109) as a predicate.

    True iff *name* contains both the linkedservice and datafactory
    substrings AND its embedded 14-digit timestamp lies in
    ``[reference_date + daydiff - window_days, reference_date + daydiff]``
    compared as yyyyMMdd000000 / yyyyMMdd999999 integer bounds
    (HelperFunction.py:99-106).

    Mirrors the reference quirk that non-matching names fall through as
    falsy (no else branch, HelperFunction.py:95): names without both
    substrings are simply filtered out, never an error.
    """
    lo = F.concat(F.date_format(F.date_add(reference_date, daydiff - window_days), "yyyyMMdd"), F.lit("000000")).cast("long")
    hi = F.concat(F.date_format(F.date_add(reference_date, daydiff), "yyyyMMdd"), F.lit("999999")).cast("long")
    stamp = F.regexp_extract(name, r"(\d{14})", 1)
    return (
        name.contains(linkedservice)
        & name.contains(datafactory)
        & (stamp != "")
        & stamp.cast("long").between(lo, hi)
    )


def archive_folder(folder: Column, ts: Column) -> Column:
    """``{folder}_{yyyyMMddHHmm}`` archive naming
    (SharedCode/HelperFunction.py:52-55)."""
    return F.concat_ws("_", folder, F.date_format(ts, "yyyyMMddHHmm"))
