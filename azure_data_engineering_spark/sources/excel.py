"""Excel ingest with multi-sheet fan-out.

Reference behavior (SharedCode/HelperFunction.py:9-43 xls2csv):
workbook → selected sheets ("all" or comma-list, :22-25) → one output
per sheet named `{sanitized_basename}_{sheet}` (:30-31), cells
stringified row-by-row with the destructive sanitize chain (:36-41).

Spark-first design:
- few/small files: driver-side openpyxl → createDataFrame per sheet;
- many/large files (the 100 TB shape): `spark.read.format("binaryFile")`
  over the folder, then mapInPandas fans each workbook's sheets out on
  executors — the driver never holds file bytes.

openpyxl/xlrd are NOT installed in this environment, so both paths are
gated: the plumbing (naming, sheet selection, sanitize application) is
real and tested via a deterministic fake workbook loader; the byte-
level xlsx parse raises unless an engine is available.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_data_engineering_spark.functions.sanitize import sanitize_cell

try:  # gated optional dependency
    import openpyxl  # type: ignore  # noqa: F401

    _HAVE_XLSX = True
except ImportError:
    _HAVE_XLSX = False

# (sheet_name -> list of rows, each row a list of cells) — the minimal
# workbook shape the reference iterates (HelperFunction.py:27,34-35).
WorkbookLoader = Callable[[str], dict[str, list[list[str]]]]


def sanitize_basename(path: str) -> str:
    """`re.sub('[^A-Za-z0-9]+','')` on the file basename
    (HelperFunction.py:18-19)."""
    base = os.path.splitext(os.path.basename(path))[0]
    return re.sub(r"[^A-Za-z0-9]+", "", base)


def select_sheets(all_sheets: Iterable[str], sheet_list: str = "all") -> list[str]:
    """Sheet selection: 'all' or comma-separated names
    (HelperFunction.py:22-25)."""
    names = list(all_sheets)
    if sheet_list == "all":
        return names
    wanted = [s.strip() for s in sheet_list.split(",")]
    return [s for s in names if s in wanted]


def _default_loader(path: str) -> dict[str, list[list[str]]]:
    if not _HAVE_XLSX:
        raise NotImplementedError(
            "xlsx parsing requires openpyxl, which is not installed in this "
            "environment; pass a workbook_loader (tests use a deterministic fake)"
        )
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    return {
        ws.title: [["" if c is None else str(c) for c in row] for row in ws.iter_rows(values_only=True)]
        for ws in wb.worksheets
    }


def ingest_excel_distributed(
    spark: SparkSession,
    dir_path: str,
    glob: str = "*.xls*",
    sheet_list: str = "all",
    sanitize: bool = False,
    bytes_loader=None,
) -> DataFrame:
    """Many-files ingest (the 100 TB shape): `binaryFile` scan over the
    folder → mapInPandas fans each workbook's sheets out ON EXECUTORS —
    the driver never holds file bytes (vs the reference's one-at-a-time
    driver loop, adffunction/__init__.py:91-104).

    Returns one long DataFrame: (source_name, sheet, row_idx, cells
    array<string>) — cells stay schema-less all-string like the
    reference's CSV stage. bytes_loader(name, payload) -> {sheet:
    rows}; defaults to openpyxl (gated), tests inject a fake.
    """
    import io
    import re as _re

    from collections.abc import Iterator

    import pandas as pd

    if bytes_loader is None:
        if not _HAVE_XLSX:
            raise NotImplementedError(
                "xlsx parsing requires openpyxl; pass bytes_loader (tests use a fake)"
            )

        def bytes_loader(name: str, payload: bytes):  # pragma: no cover - needs openpyxl
            wb = openpyxl.load_workbook(io.BytesIO(payload), read_only=True, data_only=True)
            return {
                ws.title: [["" if c is None else str(c) for c in row] for row in ws.iter_rows(values_only=True)]
                for ws in wb.worksheets
            }

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(dir_path)
        .select("path", "content")
    )

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                base = _re.sub(r"[^A-Za-z0-9]+", "", os.path.splitext(os.path.basename(row["path"]))[0])
                book = bytes_loader(row["path"], row["content"])
                for sheet in select_sheets(book.keys(), sheet_list):
                    for i, cells in enumerate(book[sheet]):
                        out.append((f"{base}_{sheet}", sheet, i, [str(c) for c in cells]))
            yield pd.DataFrame(out, columns=["source_name", "sheet", "row_idx", "cells"])

    df = files.mapInPandas(
        fan_out, schema="source_name string, sheet string, row_idx int, cells array<string>"
    )
    if sanitize:
        df = df.withColumn(
            "cells", F.transform(F.col("cells"), lambda c: sanitize_cell(c))
        )
    return df


def ingest_excel(
    spark: SparkSession,
    path: str,
    sheet_list: str = "all",
    sanitize: bool = False,
    workbook_loader: WorkbookLoader | None = None,
) -> dict[str, DataFrame]:
    """Ingest one workbook → {output_name: DataFrame of all-string cols}.

    Output naming matches the reference: `{sanitized_basename}_{sheet}`
    (HelperFunction.py:30-31). No header handling, no type inference —
    the header row is data, like the reference (:34-42). sanitize=True
    opts into the destructive cell chain (:36-41) — opt-in, not silent
    (SURVEY.md §2A quirks).
    """
    loader = workbook_loader or _default_loader
    book = loader(path)
    base = sanitize_basename(path)
    out: dict[str, DataFrame] = {}
    for sheet in select_sheets(book.keys(), sheet_list):
        rows = book[sheet]
        width = max((len(r) for r in rows), default=0)
        cols = [f"c{i}" for i in range(width)]
        padded = [[("" if i >= len(r) or r[i] is None else str(r[i])) for i in range(width)] for r in rows]
        df = spark.createDataFrame(padded, schema=cols) if rows else spark.createDataFrame([], schema=", ".join(f"{c} string" for c in cols) or "c0 string")
        if sanitize:
            df = df.select(*[sanitize_cell(df[c]).alias(c) for c in df.columns])
        out[f"{base}_{sheet}"] = df
    return out
