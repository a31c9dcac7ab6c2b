"""JSON-lines (ndjson) source and sink.

The interchange format of most web-scale text pipelines (Common Crawl
derivatives, instruction datasets) is one JSON object per line. Spark's
native json reader/writer is splittable per line, so a 100 TB jsonl
corpus parallelizes exactly like text — each executor parses its own
byte range, schema projection prunes unread fields at parse time.

Reference parity: the reference ingests CSV/Excel then emits tabular
loads (SharedCode/HelperFunction.py:9-43); jsonl is the same
ingest-normalize step for the document corpora this engine adds.

Design notes:
- Always pass an explicit schema on read in production: schema
  inference is a full extra pass over the data. `read_jsonl` requires
  one unless `infer=True` is opted into.
- `badRecordsMode='PERMISSIVE'` + `_corrupt_record` keeps malformed
  lines visible instead of failing a week-long job; `strict=True`
  switches to FAILFAST for gated loads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, one file per partition (splittable,
    append-friendly). Timestamps serialize as ISO-8601 strings."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    strict: bool = False,
    infer: bool = False,
) -> DataFrame:
    """Read ndjson with an explicit schema (production path) or opt-in
    inference. PERMISSIVE by default: malformed lines land in
    `_corrupt_record` (added to the schema here) rather than aborting."""
    if schema is None and not infer:
        raise ValueError("read_jsonl requires a schema; pass infer=True to opt into the extra inference pass")
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        if not strict:
            # PERMISSIVE silently drops corrupt-record capture unless the
            # column is present in the schema — add it explicitly.
            schema = StructType(list(schema.fields) + [StructField("_corrupt_record", StringType(), True)])
        reader = reader.schema(schema)
    reader = reader.option("mode", "FAILFAST" if strict else "PERMISSIVE")
    reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.json(path)
