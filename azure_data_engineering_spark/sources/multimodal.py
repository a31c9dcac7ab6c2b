"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star design (BASELINE.json): image/audio/video travel as
`binary` columns with a typed metadata struct; decode / feature-
extract / resize / frame-sample run as Arrow-batched Pandas UDFs via
mapInPandas so the bytes never round-trip through the driver and each
executor processes columnar batches.

The real media codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernel is a clearly-marked deterministic fake
(metadata derived from the payload bytes); the Spark-side plumbing —
schema, batch iteration, partitioning — is real and is what the tests
cover. Swap `_fake_decode` for a real codec in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "id bigint, media_type string, n_bytes int, width int, height int, checksum bigint"
)


def with_binary_payload(df: DataFrame, text_col: str, id_col: str, media_type: str = "image/fake") -> DataFrame:
    """Wrap a string column as an opaque binary payload + metadata —
    stand-in for reading real media blobs (in production this is
    `binaryFile` content or parquet binary columns)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """DETERMINISTIC FAKE decode — replace with a real codec (PIL etc.)
    in production. Derives (n_bytes, width, height, checksum) purely
    from the bytes so results are reproducible and oracle-checkable."""
    n = len(payload)
    checksum = sum(payload) % 1_000_000_007
    return n, n % 64 + 1, n % 48 + 1, checksum


def decode_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas decode: executors receive Arrow batches of
    (id, payload, media_type) and emit typed metadata rows. Batch-at-a-
    time, zero driver involvement; partitioning is preserved."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]),
                    "height": meta.map(lambda m: m[2]),
                    "checksum": meta.map(lambda m: m[3]),
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)
