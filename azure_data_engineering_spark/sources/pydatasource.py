"""Custom connector extensibility: the Spark 4 Python DataSource API.

The reference hard-wires three connectors (blob/Excel, pipe-CSV,
Postgres — adffunction/__init__.py:237-288). The engine's answer to
"what about the next source?" is Spark's Python DataSource API: a
class declaring a schema, a partition plan, and a per-partition
reader generator. Partitions are the unit of executor parallelism —
each `read(partition)` runs as its own task, so a well-partitioned
custom source scales out exactly like a file scan, with no driver
bottleneck.

Shipped source: ``SequenceSource`` ("sequence" format) — a
deterministic distributed integer-sequence generator (options: n,
parts, mod). Every bench/backfill pipeline needs a synthetic spine;
this one is reproducible cell-for-cell on any engine (DuckDB:
generate_series), which is what lets the driver gate hash-match a
custom connector end-to-end.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _SequenceReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.mod = int(options.get("mod", 97))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            InputPartition((i * step, min((i + 1) * step, self.n)))
            for i in range(self.parts)
            if i * step < self.n
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, (i * i) % self.mod)


class SequenceSource(DataSource):
    """``spark.read.format("sequence").option("n", ...).load()`` →
    rows (i, sq = i² mod m), range-partitioned across executors."""

    @classmethod
    def name(cls):
        return "sequence"

    def schema(self):
        return "i bigint, sq bigint"

    def reader(self, schema):
        return _SequenceReader(self.options)


class _SeqStreamReader(DataSourceStreamReader):
    """Streaming half of the connector API: offset-tracked,
    partition-parallel micro-batch reads.

    Offsets are dicts checkpointed by the engine; `partitions(start,
    end)` splits each micro-batch's offset range into executor tasks,
    so a custom stream scales out like the file source. The source is
    bounded (option `n`), which gives streaming EXACTLY-ONCE a clean
    proof shape: a first availableNow run drains rows [0, n); a
    restart from the same checkpoint sees its committed offset equal
    to the latest offset and emits ZERO new rows (tests/test_sources).
    """

    def __init__(self, options):
        self.total = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.mod = int(options.get("mod", 97))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        return {"i": self.total}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["i"]), int(end["i"])
        if hi <= lo:
            return [InputPartition((lo, lo))]
        step = (hi - lo + self.parts - 1) // self.parts
        return [
            InputPartition((lo + k * step, min(lo + (k + 1) * step, hi)))
            for k in range(self.parts)
            if lo + k * step < hi
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, (i * i) % self.mod)

    def commit(self, end: dict) -> None:
        pass


class SequenceStreamSource(DataSource):
    """``spark.readStream.format("sequence_stream")`` — the streaming
    twin of SequenceSource, same schema and cell values."""

    @classmethod
    def name(cls):
        return "sequence_stream"

    def schema(self):
        return "i bigint, sq bigint"

    def streamReader(self, schema):
        return _SeqStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the shipped custom sources."""
    spark.dataSource.register(SequenceSource)
    spark.dataSource.register(SequenceStreamSource)
