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


# ------------------------------------------------------------- writer

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


def _pipe_cell(v) -> str:
    """Format one cell the way Spark's own CSV writer does for sep='|'
    (so ``read_pipe_csv`` — a plain Spark CSV scan — parses it back
    losslessly): values containing the delimiter, a quote, or a line
    break are wrapped in double quotes with ``\\`` and ``"`` escaped
    (univocity quote + quoteEscape defaults). Verified against Spark's
    writer output byte-for-byte in tests/test_python_datasink.py."""
    if v is None:
        return ""
    s = str(v)
    if any(c in s for c in '|"\n\r'):
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


class _PipeTextWriter(DataSourceWriter):
    """Per-partition task writer: each executor task streams its rows
    into one pipe-delimited text part under a staging name; commit()
    runs ON THE DRIVER after every task reports success and atomically
    renames the parts in — the standard two-phase file-sink protocol
    (task outputs are invisible until the job-level commit), so a
    failed/speculated task can never leak a half-written part.
    abort() removes the staging files.

    Final part names carry a per-job token (``part-<token>-00000.psv``)
    so an append job can never clobber a previous job's committed
    parts; ``mode='overwrite'`` removes every previously committed
    ``part-*.psv`` at commit time, after all of this job's tasks have
    succeeded (readers of the old data are never left with a half
    overwrite)."""

    def __init__(self, options, schema, overwrite):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("pipetext writer requires a path")
        self.cols = [f.name for f in schema.fields]
        self.overwrite = bool(overwrite)
        # Job-level token, minted once on the driver and pickled to all
        # tasks — uniquifies this job's committed part names.
        self.token = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"_staging-part-{uuid.uuid4().hex}.psv"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write("|".join(_pipe_cell(v) for v in row) + "\n")
                n += 1
        return _PartFile(path=full, rows=n)

    def commit(self, messages):
        import glob
        import json
        import os

        stale = glob.glob(os.path.join(self.path, "part-*.psv"))
        if self.overwrite:
            for p in stale:
                os.remove(p)
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{self.token}-{i:05d}.psv")
            os.replace(m.path, final)
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"rows": total, "parts": len(messages)}, f)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class PipeTextSink(DataSource):
    """``df.write.format("pipetext").option("path", dir).save()`` —
    a custom Python WRITE connector (the write half of the
    extensibility story; SequenceSource/SequenceStreamSource are the
    read half). Rows stream through per-task Python writers into
    pipe-delimited text with two-phase commit; the header-free
    pipe-separated layout matches the reference's CSV contract
    (SharedCode/csv conventions), so the engine's own
    read_pipe_csv round-trips it."""

    @classmethod
    def name(cls):
        return "pipetext"

    def writer(self, schema, overwrite):
        return _PipeTextWriter(self.options, schema, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(PipeTextSink)
