"""WARC (Web ARChive, ISO 28500) source — the admission format of the
crawl-corpus chain (Common Crawl's native layout): warcinfo / request /
response records, each optionally its own gzip member so a 100 TB
archive splits at record boundaries without a central index.

Provenance: N (native operator — the reference pipeline ingests
already-extracted feeds; a crawl-scale training-data engine must read
the archive format those payloads arrive in). The record walk is
implemented from the public ISO 28500 / WARC 1.1 specification with
the stdlib only, behind the repo's established mapInPandas media-walk
discipline (sources/multimodal.py): bytes stay on executors, malformed
files quarantine as rows — never batch failures — and cost is
O(record headers + payload hash) per file.

Scale shape: embarrassingly parallel over files (one binary payload
per row via `binaryFile` or any upstream source); no shuffle is
introduced by the extraction itself — the plan is scan → mapInPandas.
At cluster scale, .warc.gz member-per-record files are the unit of
parallelism exactly as Common Crawl distributes them (~1 GB each,
one task per file)."""

from __future__ import annotations

import gzip
import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_RECORDS_SCHEMA = (
    "id bigint, rec_idx int, rec_type string, target_uri string, "
    "http_status int, mime string, body_len bigint, body_md5 string, "
    "file_format string, file_truncated int, malformed int"
)

_CRLF = b"\r\n"


# ----------------------------------------------------------- record walk


def _parse_one_record(buf: bytes, pos: int):
    """Parse one WARC record at `pos`. Returns (record dict, next_pos)
    or (None, -1) when the remaining bytes cannot form a complete
    record (interrupted download → the caller marks the file
    truncated)."""
    end = len(buf)
    # version line
    eol = buf.find(_CRLF, pos)
    if eol < 0 or not buf[pos:eol].startswith(b"WARC/"):
        return None, -1
    p = eol + 2
    headers: dict[str, str] = {}
    while True:
        eol = buf.find(_CRLF, p)
        if eol < 0:
            return None, -1
        line = buf[p:eol]
        p = eol + 2
        if line == b"":
            break
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    try:
        clen = int(headers.get("content-length", ""))
    except ValueError:
        return None, -1
    if clen < 0 or p + clen > end:
        return None, -1
    content = buf[p : p + clen]
    p += clen
    # two CRLFs terminate the record; tolerate their absence at EOF
    for _ in range(2):
        if buf[p : p + 2] == _CRLF:
            p += 2
    return {"headers": headers, "content": content}, p


def _split_http_response(content: bytes):
    """(status, mime, body) from an application/http msgtype=response
    content block. A status line that does not parse yields (0, '',
    whole content) — triage, not exception."""
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        return 0, "", content
    head, body = content[:sep], content[sep + 4 :]
    lines = head.split(_CRLF)
    status = 0
    first = lines[0].split(b" ", 2)
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = 0
    if status == 0:
        return 0, "", content
    mime = ""
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            mime = v.strip().split(b";", 1)[0].decode("latin-1")
            break
    return status, mime, body


def parse_warc(payload: bytes):
    """Walk a WARC stream — plain or gzip-member-per-record — into
    (records, truncated). Each record: dict with rec_type, target_uri,
    mime, http_status, body (bytes). A short tail (cut download, a
    gzip member that fails CRC/decompress) stops the walk with
    truncated=True; everything complete before it survives.

    Raises ValueError only when the payload is not WARC at all."""
    records = []
    truncated = False

    def _emit(rec):
        h = rec["headers"]
        rec_type = h.get("warc-type", "")
        uri = h.get("warc-target-uri", "")
        warc_mime = h.get("content-type", "").split(";", 1)[0].strip()
        content = rec["content"]
        if warc_mime == "application/http" and "msgtype=response" in h.get(
            "content-type", ""
        ):
            status, mime, body = _split_http_response(content)
        else:
            status, mime, body = 0, warc_mime, content
        records.append(
            {
                "rec_type": rec_type,
                "target_uri": uri,
                "http_status": status,
                "mime": mime,
                "body": body,
            }
        )

    if payload[:2] == b"\x1f\x8b":
        # one gzip member per record (the Common Crawl layout); walk
        # members via decompressobj so a corrupt/cut member stops the
        # walk instead of poisoning the whole file
        rest = payload
        while rest[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                chunk = d.decompress(rest)
                if not d.eof:  # member cut mid-stream
                    truncated = True
                    break
            except zlib.error:
                truncated = True
                break
            pos = 0
            while pos < len(chunk):
                rec, pos = _parse_one_record(chunk, pos)
                if rec is None:
                    truncated = True
                    break
                _emit(rec)
            if truncated:
                break
            rest = d.unused_data
        else:
            # loop exited because the remaining bytes are not a gzip
            # member: a non-empty tail is a corrupt/overwritten member,
            # not a clean EOF
            if rest:
                truncated = True
        if not records and not truncated:
            raise ValueError("gzip stream with no WARC records")
    elif payload[:5] == b"WARC/":
        pos = 0
        while pos < len(payload):
            rec, pos = _parse_one_record(payload, pos)
            if rec is None:
                truncated = True
                break
            _emit(rec)
    else:
        raise ValueError("not a WARC stream")
    return records, truncated


# ------------------------------------------------------------ Spark side


def warc_records(df: DataFrame) -> DataFrame:
    """Explode a frame of (id, payload) WARC files into one row per
    record: (id, rec_idx, rec_type, target_uri, http_status, mime,
    body_len, body_md5, file_format, file_truncated, malformed).

    The body itself never leaves the executor — rows carry its length
    and md5 (the dedup/join key downstream kernels use); feeding the
    body onward (HTML extraction, triage) composes by re-walking
    inside the same task via `parse_warc`. Non-WARC payloads
    quarantine as a single malformed=1 row (the media-walk contract).
    Plan: scan → mapInPandas, no shuffle introduced."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "rec_idx", "rec_type", "target_uri", "http_status",
            "mime", "body_len", "body_md5", "file_format",
            "file_truncated", "malformed",
        ]
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rid = row["id"]
                b = bytes(row["payload"])
                fmt = "warc.gz" if b[:2] == b"\x1f\x8b" else "warc"
                try:
                    recs, trunc = parse_warc(b)
                except ValueError:
                    rows.append(
                        (rid, -1, "corrupt", "", 0, "", 0, "", "corrupt", 0, 1)
                    )
                    continue
                for k, r in enumerate(recs):
                    rows.append(
                        (
                            rid, k, r["rec_type"], r["target_uri"],
                            r["http_status"], r["mime"], len(r["body"]),
                            hashlib.md5(r["body"]).hexdigest(), fmt,
                            int(trunc), 0,
                        )
                    )
                if not recs:
                    rows.append(
                        (rid, -1, "empty", "", 0, "", 0, "", fmt, int(trunc), 1)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, schema=WARC_RECORDS_SCHEMA)


def warc_response_texts(df: DataFrame, mime_prefix: str = "text/") -> DataFrame:
    """HTTP RESPONSE records of (id, payload) WARC files, with the
    response body decoded as text: (id, rec_idx, target_uri,
    http_status, mime, html). The body DOES ride the row here — this
    is the extraction feed (main_content, quality scoring, language
    ID all consume the page text), still one scan → mapInPandas with
    no shuffle; everything non-response (warcinfo, requests,
    non-matching mimes, malformed files) is dropped, because the
    quarantine/accounting surface is `warc_records`."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "rec_idx", "target_uri", "http_status", "mime", "html"]
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rid = row["id"]
                try:
                    recs, _trunc = parse_warc(bytes(row["payload"]))
                except ValueError:
                    continue
                for k, r in enumerate(recs):
                    if r["rec_type"] != "response":
                        continue
                    if not r["mime"].startswith(mime_prefix):
                        continue
                    rows.append(
                        (
                            rid, k, r["target_uri"], r["http_status"],
                            r["mime"],
                            r["body"].decode("utf-8", errors="replace"),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(
        kernel,
        schema=(
            "id bigint, rec_idx int, target_uri string, http_status int, "
            "mime string, html string"
        ),
    )


def read_warc(spark, path: str) -> DataFrame:
    """WARC files on disk → record rows, via the binaryFile source
    (whole-file payloads — correct for member-per-record .warc.gz,
    which only splits at record boundaries anyway). One task per file;
    the path string is the id surrogate."""
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path).select(
        F.xxhash64(F.col("path")).alias("id"),
        F.col("content").alias("payload"),
        F.col("path"),
    )
    out = warc_records(files.select("id", "payload"))
    return out.join(
        F.broadcast(files.select("id", "path")), "id", "left"
    )


# ------------------------------------------- record/fixture builders

_WARC_DATE = "2024-01-15T00:00:00Z"
WET_INFO = "software: ade-spark-crawler/1.0\r\nformat: WARC File Format 1.0\r\n"


def build_record(
    rec_type: str,
    file_id: int,
    idx: int,
    content: bytes,
    uri: str = "",
    http: str | None = None,
    content_type: str | None = None,
) -> bytes:
    """One serialized WARC record (version line, headers, content,
    terminating CRLFs). `http` sets the application/http msgtype
    content type; `content_type` overrides it (e.g. text/plain for
    WET conversion records); neither -> application/warc-fields."""
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + rec_type.encode(),
        f"WARC-Record-ID: <urn:uuid:{file_id:08d}-{idx:04d}>".encode(),
        b"WARC-Date: " + _WARC_DATE.encode(),
    ]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    if content_type is not None:
        h.append(b"Content-Type: " + content_type.encode())
    elif http:
        h.append(f"Content-Type: application/http; msgtype={http}".encode())
    else:
        h.append(b"Content-Type: application/warc-fields")
    h.append(b"Content-Length: " + str(len(content)).encode())
    return _CRLF.join(h) + _CRLF + _CRLF + content + _CRLF + _CRLF


def wet_write_bytes(
    df: DataFrame,
    file_col: str,
    uri_col: str,
    text_col: str,
) -> DataFrame:
    """Serialize extracted page texts into WET files — the
    conversion-record WARC layout Common Crawl publishes beside every
    archive (one `warcinfo` then one `conversion` record per page,
    Content-Type text/plain, each its own gzip member): the EXPORT
    half of the crawl chain, so a corpus refined here round-trips
    through the same `parse_warc` walk any consumer runs.

    One shuffle on `file_col` (the file is the atomic output unit),
    then applyInPandas serializes each group with records ordered by
    target URI — a DETERMINISTIC layout: same rows → byte-identical
    file regardless of partitioning. Returns (id, payload)."""

    def serialize(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf[file_col].iloc[0])
        out = [
            gzip.compress(
                build_record("warcinfo", fid, 0, WET_INFO.encode()),
                compresslevel=6,
                mtime=0,
            )
        ]
        rows = pdf.sort_values(uri_col)
        for k, (_, row) in enumerate(rows.iterrows(), start=1):
            rec = build_record(
                "conversion",
                fid,
                k,
                str(row[text_col]).encode("utf-8"),
                uri=str(row[uri_col]),
                content_type="text/plain",
            )
            out.append(gzip.compress(rec, compresslevel=6, mtime=0))
        return pd.DataFrame({"id": [fid], "payload": [b"".join(out)]})

    return df.groupBy(file_col).applyInPandas(
        serialize, schema="id bigint, payload binary"
    )


def warc_container(
    file_id: int,
    n_pages: int,
    gzip_members: bool = True,
    truncate: bool = False,
) -> bytes:
    """Deterministic WARC fixture: one warcinfo record + per page a
    (request, response) pair, every field a closed-form function of
    (file_id, page) so a SQL oracle can reconstruct each record's
    exact body text — an offset bug anywhere in the walk breaks the
    md5. `truncate` cuts the final 20 bytes (interrupted download):
    the last record must drop and the file must flag truncated."""

    def rec(rec_type: str, idx: int, content: bytes, uri: str = "",
            http: str | None = None) -> bytes:
        return build_record(rec_type, file_id, idx, content, uri, http)

    out_recs = []
    info = b"software: ade-spark-crawler/1.0\r\nformat: WARC File Format 1.0\r\n"
    out_recs.append(rec("warcinfo", 0, info))
    host = f"site{file_id % 50}.example.com"
    for j in range(n_pages):
        uri = f"https://{host}/page/{j}"
        req = (
            f"GET /page/{j} HTTP/1.1\r\nHost: {host}\r\n"
            "User-Agent: ade-bot/1.0\r\n\r\n"
        ).encode()
        out_recs.append(rec("request", 2 * j + 1, req, uri, "request"))
        status, reason = _status_for(file_id, j)
        body = _page_body(file_id, j).encode()
        resp = (
            f"HTTP/1.1 {status} {reason}\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        out_recs.append(rec("response", 2 * j + 2, resp, uri, "response"))
    if gzip_members:
        blob = b"".join(
            gzip.compress(r, compresslevel=6, mtime=0) for r in out_recs
        )
    else:
        blob = b"".join(out_recs)
    if truncate:
        return blob[: len(blob) - 20]
    return blob


def _status_for(file_id: int, j: int) -> tuple[int, str]:
    k = file_id + j
    if k % 9 == 0:
        return 301, "Moved Permanently"
    if k % 5 == 0:
        return 404, "Not Found"
    return 200, "OK"


def _page_body(file_id: int, j: int) -> str:
    words = ("w%d " % ((file_id + j) % 7)) * (5 + (file_id * j) % 11)
    return (
        f"<html><head><title>p{file_id}-{j}</title></head>"
        f"<body>{words}</body></html>"
    )
