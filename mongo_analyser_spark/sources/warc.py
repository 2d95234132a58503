"""WARC (web-crawl archive) ingestion with zero non-stdlib dependencies
[EXT — the web-corpus entry point of the training-data pipeline tier].

The reference ingests documents from MongoDB dumps
(mongo_analyser/core/db.py, core/extractor.py); a 100-TB LLM corpus
usually STARTS as web crawl in WARC files (ISO 28500 / WARC 1.1, the
Common-Crawl container — a fully public format). This module gives the
engine that entry point:

* ``parse_warc`` — record walk over a plain ``.warc`` byte stream OR a
  ``.warc.gz`` member-gzip concatenation (each record its own gzip
  member, the Common-Crawl layout; detected by magic, decompressed
  member-by-member via ``zlib`` with bounded output);
* ``split_http_payload`` — status / headers / body of the HTTP response
  stored inside ``response`` records (``application/http``);
* ``read_warc`` — the Spark source: ``binaryFile`` scan → ONE
  Arrow-batched ``mapInPandas`` stage emitting one row per record.

Spark shape (100-TB contract): the parallelism unit is the FILE —
member-gzip streams are not arbitrarily splittable without an external
index, and crawls ship as many ~1 GiB files (Common Crawl: ~72k files
per monthly snapshot), which is exactly the layout that distributes a
binaryFile scan. The record walk is necessarily Python (byte framing),
so it runs Arrow-batched with fixed-width output and no shuffle of
record bodies. A corrupt FILE quarantines as a single all-NULL row
(the read_bson_dump PERMISSIVE-mode convention) instead of killing the
bulk ingest.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: per-record payload cap — matches the other untrusted-input bounds
_MAX_PAYLOAD = 1 << 28

#: WARC named fields surfaced as columns (lower-cased header names)
_FIELDS = (
    "warc-type",
    "warc-record-id",
    "warc-target-uri",
    "warc-date",
    "content-type",
)


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time
    (``unused_data`` marks each boundary), bounding every member."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(data[pos:], _MAX_PAYLOAD)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC: {exc}") from None
        if not d.eof:
            raise ValueError("oversized or truncated gzip member in WARC")
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress in WARC")
        pos += consumed


def _parse_records(stream: bytes) -> Iterator[dict]:
    """Record walk over one UNCOMPRESSED WARC byte stream."""
    pos = 0
    n = len(stream)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and stream[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = stream.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("WARC record without header terminator")
        head = stream[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError("WARC record missing version line")
        version = lines[0][5:].strip()
        if version not in ("1.0", "1.1"):
            raise ValueError(f"unsupported WARC version {version}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if not line:
                continue
            k, sep, v = line.partition(":")
            if not sep:
                raise ValueError("malformed WARC header line")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length")
        if not 0 <= length <= _MAX_PAYLOAD:
            raise ValueError("WARC Content-Length out of bounds")
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("WARC record truncated")
        rec = {f: headers.get(f) for f in _FIELDS}
        rec["content"] = stream[body_start:body_start + length]
        yield rec
        pos = body_start + length
        if stream[pos:pos + 4] != b"\r\n\r\n":
            raise ValueError("WARC record missing block terminator")
        pos += 4


def parse_warc(data: bytes) -> Iterator[dict]:
    """Iterate records of a WARC payload, plain or member-gzip (header
    fields lower-cased per ``_FIELDS`` plus ``content`` bytes)."""
    if data[:2] == b"\x1f\x8b":
        for member in _gzip_members(data):
            yield from _parse_records(member)
    else:
        yield from _parse_records(data)


def split_http_payload(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) of the ``application/http`` payload a
    ``response`` record carries. Transfer encodings are not decoded —
    crawlers store the wire bytes; Common Crawl strips chunking."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        raise ValueError("HTTP payload without header terminator")
    lines = payload[:head_end].decode("iso-8859-1").split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError("malformed HTTP status line")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError("malformed HTTP status code")
    headers = {}
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if sep:
            headers[k.strip().lower()] = v.strip()
    return status, headers, payload[head_end + 4:]


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def build_warc_record(
    warc_type: str,
    payload: bytes,
    record_id: str,
    date: str = "2026-01-01T00:00:00Z",
    target_uri: str | None = None,
    content_type: str | None = None,
) -> bytes:
    """One WARC/1.1 record with the mandatory named fields."""
    lines = [
        "WARC/1.1",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:uuid:{record_id}>",
        f"WARC-Date: {date}",
    ]
    if target_uri:
        lines.append(f"WARC-Target-URI: {target_uri}")
    if content_type:
        lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


def build_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate records into a ``.warc`` stream, optionally gzipping
    each record into its own member (the ``.warc.gz`` layout). mtime is
    pinned so fixture bytes are deterministic."""
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        out += buf.getvalue()
    return bytes(out)


def http_response_payload(
    body: bytes, content_type: str = "text/html; charset=utf-8"
) -> bytes:
    """A minimal stored HTTP/1.1 200 response around ``body``."""
    head = (
        "HTTP/1.1 200 OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------

_SCHEMA = (
    "path string, record_idx int, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, content binary"
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame of WARC records under ``path`` (one row per record;
    see module doc for the distribution contract). A file whose framing
    is corrupt yields ONE row with NULL record fields and its path —
    the quarantine convention of ``read_bson_dump``."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    for i, rec in enumerate(parse_warc(bytes(blob))):
                        rows.append(
                            (
                                fpath,
                                i,
                                rec["warc-type"],
                                rec["warc-record-id"],
                                rec["warc-target-uri"],
                                rec["warc-date"],
                                rec["content-type"],
                                len(rec["content"]),
                                rec["content"],
                            )
                        )
                except ValueError:
                    rows.append(
                        (fpath, None, None, None, None, None, None,
                         None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_idx", "warc_type", "record_id",
                    "target_uri", "warc_date", "content_type",
                    "content_length", "content",
                ],
            )

    return files.mapInPandas(gen, _SCHEMA)
