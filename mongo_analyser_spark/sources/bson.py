"""Raw BSON (mongodump ``.bson``) ingestion with zero non-stdlib
dependencies (SURVEY §2.1 S12 — the dump-file twin of the live
`MongoSource`, closing the one reference entry point that previously had
no runnable path in this container).

Reference behavior being reproduced (not code): the reference reads its
collections live via pymongo cursors (mongo_analyser/core/db.py:20-187,
core/extractor.py:292-298) and the same BSON type vocabulary drives its
schema inference (core/extractor.py:91-246). `mongodump` writes exactly
those documents as a concatenation of length-prefixed BSON documents;
decoding that framing with stdlib ``struct`` gives the identical rows
without a MongoDB server or the Spark connector jar.

Spark shape (100-TB contract): `binaryFile` scan → one Arrow-batched
``mapInPandas`` stage that walks each file's documents and emits one
canonical Extended-JSON-v2 line per document → the SAME engine-side
try_parse_json / try_variant_get projection as `read_mongoexport_json`
(sources/mongodb.py), so the two dump formats are hash-identical by
construction for the same documents. Parallelism unit is the FILE:
BSON framing has no sync markers, so a single document stream is not
arbitrarily splittable — mongodump's standard layout (one ``.bson`` per
collection, large deployments dumping per-shard / per-chunk files) is
what distributes the scan. Corrupt bytes must not kill a bulk ingest:
an undecodable document yields an all-NULL row (and the raw hex in
``corrupt_col`` when requested), mirroring the PERMISSIVE-mode contract
of the JSON path.
"""

from __future__ import annotations

import base64
import json
import struct
import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# pure-Python BSON document decode (stdlib only)
# ---------------------------------------------------------------------------

_DEC128_BIAS = 6176
_DEC128_MAX_COEFF = 10**34 - 1


def _decode_decimal128(raw: bytes) -> str:
    """IEEE 754-2008 decimal128 (BID encoding, little-endian) → canonical
    decimal string, matching mongoexport's $numberDecimal rendering for
    finite values (scientific form when the exponent forces it)."""
    low, high = struct.unpack("<QQ", raw)
    sign = "-" if high >> 63 else ""
    if (high >> 58) & 0b11111 in (0b11110, 0b11111):
        if (high >> 58) & 0b11111 == 0b11111:
            return "NaN"
        return f"{sign}Infinity"
    if (high >> 61) & 0b11 == 0b11:  # high-combination form
        exp = ((high >> 47) & 0x3FFF) - _DEC128_BIAS
        coeff = (((high & 0x7FFF_FFFF_FFFF) | (1 << 49)) << 64) | low
    else:
        exp = ((high >> 49) & 0x3FFF) - _DEC128_BIAS
        coeff = ((high & 0x1_FFFF_FFFF_FFFF) << 64) | low
    if coeff > _DEC128_MAX_COEFF:  # non-canonical per spec → value is 0
        coeff = 0
    digits = str(coeff)
    # canonical rendering (same rules as the official drivers): plain
    # notation while the adjusted exponent stays in [-6, 0], else E-form
    adjusted = exp + len(digits) - 1
    if exp <= 0 and adjusted >= -6:
        if exp == 0:
            return f"{sign}{digits}"
        point = len(digits) + exp
        if point <= 0:
            return f"{sign}0.{'0' * -point}{digits}"
        return f"{sign}{digits[:point]}.{digits[point:]}"
    if len(digits) > 1:
        return f"{sign}{digits[0]}.{digits[1:]}E{'+' if adjusted >= 0 else ''}{adjusted}"
    return f"{sign}{digits}E{'+' if adjusted >= 0 else ''}{adjusted}"


def _fmt_double(x: float) -> str:
    """Shortest round-trip rendering, the canonical-extJSON style."""
    if x != x:
        return "NaN"
    if x in (float("inf"), float("-inf")):
        return "Infinity" if x > 0 else "-Infinity"
    return repr(x)


def _read_cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8", errors="replace"), end + 1


def _decode_element(t: int, buf: bytes, pos: int):
    """Decode one element's VALUE at ``pos``; returns (extjson_value,
    next_pos). Extended-JSON-v2 canonical wrappers — exactly the forms
    `_ext_json_expr` (sources/mongodb.py) probes."""
    if t == 0x01:  # double
        # finite doubles emit RELAXED (plain JSON number): mongoexport's
        # default, and the form the array<double> ddl cast in
        # _ext_json_expr understands; non-finite needs the wrapper
        # (bare NaN is not valid JSON)
        (x,) = struct.unpack_from("<d", buf, pos)
        if x != x or x in (float("inf"), float("-inf")):
            return {"$numberDouble": _fmt_double(x)}, pos + 8
        return x, pos + 8
    if t == 0x02:  # string
        (n,) = struct.unpack_from("<i", buf, pos)
        s = buf[pos + 4 : pos + 4 + n - 1].decode("utf-8", errors="replace")
        return s, pos + 4 + n
    if t in (0x03, 0x04):  # embedded document / array
        (n,) = struct.unpack_from("<i", buf, pos)
        doc = _decode_doc(buf[pos : pos + n])
        if t == 0x04:
            return [doc[k] for k in doc], pos + n
        return doc, pos + n
    if t == 0x05:  # binary
        (n,) = struct.unpack_from("<i", buf, pos)
        subtype = buf[pos + 4]
        data = buf[pos + 5 : pos + 5 + n]
        if subtype == 4:  # UUID
            return {"$uuid": str(uuid.UUID(bytes=bytes(data)))}, pos + 5 + n
        return {
            "$binary": {
                "base64": base64.b64encode(data).decode("ascii"),
                "subType": f"{subtype:02x}",
            }
        }, pos + 5 + n
    if t == 0x07:  # ObjectId
        return {"$oid": buf[pos : pos + 12].hex()}, pos + 12
    if t == 0x08:  # bool
        return buf[pos] != 0, pos + 1
    if t == 0x09:  # UTC datetime, int64 millis
        (ms,) = struct.unpack_from("<q", buf, pos)
        return {"$date": {"$numberLong": str(ms)}}, pos + 8
    if t in (0x0A, 0x06):  # null / deprecated undefined
        return None, pos
    if t == 0x0B:  # regex (cstring pattern, cstring options)
        pat, pos = _read_cstring(buf, pos)
        opts, pos = _read_cstring(buf, pos)
        return {"$regularExpression": {"pattern": pat, "options": opts}}, pos
    if t == 0x10:  # int32 — relaxed (see double note; exact in JSON text)
        (n,) = struct.unpack_from("<i", buf, pos)
        return n, pos + 4
    if t == 0x11:  # Mongo internal timestamp
        (inc, ts) = struct.unpack_from("<II", buf, pos)
        return {"$timestamp": {"t": ts, "i": inc}}, pos + 8
    if t == 0x12:  # int64 — relaxed; JSON text is exact at any magnitude
        (n,) = struct.unpack_from("<q", buf, pos)
        return n, pos + 8
    if t == 0x13:  # decimal128
        return {"$numberDecimal": _decode_decimal128(buf[pos : pos + 16])}, pos + 16
    if t == 0x0D:  # JavaScript code
        (n,) = struct.unpack_from("<i", buf, pos)
        s = buf[pos + 4 : pos + 4 + n - 1].decode("utf-8", errors="replace")
        return {"$code": s}, pos + 4 + n
    if t == 0x0F:  # code-with-scope (deprecated): int32 total, string, doc
        (total,) = struct.unpack_from("<i", buf, pos)
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        s = buf[pos + 8 : pos + 8 + n - 1].decode("utf-8", errors="replace")
        scope = _decode_doc(buf[pos + 8 + n : pos + total])
        return {"$code": s, "$scope": scope}, pos + total
    if t == 0x0C:  # deprecated DBPointer: string ns + 12-byte oid
        (n,) = struct.unpack_from("<i", buf, pos)
        ns = buf[pos + 4 : pos + 4 + n - 1].decode("utf-8", errors="replace")
        oid = buf[pos + 4 + n : pos + 16 + n].hex()
        return {"$dbPointer": {"$ref": ns, "$id": {"$oid": oid}}}, pos + 16 + n
    if t == 0xFF:  # MinKey
        return {"$minKey": 1}, pos
    if t == 0x7F:  # MaxKey
        return {"$maxKey": 1}, pos
    raise ValueError(f"unsupported BSON element type 0x{t:02x}")


def _decode_doc(buf: bytes) -> dict:
    """One BSON document (including its own int32 length frame) → dict of
    Extended-JSON values, preserving field order."""
    (total,) = struct.unpack_from("<i", buf, 0)
    if total != len(buf) or total < 5 or buf[total - 1] != 0:
        raise ValueError("bad BSON document frame")
    out: dict = {}
    pos = 4
    while True:
        t = buf[pos]
        if t == 0:
            break
        name, pos = _read_cstring(buf, pos + 1)
        out[name], pos = _decode_element(t, buf, pos)
    return out


def iter_bson_docs(data: bytes) -> Iterator[tuple[dict | None, bytes]]:
    """Walk a mongodump stream (concatenated framed documents), yielding
    ``(doc, raw)`` per document — ``doc`` is None when that document
    fails to decode (raw still carries its bytes). Framing has no resync
    marker, so a corrupt LENGTH abandons the remainder of the stream as
    one final corrupt record (an intact length with corrupt innards only
    loses that one document)."""
    pos, n = 0, len(data)
    while pos + 4 <= n:
        (size,) = struct.unpack_from("<i", data, pos)
        if size < 5 or pos + size > n:
            yield None, data[pos:]
            return
        raw = data[pos : pos + size]
        try:
            yield _decode_doc(raw), raw
        except Exception:
            yield None, raw
        pos += size
    if pos != n:
        yield None, data[pos:]


#: sentinel prefix for undecodable documents — deliberately NOT valid
#: JSON, so the shared variant projection marks the row corrupt exactly
#: like a malformed mongoexport line
_CORRUPT_PREFIX = "\x00bson-corrupt:"


def bson_to_extjson_lines(data: bytes) -> Iterator[str]:
    for doc, raw in iter_bson_docs(data):
        if doc is None:
            yield _CORRUPT_PREFIX + raw[:64].hex()
        else:
            yield json.dumps(doc, ensure_ascii=False, separators=(",", ":"))


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def bson_dump_lines(spark: SparkSession, path: str) -> DataFrame:
    """``.bson`` dump file(s) → one Extended-JSON line per document
    (column ``value`` — the same shape `spark.read.text` gives the
    mongoexport path). binaryFile scan, then ONE Arrow-batched
    mapInPandas stage; the per-document walk is necessarily Python (the
    whole point is no connector jar), but it streams one file per task
    and never touches the driver."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            for content in pdf["content"]:
                yield pd.DataFrame(
                    {"value": list(bson_to_extjson_lines(bytes(content)))}
                )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(gen, "value string")


def read_bson_dump(
    spark: SparkSession,
    path: str,
    fields: dict[str, str],
    corrupt_col: str | None = None,
) -> DataFrame:
    """mongodump ``.bson`` → typed DataFrame: decode to Extended-JSON
    lines, then the SAME projection as `read_mongoexport_json` — one
    try_parse_json + per-field try_variant_get, engine-side. ``fields``
    maps column name → reference type label (§1.2 vocabulary), identical
    contract to the JSON reader, so a mongoexport of the same collection
    hash-matches this read (pytest-pinned in tests/test_bson.py)."""
    from mongo_analyser_spark.sources.mongodb import project_ext_json_lines

    return project_ext_json_lines(bson_dump_lines(spark, path), fields, corrupt_col)
