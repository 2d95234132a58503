"""Raw BSON (mongodump) reader: pure-Python framing decode + the
hash-match contract vs the mongoexport ndjson path (round-5 verdict
Next-round #3). The encoder here is test-side only — the package ships
the decoder."""

import json
import struct
import uuid

import pytest

from mongo_analyser_spark.sources.bson import (
    _CORRUPT_PREFIX,
    _decode_decimal128,
    bson_to_extjson_lines,
    iter_bson_docs,
    read_bson_dump,
)

# ---------------------------------------------------------------------------
# minimal test-side BSON encoder (stdlib only)
# ---------------------------------------------------------------------------


def _el(t: int, name: str, payload: bytes) -> bytes:
    return bytes([t]) + name.encode() + b"\x00" + payload


def _bstr(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack("<i", len(raw) + 1) + raw + b"\x00"


def enc_doc(elements: list[bytes]) -> bytes:
    body = b"".join(elements)
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def enc_value(name: str, v) -> bytes:
    if isinstance(v, bool):
        return _el(0x08, name, b"\x01" if v else b"\x00")
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return _el(0x10, name, struct.pack("<i", v))
        return _el(0x12, name, struct.pack("<q", v))
    if isinstance(v, float):
        return _el(0x01, name, struct.pack("<d", v))
    if isinstance(v, str):
        return _el(0x02, name, _bstr(v))
    if v is None:
        return _el(0x0A, name, b"")
    if isinstance(v, dict):
        return _el(0x03, name, enc_doc([enc_value(k, x) for k, x in v.items()]))
    if isinstance(v, list):
        return _el(
            0x04, name, enc_doc([enc_value(str(i), x) for i, x in enumerate(v)])
        )
    raise TypeError(type(v))


def enc_oid(name: str, hex24: str) -> bytes:
    return _el(0x07, name, bytes.fromhex(hex24))


def enc_datetime_ms(name: str, ms: int) -> bytes:
    return _el(0x09, name, struct.pack("<q", ms))


def enc_binary(name: str, data: bytes, subtype: int = 0) -> bytes:
    return _el(0x05, name, struct.pack("<i", len(data)) + bytes([subtype]) + data)


def enc_decimal128(name: str, coeff: int, exp: int, neg: bool = False) -> bytes:
    high = (int(neg) << 63) | ((exp + 6176) << 49) | (coeff >> 64)
    low = coeff & 0xFFFFFFFFFFFFFFFF
    return _el(0x13, name, struct.pack("<QQ", low, high))


# ---------------------------------------------------------------------------


def test_decimal128_rendering():
    cases = [
        ((12345, -2, False), "123.45"),
        ((1, 3, False), "1E+3"),
        ((1, -3, False), "0.001"),
        ((0, 0, True), "-0"),
        ((10**34 - 1, 0, False), str(10**34 - 1)),
    ]
    for (coeff, exp, neg), want in cases:
        raw = enc_decimal128("d", coeff, exp, neg)[3:]
        assert _decode_decimal128(raw) == want, (coeff, exp, neg)
    assert _decode_decimal128(struct.pack("<QQ", 0, 0x7C00000000000000)) == "NaN"
    assert (
        _decode_decimal128(struct.pack("<QQ", 0, 0x7800000000000000)) == "Infinity"
    )
    assert (
        _decode_decimal128(struct.pack("<QQ", 0, 0xF800000000000000)) == "-Infinity"
    )


def _sample_docs() -> list[bytes]:
    u = uuid.UUID("12345678-1234-5678-1234-567812345678")
    return [
        enc_doc(
            [
                enc_oid("_id", f"{i:024x}"),
                enc_value("name", f"doc-{i}"),
                enc_value("n", i),
                enc_value("big", 2**40 + i),
                enc_value("x", i * 1.5),
                enc_value("ok", i % 2 == 0),
                enc_datetime_ms("ts", 1700000000000 + i * 1000),
                enc_decimal128("price", 199 + i, -2),
                enc_binary("blob", bytes([i, i + 1, i + 2])),
                enc_binary("uid", u.bytes, subtype=4),
                enc_value("tags", [i, i + 1]),
                enc_value("meta", {"k": f"v{i}", "depth": 2}),
            ]
        )
        for i in range(5)
    ]


def test_iter_and_extjson_lines_roundtrip():
    data = b"".join(_sample_docs())
    docs = [d for d, _ in iter_bson_docs(data)]
    assert len(docs) == 5 and all(d is not None for d in docs)
    d0 = docs[0]
    assert d0["_id"] == {"$oid": "0" * 24}
    assert d0["name"] == "doc-0" and d0["n"] == 0 and d0["big"] == 2**40
    assert d0["x"] == 0.0 and d0["ok"] is True
    assert d0["ts"] == {"$date": {"$numberLong": "1700000000000"}}
    assert d0["price"] == {"$numberDecimal": "1.99"}
    assert d0["blob"]["$binary"]["subType"] == "00"
    assert d0["uid"] == {"$uuid": "12345678-1234-5678-1234-567812345678"}
    assert d0["tags"] == [0, 1] and d0["meta"] == {"k": "v0", "depth": 2}
    lines = list(bson_to_extjson_lines(data))
    assert [json.loads(line) for line in lines] == docs


def test_corrupt_framing_is_contained():
    good = _sample_docs()
    # corrupt INNARDS of doc 1 (length intact, bogus element type) — only
    # that document is lost; a corrupt LENGTH abandons the remainder
    bad_innards = bytearray(good[1])
    bad_innards[4] = 0xEE
    stream = good[0] + bytes(bad_innards) + good[2]
    out = list(iter_bson_docs(stream))
    assert [d is not None for d, _ in out] == [True, False, True]
    truncated = good[0] + good[1][:10]
    out2 = list(iter_bson_docs(truncated))
    assert [d is not None for d, _ in out2] == [True, False]
    lines = list(bson_to_extjson_lines(stream))
    assert lines[1].startswith(_CORRUPT_PREFIX)


FIELDS = {
    "_id": "ObjectId",
    "name": "str",
    "n": "int32",
    "big": "int64",
    "x": "double",
    "ok": "bool",
    "ts": "datetime",
    "price": "decimal128",
    "blob": "binary<generic>",
    "uid": "UUID",
    "tags": "array<int32>",
    "meta": "dict",
}


def test_bson_dump_hash_matches_mongoexport_json(spark, tmp_path):
    """The S12 contract: the same collection dumped as raw BSON and as
    Extended-JSON ndjson must produce identical typed DataFrames."""
    from mongo_analyser_spark.sources.mongodb import read_mongoexport_json

    data = b"".join(_sample_docs())
    bson_path = tmp_path / "coll.bson"
    bson_path.write_bytes(data)
    json_path = tmp_path / "coll.json"
    json_path.write_text("\n".join(bson_to_extjson_lines(data)) + "\n")

    df_bson = read_bson_dump(spark, str(bson_path), FIELDS)
    df_json = read_mongoexport_json(spark, str(json_path), FIELDS)
    rows_b = sorted(map(tuple, df_bson.collect()))
    rows_j = sorted(map(tuple, df_json.collect()))
    assert df_bson.schema == df_json.schema
    assert rows_b == rows_j
    r0 = dict(zip(FIELDS, rows_b[0]))
    assert r0["_id"] == "0" * 24 and r0["big"] == 2**40
    assert str(r0["price"]) == "1.9900000000"
    assert r0["uid"] == "12345678-1234-5678-1234-567812345678"
    assert r0["tags"] == [0, 1]
    assert json.loads(r0["meta"]) == {"k": "v0", "depth": 2}


def test_bson_dump_corrupt_col(spark, tmp_path):
    good = _sample_docs()
    bad = bytearray(good[1])
    bad[4] = 0xEE
    p = tmp_path / "c.bson"
    p.write_bytes(good[0] + bytes(bad) + good[2])
    df = read_bson_dump(spark, str(p), {"name": "str"}, corrupt_col="_raw")
    rows = df.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r._raw is not None]
    assert len(corrupt) == 1 and corrupt[0].name is None
    assert corrupt[0]._raw.startswith(_CORRUPT_PREFIX)


def test_unsupported_element_type_raises():
    doc = enc_doc([_el(0xEE, "weird", b"")])
    with pytest.raises(ValueError, match="bad BSON|unsupported"):
        from mongo_analyser_spark.sources.bson import _decode_doc

        _decode_doc(doc)


def test_legacy_element_types_decode():
    """Old dumps carry deprecated element types — the decoder must not
    treat them as corruption."""
    from mongo_analyser_spark.sources.bson import _decode_doc

    code = "function() { return 1; }"
    scope = enc_doc([enc_value("x", 1)])
    code_b = _bstr(code)
    code_ws = struct.pack("<i", 4 + len(code_b) + len(scope)) + code_b + scope
    ns = _bstr("db.coll")
    doc = enc_doc(
        [
            _el(0x06, "undef", b""),
            _el(0x0D, "js", _bstr(code)),
            _el(0x0F, "jss", code_ws),
            _el(0x0C, "ptr", ns + bytes.fromhex("aa" * 12)),
            _el(0xFF, "lo", b""),
            _el(0x7F, "hi", b""),
            _el(0x0B, "rx", b"^a.*\x00i\x00"),
            _el(0x11, "mts", struct.pack("<II", 5, 1700000000)),
        ]
    )
    out = _decode_doc(doc)
    assert out["undef"] is None
    assert out["js"] == {"$code": code}
    assert out["jss"] == {"$code": code, "$scope": {"x": 1}}
    assert out["ptr"]["$dbPointer"]["$ref"] == "db.coll"
    assert out["ptr"]["$dbPointer"]["$id"] == {"$oid": "aa" * 12}
    assert out["lo"] == {"$minKey": 1} and out["hi"] == {"$maxKey": 1}
    assert out["rx"] == {"$regularExpression": {"pattern": "^a.*", "options": "i"}}
    assert out["mts"] == {"$timestamp": {"t": 1700000000, "i": 5}}
