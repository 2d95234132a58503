"""Extended-JSON (v2) dump reader: the offline Mongo ingestion path
(sources/mongodb.read_mongoexport_json). Truth table mirrors the
reference's type-directed conversion rules (core/extractor.py:91-246)
applied to mongoexport wrapper forms."""

from __future__ import annotations

import datetime as dt

import pytest

from mongo_analyser_spark.sources.mongodb import read_mongoexport_json

DOCS = [
    # canonical Extended JSON v2 (mongoexport default)
    '{"_id":{"$oid":"507f1f77bcf86cd799439011"},"n":{"$numberLong":"9007199254740993"},'
    '"i":{"$numberInt":"41"},"x":{"$numberDouble":"1.5"},'
    '"d":{"$date":"2023-01-01T12:00:00Z"},"dec":{"$numberDecimal":"12.34"},'
    '"u":{"$binary":{"base64":"ASNFZ4mrze8BI0VniavN7w==","subType":"04"}},'
    '"raw":{"$binary":{"base64":"AQI=","subType":"00"}},'
    '"s":"hello","ok":true,"tags":["a","b"],"meta":{"k":1}}',
    # relaxed / plain-JSON forms of the same fields
    '{"_id":"plain-id-2","n":7,"i":8,"x":2.5,"d":{"$date":{"$numberLong":"1672574400000"}},'
    '"dec":"5.5","s":"world","ok":false,"tags":[],"meta":{}}',
]

FIELDS = {
    "_id": "ObjectId",
    "n": "int64",
    "i": "int32",
    "x": "double",
    "d": "datetime",
    "dec": "decimal128",
    "u": "binary<UUID>",
    "raw": "binary<generic>",
    "s": "str",
    "ok": "bool",
    "tags": "array",
    "meta": "dict",
}


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    p = tmp_path_factory.mktemp("dump") / "coll.json"
    p.write_text("\n".join(DOCS) + "\n")
    return str(p)


def test_mongoexport_canonical_row(spark, dump):
    df = read_mongoexport_json(spark, dump, FIELDS)
    r = {row._id: row for row in df.collect()}["507f1f77bcf86cd799439011"]
    assert r.n == 9007199254740993  # > 2^53: must ride the string wrapper
    assert r.i == 41
    assert r.x == 1.5
    assert r.d == dt.datetime(2023, 1, 1, 12, 0, 0)
    assert str(r.dec) == "12.3400000000"
    assert r.u == "01234567-89ab-cdef-0123-456789abcdef"
    assert bytes(r.raw) == b"\x01\x02"
    assert r.s == "hello" and r.ok is True
    assert r.tags == '["a","b"]' and r.meta == '{"k":1}'


def test_mongoexport_relaxed_row_falls_back(spark, dump):
    df = read_mongoexport_json(spark, dump, FIELDS)
    r = {row._id: row for row in df.collect()}["plain-id-2"]
    assert r.n == 7 and r.i == 8 and r.x == 2.5
    assert r.d == dt.datetime(2023, 1, 1, 12, 0, 0)  # epoch-millis form
    assert str(r.dec) == "5.5000000000"
    assert r.u is None and r.raw is None  # absent fields stay null
    assert r.ok is False and r.tags == "[]" and r.meta == "{}"


def test_mongoexport_no_python_in_row_path(spark, dump):
    from mongo_analyser_spark.plans import formatted_plan

    plan = formatted_plan(read_mongoexport_json(spark, dump, FIELDS))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mongoexport_rejects_unknown_label(spark, dump):
    with pytest.raises(ValueError):
        read_mongoexport_json(spark, dump, {"s": "not-a-label"})


def test_mongoexport_typed_arrays(spark, dump):
    fields = {"_id": "ObjectId", "tags": "array<str>", "meta": "dict"}
    df = read_mongoexport_json(spark, dump, fields)
    assert dict(df.dtypes)["tags"] == "array<string>"
    rows = {r._id: r for r in df.collect()}
    assert rows["507f1f77bcf86cd799439011"].tags == ["a", "b"]
    assert rows["plain-id-2"].tags == []


def test_mongoexport_corrupt_lines_dont_kill_the_read(spark, tmp_path):
    """A malformed line in a dump must not fail the job (PERMISSIVE
    contract): typed columns go NULL and corrupt_col keeps the raw line
    for quarantine — at 100 TB one bad record must never cost the run."""
    p = tmp_path / "bad.json"
    p.write_text("\n".join([DOCS[1], "{not json at all", DOCS[1]]) + "\n")
    out = read_mongoexport_json(
        spark, str(p), {"_id": "ObjectId", "s": "str"}, corrupt_col="_corrupt"
    ).collect()
    assert len(out) == 3
    bad = [r for r in out if r["_corrupt"] is not None]
    assert len(bad) == 1 and bad[0]["_corrupt"].startswith("{not json")
    assert bad[0]["_id"] is None and bad[0]["s"] is None
    good = [r for r in out if r["_corrupt"] is None]
    assert all(r["s"] == "world" for r in good)
