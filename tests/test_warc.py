"""WARC source (sources/warc.py, round 15): record framing, member-gzip
walk, HTTP payload split, the Spark binaryFile reader, and the
untrusted-input armor."""

import pytest

from mongo_analyser_spark.sources.warc import (
    build_warc,
    build_warc_record,
    http_response_payload,
    parse_warc,
    read_warc,
    split_http_payload,
)


def _two_records(body: bytes = b"<p>hi</p>"):
    return [
        build_warc_record(
            "warcinfo", b"software: test\r\n", "0" * 32,
            content_type="application/warc-fields",
        ),
        build_warc_record(
            "response", http_response_payload(body), "1" * 32,
            target_uri="http://example.org/a",
            content_type="application/http;msgtype=response",
        ),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_plain_and_member_gzip(gz):
    body = b"<html><body><p>hello &amp; world</p></body></html>"
    out = list(parse_warc(build_warc(_two_records(body), gzip_members=gz)))
    assert [r["warc-type"] for r in out] == ["warcinfo", "response"]
    assert out[1]["warc-target-uri"] == "http://example.org/a"
    assert out[1]["warc-date"] == "2026-01-01T00:00:00Z"
    status, headers, got = split_http_payload(out[1]["content"])
    assert status == 200
    assert headers["content-length"] == str(len(body))
    assert got == body


def test_member_gzip_is_per_record():
    """Each record must be its own gzip member (the Common-Crawl layout
    that lets a reader skip records without decompressing everything):
    the stream must contain exactly two gzip magics."""
    data = build_warc(_two_records(), gzip_members=True)
    assert data.count(b"\x1f\x8b\x08") == 2


def test_binary_body_and_empty_body():
    raw = bytes(range(256)) * 4
    recs = [
        build_warc_record("resource", raw, "2" * 32,
                          content_type="application/octet-stream"),
        build_warc_record("metadata", b"", "3" * 32),
    ]
    out = list(parse_warc(build_warc(recs, gzip_members=True)))
    assert out[0]["content"] == raw
    assert out[1]["content"] == b""
    assert out[1]["content-type"] is None


def test_armor_rejects_malformed_framing():
    good = build_warc(_two_records())
    cases = [
        b"NOTWARC",
        b"WARC/2.5\r\nContent-Length: 0\r\n\r\n\r\n\r\n",  # bad version
        good[:-4],                                          # lost terminator
        good[:-10],                                         # truncated body
        b"\x1f\x8b\x00bad",                                 # corrupt gzip
        b"WARC/1.1\r\nWARC-Type: response\r\n\r\n\r\n\r\n",  # no length
        b"WARC/1.1\r\nContent-Length: 99999999999\r\n\r\n",  # absurd length
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            list(parse_warc(bad))


def test_split_http_payload_errors():
    with pytest.raises(ValueError, match="header terminator"):
        split_http_payload(b"HTTP/1.1 200 OK\r\n")
    with pytest.raises(ValueError, match="status line"):
        split_http_payload(b"GARBAGE\r\n\r\nbody")
    with pytest.raises(ValueError, match="status code"):
        split_http_payload(b"HTTP/1.1 abc OK\r\n\r\nbody")


def test_read_warc_spark_source(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(
        build_warc(_two_records(b"<p>A</p>"), gzip_members=True)
    )
    (d / "b.warc").write_bytes(build_warc(_two_records(b"<p>B</p>")))
    (d / "corrupt.warc").write_bytes(b"WARC/1.1\r\nbroken")
    df = read_warc(spark, str(d)).orderBy("path", "record_idx")
    rows = df.collect()
    # 2 records per good file + 1 quarantine row for the corrupt one
    assert len(rows) == 5
    good = [r for r in rows if r.record_idx is not None]
    assert len(good) == 4
    responses = [r for r in good if r.warc_type == "response"]
    assert {bytes(r.content)[-8:] for r in responses} == {
        b"<p>A</p>", b"<p>B</p>",
    }
    quarantined = [r for r in rows if r.record_idx is None]
    assert len(quarantined) == 1
    assert quarantined[0].path.endswith("corrupt.warc")
    assert quarantined[0].content is None
