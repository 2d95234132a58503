"""WebDataset tar-shard source (sources/webdataset.py, round 15)."""

import pytest

from mongo_analyser_spark.sources.webdataset import (
    build_webdataset,
    iter_tar_samples,
    read_webdataset,
)


def _samples():
    from mongo_analyser_spark.operators.pixels import encode_pnm

    return [
        {
            "__key__": "shard/img0",
            "ppm": encode_pnm(4, 4, 1, bytes(range(16))),
            "cls": b"7",
            "json": b'{"a":1}',
        },
        {
            "__key__": "shard/img1",
            "ppm": encode_pnm(2, 2, 3, bytes(12)),
            "cls": b"3",
        },
        {"__key__": "x", "seg.png": b"fakepng"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_sample_walk_plain_and_gzip(gz):
    out = list(iter_tar_samples(build_webdataset(_samples(), gz)))
    assert [s["__key__"] for s in out] == ["shard/img0", "shard/img1", "x"]
    assert set(out[0]) == {"__key__", "ppm", "cls", "json"}
    assert out[0]["cls"] == b"7" and out[1]["cls"] == b"3"
    # the key rule: basename up to the FIRST dot; the rest (which may
    # itself contain dots) is the extension
    assert out[2]["seg.png"] == b"fakepng"


def test_shard_bytes_are_deterministic():
    assert build_webdataset(_samples()) == build_webdataset(_samples())
    assert build_webdataset(_samples(), gzip_shard=True) == (
        build_webdataset(_samples(), gzip_shard=True)
    )


def test_armor_rejects_malformed_shards():
    good = build_webdataset(_samples())
    for bad in (b"notatar" * 100, b"\x1f\x8b\x00bad", good[:700]):
        with pytest.raises(ValueError):
            list(iter_tar_samples(bad))


def test_read_webdataset_spark_source(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    (d / "s0.tar").write_bytes(build_webdataset(_samples()))
    (d / "s1.tar.gz").write_bytes(
        build_webdataset(_samples(), gzip_shard=True)
    )
    (d / "bad.tar").write_bytes(b"broken" * 100)
    df = read_webdataset(spark, str(d)).orderBy("path", "key", "ext")
    rows = df.collect()
    good = [r for r in rows if r.key is not None]
    quarantined = [r for r in rows if r.key is None]
    # 6 members per good shard (3+2+1), 2 shards; 1 quarantine row
    assert len(good) == 12 and len(quarantined) == 1
    assert quarantined[0].path.endswith("bad.tar")
    per_key = {}
    for r in good:
        per_key.setdefault(r.key, set()).add(r.ext)
    assert per_key["shard/img0"] == {"ppm", "cls", "json"}
    assert per_key["x"] == {"seg.png"}
    cls = [bytes(r.content) for r in good if r.ext == "cls"]
    assert sorted(cls) == [b"3", b"3", b"7", b"7"]
