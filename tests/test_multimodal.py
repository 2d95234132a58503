"""Multimodal plumbing: pack → mapInPandas feature extraction (stubbed
decode — the container has no codecs; the Spark-side shape is real)."""

import hashlib

import pytest

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.multimodal import (
    extract_media_features,
    fake_decode,
    pack_media,
    real_decode,
)


@pytest.fixture(scope="module")
def media_df(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another payload")], "id long, text string"
    )
    return df.select(
        "id", pack_media(F.encode("text", "utf-8"), "text/plain").alias("media")
    )


def test_extract_features_deterministic(spark, media_df):
    out = {r["id"]: r.asDict() for r in extract_media_features(media_df, "id", "media").collect()}
    expected = fake_decode(b"hello world")
    assert out[1]["media_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert out[1]["media_len"] == len(b"hello world")
    assert out[1]["width"] == expected["width"]
    assert out[1]["n_frames"] == expected["n_frames"]
    # batch plumbing preserves row count and ids
    assert set(out) == {1, 2}


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG")


def test_custom_decoder_pluggable(spark, media_df):
    def decoder(payload: bytes):
        return {
            "media_len": len(payload),
            "media_md5": "x",
            "width": 1,
            "height": 2,
            "n_frames": 3,
        }

    rows = extract_media_features(media_df, "id", "media", decoder=decoder).collect()
    assert all(r["width"] == 1 and r["n_frames"] == 3 for r in rows)

def test_frame_sampling_expression(spark, media_df):
    from mongo_analyser_spark.operators.multimodal import (
        extract_media_features,
        sample_frame_indices,
    )

    feats = extract_media_features(media_df, "id", "media")
    out = feats.select(
        "id", "n_frames", sample_frame_indices(F.col("n_frames"), k=4).alias("frames")
    ).collect()
    for r in out:
        assert r["frames"] == sorted(set(r["frames"]))
        assert len(r["frames"]) == min(4, r["n_frames"])
        assert r["frames"][0] == 0 and r["frames"][-1] == r["n_frames"] - 1


def test_resize_fake_plumbing(spark, media_df):
    from mongo_analyser_spark.operators.multimodal import resize_media

    out = {r["id"]: r for r in resize_media(media_df, "id", "media", 224, 224).collect()}
    assert bytes(out[1]["data"]) == b"hello world"  # passthrough stub
    assert out[1]["width"] == out[1]["height"] == 224


def test_resize_real_is_explicit_stub(spark, media_df):
    from mongo_analyser_spark.operators.multimodal import resize_media

    with pytest.raises(Exception, match="NotImplementedError|real resize"):
        resize_media(media_df, "id", "media", 10, 10, resizer="real").collect()
