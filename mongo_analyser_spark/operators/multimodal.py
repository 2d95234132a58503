"""Multimodal column handling [EXT — BASELINE.json north star]: treat
image/audio/video as opaque ``binary`` payloads with typed metadata, and
run decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The container ships no image/audio codecs, so the DECODE step is stubbed:
``decoder="fake"`` derives deterministic pseudo-features from the payload
digest (full plumbing — schema, batching, partitioning — is real and
tested); ``decoder="real"`` raises NotImplementedError at the exact point
a PIL/ffmpeg call would go.

Scale notes: mapInPandas streams Arrow record batches (no per-row serde);
payload bytes stay in one column so Parquet stores them contiguously, and
metadata-only queries never read the blob column (column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_len", T.LongType()),
        T.StructField("media_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def pack_media(payload: Column, mime: str) -> Column:
    """Opaque media struct: binary payload + mime tag."""
    return F.struct(payload.alias("data"), F.lit(mime).alias("mime"))


def fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a codec: pseudo width/height/frames from
    the digest. Replaced by a real decoder where codecs exist."""
    digest = hashlib.md5(payload).digest()
    return {
        "media_len": len(payload),
        "media_md5": hashlib.md5(payload).hexdigest(),
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 32,
    }


def real_decode(payload: bytes) -> dict[str, Any]:
    raise NotImplementedError(
        "real media decode requires image/audio codecs (PIL/ffmpeg) that are "
        "not available in this container; plug a decoder into "
        "extract_media_features(decoder=...) where they exist"
    )


def extract_media_features(
    df: DataFrame,
    id_col: str,
    media_col: str,
    decoder: str | Callable[[bytes], dict[str, Any]] = "fake",
) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched mapInPandas over
    (id, media.data) — the Spark-side shape a real codec UDF would use.
    Output: (id, media_len, media_md5, width, height, n_frames)."""
    if decoder == "fake":
        decode = fake_decode
    elif decoder == "real":
        decode = real_decode
    else:
        decode = decoder

    out_schema = T.StructType(
        [df.schema[id_col]] + list(MEDIA_FEATURES_SCHEMA.fields)
    )
    narrowed = df.select(id_col, F.col(media_col).getField("data").alias("__data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf["__data"]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return narrowed.mapInPandas(run, out_schema)


def sample_frame_indices(n_frames: Column, k: int = 4) -> Column:
    """Uniform deterministic frame sampling: k indices spread over
    [0, n_frames-1] (floor(i*(n-1)/(k-1))), deduplicated and ordered —
    pure Column expression, no UDF, so the planner can fuse it with the
    feature-extract stage. Clips that have fewer than k frames yield all
    their frames."""
    n = n_frames.cast("long")
    idx = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.floor(i.cast("double") * (n - 1) / (k - 1)).cast("int"),
    )
    return F.array_sort(F.array_distinct(idx))


def resize_media(
    df: DataFrame,
    id_col: str,
    media_col: str,
    width: int,
    height: int,
    resizer: str | Callable[[bytes, int, int], bytes] = "fake",
) -> DataFrame:
    """Resize stage: mapInPandas over the payload, emitting a transformed
    binary plus the new dimensions. ``"fake"`` passes the payload through
    (tagged with the target dims) so the batching/schema plumbing is
    exercised; ``"real"`` raises where the PIL call would go."""
    if resizer == "fake":
        def do_resize(payload: bytes, w: int, h: int) -> bytes:
            return payload
    elif resizer == "real":
        def do_resize(payload: bytes, w: int, h: int) -> bytes:
            raise NotImplementedError(
                "real resize requires an image codec (PIL) not present in "
                "this container; pass resizer=<callable> where one exists"
            )
    else:
        do_resize = resizer

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("data", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    narrowed = df.select(id_col, F.col(media_col).getField("data").alias("__data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "data": [do_resize(bytes(p), width, height) for p in pdf["__data"]],
                    "width": width,
                    "height": height,
                }
            )

    return narrowed.mapInPandas(run, out_schema)
