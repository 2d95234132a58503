"""Stdlib pixel codecs (operators/pixels.py): PNG round-trip, all five
scanline filters, BMP decode, nearest-neighbor resize, and the Arrow
pixel-stats stage — real pixel work with zero codec dependencies."""

from __future__ import annotations

import struct
import zlib

import pytest

from mongo_analyser_spark.operators import pixels


def _checker_rgb(w: int, h: int) -> bytes:
    """Deterministic RGB test image: checkerboard of red/blue."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += b"\xff\x00\x00" if (x + y) % 2 == 0 else b"\x00\x00\xff"
    return bytes(out)


def test_png_round_trip_rgb_and_gray():
    for ch, px in ((3, _checker_rgb(5, 4)), (1, bytes(range(20)))):
        blob = pixels.encode_png(5, 4, ch, px)
        w, h, ch2, out = pixels.decode_png(blob)
        assert (w, h, ch2) == (5, 4, ch)
        assert bytes(out) == px


def test_png_all_filters_decode():
    """Hand-build a PNG whose four scanlines use filters Sub/Up/Average/
    Paeth — the decoder must reproduce the plain pixels."""
    w, h, ch = 4, 4, 3
    plain = _checker_rgb(w, h)
    stride = w * ch
    rows = [bytearray(plain[r * stride:(r + 1) * stride]) for r in range(h)]

    def sub(row):
        enc = bytearray(row)
        for i in range(stride - 1, ch - 1, -1):
            enc[i] = (enc[i] - row[i - ch]) & 0xFF
        return enc

    def up(row, prev):
        return bytearray((row[i] - prev[i]) & 0xFF for i in range(stride))

    def avg(row, prev):
        enc = bytearray(stride)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        return enc

    def paeth(row, prev):
        enc = bytearray(stride)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            ul = prev[i - ch] if i >= ch else 0
            enc[i] = (row[i] - pixels._paeth(left, prev[i], ul)) & 0xFF
        return enc

    raw = (
        b"\x01" + bytes(sub(rows[0]))
        + b"\x02" + bytes(up(rows[1], rows[0]))
        + b"\x03" + bytes(avg(rows[2], rows[1]))
        + b"\x04" + bytes(paeth(rows[3], rows[2]))
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        pixels._PNG_SIG
        + pixels._png_chunk(b"IHDR", ihdr)
        + pixels._png_chunk(b"IDAT", zlib.compress(raw))
        + pixels._png_chunk(b"IEND", b"")
    )
    got = pixels.decode_png(blob)
    assert bytes(got[3]) == plain


def test_png_unsupported_features_gate():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)  # 16-bit depth
    blob = (
        pixels._PNG_SIG
        + pixels._png_chunk(b"IHDR", ihdr)
        + pixels._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        pixels.decode_png(blob)


def _bmp_24(w: int, h: int, rgb: bytes) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP from row-major RGB bytes."""
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for row in range(h - 1, -1, -1):  # bottom-up storage
        line = bytearray()
        for x in range(w):
            r, g, b = rgb[(row * w + x) * 3:(row * w + x) * 3 + 3]
            line += bytes((b, g, r))
        line += b"\x00" * (row_bytes - len(line))
        body += line
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    assert len(header) == 54
    return bytes(header + body)


def test_bmp_decode_normalizes_to_rgb_row_major():
    rgb = _checker_rgb(3, 2)
    w, h, ch, out = pixels.decode_bmp(_bmp_24(3, 2, rgb))
    assert (w, h, ch) == (3, 2, 3)
    assert bytes(out) == rgb


def test_pixel_stats_exact_means():
    # 2x2 RGB: two pure-red + two pure-blue pixels
    px = b"\xff\x00\x00" * 2 + b"\x00\x00\xff" * 2
    blob = pixels.encode_png(2, 2, 3, px)
    stats = pixels.pixel_stats(blob)
    assert stats["width"] == 2 and stats["height"] == 2
    assert stats["channels"] == 3
    # mean R = mean B = 127.5; luma = (299+114)*127.5/1000
    assert stats["mean_luma"] == round((299 + 114) * 127.5 / 1000, 4)


def test_resize_nearest_halves_checkerboard():
    blob = pixels.encode_png(4, 4, 3, _checker_rgb(4, 4))
    out = pixels.resize_nearest(blob, 2, 2)
    w, h, ch, px = pixels.decode_png(out)
    assert (w, h, ch) == (2, 2, 3)
    # nearest with 2x downscale samples even source rows/cols -> all red
    assert bytes(px) == b"\xff\x00\x00" * 4


def test_codec_formats_still_gated():
    with pytest.raises(NotImplementedError):
        pixels.decode_pixels(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_arrow_pixel_stats_and_real_resize_stage(spark):
    """The Spark-side plumbing with REAL pixel work: pack PNG payloads,
    extract pixel stats and resize through the Arrow stages."""
    from pyspark.sql import functions as F

    from mongo_analyser_spark.operators.multimodal import (
        extract_pixel_stats,
        pack_media,
        resize_media,
    )

    blobs = [
        (1, pixels.encode_png(4, 4, 3, _checker_rgb(4, 4))),
        (2, _bmp_24(3, 2, _checker_rgb(3, 2))),
    ]
    df = spark.createDataFrame(blobs, "id long, payload binary").select(
        "id", pack_media(F.col("payload"), "image/png").alias("media")
    )
    stats = {r["id"]: r for r in extract_pixel_stats(df, "id", "media").collect()}
    assert stats[1]["width"] == 4 and stats[1]["channels"] == 3
    assert stats[2]["width"] == 3 and stats[2]["height"] == 2

    resized = {
        r["id"]: r for r in resize_media(df, "id", "media", 2, 2, resizer="real").collect()
    }
    for rid in (1, 2):
        w, h, ch, _ = pixels.decode_png(bytes(resized[rid]["data"]))
        assert (w, h) == (2, 2)
