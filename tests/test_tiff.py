"""Baseline TIFF codec (operators/tiff.py, round 15): LZW early-change
conventions, PackBits runs, predictor, strips, both byte orders, and the
untrusted-input armor."""

import random
import struct

import pytest

from mongo_analyser_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


def test_lzw_roundtrip_across_width_boundaries():
    """Round trips crossing the 9→10→11→12-bit early-change boundaries
    and the 4094-entry CLEAR."""
    rng = random.Random(7)
    for n in (0, 1, 5, 300, 2000, 20000, 120000):
        for alphabet in (4, 256):
            data = bytes(rng.randrange(alphabet) for _ in range(n))
            assert tiff_lzw_decode(
                tiff_lzw_encode(data), cap=n + 16
            ) == data, (n, alphabet)


def test_lzw_early_change_is_pinned_at_the_first_boundary():
    """A decoder WITHOUT early change desynchronizes at code 511: pin
    the exact bit where the width must bump by decoding a stream whose
    table crosses 511 and checking the bytes that follow the boundary.
    The encoder adds one table entry per emitted code, so 253 distinct
    pairs reach entry 510 — the decoder must read the NEXT code at 10
    bits already (TIFF 6.0 §13, the classic interop pitfall)."""
    # data engineered so no pair repeats: all 256 values cycled twice
    # with different strides gives > 253 fresh pairs
    data = bytes((i * 17 + (i * i) % 251) % 256 for i in range(4000))
    enc = tiff_lzw_encode(data)
    assert tiff_lzw_decode(enc, cap=len(data) + 16) == data
    # late-change misread: re-decode with a deliberately broken reader
    # (bump at 2^width instead of 2^width - 1) must NOT reproduce data
    out = bytearray()
    table = None
    width = 9
    prev = None
    acc = bits = 0
    broken_matches = True
    try:
        for byte in enc:
            acc = (acc << 8) | byte
            bits += 8
            while bits >= width:
                code = (acc >> (bits - width)) & ((1 << width) - 1)
                bits -= width
                if code == 256:
                    table = [bytes([i]) for i in range(256)] + [b"", b""]
                    width = 9
                    prev = None
                    continue
                if code == 257:
                    raise StopIteration
                if code < len(table) and (code < 256 or len(table[code])):
                    entry = table[code]
                elif code == len(table) and prev is not None:
                    entry = prev + prev[:1]
                else:
                    broken_matches = False
                    raise StopIteration
                out += entry
                if prev is not None and len(table) < 4096:
                    table.append(prev + entry[:1])
                if len(table) >= (1 << width) and width < 12:  # LATE
                    width += 1
                prev = entry
    except StopIteration:
        pass
    assert not (broken_matches and bytes(out) == data)


def test_lzw_rejects_garbage():
    with pytest.raises(ValueError, match="must start with CLEAR"):
        tiff_lzw_decode(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="without EOI"):
        # CLEAR (256 in 9 bits, MSB-first: 0x80 0x00) then nothing
        tiff_lzw_decode(b"\x80\x00")
    with pytest.raises(ValueError, match="size cap"):
        tiff_lzw_decode(tiff_lzw_encode(b"a" * 1000), cap=10)


def test_packbits_runs_and_errors():
    rng = random.Random(11)
    for n in (0, 1, 3, 128, 129, 400):
        row = bytes(
            rng.choice([0, 0, 0, rng.randrange(256)]) for _ in range(n)
        )
        assert packbits_decode(packbits_encode(row), n) == row, n
    with pytest.raises(ValueError, match="truncated PackBits literal"):
        packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="shorter than expected"):
        packbits_decode(b"", 4)
    # n == 128 is a documented no-op
    assert packbits_decode(b"\x80\x00a", 1) == b"a"


def test_container_matrix_roundtrips_bit_exact():
    rng = random.Random(3)
    for w, h, ch in ((16, 16, 1), (20, 13, 3), (1, 1, 1), (7, 31, 3)):
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        for comp in ("none", "packbits", "lzw"):
            for bo in ("II", "MM"):
                preds = (False,) if comp == "none" else (False, True)
                for pred in preds:
                    for rps in (0, 5):
                        t = encode_tiff(
                            w, h, ch, px, compression=comp, byte_order=bo,
                            predictor=pred, rows_per_strip=rps,
                        )
                        W, H, C, out = decode_tiff(t)
                        assert (W, H, C) == (w, h, ch)
                        assert bytes(out) == px, (w, h, ch, comp, bo, pred)


def _patch_tag(t: bytes, tag: int, inline_byte: int) -> bytes:
    """Overwrite the first inline value byte of ``tag`` in an II TIFF."""
    buf = bytearray(t)
    ifd = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd:ifd + 2])[0]
    for k in range(n):
        off = ifd + 2 + 12 * k
        if struct.unpack("<H", buf[off:off + 2])[0] == tag:
            buf[off + 8] = inline_byte
            return bytes(buf)
    raise AssertionError(f"tag {tag} not found")


def test_white_is_zero_inverts():
    px = bytes(range(16)) * 16
    t = _patch_tag(encode_tiff(16, 16, 1, px), 262, 0)
    _, _, _, out = decode_tiff(t)
    assert bytes(out) == bytes(255 - v for v in px)


def test_gates_raise_by_name():
    px = bytes(64)
    t = encode_tiff(8, 8, 1, px)
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        decode_tiff(b"II+\x00" + t[4:])
    with pytest.raises(NotImplementedError, match="compression 2"):
        decode_tiff(_patch_tag(t, 259, 2))
    with pytest.raises(NotImplementedError, match="photometric 3"):
        decode_tiff(_patch_tag(t, 262, 3))
    with pytest.raises(NotImplementedError, match="predictor 3"):
        pt = encode_tiff(8, 8, 1, px, compression="lzw", predictor=True)
        decode_tiff(_patch_tag(pt, 317, 3))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX\x00\x00")
    with pytest.raises(ValueError, match="bad TIFF magic"):
        decode_tiff(b"II\x00\x01" + t[4:])


def test_untrusted_mutations_never_leak_low_level_errors():
    """Byte-flip fuzz over every supported shape: the armor contract is
    ValueError or NotImplementedError, never IndexError/struct.error."""
    rng = random.Random(5)
    px = bytes(rng.randrange(256) for _ in range(16 * 16 * 3))
    base = [
        encode_tiff(16, 16, 3, px, compression=c, predictor=p)
        for c, p in (("none", False), ("packbits", False), ("lzw", True))
    ]
    for t in base:
        for _ in range(120):
            buf = bytearray(t)
            buf[rng.randrange(len(buf))] = rng.randrange(256)
            try:
                decode_tiff(bytes(buf))
            except (ValueError, NotImplementedError):
                pass


def test_dispatch_and_header():
    from mongo_analyser_spark.operators.multimodal import parse_image_header
    from mongo_analyser_spark.operators.pixels import decode_pixels

    px = bytes((i * 3) % 256 for i in range(12 * 9))
    for bo in ("II", "MM"):
        t = encode_tiff(12, 9, 1, px, compression="lzw", byte_order=bo)
        w, h, ch, out = decode_pixels(t)
        assert (w, h, ch) == (12, 9, 1) and bytes(out) == px
        hdr = parse_image_header(t)
        assert hdr == {
            "mime": "image/tiff", "width": 12, "height": 9, "n_frames": 1,
        }


# --- EXIF (round 15) ---------------------------------------------------------


def test_exif_roundtrip_both_byte_orders():
    from mongo_analyser_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from mongo_analyser_spark.operators.tiff import (
        encode_exif_app1,
        insert_exif,
        parse_exif,
        strip_exif,
    )

    base = encode_jpeg(8, 8, 1, bytes([128]) * 64)
    assert parse_exif(base) is None
    for bo in ("II", "MM"):
        j = insert_exif(
            base,
            encode_exif_app1(
                make="SparkCam", model="X-1", orientation=6,
                datetime="2026:08:16 12:00:00", exposure=(1, 250),
                iso=400, byte_order=bo,
            ),
        )
        assert parse_exif(j) == {
            "make": "SparkCam", "model": "X-1", "orientation": 6,
            "datetime": "2026:08:16 12:00:00", "exposure": (1, 250),
            "iso": 400,
        }, bo
        # the image decodes identically with and without the segment
        assert decode_jpeg(j)[3] == decode_jpeg(base)[3]
        s = strip_exif(j)
        assert parse_exif(s) is None
        assert decode_jpeg(s)[3] == decode_jpeg(base)[3]


def test_exif_without_sub_ifd_and_armor():
    from mongo_analyser_spark.operators.jpeg import encode_jpeg
    from mongo_analyser_spark.operators.tiff import (
        encode_exif_app1,
        insert_exif,
        parse_exif,
    )

    base = encode_jpeg(8, 8, 1, bytes(64))
    j = insert_exif(
        base, encode_exif_app1(make="A", model="B", orientation=3,
                               datetime="d")
    )
    ex = parse_exif(j)
    assert ex["orientation"] == 3 and "iso" not in ex
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_exif(b"nope")
    # an APP1 that claims EXIF but has no TIFF header is malformed
    bad = insert_exif(base, b"Exif\x00\x00XX")
    with pytest.raises(ValueError, match="TIFF header"):
        parse_exif(bad)


def test_tiff_tags_with_lying_types_read_as_malformed():
    """ImageWidth re-typed as ASCII must be a loud ValueError, not a
    duck-typed misread (the type-2/5 support added for EXIF must not
    weaken decode_tiff)."""
    from mongo_analyser_spark.operators.tiff import decode_tiff, encode_tiff

    t = bytearray(encode_tiff(8, 8, 1, bytes(64)))
    ifd = struct.unpack("<I", t[4:8])[0]
    n = struct.unpack("<H", t[ifd:ifd + 2])[0]
    for k in range(n):
        off = ifd + 2 + 12 * k
        if struct.unpack("<H", t[off:off + 2])[0] == 256:
            t[off + 2:off + 4] = struct.pack("<H", 2)  # type -> ASCII
    with pytest.raises(ValueError, match="missing required tag"):
        decode_tiff(bytes(t))
