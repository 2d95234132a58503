"""Bit-identity pins for the r15 codec-kernel micro-optimizations.

The JPEG DCTs, the JPEG entropy bit reader, and the VP8L bit reader /
writer were restructured for speed (int-folded bitstreams, hoisted
products, unrolled folds). Each is pinned here against a straight
per-bit / nested-loop reference implementation: any change that alters
a single output bit or a single double's rounding fails these tests
before it can break a value-hash oracle downstream.
"""

from __future__ import annotations

import random

from mongo_analyser_spark.operators.jpeg import (
    _C,
    _COS,
    _BitReader,
    _fdct8x8,
    _idct8x8,
)
from mongo_analyser_spark.operators.vp8l import _LsbReader, _LsbWriter


def _idct_ref(coef, shift=128, maxv=255):
    """The pre-r15 nested-loop inverse DCT, kept verbatim as reference."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8:y * 8 + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * row[u] * _COS[x][u]
            tmp[y * 8 + x] = s / 2.0
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[y][v]
            val = int(round(s / 2.0)) + shift
            out[y * 8 + x] = 0 if val < 0 else (maxv if val > maxv else val)
    return out


def _fdct_ref(block, shift=128.0):
    """The pre-r15 nested-loop forward DCT, kept verbatim as reference."""
    sh = [v - shift for v in block]
    tmp = [0.0] * 64
    for y in range(8):
        row = sh[y * 8:y * 8 + 8]
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += row[x] * _COS[x][u]
            tmp[y * 8 + u] = s * _C[u] / 2.0
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[y][v]
            out[v * 8 + u] = s * _C[v] / 2.0
    return out


def test_idct_bit_identical_to_reference():
    rng = random.Random(3)
    for trial in range(800):
        coef = [rng.uniform(-2048, 2048) for _ in range(64)]
        shift, maxv = (128, 255) if trial % 2 else (2048, 4095)
        assert _idct8x8(coef, shift, maxv) == _idct_ref(coef, shift, maxv)


def test_fdct_bit_identical_to_reference():
    rng = random.Random(4)
    for trial in range(800):
        blk = [rng.randrange(0, 4096) for _ in range(64)]
        shift = 128.0 if trial % 2 else 2048.0
        a, b = _fdct8x8(blk, shift), _fdct_ref(blk, shift)
        assert a == b  # exact doubles, not approx


def test_jpeg_bitreader_matches_per_bit_reference():
    rng = random.Random(5)
    for _ in range(200):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
        r = _BitReader(data)
        # reference: direct byte/bit indexing
        pos = 0
        vals = []
        while pos + 11 <= len(data) * 8:
            n = rng.randrange(0, 12)
            ref = 0
            for i in range(n):
                p = pos + i
                ref = (ref << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            vals.append((n, ref))
            pos += n
        for n, ref in vals:
            assert r.receive(n) == ref
        assert r.pos == pos


def test_jpeg_bitreader_truncation_boundary():
    r = _BitReader(b"\xab")
    assert r.receive(8) == 0xAB
    try:
        r.bit()
        raise AssertionError("expected truncation error")
    except ValueError:
        pass


def test_vp8l_reader_matches_per_bit_reference():
    rng = random.Random(6)
    for _ in range(200):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
        r = _LsbReader(data)
        pos = 0
        while pos + 15 <= len(data) * 8:
            n = rng.randrange(0, 15)
            ref = 0
            for i in range(n):
                p = pos + i
                ref |= ((data[p >> 3] >> (p & 7)) & 1) << i
            assert r.read(n) == ref
            pos += n
        assert r.pos == pos


def test_vp8l_writer_matches_per_bit_reference():
    rng = random.Random(7)
    for _ in range(200):
        writes = [
            (rng.randrange(1 << 14), rng.randrange(0, 15)) for _ in range(60)
        ]
        w = _LsbWriter()
        # reference: per-bit append
        out = bytearray()
        bit = 0
        for value, n in writes:
            w.write(value, n)
            for i in range(n):
                if bit == 0:
                    out.append(0)
                if (value >> i) & 1:
                    out[-1] |= 1 << bit
                bit = (bit + 1) & 7
        assert w.bytes() == bytes(out)


def test_vp8l_reader_truncation_boundary():
    r = _LsbReader(b"\x5a")
    assert r.read(8) == 0x5A
    try:
        r.read(1)
        raise AssertionError("expected truncation error")
    except ValueError:
        pass
