"""FLAC codec (operators/flac.py): encoder round trips, hand-built
frames for the decode-only paths (LPC, stereo decorrelation, 5-bit Rice
partitions, escapes), CRC and structural validation, fuzz contract."""

import math
import random
import struct

import pytest

from mongo_analyser_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _fixed_residual,
    _utf8_number,
    _zigzag,
    decode_flac,
    encode_flac,
)


def test_roundtrip_shapes_and_compression():
    rng = random.Random(42)
    cases = [
        [[100] * 500],
        [[i % 3000 - 1500 for i in range(1000)]],
        [[rng.randint(-32768, 32767) for _ in range(777)]],
        [[rng.randint(-2000, 2000) for _ in range(1500)] for _ in range(2)],
        [[5]],
        [[rng.randint(-100, 100) for _ in range(300)] for _ in range(4)],
    ]
    for chans in cases:
        rate, out = decode_flac(encode_flac(44100, chans))
        assert rate == 44100 and out == chans
    # smooth signals genuinely compress (fixed predictors + Rice)
    sine = [[int(8000 * math.sin(i / 20)) for i in range(5000)]]
    assert len(encode_flac(44100, sine)) < 0.25 * 2 * 5000
    # multi-frame path (block_size smaller than the clip)
    long = [[(i * 37) % 4001 - 2000 for i in range(10000)]]
    rate, out = decode_flac(encode_flac(8000, long, block_size=1024))
    assert rate == 8000 and out == long


def test_encode_validates_inputs():
    with pytest.raises(ValueError, match="bit depth"):
        encode_flac(8000, [[40000]])
    with pytest.raises(ValueError, match="share a length"):
        encode_flac(8000, [[1, 2], [3]])
    with pytest.raises(ValueError, match="at least one"):
        encode_flac(8000, [])


def _streaminfo(rate, nch, bps, total):
    si = (
        struct.pack(">HH", 4096, 4096)
        + b"\x00" * 6
        + ((rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
           ).to_bytes(8, "big")
        + b"\x00" * 16
    )
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def _frame(nch_code, bps_code, bs, subframes_writer):
    """Hand-assemble one frame: header + CRC8, subframes, CRC16."""
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)  # 16-bit blocksize-1 follows
    w.write(0, 4)  # rate from STREAMINFO
    w.write(nch_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    _utf8_number(w, 0)
    w.write(bs - 1, 16)
    w.align()
    hdr = w.bytes()
    w = _BitWriter()
    subframes_writer(w)
    w.align()
    body = hdr + bytes([_crc8(hdr)]) + w.bytes()
    return body + struct.pack(">H", _crc16(body))


def _rice_residual(w, res, method=0, porder=0, escape_parts=()):
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    w.write(method, 2)
    w.write(porder, 4)
    nparts = 1 << porder
    per = len(res) // nparts  # valid only when order==0 upstream
    for pi in range(nparts):
        part = res[pi * per : (pi + 1) * per]
        if pi in escape_parts:
            raw = max((abs(v).bit_length() + 1 for v in part), default=1)
            w.write(esc, pbits)
            w.write(raw, 5)
            for v in part:
                w.write(v & ((1 << raw) - 1), raw)
        else:
            p = 3
            w.write(p, pbits)
            for v in part:
                u = _zigzag(v)
                w.unary(u >> p)
                w.write(u & 7, p)


def test_decode_lpc_subframe():
    """LPC decode: residuals derived in-test from chosen quantized
    coefficients must reconstruct the original samples exactly."""
    s = [int(1000 * math.sin(i / 7)) for i in range(64)]
    order, shift = 2, 5
    coefs = [55, -24]  # arbitrary quantized predictor
    res = [
        s[i] - ((coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift)
        for i in range(order, len(s))
    ]

    def sub(w):
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)  # LPC, order
        w.write(0, 1)  # no wasted bits
        for v in s[:order]:
            w.write(v & 0xFFFF, 16)
        w.write(12 - 1, 4)  # precision 12
        w.write(shift, 5)
        for c in coefs:
            w.write(c & 0xFFF, 12)
        _rice_residual(w, res)

    payload = _streaminfo(8000, 1, 16, len(s)) + _frame(0, 0b100, len(s), sub)
    rate, out = decode_flac(payload)
    assert rate == 8000 and out == [s]


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_decode_stereo_decorrelation(ch_code):
    """left/side, right/side and mid/side frames reconstruct the
    original stereo pair bit-exactly (side carries the extra bit)."""
    rng = random.Random(ch_code)
    left = [rng.randint(-3000, 3000) for _ in range(48)]
    right = [rng.randint(-3000, 3000) for _ in range(48)]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    chans = {8: [left, side], 9: [side, right], 10: [mid, side]}[ch_code]
    extra_ch = {8: 1, 9: 0, 10: 1}[ch_code]

    def sub(w):
        for ci, ch in enumerate(chans):
            bits = 16 + (1 if ci == extra_ch else 0)
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            w.write(0, 1)
            for v in ch:
                w.write(v & ((1 << bits) - 1), bits)

    payload = _streaminfo(8000, 2, 16, 48) + _frame(ch_code, 0b100, 48, sub)
    rate, out = decode_flac(payload)
    assert out == [left, right]


def test_decode_constant_wasted_bits_and_rice_variants():
    """CONSTANT subframe, wasted-bits shift, 5-bit Rice method,
    multi-partition order, and escape partitions."""
    res = [(i % 7) - 3 for i in range(64)]

    def sub(w):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(1, 1)  # wasted bits follow
        w.write(1, 1)  # unary 0 -> wasted = 1
        w.write(21 & 0x7FFF, 15)  # constant (16 - 1 wasted bits)

    payload = _streaminfo(8000, 1, 16, 16) + _frame(0, 0b100, 16, sub)
    rate, out = decode_flac(payload)
    assert out == [[42] * 16]  # 21 << 1 wasted bit

    def sub2(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # FIXED order 0
        w.write(0, 1)
        _rice_residual(w, res, method=1, porder=2, escape_parts=(1, 3))

    payload = _streaminfo(8000, 1, 16, 64) + _frame(0, 0b100, 64, sub2)
    rate, out = decode_flac(payload)
    assert out == [res]


def test_structural_lies_raise():
    good = encode_flac(8000, [[i % 100 for i in range(200)]])
    # frame CRC16 corrupted
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(bad))
    # header CRC8 corrupted (flip a header bit past the sync code)
    bad = bytearray(good)
    i = bad.find(b"\xff\xf8")
    bad[i + 3] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # STREAMINFO sample count lying beyond the payload
    bad = bytearray(good)
    hi = (8000 << 44) | (0 << 41) | (15 << 36) | ((1 << 36) - 1)
    bad[18:26] = hi.to_bytes(8, "big")
    with pytest.raises(ValueError, match="sample count|ended early"):
        decode_flac(bytes(bad))
    # truncated mid-frame
    with pytest.raises(ValueError):
        decode_flac(good[: len(good) - 7])
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")


def test_fuzz_contract():
    """Mutations of a valid payload only ever raise ValueError (the
    untrusted-input contract) — never low-level errors, never hangs."""
    rng = random.Random(7)
    base = encode_flac(8000, [[(i * 13) % 500 - 250 for i in range(400)]])
    for _ in range(800):
        b = bytearray(base)
        mode = rng.randrange(3)
        if mode == 0:
            b = b[: rng.randrange(len(b))]
        elif mode == 1:
            for _ in range(rng.randrange(1, 9)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            b = b[: rng.randrange(4, len(b))]
            for _ in range(rng.randrange(1, 5)):
                if b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_flac(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_flac_roundtrip_property():
    """Hypothesis: ANY int16 sample matrix round-trips bit-exactly
    through every block size (the lossless-by-construction pin)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=300,
            ),
            min_size=1, max_size=3,
        ).filter(lambda cs: len({len(c) for c in cs}) == 1),
        st.sampled_from([16, 64, 256, 4096]),
        st.sampled_from([8000, 44100, 96000]),
    )
    def check(chans, bs, rate):
        out_rate, out = decode_flac(encode_flac(rate, chans, block_size=bs))
        assert out_rate == rate and out == chans

    check()
