"""WebP-lossless codec (operators/vp8l.py): encoder round trips plus
hand-built bitstreams for the decode-only paths — all four transforms,
color cache, LZ77 with the 2-D distance map, simple prefix codes, and
meta-huffman groups — with expectations computed independently in the
test. Fuzz contract at the end."""

import random
import struct

import pytest

from mongo_analyser_spark.operators.vp8l import (
    _LsbWriter,
    _enc_tables_for,
    _encode_lengths,
    _put_code,
    _rev_bits,
    _write_literal_body,
    decode_webp_lossless,
    encode_webp_lossless,
)


def _rgba(argb_list, w, h):
    out = bytearray()
    for px in argb_list:
        out += bytes(
            [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF, (px >> 24) & 0xFF]
        )
    return bytes(out)


def _wrap(data: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(w_, width, height, n_transform_writer=None):
    w_.write(0x2F, 8)
    w_.write(width - 1, 14)
    w_.write(height - 1, 14)
    w_.write(1, 1)  # alpha hint
    w_.write(0, 3)  # version


def test_roundtrip_shapes():
    rng = random.Random(5)
    for w, h, ch in [(1, 1, 4), (7, 3, 3), (16, 16, 4), (33, 9, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        dw, dh, dch, out = decode_webp_lossless(
            encode_webp_lossless(w, h, ch, px)
        )
        exp = (
            px
            if ch == 4
            else b"".join(
                bytes([px[3 * i], px[3 * i + 1], px[3 * i + 2], 255])
                for i in range(w * h)
            )
        )
        assert (dw, dh, dch) == (w, h, 4) and bytes(out) == exp


def test_subtract_green_transform():
    w = h = 4
    argb = [
        (0xFF << 24) | (r << 16) | (g << 8) | b
        for r, g, b in [(10, 100, 30)] * 8 + [(200, 50, 7)] * 8
    ]
    # store residuals: r-g, b-g mod 256
    stored = [
        (px & 0xFF00FF00)
        | ((((px >> 16) & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF) << 16
        | ((px & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF
        for px in argb
    ]
    bw = _LsbWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT GREEN
    bw.write(0, 1)  # no more transforms
    _write_literal_body(bw, stored, level0=True)
    dw, dh, dch, out = decode_webp_lossless(_wrap(bw.bytes()))
    assert bytes(out) == _rgba(argb, w, h)


def test_predictor_transform_modes():
    """One 4x4 image per predictor mode (block bits 2 -> a single
    block): residuals computed in-test from the spec prediction, so the
    decoder's inverse must land exactly on the source pixels."""
    rng = random.Random(9)
    w = h = 4

    def avg2(a, b):
        return sum(
            ((((a >> s) & 0xFF) + ((b >> s) & 0xFF)) >> 1) << s
            for s in (24, 16, 8, 0)
        )

    def clamp_full(a, b, c):
        out = 0
        for s in (24, 16, 8, 0):
            v = ((a >> s) & 0xFF) + ((b >> s) & 0xFF) - ((c >> s) & 0xFF)
            out |= (0 if v < 0 else (255 if v > 255 else v)) << s
        return out

    def clamp_half(a, b, c):
        out = 0
        for s in (24, 16, 8, 0):
            ave = (((a >> s) & 0xFF) + ((b >> s) & 0xFF)) >> 1
            d = ave - ((c >> s) & 0xFF)
            v = ave + (d // 2 if d >= 0 else -((-d) // 2))
            out |= (0 if v < 0 else (255 if v > 255 else v)) << s
        return out

    def select(l, t, tl):
        pl = pt = 0
        for s in (24, 16, 8, 0):
            pred = ((l >> s) & 0xFF) + ((t >> s) & 0xFF) - ((tl >> s) & 0xFF)
            pl += abs(pred - ((l >> s) & 0xFF))
            pt += abs(pred - ((t >> s) & 0xFF))
        return l if pl < pt else t

    for mode in range(14):
        argb = [
            (0xFF << 24)
            | (rng.randrange(256) << 16)
            | (rng.randrange(256) << 8)
            | rng.randrange(256)
            for _ in range(w * h)
        ]
        # forward predict to residuals (spec edge rules)
        stored = []
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = argb[i - 1]
                elif x == 0:
                    pred = argb[i - w]
                else:
                    L, T, TL = argb[i - 1], argb[i - w], argb[i - w - 1]
                    TR = argb[i - w + 1]
                    pred = [
                        0xFF000000, L, T, TR, TL,
                        avg2(avg2(L, TR), T), avg2(L, TL), avg2(L, T),
                        avg2(TL, T), avg2(T, TR),
                        avg2(avg2(L, TL), avg2(T, TR)),
                        select(L, T, TL), clamp_full(L, T, TL),
                        clamp_half(L, T, TL),
                    ][mode]
                stored.append(
                    sum(
                        ((((argb[i] >> s) & 0xFF) - ((pred >> s) & 0xFF))
                         & 0xFF) << s
                        for s in (24, 16, 8, 0)
                    )
                )
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(0, 3)  # size_bits-2 = 0 -> block size 4 (one block)
        _write_literal_body(bw, [(0xFF << 24) | (mode << 8)], level0=False)
        bw.write(0, 1)  # no more transforms
        _write_literal_body(bw, stored, level0=True)
        dw, dh, dch, out = decode_webp_lossless(_wrap(bw.bytes()))
        assert bytes(out) == _rgba(argb, w, h), f"predictor mode {mode}"


def test_color_transform_inverse():
    rng = random.Random(4)
    w = h = 4
    g2r, g2b, r2b = 0x20, 0xE8, 0x11  # mixed-sign 3.5 fixed elements

    def d(t, c):
        ts = t - 256 if t >= 128 else t
        cs = c - 256 if c >= 128 else c
        return (ts * cs) >> 5

    argb = [
        (0xFF << 24) | (rng.randrange(256) << 16)
        | (rng.randrange(256) << 8) | rng.randrange(256)
        for _ in range(w * h)
    ]
    stored = []
    for px in argb:
        a, r, g, b = (px >> 24) & 255, (px >> 16) & 255, (px >> 8) & 255, px & 255
        # forward: subtract the deltas (decode adds them back)
        r2 = (r - d(g2r, g)) & 0xFF
        b2 = (b - d(g2b, g) - d(r2b, r)) & 0xFF
        stored.append((a << 24) | (r2 << 16) | (g << 8) | b2)
    bw = _LsbWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR TRANSFORM
    bw.write(0, 3)  # one block
    el = (0xFF << 24) | (g2r << 16) | (g2b << 8) | r2b
    _write_literal_body(bw, [el], level0=False)
    bw.write(0, 1)
    _write_literal_body(bw, stored, level0=True)
    dw, dh, dch, out = decode_webp_lossless(_wrap(bw.bytes()))
    assert bytes(out) == _rgba(argb, w, h)


@pytest.mark.parametrize("psize,pack", [(4, 2), (16, 1), (40, 0), (2, 3)])
def test_palette_transform_with_bundling(psize, pack):
    rng = random.Random(psize)
    w, h = 8, 3
    palette = [
        (0xFF << 24) | (rng.randrange(256) << 16)
        | (rng.randrange(256) << 8) | rng.randrange(256)
        for _ in range(psize)
    ]
    idx = [rng.randrange(psize) for _ in range(w * h)]
    argb = [palette[i] for i in idx]
    # palette travels delta-coded
    deltas = []
    prev = 0
    for p in palette:
        deltas.append(
            sum((((p >> s) & 255) - ((prev >> s) & 255) & 255) << s
                for s in (24, 16, 8, 0))
        )
        prev = p
    bw = _LsbWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR INDEXING
    bw.write(psize - 1, 8)
    _write_literal_body(bw, deltas, level0=False)
    bw.write(0, 1)
    if pack:
        per = 1 << pack
        ibits = 8 >> pack
        pw = (w + per - 1) >> pack
        stored = []
        for y in range(h):
            for bx in range(pw):
                g = 0
                for k in range(per):
                    x = (bx << pack) + k
                    if x < w:
                        g |= idx[y * w + x] << (ibits * k)
                stored.append((0xFF << 24) | (g << 8))
    else:
        stored = [(0xFF << 24) | (i << 8) for i in idx]
    _write_literal_body(bw, stored, level0=True)
    dw, dh, dch, out = decode_webp_lossless(_wrap(bw.bytes()))
    assert (dw, dh) == (w, h)
    assert bytes(out) == _rgba(argb, w, h)


def test_color_cache_and_lz77():
    """Hand-coded symbol stream: literal, cache hit, and an LZ77 ref
    through the 2-D distance map (dcode 1 -> (0,1), one row up)."""
    w, h = 4, 3
    cache_bits = 4
    A = 0xFF102030
    B = 0xFF405060
    # stream: A B A(cache) B(cache) | LZ77 len=4 dist=row | A(cache) ...
    bw = _LsbWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta huffman
    # trees: green alphabet literals {0x30,0x60}, cache hits {280+iA,280+iB},
    # length code 256+? for len 4 -> prefix code 3 (value 4): symbol 259
    def ci(px):
        return (px * 0x1E35A7BD & 0xFFFFFFFF) >> (32 - cache_bits)

    greens = {0x20: 3, 0x50: 3, 259: 3, 280 + ci(A): 3, 280 + ci(B): 3}
    galpha = 256 + 24 + (1 << cache_bits)
    glen = [0] * galpha
    for s, l in greens.items():
        glen[s] = l
    # pad to a complete 3-bit code: need 8 symbols at length 3
    extra = [s for s in range(galpha) if glen[s] == 0][:3]
    for s in extra:
        glen[s] = 3
    rl = [0] * 256
    rl[0x10] = 1
    rl[0x40] = 1
    bl = [0] * 256
    bl[0x30] = 1
    bl[0x60] = 1
    al = [0] * 256
    al[0xFF] = 1
    dl = [0] * 40
    dl[0] = 1
    dl[1] = 1  # dcode prefix 0/1; we use prefix code 0 -> value 1? map below

    def canon(lengths):
        enc = {}
        maxlen = max(lengths)
        counts = [0] * (maxlen + 1)
        for l in lengths:
            if l:
                counts[l] += 1
        nc = [0] * (maxlen + 2)
        c = 0
        for l in range(1, maxlen + 1):
            c = (c + counts[l - 1]) << 1
            nc[l] = c
        single = sum(1 for l in lengths if l) == 1
        for s, l in enumerate(lengths):
            if l:
                # codes are stored PRE-REVERSED for the LSB-first writer,
                # mirroring _enc_tables_for's convention (_put_code emits
                # the stored bits verbatim)
                enc[s] = None if single else (_rev_bits(nc[l], l), l)
                nc[l] += 1
        return enc

    for lengths in (glen, rl, bl, al, dl):
        _encode_lengths(bw, lengths)
    ge, re_, be, ae, de = (canon(x) for x in (glen, rl, bl, al, dl))

    def lit(px):
        _put_code(bw, ge, (px >> 8) & 0xFF)
        _put_code(bw, re_, (px >> 16) & 0xFF)
        _put_code(bw, be, px & 0xFF)
        _put_code(bw, ae, (px >> 24) & 0xFF)

    # row 0: A B cache(A) cache(B)
    lit(A)
    lit(B)
    _put_code(bw, ge, 280 + ci(A))
    _put_code(bw, ge, 280 + ci(B))
    # row 1: LZ77 length 4, distance = one row (distance code 1 -> (0,1)
    # => dist w): length prefix code 3 (green 259) = value 4;
    # distance prefix code 1 = value 2 -> dist_code 2 -> map[1] = (1,0)?
    # Use dcode prefix 0 (value 1) -> dist_code 1 -> map[0] = (0,1) -> w
    _put_code(bw, ge, 259)
    _put_code(bw, de, 0)
    # row 2: same again
    _put_code(bw, ge, 259)
    _put_code(bw, de, 0)
    dw, dh, dch, out = decode_webp_lossless(_wrap(bw.bytes()))
    row = [A, B, A, B]
    assert bytes(out) == _rgba(row * 3, w, h)


def test_meta_huffman_two_groups():
    """Entropy image splits the canvas into two horizontal groups whose
    green trees decode DIFFERENT constant pixels."""
    w, h = 8, 4
    bw = _LsbWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta huffman present
    bw.write(0, 3)  # huffman_bits-2 = 0 -> block 4: 2x1 blocks
    # entropy image 2x1: group 0 then group 1 ((r<<8|g) = index)
    _write_literal_body(
        bw, [0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)], level0=False
    )
    PXA = 0xFFAA1122
    PXB = 0xFF33BB44
    for px in (PXA, PXB):  # two groups, single-symbol trees everywhere
        for lengths_spec in (
            ((px >> 8) & 255, 256 + 24),
            ((px >> 16) & 255, 256),
            (px & 255, 256),
            ((px >> 24) & 255, 256),
            (0, 40),
        ):
            sym, alpha = lengths_spec
            lengths = [0] * alpha
            lengths[sym] = 1
            _encode_lengths(bw, lengths)
    # all trees single-symbol: zero bits per pixel
    dw, dh, dch, out = decode_webp_lossless(_wrap(bw.bytes()))
    expect = []
    for y in range(4):
        expect += [PXA] * 4 + [PXB] * 4
    assert bytes(out) == _rgba(expect, w, h)


def test_lossy_gate_and_malformed():
    from mongo_analyser_spark.operators.jpeg import encode_jpeg  # noqa: F401

    vp8 = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        decode_webp_lossless(vp8)
    with pytest.raises(ValueError):
        decode_webp_lossless(b"RIFF\x04\x00\x00\x00WEBP")
    with pytest.raises(ValueError):
        decode_webp_lossless(b"not webp")


def test_fuzz_contract():
    rng = random.Random(77)
    base = encode_webp_lossless(
        8, 8, 4, bytes(rng.randrange(256) for _ in range(256))
    )
    for _ in range(1200):
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
            decode_webp_lossless(bytes(b))
        except (ValueError, NotImplementedError):
            pass
