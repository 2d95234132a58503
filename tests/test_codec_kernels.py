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


def _random_complete_lengths(rng, nsym):
    """A Kraft-complete canonical length vector via huffman over random
    frequencies (the only shape _build_huffman accepts)."""
    import heapq

    freqs = [rng.randrange(1, 100) for _ in range(nsym)]
    heap = [(f, i, None) for i, f in enumerate(freqs)]
    heapq.heapify(heap)
    nxt = nsym
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        heapq.heappush(heap, (a[0] + b[0], nxt, (a, b)))
        nxt += 1
    depths = [0] * nsym
    stack = [(heap[0], 0)]
    while stack:
        (f, i, ch), d = stack.pop()
        if ch is None:
            depths[i] = max(d, 1)
        else:
            stack.append((ch[0], d + 1))
            stack.append((ch[1], d + 1))
    return depths


def _vp8l_read_symbol_ref(r, table):
    """Pre-LUT per-bit walk, kept verbatim as reference."""
    if "single" in table:
        return table["single"]
    code = 0
    for length in range(1, 16):
        if r.pos >= r._nbits:
            raise ValueError("truncated VP8L bitstream")
        code = (code << 1) | ((r._val >> r.pos) & 1)
        r.pos += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid VP8L huffman code")


def test_vp8l_lut_symbol_decode_matches_walk():
    from mongo_analyser_spark.operators.vp8l import (
        _build_huffman,
        _read_symbol,
    )

    rng = random.Random(31)
    for _ in range(600):
        lengths = _random_complete_lengths(rng, rng.randrange(2, 40))
        table = _build_huffman(lengths)
        assert "lut" in table or max(lengths) > 11
        data = bytes(rng.randrange(256) for _ in range(10))
        r1, r2 = _LsbReader(data), _LsbReader(data)
        while True:
            e1 = e2 = s1 = s2 = None
            try:
                s1 = _vp8l_read_symbol_ref(r1, table)
            except ValueError as e:
                e1 = str(e)
                r1.pos = r1._nbits  # reference walk consumed to the end
            try:
                s2 = _read_symbol(r2, table)
            except ValueError as e:
                e2 = str(e)
            assert s1 == s2 and e1 == e2, (s1, s2, e1, e2, lengths)
            if e1 is not None:
                break
            assert r1.pos == r2.pos


def _jpeg_decode_ref(r, table):
    """Pre-LUT per-bit walk, kept verbatim as reference."""
    code = 0
    for length in range(1, 17):
        if r.pos >= r._nbits:
            raise ValueError("truncated JPEG entropy stream")
        code = (code << 1) | ((r._val >> (r._nbits - 1 - r.pos)) & 1)
        r.pos += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG entropy stream")


def test_jpeg_lut_decode_matches_walk():
    from mongo_analyser_spark.operators.jpeg import _build_huff_decode

    rng = random.Random(32)
    for _ in range(600):
        nsym = rng.randrange(1, 30)
        lens = sorted(rng.randrange(1, 13) for _ in range(nsym))
        # keep Kraft <= 1 (valid, possibly INCOMPLETE, JPEG tables)
        kraft = sum(2.0 ** -l for l in lens)
        i = 0
        while kraft > 1.0:
            if lens[i % nsym] < 16:
                kraft -= 2.0 ** -lens[i % nsym]
                lens[i % nsym] += 1
                kraft += 2.0 ** -lens[i % nsym]
            i += 1
        lens.sort()
        bits = [0] * 16
        for l in lens:
            bits[l - 1] += 1
        vals = bytes(rng.randrange(256) for _ in range(nsym))
        table = _build_huff_decode(bits, vals)
        data = bytes(rng.randrange(256) for _ in range(8))
        r1, r2 = _BitReader(data), _BitReader(data)
        while True:
            e1 = e2 = s1 = s2 = None
            try:
                s1 = _jpeg_decode_ref(r1, table)
            except ValueError as e:
                e1 = str(e)
            try:
                s2 = r2.decode(table)
            except ValueError as e:
                e2 = str(e)
            assert s1 == s2 and e1 == e2, (s1, s2, e1, e2, bits)
            if e1 is not None:
                break
            assert r1.pos == r2.pos


def test_bitwriter_write_run_matches_sequential_writes():
    """r15 bulk folds: write_run == the equivalent write sequence for
    all three writers (FLAC MSB-first, JPEG MSB-first + byte stuffing,
    VP8L LSB-first)."""
    from mongo_analyser_spark.operators.flac import _BitWriter as FlacW
    from mongo_analyser_spark.operators.jpeg import _BitWriter as JpegW
    from mongo_analyser_spark.operators.vp8l import _LsbWriter

    rng = random.Random(77)
    for cls in (FlacW, JpegW, _LsbWriter):
        for _ in range(200):
            pieces = [
                (rng.randrange(1 << n), n)
                for n in (rng.randrange(1, 40) for _ in range(rng.randrange(1, 30)))
            ]
            # bias toward 0xFF-heavy output to exercise JPEG stuffing
            if rng.random() < 0.5:
                pieces = [(( (1 << n) - 1), n) for _, n in pieces]
            a, b = cls(), cls()
            for v, n in pieces:
                a.write(v, n)
            acc = 0
            nb = 0
            if cls is _LsbWriter:
                for v, n in pieces:
                    acc |= (v & ((1 << n) - 1)) << nb
                    nb += n
            else:
                for v, n in pieces:
                    acc = (acc << n) | (v & ((1 << n) - 1))
                    nb += n
            b.write_run(acc, nb)
            assert a.out == b.out
            if cls is _LsbWriter:
                assert (a._acc, a._nbits) == (b._acc, b._nbits)
            else:
                assert (a.acc, a.n) == (b.acc, b.n)


def test_flac_order_selection_matches_min_over_fixed_residuals():
    """The incremental-diff order selection == argmin over
    _fixed_residual zigzag sums with the old guard and tie-break, and
    encode_flac round trips losslessly on the shapes that exercise
    short channels and every order."""
    from mongo_analyser_spark.operators.flac import (
        _fixed_residual,
        _zigzag,
        _zigzag_total,
        decode_flac,
        encode_flac,
    )

    rng = random.Random(78)
    for _ in range(300):
        n = rng.randrange(1, 80)
        style = rng.randrange(4)
        if style == 0:
            ch = [rng.randrange(-32768, 32768) for _ in range(n)]
        elif style == 1:
            ch = [0] * n
        elif style == 2:
            v = 0
            ch = []
            for _ in range(n):
                v = max(-32768, min(32767, v + rng.randrange(-9, 10)))
                ch.append(v)
        else:
            ch = [((-1) ** i) * (i % 7) * 100 for i in range(n)]
        # reference selection (the pre-r15 expression)
        ref = min(
            range(5),
            key=lambda o: (
                sum(_zigzag(v) for v in _fixed_residual(ch, o))
                if len(ch) > o
                else 1 << 62
            ),
        )
        if len(ch) <= ref:
            ref = 0
        # incremental selection (the encode_flac r15 form)
        order, best = 0, _zigzag_total(list(ch))
        cand = list(ch)
        for o in range(1, 5):
            if len(ch) <= o:
                break
            cand = [cand[i] - cand[i - 1] for i in range(1, len(cand))]
            cost = _zigzag_total(cand)
            if cost < best:
                order, best = o, cost
        assert order == ref, (ch, order, ref)
        _, out = decode_flac(encode_flac(8000, [ch], block_size=16))
        assert out == [ch]


def test_jpeg_batched_dct_matches_scalar():
    """_idct_batch / _fdct_quant_batch == the scalar per-block forms,
    bit for bit, at 8- and 12-bit precision."""
    from mongo_analyser_spark.operators.jpeg import (
        ZIGZAG,
        _fdct8x8,
        _fdct_quant_batch,
        _idct8x8,
        _idct_batch,
    )

    rng = random.Random(79)
    for shift, maxv in ((128, 255), (2048, 4095)):
        coefs = [
            [
                rng.uniform(-8 * maxv, 8 * maxv) if rng.random() < 0.3 else 0.0
                for _ in range(64)
            ]
            for _ in range(37)
        ]
        assert _idct_batch(coefs, shift, maxv) == [
            _idct8x8(c, shift, maxv) for c in coefs
        ]
        q = [rng.choice([1, 3, 16, 255])] * 64
        blocks = [
            [rng.randrange(maxv + 1) for _ in range(64)] for _ in range(37)
        ]
        ref = [
            [
                int(round(_fdct8x8(b, float(shift))[ZIGZAG[k]] / q[k]))
                for k in range(64)
            ]
            for b in blocks
        ]
        assert _fdct_quant_batch(blocks, q, float(shift)) == ref
    assert _idct_batch([]) == []
    assert _fdct_quant_batch([], [1] * 64) == []


def test_jpeg_vectorized_color_helpers_match_scalar():
    """r15 color-path vectorization: _rgb_to_ycbcr_planes and _down2x2
    == their scalar per-pixel references, bit for bit, at both
    precisions (128/255 and 2048/4095)."""
    from mongo_analyser_spark.operators.jpeg import (
        _down2x2,
        _rgb_to_ycbcr_planes,
    )

    rng = random.Random(80)
    for center, maxv in ((128, 255), (2048, 4095)):
        for _ in range(40):
            n = rng.randrange(1, 200)
            samples = [rng.randrange(maxv + 1) for _ in range(3 * n)]
            ys, cbs, crs = _rgb_to_ycbcr_planes(samples, center, maxv)
            for i in range(n):
                r, g, bl = samples[3 * i], samples[3 * i + 1], samples[3 * i + 2]
                assert ys[i] == min(maxv, max(0, int(round(
                    0.299 * r + 0.587 * g + 0.114 * bl))))
                assert cbs[i] == min(maxv, max(0, int(round(
                    center - 0.168736 * r - 0.331264 * g + 0.5 * bl))))
                assert crs[i] == min(maxv, max(0, int(round(
                    center + 0.5 * r - 0.418688 * g - 0.081312 * bl))))
    for _ in range(60):
        w = rng.randrange(1, 20)
        h = rng.randrange(1, 20)
        plane = [rng.randrange(4096) for _ in range(w * h)]
        got = _down2x2(plane, w, h)
        cw, ch = -(-w // 2), -(-h // 2)
        ref = []
        for y in range(ch):
            for x in range(cw):
                acc = cnt = 0
                for dy in range(2):
                    for dx in range(2):
                        sy, sx = 2 * y + dy, 2 * x + dx
                        if sy < h and sx < w:
                            acc += plane[sy * w + sx]
                            cnt += 1
                ref.append(int(round(acc / cnt)))
        assert got == ref, (w, h)
