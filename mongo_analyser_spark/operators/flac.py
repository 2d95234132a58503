"""Pure-stdlib FLAC codec [EXT — the lossless half of the
compressed-audio gate closes].

The reference treats audio as opaque binary (binary subtype map,
``core/shared.py:8-14``); this tier is north-star multimodal surface
(BASELINE.json). FLAC (the xiph.org format, RFC 9639) is the dominant
LOSSLESS compressed-audio format in real corpora, and — unlike
MP3/AAC/Opus — its decode needs nothing beyond integer math: fixed or
LPC linear prediction plus Rice-coded residuals, all exactly
reconstructible. So, like the PNG/JPEG/WAV tiers, the codec here is
genuinely real, and the audio NotImplementedError gate narrows to the
genuinely lossy/DSP-bound codecs (MP3/AAC/Opus).

Decoder (`decode_flac`): STREAMINFO + metadata-block walk, frame
headers (UTF-8 frame numbers, all block-size/sample-rate/sample-size
codes, CRC-8 verified), subframe types CONSTANT / VERBATIM / FIXED
orders 0-4 / LPC (any order, quantized coefficients + shift), wasted
bits, Rice residual partitions (both 4- and 5-bit parameter widths,
escape partitions), stereo decorrelation (left-side / right-side /
mid-side), frame CRC-16 verified. Sample sizes 8/12/16/20/24.

Encoder (`encode_flac`): independent channels, FIXED predictor per
subframe (order chosen 0-4 by minimum residual magnitude), one-partition
Rice residuals with a computed parameter, 16-bit blocksize-1 header
form, UTF-8 frame numbers, real CRC-8/CRC-16 (tables generated in code
from the polynomials — the jpeg.py no-memorized-constants discipline).
Every encode is bit-exact on decode: lossless round trip by
construction, which is what makes the registry row hash-oracle-able.

Like the other codec tiers, per-sample loops are plain Python sized for
fixture payloads; the Spark plumbing contract (Arrow-batched
mapInPandas over an adaptive fanout) lives in operators/multimodal.py /
queries_pipeline.py.
"""

from __future__ import annotations

import struct

from mongo_analyser_spark.operators.pixels import untrusted_decoder

#: in-code CRC tables (generated, not memorized): CRC-8 poly 0x07,
#: CRC-16 poly 0x8005 — the two FLAC framing checksums
_CRC8 = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8.append(_c)
_CRC16 = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC8[c ^ byte]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC16[(c >> 8) ^ byte] ^ ((c << 8) & 0xFFFF)
    return c


class _BitWriter:
    """MSB-first bit packer (FLAC is big-endian at the bit level)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_run(self, value: int, bits: int) -> None:
        """Append ``bits`` bits of ``value`` MSB-first in one fold —
        bit-identical to the equivalent sequence of ``write`` calls
        (r15, guide §1.2: the per-call form flushed byte-by-byte
        through a Python loop; this emits all whole bytes via ONE
        ``int.to_bytes``). Used by the residual writer, which folds a
        whole Rice partition into one big int first."""
        acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        n = self.n + bits
        rem = n & 7
        nbytes = n >> 3
        if nbytes:
            self.out += (acc >> rem).to_bytes(nbytes, "big")
            acc &= (1 << rem) - 1
        self.acc = acc
        self.n = rem

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    """MSB-first reader; byte position tracked for CRC spans.

    r15 (guide §1.2 per-task work): reads are served from a small
    accumulator refilled 8 bytes at a time (``int.from_bytes``) instead
    of a per-byte shift loop, and ``unary`` counts a whole zero run via
    ``bit_length`` instead of one ``read(1)`` per bit — together ~45%
    of the FLAC decode profile. Invariant: the accumulator holds bits
    [bitpos, _cend*8), so ``_nacc == _cend*8 - bitpos`` and the cache
    end stays byte-aligned. Bit-identical by construction; the
    truncation guards raise on the same boundaries with the same
    messages (pinned in tests/test_codec_kernels.py)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8
        self._acc = 0
        self._nacc = 0
        self._cend = pos  # byte index one past the cached window

    @property
    def bytepos(self) -> int:
        return self.bitpos >> 3

    def _refill(self, need_bits: int) -> None:
        data = self.data
        cend = self._cend
        take = max(8, (need_bits - self._nacc + 7) >> 3)
        if take > len(data) - cend:
            take = len(data) - cend
        if take > 0:
            self._acc = (self._acc << (take * 8)) | int.from_bytes(
                data[cend : cend + take], "big"
            )
            self._nacc += take * 8
            self._cend = cend + take

    def read(self, bits: int) -> int:
        if self.bitpos + bits > len(self.data) * 8:
            raise ValueError("truncated FLAC bitstream")
        nacc = self._nacc
        if nacc < bits:
            self._refill(bits)
            nacc = self._nacc
        nacc -= bits
        v = self._acc >> nacc
        self._acc &= (1 << nacc) - 1
        self._nacc = nacc
        self.bitpos += bits
        return v

    def unary(self) -> int:
        q = 0
        while True:
            acc = self._acc
            nacc = self._nacc
            if nacc == 0:
                if self._cend >= len(self.data):
                    raise ValueError("truncated FLAC unary run")
                self._refill(1)
                continue
            if acc == 0:
                # the whole cached window is zeros — consume it
                q += nacc
                self.bitpos += nacc
                self._nacc = 0
                continue
            lead = nacc - acc.bit_length()
            nacc -= lead + 1
            self._acc = acc & ((1 << nacc) - 1)
            self._nacc = nacc
            self.bitpos += lead + 1
            return q + lead

    def align(self) -> None:
        delta = (-self.bitpos) & 7
        if delta:
            # the cache end is byte-aligned, so an unaligned bitpos
            # always has >= delta cached bits (see class invariant)
            self._nacc -= delta
            self._acc &= (1 << self._nacc) - 1
            self.bitpos += delta


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >> (bits - 1) else v


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if not u & 1 else -((u + 1) >> 1)


def _utf8_number(w: _BitWriter, n: int) -> None:
    """FLAC frame numbers use the UTF-8 length/continuation pattern."""
    if n < 0x80:
        w.write(n, 8)
        return
    payload = []
    while True:
        payload.append(n & 0x3F)
        n >>= 6
        head_bits = 7 - len(payload) - 1
        if n < (1 << head_bits) or head_bits <= 0:
            break
    nbytes = len(payload) + 1
    w.write((0xFF << (8 - nbytes)) & 0xFF | n, 8)
    for p in reversed(payload):
        w.write(0x80 | p, 8)


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC UTF-8 frame number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n


#: fixed-predictor residual rules, order 0-4 (RFC 9639 §9.2.1)
def _fixed_residual(samples: list[int], order: int) -> list[int]:
    s = samples
    if order == 0:
        return list(s[0:])
    if order == 1:
        return [s[i] - s[i - 1] for i in range(1, len(s))]
    if order == 2:
        return [s[i] - 2 * s[i - 1] + s[i - 2] for i in range(2, len(s))]
    if order == 3:
        return [
            s[i] - 3 * s[i - 1] + 3 * s[i - 2] - s[i - 3]
            for i in range(3, len(s))
        ]
    return [
        s[i] - 4 * s[i - 1] + 6 * s[i - 2] - 4 * s[i - 3] + s[i - 4]
        for i in range(4, len(s))
    ]


def _fixed_restore(warm: list[int], res: list[int], order: int) -> list[int]:
    out = list(warm)
    if order == 0:
        return list(res)
    for r in res:
        if order == 1:
            out.append(r + out[-1])
        elif order == 2:
            out.append(r + 2 * out[-1] - out[-2])
        elif order == 3:
            out.append(r + 3 * out[-1] - 3 * out[-2] + out[-3])
        else:
            out.append(r + 4 * out[-1] - 6 * out[-2] + 4 * out[-3] - out[-4])
    return out


def _zigzag_total(res: list[int]) -> int:
    """sum(_zigzag(r)) without the per-element call: zigzag(r) is 2r
    for r>=0 and 2|r|-1 for r<0, so the total is 2*sum(|r|) minus the
    negative count — exact integer identity (r15, guide §1.2; the
    C-level sum(map(abs, ...)) replaces ~450k generator steps per 300
    docs)."""
    return 2 * sum(map(abs, res)) - sum(1 for r in res if r < 0)


def _best_rice_param(res: list[int], maxp: int = 14) -> int:
    if not res:
        return 0
    total = _zigzag_total(res)
    mean = total // max(1, len(res))
    p = 0
    while (1 << p) < mean + 1 and p < maxp:
        p += 1
    return p


def _write_residual(w: _BitWriter, res: list[int]) -> None:
    """One-partition Rice coding, 4-bit parameter space (method 0).

    r15 (guide §1.2): the whole partition is folded into ONE big int
    (2 int ops per residual) and emitted via ``write_run`` instead of
    2-3 ``write``/``unary`` method calls per residual — each residual
    contributes exactly the bits the per-call form wrote: q zeros, a
    one, then the p low bits of the zigzag code (pinned against the
    per-call reference in tests/test_codec_kernels.py)."""
    p = _best_rice_param(res)
    # header: method 0 (2 bits) + partition order 0 (4) + param (4)
    acc = p
    nbits = 10
    if p:
        mask = (1 << p) - 1
        p1 = p + 1
        for r in res:
            u = (r << 1) if r >= 0 else ((-r << 1) - 1)
            q = u >> p
            nbits += q + p1
            acc = (acc << (q + p1)) | (1 << p) | (u & mask)
    else:
        for r in res:
            u = (r << 1) if r >= 0 else ((-r << 1) - 1)
            nbits += u + 1
            acc = (acc << (u + 1)) | 1
    w.write_run(acc, nbits)


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("FLAC partition count does not divide block size")
    res: list[int] = []
    for part in range(nparts):
        count = block_size >> porder
        if part == 0:
            count -= order
            if count < 0:
                raise ValueError("FLAC predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(count):
                res.append(_signed(r.read(raw), raw) if raw else 0)
        else:
            for _ in range(count):
                q = r.unary()
                u = (q << param) | (r.read(param) if param else 0)
                res.append(_unzigzag(u))
    return res


def encode_flac(
    sample_rate: int,
    channels: list[list[int]],
    bps: int = 16,
    block_size: int = 4096,
) -> bytes:
    """FLAC bytes from per-channel integer samples (independent
    channels, FIXED predictor per subframe, one-partition Rice
    residuals). Lossless: ``decode_flac`` returns the exact input."""
    if bps != 16:
        raise ValueError("encode_flac writes 16-bit streams")
    if not channels or not channels[0]:
        raise ValueError("need at least one channel with samples")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channels must share a length")
    nch = len(channels)
    if not 1 <= nch <= 8:
        raise ValueError("1..8 channels")
    lim = 1 << (bps - 1)
    for c in channels:
        for v in c:
            if not -lim <= v < lim:
                raise ValueError("sample exceeds the declared bit depth")

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = [c[start : start + block_size] for c in channels]
        bs = len(blk[0])
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize stream
        w.write(0b0111, 4)  # block size: 16-bit value-1 follows
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(nch - 1, 4)  # independent channels
        w.write(0b100, 3)  # 16 bits per sample
        w.write(0, 1)  # reserved
        _utf8_number(w, fi)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w = _BitWriter()
        for ch in blk:
            # r15 (guide §1.2): the order-o fixed residual IS the o-th
            # forward difference (RFC 9639 §9.2.1 binomial weights), so
            # build the five candidates incrementally — each order is
            # one diff of the previous — and cost each with the
            # closed-form zigzag total instead of a per-element
            # generator. min() tie-break preserved (strict < keeps the
            # lowest order on equal cost, infeasible orders excluded
            # exactly as the old len(ch) > o guard did); the winning
            # residual is reused instead of recomputed. Exact integer
            # identities throughout — bit-identical streams.
            order, best_res = 0, list(ch)
            best_cost = _zigzag_total(best_res)
            cand = best_res
            for o in range(1, 5):
                if len(ch) <= o:
                    break
                cand = [cand[i] - cand[i - 1] for i in range(1, len(cand))]
                cost = _zigzag_total(cand)
                if cost < best_cost:
                    order, best_cost, best_res = o, cost, cand
            w.write(0, 1)  # subframe header padding bit
            w.write(0b001000 | order, 6)  # FIXED, order
            w.write(0, 1)  # no wasted bits
            for v in ch[:order]:
                w.write(v & 0xFFFF, 16)  # warm-up samples
            _write_residual(w, best_res)
        w.align()
        body = hdr + bytes([_crc8(hdr)]) + w.bytes()
        frames += body + struct.pack(">H", _crc16(body))

    streaminfo = (
        struct.pack(">HH", min(block_size, n), min(block_size, n))
        + (0).to_bytes(3, "big") * 2
        + (
            (sample_rate << 44)
            | ((nch - 1) << 41)
            | ((bps - 1) << 36)
            | n
        ).to_bytes(8, "big")
        + b"\x00" * 16  # MD5 unset (spec: unknown)
    )
    return (
        b"fLaC"
        + bytes([0x80])  # last metadata block, type 0 (STREAMINFO)
        + len(streaminfo).to_bytes(3, "big")
        + streaminfo
        + bytes(frames)
    )


_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


@untrusted_decoder
def decode_flac(payload: bytes) -> tuple[int, list[list[int]]]:
    """(sample_rate, per-channel integer samples) from a FLAC payload:
    full subframe support (CONSTANT / VERBATIM / FIXED 0-4 / LPC),
    Rice partitions with both parameter widths and escapes, wasted
    bits, stereo decorrelation, CRC-8/CRC-16 verification. Raises
    ValueError for malformed bytes."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos, si = 4, None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if pos + 4 + blen > len(payload):
            raise ValueError("FLAC metadata block overruns the payload")
        if hdr & 0x7F == 0:
            if blen < 34:
                raise ValueError("FLAC STREAMINFO too short")
            si = payload[pos + 4 : pos + 38]
        pos += 4 + blen
        if hdr & 0x80:
            break
    if si is None:
        raise ValueError("FLAC missing STREAMINFO")
    bits36 = int.from_bytes(si[10:18], "big")
    rate = bits36 >> 44
    nch_si = ((bits36 >> 41) & 7) + 1
    bps_si = ((bits36 >> 36) & 0x1F) + 1
    total = bits36 & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC STREAMINFO declares zero sample rate")
    if total > (len(payload) << 4):
        # each sample needs well under 16 bits minimum in any real
        # stream; a mutated 36-bit count must not size the output
        raise ValueError("FLAC STREAMINFO sample count exceeds the payload")

    out: list[list[int]] = [[] for _ in range(nch_si)]
    while pos + 2 <= len(payload) and (len(out[0]) < total or total == 0):
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            frate = rate
        elif sr_code in _RATES:
            frate = _RATES[sr_code]
        elif sr_code == 12:
            frate = r.read(8) * 1000
        elif sr_code == 13:
            frate = r.read(16)
        elif sr_code == 14:
            frate = r.read(16) * 10
        else:
            raise ValueError("invalid FLAC sample rate code")
        if ss_code == 0:
            bps = bps_si
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise ValueError("reserved FLAC sample size code")
        r.align()
        hdr_crc = r.read(8)
        if _crc8(payload[pos : r.bytepos - 1]) != hdr_crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            assigns = [0] * nch
        elif ch_code in (8, 9, 10):
            nch = 2
            assigns = {8: [0, 1], 9: [1, 0], 10: [0, 2]}[ch_code]
            # per-channel extra bit for the SIDE channel
        else:
            raise ValueError("reserved FLAC channel assignment")
        if nch != nch_si:
            raise ValueError("FLAC frame channel count disagrees with STREAMINFO")

        chans: list[list[int]] = []
        for ci in range(nch):
            extra = 0
            if ch_code == 8 and ci == 1:
                extra = 1  # left/side: side channel carries one more bit
            elif ch_code == 9 and ci == 0:
                extra = 1  # right/side
            elif ch_code == 10 and ci == 1:
                extra = 1  # mid/side
            sbps = bps + extra
            if r.read(1):
                raise ValueError("FLAC subframe padding bit set")
            stype = r.read(6)
            wasted = 0
            if r.read(1):
                wasted = 1 + r.unary()
                sbps -= wasted
            if stype == 0:  # CONSTANT
                v = _signed(r.read(sbps), sbps)
                ch = [v] * bs
            elif stype == 1:  # VERBATIM
                ch = [_signed(r.read(sbps), sbps) for _ in range(bs)]
            elif 8 <= stype <= 12:  # FIXED order 0-4
                order = stype - 8
                warm = [_signed(r.read(sbps), sbps) for _ in range(order)]
                res = _read_residual(r, bs, order)
                ch = _fixed_restore(warm, res, order)
            elif stype >= 32:  # LPC, order = (stype & 31) + 1
                order = (stype & 31) + 1
                warm = [_signed(r.read(sbps), sbps) for _ in range(order)]
                prec = r.read(4)
                if prec == 15:
                    raise ValueError("invalid FLAC LPC precision code")
                prec += 1
                shift = _signed(r.read(5), 5)
                if shift < 0:
                    raise ValueError("negative FLAC LPC shift")
                coefs = [_signed(r.read(prec), prec) for _ in range(order)]
                res = _read_residual(r, bs, order)
                ch = list(warm)
                for rv in res:
                    pred = sum(
                        coefs[j] * ch[-1 - j] for j in range(order)
                    ) >> shift
                    ch.append(rv + pred)
            else:
                raise ValueError(f"reserved FLAC subframe type {stype}")
            if wasted:
                ch = [v << wasted for v in ch]
            chans.append(ch)
        r.align()
        body_end = r.bytepos
        crc = struct.unpack(">H", payload[body_end : body_end + 2])[0]
        if _crc16(payload[pos:body_end]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2

        if ch_code == 8:  # left/side: right = left - side
            left, side = chans
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side: left = right + side
            side, right = chans
            chans = [[rt + s for rt, s in zip(right, side)], right]
        elif ch_code == 10:  # mid/side (RFC 9639: mid = (l+r)>>1, lost
            # LSB travels in side = l-r; reconstruct via 2*mid|(s&1))
            mid, side = chans
            chans = [
                [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
                [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
            ]
        for ci in range(nch):
            out[ci].extend(chans[ci])
        if frate != rate:
            raise ValueError("FLAC frame sample rate disagrees with STREAMINFO")
    if total and len(out[0]) < total:
        raise ValueError(
            f"FLAC stream ended early: {len(out[0])} of {total} samples"
        )
    if total:
        out = [c[:total] for c in out]
    return rate, out
