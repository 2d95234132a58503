"""Pure-stdlib baseline TIFF codec [EXT — north-star multimodal surface].

The reference renders no pixels (its TUI shows metadata only; see
/root/reference/mongo_analyser/tui.py), so like operators/jpeg.py this
extends the multimodal tier rather than porting anything: TIFF 6.0
(Adobe, 1992 — a fully public specification) is the dominant container
for scanned/scientific corpora, and its baseline profile needs nothing
beyond integer byte-shuffling.

Decoder (`decode_tiff`): both byte orders (``II``/``MM``), first IFD,
8-bit grayscale (PhotometricInterpretation 0/1 — WhiteIsZero inverts)
and RGB, chunky planar config, multi-strip layout, compressions
**none (1)**, **LZW (5)** and **PackBits (32773)**, and horizontal
differencing (Predictor 2). Anything else raises by name — the honest
NotImplementedError discipline of the other codecs.

TIFF-flavor LZW is NOT GIF-flavor LZW (frames.lzw_decode): codes pack
MSB-first, the table roots are 256 byte strings plus CLEAR=256/EOI=257,
and the code width bumps one code EARLY (when the table reaches
2^width−1 — TIFF 6.0 §13, the classic interop pitfall; late-change
streams from ancient broken writers are rejected as corrupt rather
than silently misread).

Encoder (`encode_tiff`): the fixture twin — same profile surface
(byte order, compression, predictor, rows-per-strip) with LZW emitting
a CLEAR at table entry 4094 per the spec. Round trips are bit-exact
because every supported compression is lossless.

Like the other codecs, per-pixel loops are plain Python sized for
fixture/thumbnail payloads; the Spark plumbing contract lives in
operators/multimodal.py (adaptive fanout -> one Arrow stage).
"""

from __future__ import annotations

import struct

from mongo_analyser_spark.operators.pixels import (
    check_dims,
    untrusted_decoder,
)

#: decoded-output cap shared with the other image decoders (64 MP RGB)
_MAX_OUT = 1 << 28

_CLEAR, _EOI = 256, 257


def tiff_lzw_decode(data: bytes, cap: int = _MAX_OUT) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first codes, initial width 9, EARLY width
    change (bump when the table length reaches 2^width − 1), CLEAR
    resets, EOI ends. ``cap`` bounds the decoded size against
    decompression bombs."""
    out = bytearray()
    table: list[bytes] | None = None
    width = 9
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == _CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == _EOI:
                return bytes(out)
            if table is None:
                raise ValueError("TIFF LZW stream must start with CLEAR")
            if code < len(table) and (code < 256 or len(table[code])):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"corrupt TIFF LZW stream (code {code})")
            out += entry
            if len(out) > cap:
                raise ValueError("TIFF LZW output exceeds size cap")
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1  # early change: one code before the ceiling
            prev = entry
    raise ValueError("TIFF LZW stream ended without EOI")


def tiff_lzw_encode(data: bytes) -> bytes:
    """The encoding twin: emits CLEAR first, registers strings at the
    decoder's slots, bumps width when the next free code reaches
    2^width − 1 (early change), and emits CLEAR again when the table
    reaches entry 4094 per the spec."""
    out = bytearray()
    acc = bits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = _EOI + 1

    emit(_CLEAR)
    cur: int | None = None
    for byte in data:
        if cur is None:
            cur = byte
            continue
        key = (cur, byte)
        if key in table:
            cur = table[key]
            continue
        emit(cur)
        table[key] = next_code
        next_code += 1
        # early change, encoder side: switch after ADDING entry
        # 2^width−1 (511/1023/2047); the decoder lags one entry and
        # switches after adding 2^width−2 (510/1022/2046) — TIFF 6.0 §13
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # spec: clear before the table fills
            emit(_CLEAR)
            table.clear()
            next_code = _EOI + 1
            width = 9
        cur = byte
    if cur is not None:
        emit(cur)
    emit(_EOI)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes, expect: int, cap: int = _MAX_OUT) -> bytes:
    """TIFF PackBits (Apple RLE): n in 0..127 copies n+1 literals,
    n in 129..255 (two's-complement −1..−127) repeats the next byte
    1−n times, n == 128 is a no-op. Stops once ``expect`` bytes are
    produced (strips may carry trailing pad)."""
    if expect > cap:
        raise ValueError("PackBits output exceeds size cap")
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("PackBits strip shorter than expected")
    return bytes(out[:expect])


def packbits_encode(row: bytes) -> bytes:
    """Row-at-a-time PackBits writer (TIFF compresses each row
    independently): greedy runs, repeats only when ≥3 long (ties favor
    literals per the spec's recommendation)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i = j
            continue
        # literal stretch: until a ≥3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += row[i:k]
        i = k
    return bytes(out)


def _undo_predictor(row: bytearray, nch: int) -> None:
    """Predictor 2 (horizontal differencing): each sample stores the
    delta to the same channel one pixel left; accumulate mod 256."""
    for i in range(nch, len(row)):
        row[i] = (row[i] + row[i - nch]) & 0xFF


def _apply_predictor(row: bytearray, nch: int) -> None:
    for i in range(len(row) - 1, nch - 1, -1):
        row[i] = (row[i] - row[i - nch]) & 0xFF


def _read_ifd(b: bytes, e: str, ifd_off: int | None = None):
    """IFD tag dict: tag -> list of int values (BYTE/SHORT/LONG), str
    (ASCII, NUL-trimmed), or (num, den) tuples (RATIONAL — parsed for
    the EXIF reuse of this walker). ``ifd_off`` defaults to the first
    IFD from the header."""
    if ifd_off is None:
        (ifd_off,) = struct.unpack(e + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise ValueError("TIFF IFD offset out of range")
    (nent,) = struct.unpack(e + "H", b[ifd_off:ifd_off + 2])
    if nent > 4096:
        raise ValueError("implausible TIFF IFD entry count")
    tags: dict[int, object] = {}
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    fmt = {1: "B", 3: "H", 4: "I"}
    for k in range(nent):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(b):
            raise ValueError("truncated TIFF IFD")
        tag, typ = struct.unpack(e + "HH", b[off:off + 4])
        (count,) = struct.unpack(e + "I", b[off + 4:off + 8])
        if typ not in sizes:
            continue  # SBYTE/FLOAT/… metadata — not needed here
        total = sizes[typ] * count
        if count > (1 << 20):
            raise ValueError("implausible TIFF tag count")
        if total <= 4:
            raw = b[off + 8:off + 8 + total]
        else:
            (voff,) = struct.unpack(e + "I", b[off + 8:off + 12])
            if voff + total > len(b):
                raise ValueError("TIFF tag value out of range")
            raw = b[voff:voff + total]
        if typ == 2:
            tags[tag] = raw.split(b"\0", 1)[0].decode(
                "ascii", "replace"
            )
        elif typ == 5:
            tags[tag] = [
                struct.unpack(e + "II", raw[8 * i:8 * i + 8])
                for i in range(count)
            ]
        else:
            tags[tag] = list(
                struct.unpack(e + fmt[typ] * count, raw)
            )
    return tags


@untrusted_decoder
def decode_tiff(b: bytes) -> tuple[int, int, int, bytearray]:
    """(width, height, channels, flat row-major pixel bytes) from a
    baseline 8-bit TIFF — see the module doc for the exact profile.
    Unsupported features raise NotImplementedError by name."""
    if len(b) < 8:
        raise ValueError("not a TIFF payload")
    if b[:2] == b"II":
        e = "<"
    elif b[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (magic,) = struct.unpack(e + "H", b[2:4])
    if magic == 43:
        raise NotImplementedError("BigTIFF is outside the stdlib decoder")
    if magic != 42:
        raise ValueError("bad TIFF magic")
    t = _read_ifd(b, e)
    # a tag stored with a lying type (ASCII/RATIONAL where an integer
    # belongs) must read as malformed, not duck-type its way through
    t = {
        k: v for k, v in t.items()
        if isinstance(v, list) and v and isinstance(v[0], int)
    }
    for req in (256, 257, 273, 279):
        if req not in t:
            raise ValueError(f"TIFF missing required tag {req}")
    w, h = t[256][0], t[257][0]
    check_dims(w, h, "TIFF")
    nch = t.get(277, [1])[0]
    if nch not in (1, 3):
        raise NotImplementedError(f"TIFF SamplesPerPixel {nch} (need 1 or 3)")
    bps = t.get(258, [8] * nch)
    if any(v != 8 for v in bps):
        raise NotImplementedError(f"TIFF BitsPerSample {bps} (8-bit only)")
    comp = t.get(259, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (none/LZW/PackBits only)"
        )
    photo = t.get(262, [1])[0]
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} (gray/RGB only)"
        )
    if (photo == 2) != (nch == 3):
        raise ValueError("TIFF photometric/SamplesPerPixel mismatch")
    if t.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF (chunky PlanarConfig only)")
    pred = t.get(317, [1])[0]
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred}")
    rps = t.get(278, [h])[0] or h
    offs, cnts = t[273], t[279]
    nstrips = -(-h // rps)
    if len(offs) != nstrips or len(cnts) != nstrips:
        raise ValueError("TIFF strip table does not match RowsPerStrip")
    stride = w * nch
    out = bytearray()
    for s in range(nstrips):
        rows = min(rps, h - s * rps)
        expect = rows * stride
        off, cnt = offs[s], cnts[s]
        if off + cnt > len(b):
            raise ValueError("TIFF strip out of range")
        raw = b[off:off + cnt]
        if comp == 1:
            if len(raw) < expect:
                raise ValueError("TIFF strip shorter than expected")
            strip = bytes(raw[:expect])
        elif comp == 32773:
            strip = packbits_decode(raw, expect)
        else:
            strip = tiff_lzw_decode(raw, cap=expect + stride)
            if len(strip) < expect:
                raise ValueError("TIFF LZW strip shorter than expected")
            strip = strip[:expect]
        if pred == 2:
            rowsbuf = bytearray(strip)
            for r in range(rows):
                seg = rowsbuf[r * stride:(r + 1) * stride]
                _undo_predictor(seg, nch)
                rowsbuf[r * stride:(r + 1) * stride] = seg
            strip = bytes(rowsbuf)
        out += strip
    if photo == 0:  # WhiteIsZero: invert to the BlackIsZero convention
        out = bytearray(255 - v for v in out)
    return w, h, nch, bytearray(out)


def encode_tiff(
    w: int,
    h: int,
    channels: int,
    pixels: bytes,
    compression: str = "none",
    byte_order: str = "II",
    predictor: bool = False,
    rows_per_strip: int = 0,
) -> bytes:
    """Baseline TIFF writer over the decoder's exact profile:
    ``compression`` in none/packbits/lzw, either byte order, optional
    horizontal-differencing predictor (compressed modes only),
    multi-strip via ``rows_per_strip`` (0 = single strip). Lossless in
    every mode, so round trips are bit-exact."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != w * h * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if compression not in ("none", "packbits", "lzw"):
        raise ValueError(f"unsupported compression {compression!r}")
    if predictor and compression == "none":
        raise ValueError("predictor requires a compressed mode")
    e = "<" if byte_order == "II" else ">"
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    rps = rows_per_strip or h
    stride = w * channels
    strips: list[bytes] = []
    for s0 in range(0, h, rps):
        rows = min(rps, h - s0)
        raw = bytearray(pixels[s0 * stride:(s0 + rows) * stride])
        if predictor:
            for r in range(rows):
                seg = raw[r * stride:(r + 1) * stride]
                _apply_predictor(seg, channels)
                raw[r * stride:(r + 1) * stride] = seg
        if compression == "none":
            strips.append(bytes(raw))
        elif compression == "packbits":
            strips.append(
                b"".join(
                    packbits_encode(bytes(raw[r * stride:(r + 1) * stride]))
                    for r in range(rows)
                )
            )
        else:
            strips.append(tiff_lzw_encode(bytes(raw)))

    # layout: header(8) | strip data | IFD | out-of-line tag values
    data_off = 8
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    ifd_off = pos + (pos & 1)  # word-align the IFD

    entries: list[tuple[int, int, int, list[int]]] = []  # tag,type,count,vals

    def add(tag: int, typ: int, vals: list[int]) -> None:
        entries.append((tag, typ, len(vals), vals))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * channels)
    add(259, 3, [comp_id])
    add(262, 3, [2 if channels == 3 else 1])
    add(273, 4, strip_offs)
    add(277, 3, [channels])
    add(278, 4, [rps])
    add(279, 4, [len(s) for s in strips])
    if predictor:
        add(317, 3, [2])
    entries.sort()

    sizes = {3: 2, 4: 4}
    fmt = {3: "H", 4: "I"}
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    packed = bytearray()
    for tag, typ, count, vals in entries:
        packed += struct.pack(e + "HHI", tag, typ, count)
        body = b"".join(struct.pack(e + fmt[typ], v) for v in vals)
        if len(body) <= 4:
            packed += body + b"\0" * (4 - len(body))
        else:
            packed += struct.pack(e + "I", extra_base + len(extra))
            extra += body

    out = bytearray()
    out += b"II" if e == "<" else b"MM"
    out += struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_off)
    for s in strips:
        out += s
    out += b"\0" * (ifd_off - pos)
    out += struct.pack(e + "H", len(entries))
    out += packed
    out += struct.pack(e + "I", 0)  # no next IFD
    out += extra
    return bytes(out)


# ---------------------------------------------------------------------------
# EXIF (round 15) — the same IFD grammar embedded in JPEG APP1
# ---------------------------------------------------------------------------
#
# EXIF metadata IS a TIFF stream ("Exif\0\0" + II/MM header + IFD0, with
# tag 34665 pointing at the Exif sub-IFD), so the walker above reads it
# unchanged. Corpus curation needs this both ways: INSPECT (orientation
# decides a rotate-before-train, capture time feeds dedup heuristics)
# and STRIP (EXIF routinely carries GPS/PII).

#: IFD0 / Exif-sub-IFD tags surfaced by parse_exif
_EXIF_TAGS = {
    271: "make", 272: "model", 274: "orientation", 306: "datetime",
    33434: "exposure", 34855: "iso",
    40962: "pixel_x", 40963: "pixel_y",
}
_EXIF_POINTER = 34665


def parse_exif(jpeg: bytes) -> dict | None:
    """EXIF fields from a JPEG's APP1 segment (None when absent):
    make/model/datetime strings, orientation (1-8), and from the Exif
    sub-IFD exposure (num, den), iso, pixel_x/pixel_y. Malformed EXIF
    raises ValueError — the untrusted-input contract — but a JPEG
    without EXIF is simply None."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if marker == 0xDA:
            break  # entropy data follows; EXIF must precede it
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00":
            blob = jpeg[pos + 10:pos + 2 + seglen]
            if blob[:2] == b"II":
                e = "<"
            elif blob[:2] == b"MM":
                e = ">"
            else:
                raise ValueError("EXIF blob without TIFF header")
            ifd0 = _read_ifd(blob, e)
            out: dict = {}

            def take(tags):
                for tag, name in _EXIF_TAGS.items():
                    if tag not in tags:
                        continue
                    v = tags[tag]
                    if name == "exposure":
                        if isinstance(v, list) and v and isinstance(
                            v[0], tuple
                        ):
                            out[name] = v[0]
                    elif isinstance(v, str):
                        out[name] = v
                    elif isinstance(v, list) and v and isinstance(
                        v[0], int
                    ):
                        out[name] = v[0]

            take(ifd0)
            ptr = ifd0.get(_EXIF_POINTER)
            if isinstance(ptr, list) and ptr and isinstance(ptr[0], int):
                take(_read_ifd(blob, e, ifd_off=ptr[0]))
            return out
        pos += 2 + seglen
    return None


def _pack_ifd(e: str, entries, base: int) -> bytes:
    """One IFD at absolute offset ``base`` inside the EXIF blob:
    entries are (tag, type, count, payload bytes)."""
    extra = bytearray()
    extra_base = base + 2 + 12 * len(entries) + 4
    packed = bytearray(struct.pack(e + "H", len(entries)))
    for tag, typ, count, body in sorted(entries):
        packed += struct.pack(e + "HHI", tag, typ, count)
        if len(body) <= 4:
            packed += body + b"\0" * (4 - len(body))
        else:
            packed += struct.pack(e + "I", extra_base + len(extra))
            extra += body
    packed += struct.pack(e + "I", 0)
    return bytes(packed + extra)


def encode_exif_app1(
    make: str = "",
    model: str = "",
    orientation: int = 1,
    datetime: str = "",
    exposure: tuple[int, int] | None = None,
    iso: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """APP1 payload ("Exif\\0\\0" + TIFF blob) for fixtures: IFD0 with
    make/model/orientation/datetime and an Exif sub-IFD carrying
    exposure/iso when given."""
    e = "<" if byte_order == "II" else ">"

    def ascii_e(s: str) -> bytes:
        return s.encode("ascii") + b"\0"

    sub: list = []
    if exposure is not None:
        sub.append((33434, 5, 1, struct.pack(e + "II", *exposure)))
    if iso is not None:
        sub.append((34855, 3, 1, struct.pack(e + "H", iso)))

    ifd0: list = [
        (271, 2, len(make) + 1, ascii_e(make)),
        (272, 2, len(model) + 1, ascii_e(model)),
        (274, 3, 1, struct.pack(e + "H", orientation)),
        (306, 2, len(datetime) + 1, ascii_e(datetime)),
    ]
    # compute IFD0 size to place the sub-IFD right after it
    n0 = len(ifd0) + (1 if sub else 0)
    ifd0_base = 8
    # worst case: every ASCII value out of line
    probe = _pack_ifd(
        e,
        ifd0 + ([(34665, 4, 1, struct.pack(e + "I", 0))] if sub else []),
        ifd0_base,
    )
    sub_base = ifd0_base + len(probe)
    if sub:
        ifd0.append((34665, 4, 1, struct.pack(e + "I", sub_base)))
    blob = bytearray()
    blob += b"II" if e == "<" else b"MM"
    blob += struct.pack(e + "H", 42)
    blob += struct.pack(e + "I", ifd0_base)
    blob += _pack_ifd(e, ifd0, ifd0_base)
    if sub:
        blob += _pack_ifd(e, sub, sub_base)
    return b"Exif\x00\x00" + bytes(blob)


def insert_exif(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Insert an APP1 EXIF segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    seg = struct.pack(">BBH", 0xFF, 0xE1, len(app1_payload) + 2)
    return jpeg[:2] + seg + app1_payload + jpeg[2:]


def strip_exif(jpeg: bytes) -> bytes:
    """Remove every APP1 EXIF segment (the PII-scrub twin of
    parse_exif) — other segments pass through untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    out = bytearray(jpeg[:2])
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            out += jpeg[pos:pos + 2]
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if marker == 0xDA:
            break
        if not (
            marker == 0xE1
            and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00"
        ):
            out += jpeg[pos:pos + 2 + seglen]
        pos += 2 + seglen
    out += jpeg[pos:]
    return bytes(out)
