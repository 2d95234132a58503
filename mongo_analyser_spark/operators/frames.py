"""Multi-frame pixel codecs, pure stdlib — graduating the "video"
member of the multimodal quartet from plumbing to real decode
(round-10 verdict Next-round #2).

The reference treats media as opaque values (binary subtype map,
``core/shared.py:8-14``); frame-level analytics is [EXT — BASELINE.json
north star]. Two animation containers decode fully in the standard
library, so they do:

* **APNG** — acTL/fcTL/fdAT chunk walk on top of the existing PNG
  scanline machinery (zlib + the five unfilters, operators/pixels.py),
  with real frame COMPOSITION: per-frame x/y offsets, blend_op
  SOURCE(0)/OVER(1) and dispose_op NONE(0)/BACKGROUND(1)/PREVIOUS(2).
* **GIF87a/89a** — a complete LZW decoder (variable code width, CLEAR /
  EOI handling, 4096-entry dictionary), global/local color tables,
  interlace pass reorder, and Graphic-Control disposal + transparency
  composition. The encoder writes real LZW streams too, so round trips
  exercise both directions.

True video containers (MP4/WebM/AVI) remain genuinely codec-bound —
``operators/multimodal.py`` keeps its documented stand-in for those.

Everything here is per-payload Python executed inside Arrow-batched
``mapInPandas`` stages (the extract_pixel_stats shape): at 100 TB the
unit of parallelism is the payload, the loops below touch fixture-sized
thumbnails, and a production deployment swaps these callables for a
native codec without changing the Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

from mongo_analyser_spark.operators.pixels import (
    _PNG_CHANNELS,
    _PNG_SIG,
    _paeth,
    _png_chunk,
)

# ---------------------------------------------------------------------------
# shared PNG scanline helpers (used by both whole-image and APNG regions)
# ---------------------------------------------------------------------------


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> bytearray:
    """Reverse the five PNG scanline filters over a decompressed stream
    of ``h`` rows of ``1 + w*ch`` bytes (same loop as
    pixels.decode_png, factored out so APNG frame regions reuse it)."""
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[row * stride : (row + 1) * stride] = line
        prev = line
    return out


def _filter0(w: int, h: int, ch: int, pixels: bytes) -> bytes:
    stride = w * ch
    return b"".join(
        b"\x00" + bytes(pixels[r * stride : (r + 1) * stride])
        for r in range(h)
    )


# ---------------------------------------------------------------------------
# APNG
# ---------------------------------------------------------------------------


def encode_apng(
    w: int,
    h: int,
    ch: int,
    frames: list[tuple[int, int, int, int, bytes]],
    dispose: int | list[int] = 0,
    blend: int | list[int] = 0,
) -> bytes:
    """Real APNG writer: ``frames`` is a list of
    ``(x, y, fw, fh, pixels)`` regions; the FIRST frame must cover the
    full canvas (it doubles as the PNG default image, per the spec —
    its pixels travel in IDAT, later frames in fdAT). Each frame's
    fcTL carries the given dispose/blend ops. Chunks are CRC32'd like
    pixels.encode_png, so any stdlib PNG reader accepts the file."""
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    if not frames:
        raise ValueError("need at least one frame")
    x0, y0, fw0, fh0, px0 = frames[0]
    if (x0, y0, fw0, fh0) != (0, 0, w, h):
        raise ValueError("first APNG frame must cover the full canvas")
    disposes = (
        list(dispose) if isinstance(dispose, list) else [dispose] * len(frames)
    )
    blends = list(blend) if isinstance(blend, list) else [blend] * len(frames)
    if len(disposes) != len(frames) or len(blends) != len(frames):
        raise ValueError("per-frame dispose/blend lists must match frames")
    out = bytearray(_PNG_SIG)
    out += _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0

    def fctl(fx: int, fy: int, fw: int, fh: int, k: int) -> bytes:
        nonlocal seq
        data = struct.pack(
            ">IIIIIHHBB", seq, fw, fh, fx, fy, 1, 10, disposes[k], blends[k]
        )
        seq += 1
        return _png_chunk(b"fcTL", data)

    out += fctl(0, 0, w, h, 0)
    out += _png_chunk(b"IDAT", zlib.compress(_filter0(w, h, ch, px0), 6))
    for k, (fx, fy, fw, fh, px) in enumerate(frames[1:], start=1):
        if len(px) != fw * fh * ch:
            raise ValueError("frame pixel buffer does not match its rect")
        out += fctl(fx, fy, fw, fh, k)
        body = struct.pack(">I", seq) + zlib.compress(
            _filter0(fw, fh, ch, px), 6
        )
        seq += 1
        out += _png_chunk(b"fdAT", body)
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(b: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, channels, [composed full-canvas frame buffers])
    from an APNG payload, honoring per-frame regions, blend_op
    SOURCE/OVER, and dispose_op NONE/BACKGROUND/PREVIOUS. A plain PNG
    (no acTL) decodes as one frame. Raises NotImplementedError for the
    same feature set pixels.decode_png gates on (16-bit, palette,
    interlace)."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr = 8, None
    n_frames = None
    # fctls: list of (fw, fh, fx, fy, dispose, blend, zdata bytearray)
    fctls: list[list] = []
    idat = bytearray()
    idat_is_frame0 = False
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        if pos + 8 + length > len(b):
            raise ValueError("PNG chunk length exceeds payload (truncated?)")
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"acTL":
            n_frames = struct.unpack(">I", data[:4])[0]
        elif ctype == b"fcTL":
            (_seq, fw, fh, fx, fy, _dn, _dd, disp, blnd) = struct.unpack(
                ">IIIIIHHBB", data[:26]
            )
            fctls.append([fw, fh, fx, fy, disp, blnd, bytearray()])
            if not idat:
                idat_is_frame0 = True
        elif ctype == b"IDAT":
            idat += data
            if idat_is_frame0 and fctls:
                fctls[0][6] += data
        elif ctype == b"fdAT":
            if not fctls:
                raise ValueError("fdAT before any fcTL")
            fctls[-1][6] += data[4:]  # skip sequence number
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG feature outside the stdlib decoder's set "
            f"(depth={depth}, color_type={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    if n_frames is None or not fctls:
        # plain PNG: one frame, whole canvas
        raw = zlib.decompress(bytes(idat))
        return w, h, ch, [_unfilter(raw, w, h, ch)]
    canvas = bytearray(w * h * ch)
    frames: list[bytearray] = []
    stride = w * ch
    for fi, (fw, fh, fx, fy, disp, blnd, zdata) in enumerate(fctls):
        if fx + fw > w or fy + fh > h:
            raise ValueError("APNG frame rect exceeds the canvas")
        if fi == 0 and disp == 2:
            disp = 1  # spec: first-frame PREVIOUS acts as BACKGROUND
        region = _unfilter(zlib.decompress(bytes(zdata)), fw, fh, ch)
        saved = bytearray(canvas) if disp == 2 else None
        for r in range(fh):
            dst = (fy + r) * stride + fx * ch
            src = r * fw * ch
            if blnd == 1 and ch == 4:  # OVER: integer alpha composite
                for x in range(fw):
                    s = src + x * 4
                    d = dst + x * 4
                    a = region[s + 3]
                    if a == 255:
                        canvas[d : d + 4] = region[s : s + 4]
                    elif a:
                        # spec non-premultiplied OVER (APNG spec §4,
                        # ADVICE r11): destination alpha weights the
                        # destination color.  den = out_a * 255 > 0
                        # because a > 0 here.
                        na = 255 - a
                        da = canvas[d + 3]
                        den = a * 255 + da * na
                        for c in range(3):
                            num = region[s + c] * a * 255 + canvas[d + c] * da * na
                            canvas[d + c] = (num + den // 2) // den
                        canvas[d + 3] = (den + 127) // 255
            else:  # SOURCE (and OVER on alpha-less images degenerates)
                canvas[dst : dst + fw * ch] = region[src : src + fw * ch]
        frames.append(bytearray(canvas))
        if disp == 1:  # BACKGROUND: clear the frame's region
            for r in range(fh):
                dst = (fy + r) * stride + fx * ch
                canvas[dst : dst + fw * ch] = bytes(fw * ch)
        elif disp == 2 and saved is not None:  # PREVIOUS
            canvas = saved
    return w, h, ch, frames


# ---------------------------------------------------------------------------
# GIF LZW
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at
    ``min_code_size+1``, CLEAR resets the table, widths grow at table
    sizes 2^n up to 12 bits (4096 entries)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    width = min_code_size + 1
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table) and table[code]:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + [prev[0]]
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + [entry[0]])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """The encoding twin. Width growth must mirror the DECODER's state
    machine exactly, and the decoder lags the encoder by one add (the
    KwKwK lag): the string the encoder defines at its m-th emitted data
    code is only created decoder-side while processing the (m+1)-th. So
    the encoder tracks ``n`` = the decoder's table LENGTH (adds one per
    emitted data code except the first, bumps width when n hits
    2^width) and registers its own new strings at code ``n`` — the slot
    the decoder will eventually give them. At 4096 the dictionary
    freezes (deferred-clear policy, valid GIF)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[tuple[int, int], int] = {}
    n = eoi + 1  # decoder table length after the codes emitted so far
    first = True

    def sim_decoder_add() -> None:
        # the decoder appends an entry after every data code except the
        # first, then widens when its table length reaches 2^width
        nonlocal n, width, first
        if first:
            first = False
            return
        if n < 4096:
            n += 1
            if n == (1 << width) and width < 12:
                width += 1

    emit(clear)
    if indices:
        cur = indices[0]
        for sym in indices[1:]:
            key = (cur, sym)
            if key in table:
                cur = table[key]
                continue
            emit(cur)
            sim_decoder_add()
            if n < 4096:
                table[key] = n
            cur = sym
        emit(cur)
        sim_decoder_add()
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap a byte stream into GIF's ≤255-byte length-prefixed
    sub-blocks, terminated by a zero block."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    w: int,
    h: int,
    frames: list[list[int]],
    palette_bits: int = 8,
) -> bytes:
    """GIF89a writer with REAL LZW streams: grayscale global color
    table (entry i = (i,i,i), 2^palette_bits entries), each frame a
    full-canvas image descriptor (disposal NONE). ``frames`` are lists
    of palette indices, row-major w*h."""
    if not 1 <= palette_bits <= 8:
        raise ValueError("palette_bits must be 1..8")
    n_colors = 1 << palette_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (palette_bits - 1))  # GCT present, size field
    out += b"\x00\x00"  # bg color index, aspect
    for i in range(n_colors):
        g = (i * 255) // (n_colors - 1) if n_colors > 1 else 0
        g = i if n_colors == 256 else g
        out += bytes((g, g, g))
    min_code = max(2, palette_bits)
    for idx in frames:
        if len(idx) != w * h:
            raise ValueError("frame index buffer does not match dimensions")
        if any(v >= n_colors for v in idx):
            raise ValueError("palette index out of range")
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(min_code)
        out += _sub_blocks(lzw_encode(idx, min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif(b: bytes) -> tuple[int, int, list[bytearray]]:
    """(width, height, [composed full-canvas RGB frame buffers]) from a
    GIF87a/89a payload: full LZW decode, global/local color tables,
    interlace reorder, Graphic-Control transparency + disposal
    NONE/BACKGROUND/PREVIOUS composition."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", b[6:10])
    packed, bg_index = b[10], b[11]
    pos = 13
    gct: list[tuple[int, int, int]] | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    canvas = bytearray(w * h * 3)
    if gct is not None and bg_index < len(gct):
        r0, g0, b0 = gct[bg_index]
        if (r0, g0, b0) != (0, 0, 0):
            for i in range(w * h):
                canvas[3 * i : 3 * i + 3] = bytes((r0, g0, b0))
    frames: list[bytearray] = []
    transparent: int | None = None
    dispose = 0
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos + 1]
            pos += 2
            sub_start = pos
            blocks = []
            while pos < len(b) and b[pos] != 0:
                blocks.append(b[pos + 1 : pos + 1 + b[pos]])
                pos += 1 + b[pos]
            pos += 1
            if label == 0xF9 and blocks:  # Graphic Control Extension
                gce = blocks[0]
                flags = gce[0]
                dispose = (flags >> 2) & 0x07
                transparent = gce[3] if flags & 0x01 else None
            del sub_start
        elif block == 0x2C:  # image descriptor
            fx, fy, fw, fh = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
            if fx + fw > w or fy + fh > h:
                raise ValueError("GIF frame rect exceeds the canvas")
            ipacked = b[pos + 9]
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = [
                    tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
                ]
                pos += 3 * n
            interlaced = bool(ipacked & 0x40)
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                data += b[pos + 1 : pos + 1 + b[pos]]
                pos += 1 + b[pos]
            pos += 1
            if table is None:
                raise ValueError("GIF image without any color table")
            idx = lzw_decode(bytes(data), min_code)
            if len(idx) < fw * fh:
                raise ValueError("GIF frame pixel data underflow")
            if interlaced:
                rows = (
                    list(range(0, fh, 8))
                    + list(range(4, fh, 8))
                    + list(range(2, fh, 4))
                    + list(range(1, fh, 2))
                )
                deinter = [0] * (fw * fh)
                for src_r, dst_r in enumerate(rows):
                    deinter[dst_r * fw : (dst_r + 1) * fw] = idx[
                        src_r * fw : (src_r + 1) * fw
                    ]
                idx = deinter
            saved = bytearray(canvas) if dispose == 3 else None
            for r in range(fh):
                for x in range(fw):
                    v = idx[r * fw + x]
                    if transparent is not None and v == transparent:
                        continue
                    if v >= len(table):
                        raise ValueError("palette index out of range")
                    d = ((fy + r) * w + fx + x) * 3
                    canvas[d : d + 3] = bytes(table[v])
            frames.append(bytearray(canvas))
            if dispose == 2:  # restore to background
                bg = (
                    bytes(gct[bg_index])
                    if gct is not None and bg_index < len(gct)
                    else b"\x00\x00\x00"
                )
                for r in range(fh):
                    for x in range(fw):
                        d = ((fy + r) * w + fx + x) * 3
                        canvas[d : d + 3] = bg
            elif dispose == 3 and saved is not None:
                canvas = saved
            dispose = 0
            transparent = None
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return w, h, frames


# ---------------------------------------------------------------------------
# unified multi-frame dispatch
# ---------------------------------------------------------------------------


def decode_frames(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, channels, composed frames) for every container
    whose frames decode in stdlib: APNG (and plain PNG as one frame),
    GIF (RGB frames), 24-bit BMP and baseline JPEG as single frames.
    True video containers raise NotImplementedError at the exact point
    an ffmpeg call would go."""
    if payload[:8] == _PNG_SIG:
        return decode_apng(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, frames = decode_gif(payload)
        return w, h, 3, frames
    if payload[:2] == b"BM" or payload[:2] == b"\xff\xd8":
        from mongo_analyser_spark.operators.pixels import decode_pixels

        w, h, ch, px = decode_pixels(payload)
        return w, h, ch, [bytearray(px)]
    raise NotImplementedError(
        "frame decode beyond APNG/GIF/BMP/baseline-JPEG requires a video "
        "codec (ffmpeg) not present in this container"
    )


def frame_mean_luma(frame: bytes, ch: int) -> float:
    """Rec. 601 mean luma over exact integer channel sums (gray images
    use the single channel), quantized floor(x*1e4+0.5)/1e4 — the
    pixel_stats convention, per composed frame."""
    import math

    n = len(frame) // ch
    if n == 0:
        return 0.0
    if ch >= 3:
        sums = [0, 0, 0]
        for i in range(0, len(frame), ch):
            sums[0] += frame[i]
            sums[1] += frame[i + 1]
            sums[2] += frame[i + 2]
        val = (299 * sums[0] + 587 * sums[1] + 114 * sums[2]) / (1000 * n)
    else:
        val = sum(frame) / n
    return math.floor(val * 10000.0 + 0.5) / 10000.0
