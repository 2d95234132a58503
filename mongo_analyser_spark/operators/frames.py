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

* **AVI (RIFF)** — since round 13: hdrl/movi/idx1 chunk walk with two
  natively-decodable video stream kinds — MJPEG (one baseline JPEG per
  '00dc' chunk, operators/jpeg.py) and uncompressed 24-bit DIB ('00db'
  BMP-style pixel arrays). The writer emits spec-shaped headers and a
  movi-relative idx1 so conformant players accept the files.

Inter-frame video codecs (MP4/WebM, H.264-in-AVI) remain genuinely
codec-bound — ``operators/multimodal.py`` keeps its documented stand-in
for those.

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
    bounded_decompress,
    check_dims,
    untrusted_decoder,
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


@untrusted_decoder
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
    check_dims(w, h, "APNG")
    if n_frames is None or not fctls:
        # plain PNG: one frame, whole canvas
        raw = bounded_decompress(idat, 64 + h * (1 + w * ch))
        return w, h, ch, [_unfilter(raw, w, h, ch)]
    canvas = bytearray(w * h * ch)
    frames: list[bytearray] = []
    stride = w * ch
    for fi, (fw, fh, fx, fy, disp, blnd, zdata) in enumerate(fctls):
        if fx + fw > w or fy + fh > h:
            raise ValueError("APNG frame rect exceeds the canvas")
        if fi == 0 and disp == 2:
            disp = 1  # spec: first-frame PREVIOUS acts as BACKGROUND
        region = _unfilter(
            bounded_decompress(zdata, 64 + fh * (1 + fw * ch)), fw, fh, ch
        )
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
    if not 1 <= min_code_size <= 11:
        # codes max out at 12 bits, so a legal stream's initial width
        # (min+1) is at most 12; an untrusted byte here must not size
        # the 2^min root table (round-13 fuzz: a mutated 0xFF built a
        # 2^255-entry list)
        raise ValueError(f"illegal LZW minimum code size {min_code_size}")
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


@untrusted_decoder
def decode_gif(b: bytes) -> tuple[int, int, list[bytearray]]:
    """(width, height, [composed full-canvas RGB frame buffers]) from a
    GIF87a/89a payload: full LZW decode, global/local color tables,
    interlace reorder, Graphic-Control transparency + disposal
    NONE/BACKGROUND/PREVIOUS composition."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", b[6:10])
    check_dims(w, h, "GIF")
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
            # C-speed fill: a mutated header can declare a huge (but
            # under-cap) canvas, and a per-pixel Python loop here was
            # the one slow path the round-13 fuzz sweep found
            canvas[:] = bytes((r0, g0, b0)) * (w * h)
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
# AVI (RIFF) — MJPEG and uncompressed-DIB video streams
# ---------------------------------------------------------------------------
#
# AVI is the third RIFF container here (after WAV in operators/audio.py):
# the chunk grammar is public (Microsoft AVI RIFF spec / OpenDML), and an
# MJPEG stream is just one baseline JPEG per '00dc' chunk — fully
# decodable by operators/jpeg.py. Uncompressed 'DIB ' streams are BMP
# pixel arrays (bottom-up BGR, 4-byte row padding — operators/pixels.py's
# decode_bmp layout) per '00db' chunk. Real inter-frame codecs (H.264,
# VP9, …) remain the honest NotImplementedError gate.


def _avi_chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, size) over a RIFF chunk run, enforcing
    in-bounds sizes and even-byte padding (untrusted input: a size that
    overruns its parent is malformed, not a seek hint)."""
    while pos + 8 <= end:
        tag = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        start = pos + 8
        if start + size > end:
            raise ValueError(
                f"AVI chunk {tag!r} overruns its container "
                f"({size} bytes at {pos}, parent ends {end})"
            )
        yield tag, start, size
        pos = start + size + (size & 1)


def encode_avi_mjpeg(
    w: int,
    h: int,
    frames: list[bytes],
    fps: int = 10,
    raw_dib: bool = False,
    write_index: bool = True,
) -> bytes:
    """Minimal spec-shaped AVI writer: one video stream, ``frames``
    being whole baseline-JPEG payloads ('MJPG', '00dc' chunks) or — with
    ``raw_dib=True`` — BMP-style pixel arrays (bottom-up BGR rows padded
    to 4 bytes, biCompression 0, '00db' chunks). Writes avih + strh/strf
    headers, the movi list, and (by default) a movi-relative idx1 index,
    so any conformant AVI reader accepts the file."""
    if not frames:
        raise ValueError("need at least one frame")
    handler = b"DIB " if raw_dib else b"MJPG"
    compression = struct.pack("<I", 0) if raw_dib else b"MJPG"
    ckid = b"00db" if raw_dib else b"00dc"

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            tag
            + struct.pack("<I", len(data))
            + data
            + (b"\x00" if len(data) & 1 else b"")
        )

    def rlist(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10 if write_index else 0,  # dwFlags (AVIF_HASINDEX)
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHH8I4h",
        b"vids",
        handler,
        0, 0, 0, 0,  # flags, priority, language, initial frames
        1,  # dwScale
        max(1, fps),  # dwRate
        0,  # dwStart
        len(frames),  # dwLength
        max_bytes,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (default)
        0,  # dwSampleSize (0: variable-size samples)
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, compression, w * h * 3, 0, 0, 0, 0,
    )
    hdrl = rlist(
        b"hdrl",
        chunk(b"avih", avih)
        + rlist(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = bytearray()
    index = bytearray()
    for f in frames:
        # idx1 offsets are movi-relative: from the 'movi' fourcc to the
        # chunk HEADER (the first chunk is at offset 4)
        index += ckid + struct.pack("<III", 0x10, 4 + len(movi_payload), len(f))
        movi_payload += chunk(ckid, f)
    movi = rlist(b"movi", bytes(movi_payload))
    body = hdrl + movi
    if write_index:
        body += chunk(b"idx1", bytes(index))
    return chunk(b"RIFF", b"AVI " + body)


def _avi_raw_frame(data: bytes, w: int, h: int) -> bytearray:
    """Bottom-up 24-bit BGR rows (4-byte padded) -> row-major RGB."""
    row = (w * 3 + 3) & ~3
    if len(data) < row * h:
        raise ValueError("AVI DIB frame shorter than its dimensions")
    out = bytearray(w * h * 3)
    for y in range(h):
        src = (h - 1 - y) * row
        for x in range(w):
            o = (y * w + x) * 3
            out[o] = data[src + 3 * x + 2]
            out[o + 1] = data[src + 3 * x + 1]
            out[o + 2] = data[src + 3 * x]
    return out


@untrusted_decoder
def decode_avi(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, channels, frames) from an AVI container whose
    video stream is MJPEG (one baseline/progressive JPEG per chunk —
    operators/jpeg.py) or uncompressed DIB. Walks hdrl for the geometry
    and stream table, movi (including nested 'rec ' lists) for the
    frames, and cross-checks idx1 when present (either offset
    convention). Any other fccHandler/biCompression raises
    NotImplementedError naming the codec — the honest gate; structural
    lies (overrunning chunks, frame-count or dimension mismatches)
    raise ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = 8 + riff_size
    if end > len(payload):
        raise ValueError("AVI RIFF size overruns the payload")

    avih = None
    streams: list[dict] = []
    movi_ranges: list[tuple[int, int]] = []
    idx1: bytes | None = None
    for tag, start, size in _avi_chunks(payload, 12, end):
        if tag == b"LIST":
            ltype = payload[start : start + 4]
            if ltype == b"hdrl":
                for t2, s2, z2 in _avi_chunks(payload, start + 4, start + size):
                    if t2 == b"avih":
                        if z2 < 56:
                            raise ValueError("AVI avih header too short")
                        avih = struct.unpack("<14I", payload[s2 : s2 + 56])
                    elif t2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                        st: dict = {}
                        for t3, s3, z3 in _avi_chunks(
                            payload, s2 + 4, s2 + z2
                        ):
                            if t3 == b"strh" and z3 >= 48:
                                st["type"] = payload[s3 : s3 + 4]
                                st["handler"] = payload[s3 + 4 : s3 + 8]
                                (st["length"],) = struct.unpack(
                                    "<I", payload[s3 + 32 : s3 + 36]
                                )
                            elif t3 == b"strf" and st.get("type") == b"vids":
                                if z3 < 40:
                                    raise ValueError("AVI strf too short")
                                (
                                    _bisz, bw, bh, _pl, st["bits"],
                                ) = struct.unpack("<IiiHH", payload[s3 : s3 + 16])
                                st["compression"] = payload[s3 + 16 : s3 + 20]
                                st["bw"], st["bh"] = bw, abs(bh)
                        streams.append(st)
            elif ltype == b"movi":
                movi_ranges.append((start + 4, start + size))
        elif tag == b"idx1":
            idx1 = payload[start : start + size]
    if avih is None:
        raise ValueError("AVI missing avih header")
    if not movi_ranges:
        raise ValueError("AVI missing movi list")
    w, h, total_frames, n_streams = avih[8], avih[9], avih[4], avih[6]
    if len(streams) != n_streams:
        raise ValueError(
            f"AVI avih declares {n_streams} streams, hdrl lists {len(streams)}"
        )
    vid = next(
        (i for i, s in enumerate(streams) if s.get("type") == b"vids"), None
    )
    if vid is None:
        raise ValueError("AVI has no video stream")
    vs = streams[vid]
    comp = vs.get("compression", b"")
    is_mjpeg = vs["handler"].upper() in (b"MJPG", b"MJPA") or comp.upper() == b"MJPG"
    is_raw = comp in (b"\x00\x00\x00\x00",) or vs["handler"] == b"DIB "
    if not (is_mjpeg or is_raw):
        name = comp.decode("latin1", "replace").strip("\x00") or vs[
            "handler"
        ].decode("latin1", "replace")
        raise NotImplementedError(
            f"AVI video codec {name!r} requires a codec library (ffmpeg) "
            "not present in this container; MJPEG and uncompressed DIB "
            "decode natively"
        )
    if (vs.get("bw", w), vs.get("bh", h)) != (w, h):
        raise ValueError("AVI strf dimensions disagree with avih")

    vtag = b"%02ddc" % vid if is_mjpeg else b"%02ddb" % vid
    vtag_alt = b"%02ddb" % vid if is_mjpeg else b"%02ddc" % vid
    chunks: list[tuple[int, int]] = []  # (header_pos, size) for idx1 check

    def walk_movi(pos: int, stop: int) -> None:
        # Iterative worklist, not recursion: nested 'rec ' LISTs cost the
        # attacker ~12 bytes per level, so payload-driven recursion would
        # turn a ~12 KB crafted AVI into a RecursionError that escapes the
        # ValueError quarantine contract of untrusted_decoder.
        stack = [_avi_chunks(payload, pos, stop)]
        while stack:
            descended = False
            for t, s, z in stack[-1]:
                if t == b"LIST" and payload[s : s + 4] == b"rec ":
                    if len(stack) >= 64:
                        raise ValueError("AVI 'rec ' LIST nesting too deep")
                    stack.append(_avi_chunks(payload, s + 4, s + z))
                    descended = True
                    break
                elif t in (vtag, vtag_alt):
                    chunks.append((s - 8, z))
            if not descended:
                stack.pop()

    for lo, hi in movi_ranges:
        walk_movi(lo, hi)
    if not chunks:
        raise ValueError("AVI movi list has no video frames")
    if total_frames != len(chunks):
        raise ValueError(
            f"AVI avih dwTotalFrames={total_frames} but movi carries "
            f"{len(chunks)} video chunks"
        )
    if idx1 is not None:
        entries = [
            struct.unpack("<4sIII", idx1[i : i + 16])
            for i in range(0, len(idx1) - 15, 16)
        ]
        ventries = [e for e in entries if e[0] in (vtag, vtag_alt)]
        if len(ventries) != len(chunks):
            raise ValueError(
                f"AVI idx1 lists {len(ventries)} video entries for "
                f"{len(chunks)} movi chunks"
            )
        movi_fourcc = movi_ranges[0][0] - 4  # position of the 'movi' tag
        for (ck, _fl, off, sz), (hdr_pos, z) in zip(ventries, chunks):
            # both public offset conventions: relative to the 'movi'
            # fourcc (canonical) or absolute from the file start
            if not (movi_fourcc + off == hdr_pos or off == hdr_pos):
                raise ValueError("AVI idx1 offset does not match movi chunk")
            if sz != z:
                raise ValueError("AVI idx1 size does not match movi chunk")

    frames: list[bytearray] = []
    ch = None
    for hdr_pos, z in chunks:
        data = payload[hdr_pos + 8 : hdr_pos + 8 + z]
        if is_mjpeg:
            from mongo_analyser_spark.operators.jpeg import decode_jpeg

            fw, fh, fch, px = decode_jpeg(data)
            if (fw, fh) != (w, h):
                raise ValueError(
                    f"AVI MJPEG frame is {fw}x{fh}, container says {w}x{h}"
                )
        else:
            if vs.get("bits", 24) != 24:
                raise NotImplementedError(
                    f"AVI uncompressed DIB at {vs['bits']} bpp (need 24)"
                )
            fch, px = 3, _avi_raw_frame(data, w, h)
        if ch is None:
            ch = fch
        elif fch != ch:
            raise ValueError("AVI frames disagree on channel count")
        frames.append(bytearray(px))
    return w, h, ch, frames


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12)
# ---------------------------------------------------------------------------
#
# The box grammar is public (ISO BMFF); a 'jpeg' VisualSampleEntry
# (QuickTime/MP4RA-registered motion-JPEG-in-MP4) makes every video
# sample one baseline JPEG — decodable by operators/jpeg.py, same as the
# AVI MJPEG stream above. The reader walks moov>trak>mdia>minf>stbl,
# reconstructs per-sample file offsets from the stsc/stco/stsz sample
# tables, and bounds-checks every box and sample against the payload.
# AVC/HEVC/VP9/AV1 sample entries raise NotImplementedError — the honest
# inter-frame-codec gate.


def _mp4_box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def encode_mp4_mjpeg(
    w: int, h: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Minimal spec-shaped MP4 writer: one 'vide' track whose stsd entry
    is the 'jpeg' VisualSampleEntry, all samples in one mdat chunk,
    full stts/stsc/stsz/stco sample tables. ``frames`` are whole
    baseline-JPEG payloads."""
    if not frames:
        raise ValueError("need at least one frame")
    n = len(frames)
    ftyp = _mp4_box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41"
    )
    mdat_payload = b"".join(frames)
    # all samples live in ONE chunk whose file offset is the mdat
    # payload start: ftyp + mdat header (8 bytes)
    chunk_off = len(ftyp) + 8
    mdat = _mp4_box(b"mdat", mdat_payload)

    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0, flags
        + struct.pack(">IIII", 0, 0, 1000, n * 1000 // max(1, fps))
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">B3B", 0, 0, 0, 3)  # version 0, flags enabled|in-movie
        + struct.pack(">IIII4x", 0, 0, 1, n * 1000 // max(1, fps))
        + struct.pack(">4xHHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _mp4_box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIIHH", 0, 0, max(1, fps), n, 0x55C4, 0),
    )
    hdlr = _mp4_box(
        b"hdlr",
        struct.pack(">B3x4x", 0) + b"vide" + b"\x00" * 12
        + b"VideoHandler\x00",
    )
    vmhd = _mp4_box(b"vmhd", struct.pack(">B3BHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
    dref = _mp4_box(
        b"dref",
        struct.pack(">B3xI", 0, 1)
        + _mp4_box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)),
    )
    dinf = _mp4_box(b"dinf", dref)
    sample_entry = _mp4_box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
        + struct.pack(">HH12x", 0, 0)  # pre_defined, reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">III", 0x00480000, 0x00480000, 0)  # dpi, reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _mp4_box(b"stsd", struct.pack(">B3xI", 0, 1) + sample_entry)
    stts = _mp4_box(b"stts", struct.pack(">B3xIII", 0, 1, n, 1))
    stsc = _mp4_box(b"stsc", struct.pack(">B3xIIII", 0, 1, 1, n, 1))
    stsz = _mp4_box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _mp4_box(b"stco", struct.pack(">B3xII", 0, 1, chunk_off))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _mp4_boxes(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) over a box run with
    bounds checks (size 0 = to container end; size 1 = 64-bit
    largesize)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        start = pos + 8
        if size == 1:
            if start + 8 > end:
                raise ValueError("MP4 largesize overruns its container")
            (size,) = struct.unpack(">Q", b[start : start + 8])
            start += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if size != 0 and (size < 8 or box_end > end):
            raise ValueError(
                f"MP4 box {tag!r} overruns its container "
                f"({size} bytes at {pos}, parent ends {end})"
            )
        yield tag, start, box_end
        pos = box_end


def _mp4_find(b: bytes, pos: int, end: int, path: list[bytes]):
    """Payload range of the first box at ``path`` below [pos, end)."""
    for tag, s, e in _mp4_boxes(b, pos, end):
        if tag == path[0]:
            if len(path) == 1:
                return s, e
            return _mp4_find(b, s, e, path[1:])
    return None


@untrusted_decoder
def decode_mp4(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, channels, frames) from an ISO-BMFF (MP4/MOV)
    container whose video track carries 'jpeg' samples (motion JPEG in
    MP4). Walks the real sample tables — stsd for the codec, stsc/stco
    (or co64) for chunk layout, stsz for sizes — reconstructs each
    sample's file offset, bounds-checks it, and JPEG-decodes it.
    AVC/HEVC/VP9/AV1 (and any other compressed sample entry) raise
    NotImplementedError naming the codec; structural lies raise
    ValueError."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    end = len(payload)
    # locate the video track: moov > trak whose hdlr is 'vide'
    moov = _mp4_find(payload, 0, end, [b"moov"])
    if moov is None:
        raise ValueError("MP4 missing moov box")
    stbl = None
    tkwh = None
    for tag, s, e in _mp4_boxes(payload, *moov):
        if tag != b"trak":
            continue
        hdlr = _mp4_find(payload, s, e, [b"mdia", b"hdlr"])
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _mp4_find(payload, s, e, [b"tkhd"])
        if tkhd is not None:
            te = tkhd[1]
            tw, th = struct.unpack(">II", payload[te - 8 : te])
            tkwh = (tw >> 16, th >> 16)
        stbl = _mp4_find(payload, s, e, [b"mdia", b"minf", b"stbl"])
        break
    if stbl is None:
        raise ValueError("MP4 has no video track")
    boxes = {t: (s, e) for t, s, e in _mp4_boxes(payload, *stbl)}
    for req in (b"stsd", b"stsz", b"stsc"):
        if req not in boxes:
            raise ValueError(f"MP4 stbl missing {req.decode()} box")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("MP4 stbl missing stco/co64 box")

    # stsd: the codec gate
    s, e = boxes[b"stsd"]
    (entry_count,) = struct.unpack(">I", payload[s + 4 : s + 8])
    if entry_count < 1:
        raise ValueError("MP4 stsd has no sample entries")
    fourcc = payload[s + 12 : s + 16]
    if fourcc not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"MP4 video codec {fourcc.decode('latin1', 'replace')!r} "
            "requires a codec library (ffmpeg) not present in this "
            "container; 'jpeg' sample entries decode natively"
        )
    sw, sh = struct.unpack(">HH", payload[s + 40 : s + 44])

    # stsz: sample sizes. Bound the count BEFORE any allocation — a
    # mutated count field must fail as ValueError, not allocate a
    # 4-billion-entry list (every declared sample needs at least its
    # header's worth of bytes somewhere in the payload)
    s, e = boxes[b"stsz"]
    fixed, count = struct.unpack(">II", payload[s + 4 : s + 12])
    if count > len(payload):
        raise ValueError(
            f"MP4 stsz declares {count} samples in a "
            f"{len(payload)}-byte payload"
        )
    if fixed:
        if fixed * count > len(payload):
            raise ValueError("MP4 stsz fixed-size samples exceed the payload")
        sizes = [fixed] * count
    else:
        if s + 12 + 4 * count > e:
            raise ValueError("MP4 stsz table overruns its box")
        sizes = list(
            struct.unpack(f">{count}I", payload[s + 12 : s + 12 + 4 * count])
        )

    # stco/co64: chunk offsets
    if b"stco" in boxes:
        s, e = boxes[b"stco"]
        (nchunks,) = struct.unpack(">I", payload[s + 4 : s + 8])
        if s + 8 + 4 * nchunks > e:
            raise ValueError("MP4 stco table overruns its box")
        chunk_offs = list(
            struct.unpack(f">{nchunks}I", payload[s + 8 : s + 8 + 4 * nchunks])
        )
    else:
        s, e = boxes[b"co64"]
        (nchunks,) = struct.unpack(">I", payload[s + 4 : s + 8])
        if s + 8 + 8 * nchunks > e:
            raise ValueError("MP4 co64 table overruns its box")
        chunk_offs = list(
            struct.unpack(f">{nchunks}Q", payload[s + 8 : s + 8 + 8 * nchunks])
        )

    # stsc: samples-per-chunk runs -> per-sample (chunk, index-in-chunk)
    s, e = boxes[b"stsc"]
    (nruns,) = struct.unpack(">I", payload[s + 4 : s + 8])
    if s + 8 + 12 * nruns > e:
        raise ValueError("MP4 stsc table overruns its box")
    runs = [
        struct.unpack(">III", payload[s + 8 + 12 * i : s + 20 + 12 * i])
        for i in range(nruns)
    ]
    # Untrusted table: first_chunk is 1-based and must strictly increase
    # across runs. first_chunk = 0 would make range(first_chunk - 1, ...)
    # start at -1 and chunk_offs[-1] silently read the LAST chunk via
    # Python negative indexing — wrong-but-plausible offsets, not an error.
    prev_first = 0
    for first_chunk, _pc, _desc in runs:
        if not (1 <= first_chunk <= len(chunk_offs)):
            raise ValueError(
                f"MP4 stsc first_chunk {first_chunk} out of range "
                f"(1..{len(chunk_offs)})"
            )
        if first_chunk <= prev_first:
            raise ValueError(
                "MP4 stsc first_chunk values must strictly increase"
            )
        prev_first = first_chunk
    offsets: list[int] = []
    si = 0
    for ri, (first_chunk, per_chunk, _desc) in enumerate(runs):
        last_chunk = (
            runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunk_offs)
        )
        for ci in range(first_chunk - 1, last_chunk):
            if ci >= len(chunk_offs):
                raise ValueError("MP4 stsc references a missing chunk")
            off = chunk_offs[ci]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    break
                offsets.append(off)
                off += sizes[si]
                si += 1
    if si != len(sizes):
        raise ValueError(
            f"MP4 sample tables disagree: stsz lists {len(sizes)} samples, "
            f"stsc/stco lay out {si}"
        )

    from mongo_analyser_spark.operators.jpeg import decode_jpeg

    frames: list[bytearray] = []
    ch = None
    for off, sz in zip(offsets, sizes):
        if off + sz > len(payload):
            raise ValueError("MP4 sample overruns the payload")
        fw, fh, fch, px = decode_jpeg(payload[off : off + sz])
        if tkwh is not None and (fw, fh) != tkwh or (fw, fh) != (sw, sh):
            raise ValueError(
                f"MP4 'jpeg' sample is {fw}x{fh}, container says {sw}x{sh}"
            )
        if ch is None:
            ch = fch
        elif fch != ch:
            raise ValueError("MP4 samples disagree on channel count")
        frames.append(bytearray(px))
    if not frames:
        raise ValueError("MP4 video track has no samples")
    return sw, sh, ch, frames


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — raw planar video (round 15)
# ---------------------------------------------------------------------------
#
# The mjpegtools interchange format (fully public, plain-text header +
# raw planes) — the standard UNCOMPRESSED video carrier, and the one
# container whose samples need no entropy decode at all.

_Y4M_MAGIC = b"YUV4MPEG2 "


def _y4m_geometry(chroma: str, w: int, h: int) -> tuple[int, int]:
    """(frame_bytes, channels) for a colourspace tag."""
    if chroma in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        return w * h + 2 * (((w + 1) // 2) * ((h + 1) // 2)), 3
    if chroma == "C444":
        return 3 * w * h, 3
    if chroma == "Cmono":
        return w * h, 1
    raise NotImplementedError(f"Y4M colourspace {chroma}")


def encode_y4m(
    w: int,
    h: int,
    frames_y: list[bytes],
    chroma_planes: list[tuple[bytes, bytes]] | None = None,
    chroma: str = "C420jpeg",
    rate: str = "25:1",
) -> bytes:
    """YUV4MPEG2 writer: luma planes per frame plus optional explicit
    chroma planes (defaults to neutral 128s at the tag's geometry)."""
    frame_bytes, ch = _y4m_geometry(chroma, w, h)
    out = bytearray(
        _Y4M_MAGIC + f"W{w} H{h} F{rate} Ip A1:1 {chroma}\n".encode()
    )
    if chroma == "Cmono":
        csize = 0
    elif chroma == "C444":
        csize = w * h
    else:
        csize = ((w + 1) // 2) * ((h + 1) // 2)
    for i, y in enumerate(frames_y):
        if len(y) != w * h:
            raise ValueError("Y4M luma plane does not match dimensions")
        out += b"FRAME\n"
        out += y
        if ch == 3:
            if chroma_planes is not None:
                cb, cr = chroma_planes[i]
                if len(cb) != csize or len(cr) != csize:
                    raise ValueError("Y4M chroma plane size mismatch")
                out += cb + cr
            else:
                out += bytes([128]) * (2 * csize)
    return bytes(out)


@untrusted_decoder
def decode_y4m(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, channels, composed frames) from a YUV4MPEG2
    stream: C420*/C444 frames upsample chroma by pixel replication and
    convert full-range YCbCr->RGB with the JPEG integer convention
    (the _compose_pixels math); Cmono frames stay single-channel.
    Unknown colourspaces raise NotImplementedError by name; framing
    lies raise ValueError."""
    if payload[:10] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n", 10)
    if nl < 0:
        raise ValueError("Y4M header without newline")
    w = h = None
    chroma = "C420jpeg"  # the spec default when no C tag is present
    for tok in payload[10:nl].decode("ascii", "replace").split():
        if tok[:1] == "W":
            w = int(tok[1:])
        elif tok[:1] == "H":
            h = int(tok[1:])
        elif tok[:1] == "C":
            chroma = tok
        # F/I/A/X parameters do not affect pixel decode
    if not w or not h:
        raise ValueError("Y4M header missing dimensions")
    check_dims(w, h, "Y4M")
    frame_bytes, ch = _y4m_geometry(chroma, w, h)
    cw = (w + 1) // 2 if chroma.startswith("C420") else w
    frames: list[bytearray] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("Y4M frame header expected")
        pos = fnl + 1
        if pos + frame_bytes > n:
            raise ValueError("Y4M frame truncated")
        raw = payload[pos:pos + frame_bytes]
        pos += frame_bytes
        if ch == 1:
            frames.append(bytearray(raw))
            continue
        ysize = w * h
        if chroma == "C444":
            cb = raw[ysize:2 * ysize]
            cr = raw[2 * ysize:]
        else:
            csize = cw * ((h + 1) // 2)
            cb = raw[ysize:ysize + csize]
            cr = raw[ysize + csize:]
        rgb = bytearray(w * h * 3)
        half = chroma.startswith("C420")
        for yy in range(h):
            crow = (yy // 2 if half else yy) * cw
            for xx in range(w):
                yv = raw[yy * w + xx]
                ci = crow + (xx // 2 if half else xx)
                bv = cb[ci] - 128
                rv = cr[ci] - 128
                r = int(round(yv + 1.402 * rv))
                g = int(round(yv - 0.344136 * bv - 0.714136 * rv))
                bl = int(round(yv + 1.772 * bv))
                o = (yy * w + xx) * 3
                rgb[o] = 0 if r < 0 else (255 if r > 255 else r)
                rgb[o + 1] = 0 if g < 0 else (255 if g > 255 else g)
                rgb[o + 2] = 0 if bl < 0 else (255 if bl > 255 else bl)
        frames.append(rgb)
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return w, h, ch, frames


# ---------------------------------------------------------------------------
# unified multi-frame dispatch
# ---------------------------------------------------------------------------


@untrusted_decoder
def decode_frames(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, channels, composed frames) for every container
    whose frames decode in stdlib: APNG (and plain PNG as one frame),
    GIF (RGB frames), AVI with MJPEG or uncompressed-DIB video, 24-bit
    BMP and baseline JPEG as single frames. Inter-frame video codecs
    (MP4/WebM, H.264 in AVI, …) raise NotImplementedError at the exact
    point an ffmpeg call would go."""
    if payload[:8] == _PNG_SIG:
        return decode_apng(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, frames = decode_gif(payload)
        return w, h, 3, frames
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return decode_avi(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return decode_mp4(payload)
    if payload[:10] == _Y4M_MAGIC:
        return decode_y4m(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from mongo_analyser_spark.operators.vp8l import decode_webp_lossless

        w, h, ch, px = decode_webp_lossless(payload)
        return w, h, ch, [bytearray(px)]
    if payload[:2] == b"BM" or payload[:2] == b"\xff\xd8":
        from mongo_analyser_spark.operators.pixels import decode_pixels

        w, h, ch, px = decode_pixels(payload)
        return w, h, ch, [bytearray(px)]
    raise NotImplementedError(
        "frame decode beyond APNG/GIF/AVI(MJPEG|DIB)/MP4('jpeg')/BMP/"
        "baseline-JPEG requires a video codec (ffmpeg) not present in "
        "this container"
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
