"""Multimodal plumbing: pack → mapInPandas feature extraction (stubbed
decode — the container has no codecs; the Spark-side shape is real)."""

import hashlib

import pytest

from pyspark.sql import functions as F

from mongo_analyser_spark.operators.multimodal import (
    extract_media_features,
    fake_decode,
    pack_media,
    real_decode,
)


@pytest.fixture(scope="module")
def media_df(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another payload")], "id long, text string"
    )
    return df.select(
        "id", pack_media(F.encode("text", "utf-8"), "text/plain").alias("media")
    )


def test_extract_features_deterministic(spark, media_df):
    out = {r["id"]: r.asDict() for r in extract_media_features(media_df, "id", "media").collect()}
    expected = fake_decode(b"hello world")
    assert out[1]["media_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert out[1]["media_len"] == len(b"hello world")
    assert out[1]["width"] == expected["width"]
    assert out[1]["n_frames"] == expected["n_frames"]
    # batch plumbing preserves row count and ids
    assert set(out) == {1, 2}


def test_real_decoder_raises_only_for_unrecognized_payloads():
    # truncated magic / non-image bytes: the pixel-decode stub remains
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        real_decode(b"not an image at all")


# -- stdlib container-header fixtures (hand-assembled bytes, no codecs) ----


def _png_bytes(w=320, h=200, actl_frames=None):
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if actl_frames is not None:
        out += chunk(b"acTL", struct.pack(">II", actl_frames, 0))
    return out + chunk(b"IDAT", b"\x00") + chunk(b"IEND", b"")


def _jpeg_bytes(w=640, h=480):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif_bytes(w=99, h=44, frames=2):
    import struct

    hdr = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"  # no GCT
    img = b""
    for _ in range(frames):
        img += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        img += b"\x02" + b"\x01\x00" + b"\x00"  # LZW min + 1 sub-block + end
    return hdr + img + b"\x3b"


def _bmp_bytes(w=12, h=34):
    import struct

    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, -h) + b"\x00" * 20


def test_parse_image_headers_stdlib():
    from mongo_analyser_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png_bytes(320, 200)) == {
        "mime": "image/png", "width": 320, "height": 200, "n_frames": 1,
    }
    assert parse_image_header(_png_bytes(8, 8, actl_frames=7))["n_frames"] == 7
    assert parse_image_header(_jpeg_bytes(640, 480)) == {
        "mime": "image/jpeg", "width": 640, "height": 480, "n_frames": 1,
    }
    assert parse_image_header(_gif_bytes(99, 44, frames=3)) == {
        "mime": "image/gif", "width": 99, "height": 44, "n_frames": 3,
    }
    # top-down BMP stores a negative height; dims come back positive
    assert parse_image_header(_bmp_bytes(12, 34)) == {
        "mime": "image/bmp", "width": 12, "height": 34, "n_frames": 1,
    }
    assert parse_image_header(b"plain text") is None


def test_real_decode_end_to_end_in_spark(spark):
    """decoder="real" works in the Arrow-batched stage for header-parseable
    formats — the round-5 environmental gap, closed with stdlib parsing."""
    payloads = [
        (1, _png_bytes(320, 200), "image/png"),
        (2, _jpeg_bytes(640, 480), "image/jpeg"),
        (3, _gif_bytes(99, 44, frames=3), "image/gif"),
        (4, _bmp_bytes(12, 34), "image/bmp"),
    ]
    df = spark.createDataFrame(payloads, "id long, data binary, mime string")
    media = df.select(
        "id", F.struct(F.col("data"), F.col("mime")).alias("media")
    )
    out = {
        r["id"]: r.asDict()
        for r in extract_media_features(media, "id", "media", decoder="real").collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (320, 200)
    assert (out[2]["width"], out[2]["height"]) == (640, 480)
    assert (out[3]["width"], out[3]["height"], out[3]["n_frames"]) == (99, 44, 3)
    assert (out[4]["width"], out[4]["height"]) == (12, 34)
    assert out[1]["media_len"] == len(_png_bytes(320, 200))
    assert out[1]["media_md5"] == hashlib.md5(_png_bytes(320, 200)).hexdigest()


def test_custom_decoder_pluggable(spark, media_df):
    def decoder(payload: bytes):
        return {
            "media_len": len(payload),
            "media_md5": "x",
            "width": 1,
            "height": 2,
            "n_frames": 3,
        }

    rows = extract_media_features(media_df, "id", "media", decoder=decoder).collect()
    assert all(r["width"] == 1 and r["n_frames"] == 3 for r in rows)

def test_frame_sampling_expression(spark, media_df):
    from mongo_analyser_spark.operators.multimodal import (
        extract_media_features,
        sample_frame_indices,
    )

    feats = extract_media_features(media_df, "id", "media")
    out = feats.select(
        "id", "n_frames", sample_frame_indices(F.col("n_frames"), k=4).alias("frames")
    ).collect()
    for r in out:
        assert r["frames"] == sorted(set(r["frames"]))
        assert len(r["frames"]) == min(4, r["n_frames"])
        assert r["frames"][0] == 0 and r["frames"][-1] == r["n_frames"] - 1


def test_resize_fake_plumbing(spark, media_df):
    from mongo_analyser_spark.operators.multimodal import resize_media

    out = {r["id"]: r for r in resize_media(media_df, "id", "media", 224, 224).collect()}
    assert bytes(out[1]["data"]) == b"hello world"  # passthrough stub
    assert out[1]["width"] == out[1]["height"] == 224


def test_resize_real_is_explicit_stub(spark, media_df):
    from mongo_analyser_spark.operators.multimodal import resize_media

    with pytest.raises(Exception, match="NotImplementedError|real resize"):
        resize_media(media_df, "id", "media", 10, 10, resizer="real").collect()


def test_frame_sample_rows(spark):
    """One row per sampled frame: evenly-spread indices, deterministic
    digest-derived frame count and luma, single-frame clips yield one
    row at index 0."""
    import hashlib

    from pyspark.sql import functions as F

    from mongo_analyser_spark.operators.multimodal import (
        frame_sample,
        pack_media,
    )

    payloads = [b"hello world", b"x"]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "id long, data binary",
    ).select("id", pack_media(F.col("data"), "video/fake").alias("media"))
    rows = frame_sample(df, "id", "media", k=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for i, p in enumerate(payloads):
        d = hashlib.md5(p)
        n = 1 + d.digest()[2] % 32
        want = sorted({int(j * (n - 1) / 3) for j in range(4)}) if n > 1 else [0]
        got = sorted(r["frame_idx"] for r in by_id[i])
        assert by_id[i][0]["n_frames"] == n
        assert got == want
        for r in by_id[i]:
            expect = int(
                hashlib.md5(
                    f"{d.hexdigest()}:{r['frame_idx']}".encode()
                ).hexdigest()[:2],
                16,
            )
            assert r["frame_luma"] == expect


def test_sample_frame_pixel_rows_real_apng():
    """Real-decode sampling: composed APNG frames, even-spread indices,
    exact luma (64-pixel canvas => sum/64 exact)."""
    from mongo_analyser_spark.operators.frames import encode_apng
    from mongo_analyser_spark.operators.multimodal import (
        sample_frame_pixel_rows,
    )

    f0 = bytes(range(64))
    ups = [(0, r, 8, 1, bytes([200] * 8)) for r in range(5)]
    payload = encode_apng(8, 8, 1, [(0, 0, 8, 8, f0)] + ups)
    rows = sample_frame_pixel_rows(payload, k=4)
    # 6 frames, k=4 -> floor(i*5/3) = 0,1,3,5
    assert [(n, fi) for n, fi, _ in rows] == [(6, 0), (6, 1), (6, 3), (6, 5)]
    import math

    def luma(upto):
        canvas = bytearray(f0)
        for r in range(upto):
            canvas[r * 8:(r + 1) * 8] = bytes([200] * 8)
        return math.floor(sum(canvas) / 64 * 1e4 + 0.5) / 1e4

    assert [l for _, _, l in rows] == [luma(0), luma(1), luma(3), luma(5)]


def test_sample_frame_pixel_rows_video_fallback_matches_fake_contract():
    """True video containers keep the md5 stand-in, bit-compatible with
    the Column-expression frame_sample (fake contract)."""
    from mongo_analyser_spark.operators.multimodal import (
        sample_frame_pixel_rows,
    )

    # round 13: ISO-BMFF now parses natively, so the stand-in cases are
    # (a) containers the dispatcher doesn't recognize at all, and (b) a
    # REAL MP4 whose sample entry is a gated inter-frame codec
    payloads = [b"\x1aE\xdf\xa3 matroska/webm stays codec-bound"]
    from mongo_analyser_spark.operators.frames import encode_mp4_mjpeg
    from mongo_analyser_spark.operators.jpeg import encode_jpeg

    avc = bytearray(
        encode_mp4_mjpeg(8, 8, [encode_jpeg(8, 8, 1, bytes([128] * 64))])
    )
    i = avc.find(b"jpeg", avc.find(b"stsd"))
    avc[i:i + 4] = b"avc1"
    payloads.append(bytes(avc))
    for payload in payloads:
        h = hashlib.md5(payload).hexdigest()
        n = 1 + int(h[4:6], 16) % 32
        rows = sample_frame_pixel_rows(payload, k=4)
        assert all(r[0] == n for r in rows)
        for _, fi, luma in rows:
            exp = int(hashlib.md5(f"{h}:{fi}".encode()).hexdigest()[:2], 16)
            assert luma == float(exp)
    # structural garbage behind a valid ftyp is a hard error (the
    # GIF/APNG malformed-container contract), NOT a silent stand-in
    import pytest

    with pytest.raises(ValueError):
        sample_frame_pixel_rows(b"\x00\x00\x00\x18ftypmp42-fake-video", k=4)


def test_frame_pixel_sample_dataframe_stage(spark):
    """The DataFrame operator: Arrow stage over packed media, one row
    per sampled frame, luma double."""
    from mongo_analyser_spark.operators.frames import encode_gif
    from mongo_analyser_spark.operators.multimodal import (
        frame_pixel_sample,
        sample_frame_pixel_rows,
    )

    payloads = [
        (1, encode_gif(8, 8, [[i % 128 for i in range(64)],
                              [(i + 7) % 128 for i in range(64)]],
                       palette_bits=8)),
        (2, encode_gif(4, 4, [[5] * 16], palette_bits=8)),
    ]
    df = spark.createDataFrame(payloads, "id long, data binary").select(
        "id", pack_media(F.col("data"), "image/gif").alias("media")
    )
    out = frame_pixel_sample(df, "id", "media", k=4).collect()
    got = sorted((r["id"], r["n_frames"], r["frame_idx"], r["frame_luma"])
                 for r in out)
    exp = []
    for rid, p in payloads:
        for n, fi, luma in sample_frame_pixel_rows(p, 4):
            exp.append((rid, n, fi, luma))
    assert got == sorted(exp)


def test_parse_video_header_avi_and_mp4():
    """Header-only video metadata (round 13): geometry + frame count
    without decoding a single sample — so it also works when the codec
    inside is a gated inter-frame one."""
    from mongo_analyser_spark.operators.frames import (
        encode_avi_mjpeg,
        encode_mp4_mjpeg,
    )
    from mongo_analyser_spark.operators.jpeg import encode_jpeg
    from mongo_analyser_spark.operators.multimodal import (
        parse_video_header,
        real_decode,
    )

    jpgs = [encode_jpeg(16, 16, 1, bytes([128] * 256)) for _ in range(3)]
    avi = encode_avi_mjpeg(16, 16, jpgs)
    hd = parse_video_header(avi)
    assert hd == {
        "mime": "video/x-msvideo", "width": 16, "height": 16, "n_frames": 3,
    }
    mp4 = encode_mp4_mjpeg(16, 16, jpgs)
    hd = parse_video_header(mp4)
    assert hd == {"mime": "video/mp4", "width": 16, "height": 16, "n_frames": 3}
    # header parse is codec-independent: an avc1 stsd entry still yields
    # metadata (decode_mp4 would gate it)
    bad = bytearray(mp4)
    i = bad.find(b"jpeg", bad.find(b"stsd"))
    bad[i:i + 4] = b"avc1"
    assert parse_video_header(bytes(bad))["n_frames"] == 3
    # real_decode picks video headers up after the image dispatch
    feats = real_decode(avi)
    assert (feats["width"], feats["height"], feats["n_frames"]) == (16, 16, 3)
    assert parse_video_header(b"not a container at all") is None


def test_parse_audio_header_wav_flac_mp3():
    import struct

    from mongo_analyser_spark.operators.audio import (
        encode_wav_ex,
        parse_audio_header,
    )

    hd = parse_audio_header(encode_wav_ex(8000, [[0.1] * 100] * 2, fmt=3))
    assert (hd["codec"], hd["sample_rate"], hd["channels"],
            hd["n_samples"]) == ("ieee_float", 8000, 2, 100)
    # FLAC STREAMINFO: 44.1k stereo 16-bit, 12345 total samples
    bits36 = (44100 << 44) | (1 << 41) | (15 << 36) | 12345
    si = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
          + bits36.to_bytes(8, "big") + b"\x00" * 16)
    flac = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    hd = parse_audio_header(flac)
    assert (hd["codec"], hd["sample_rate"], hd["channels"], hd["bits"],
            hd["n_samples"]) == ("flac", 44100, 2, 16, 12345)
    # MPEG1 Layer III 128 kbps 44.1 kHz stereo, 3 chained frames behind
    # an ID3v2 tag — the header walk counts them without decoding
    hdr = 0xFFE00000 | (3 << 19) | (1 << 17) | (9 << 12)
    fl = 144 * 128000 // 44100
    frame = hdr.to_bytes(4, "big") + b"\x00" * (fl - 4)
    mp3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 0]) + frame * 3
    hd = parse_audio_header(mp3)
    assert (hd["codec"], hd["sample_rate"], hd["n_frames"],
            hd["n_samples"]) == ("mp3", 44100, 3, 3 * 1152)
    assert parse_audio_header(b"not audio") is None
    # malformed recognized container raises
    import pytest

    with pytest.raises(ValueError, match="STREAMINFO"):
        parse_audio_header(b"fLaC" + bytes([0x84]) + (3).to_bytes(3, "big")
                           + b"xyz")


def test_parse_image_header_webp_variants():
    import struct

    from mongo_analyser_spark.operators.multimodal import parse_image_header

    def riff_webp(chunk_tag, chunk_data):
        chunk = chunk_tag + struct.pack("<I", len(chunk_data)) + chunk_data
        if len(chunk_data) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    # VP8 lossy: 3-byte frame tag + start code + 14-bit dims
    vp8 = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
           + struct.pack("<HH", 320, 240) + b"\x00" * 8)
    hd = parse_image_header(riff_webp(b"VP8 ", vp8))
    assert hd == {"mime": "image/webp", "width": 320, "height": 240,
                  "n_frames": 1}
    # VP8L lossless: 0x2f then packed 14-bit (w-1, h-1)
    bits = (99 | (49 << 14))
    vp8l = b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 4
    hd = parse_image_header(riff_webp(b"VP8L", vp8l))
    assert (hd["width"], hd["height"]) == (100, 50)
    # VP8X extended with the ANIM flag
    vp8x = (bytes([0x02]) + b"\x00" * 3
            + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"))
    hd = parse_image_header(riff_webp(b"VP8X", vp8x))
    assert (hd["width"], hd["height"], hd["n_frames"]) == (640, 480, 2)
