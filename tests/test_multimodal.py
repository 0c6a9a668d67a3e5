"""Multimodal tests: real PNG codec (encode/decode round trip, all
filter types, CRC) + the Spark-side pipeline (schema, Arrow batching,
one-to-many expansion). JPEG is real since round 3 (see
tests/test_jpeg.py); video frame sampling is real since round 4
(MJPEG-in-AVI via the RIFF walker + in-repo JPEG codec — no ffmpeg)."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import multimodal as mm
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    return mm.synthesize_media(docs).cache()


# -- codec unit tests (no Spark) --------------------------------------------


def test_png_round_trip_gray_and_rgb():
    pix = bytes(range(64))
    assert mm.decode_png(mm.encode_png(pix, 8, 8, 1)) == (8, 8, 1, pix)
    rgb = bytes((i * 7) % 256 for i in range(5 * 4 * 3))
    assert mm.decode_png(mm.encode_png(rgb, 5, 4, 3)) == (5, 4, 3, rgb)


def test_png_decode_all_filter_types():
    """Hand-encode one scanline per PNG filter (None/Sub/Up/Average/
    Paeth) and require exact defiltered pixels."""
    w, h = 4, 5
    img = (np.arange(w * h, dtype=np.uint8).reshape(h, w) * 13).astype(np.uint8)
    lines, prev = [], np.zeros(w, dtype=int)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].astype(int)
        enc = np.zeros(w, dtype=int)
        for x in range(w):
            a = cur[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + bytes(enc.tolist()))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + mm._png_chunk(b"IEND", b"")
    )
    assert mm.decode_png(data) == (w, h, 1, img.tobytes())


def test_png_decode_rejects_corruption():
    png = bytearray(mm.encode_png(bytes(64), 8, 8, 1))
    png[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError):
        mm.decode_png(bytes(png))
    with pytest.raises(ValueError):
        mm.decode_png(b"not a png at all")


# -- Spark pipeline ----------------------------------------------------------


def test_media_schema_and_payloads(media):
    from e_commerce_lakehouse_spark.operators.jpeg import decode_jpeg

    assert set(media.columns) == {"media_id", "kind", "payload", "mime", "meta"}
    rows = media.collect()
    seen = set()
    for row in rows:
        payload = bytes(row["payload"])
        mime = mm.sniff_mime(payload)
        # the mime column (JVM-side md5 rule) must agree with the
        # payload bytes the Arrow kernel actually wrote
        assert row["mime"] == mime
        seen.add(mime)
        decode = mm.decode_png if mime == "image/png" else decode_jpeg
        # every synthesized payload is a real decodable 8x8 gray image
        assert decode(payload)[:3] == (8, 8, 1)
    # the 50-doc sample covers the full PNG/JPEG container mix
    assert seen == {"image/png", "image/jpeg"}


def test_feature_extraction(spark, media):
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["sniffed_mime"] in ("image/png", "image/jpeg")
        assert r["n_bytes"] > len(mm.PNG_SIG)
        assert len(r["digest"]) == 32
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    r0 = rows[0]
    assert r0["digest"] == hashlib.md5(raw[r0["media_id"]]).hexdigest()


def _mk_png(w, h, depth, color, raw_rows, plte=None, trns=None):
    """Hand-assemble a PNG from pre-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    out = mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += mm._png_chunk(b"PLTE", plte)
    if trns is not None:
        out += mm._png_chunk(b"tRNS", trns)
    out += mm._png_chunk(b"IDAT", zlib.compress(raw_rows))
    return out + mm._png_chunk(b"IEND", b"")


def test_png_palette_8bit_lut_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0, 1, 2, 1]) + b"\x00" + bytes([2, 2, 0, 0])
    w, h, c, px = mm.decode_png(_mk_png(4, 2, 8, 3, raw, plte=plte))
    assert (w, h, c) == (4, 2, 3)
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    want = lut[np.array([[0, 1, 2, 1], [2, 2, 0, 0]])]
    assert px == want.tobytes()


def test_png_palette_subbyte_depths():
    # 2-bit, width 5 (stride 2 bytes, 6 pad bits): indices 0,1,2,3,1
    plte = bytes(range(12))  # 4 colors
    packed = bytes([0b00011011, 0b01000000])
    w, h, c, px = mm.decode_png(_mk_png(5, 1, 2, 3, b"\x00" + packed, plte=plte))
    assert (w, h, c) == (5, 1, 3)
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert px == lut[np.array([0, 1, 2, 3, 1])].tobytes()
    # 1-bit two-color: 10110000 -> indices 1,0,1,1
    plte2 = bytes([0, 0, 0, 255, 255, 255])
    w, h, c, px = mm.decode_png(
        _mk_png(4, 1, 1, 3, b"\x00" + bytes([0b10110000]), plte=plte2)
    )
    assert (w, h, c) == (4, 1, 3)
    assert px == lut2b(plte2, [1, 0, 1, 1])


def lut2b(plte, idx):
    return np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)[np.array(idx)].tobytes()


def test_png_palette_trns_yields_rgba():
    plte = bytes([10, 20, 30, 40, 50, 60])
    raw = b"\x00" + bytes([0, 1])
    w, h, c, px = mm.decode_png(_mk_png(2, 1, 8, 3, raw, plte=plte, trns=bytes([128])))
    assert (w, h, c) == (2, 1, 4)
    assert px == bytes([10, 20, 30, 128, 40, 50, 60, 255])


def test_png_16bit_downshift_and_bpp2_defilter():
    # 16-bit gray, 3x1, filter None: high bytes survive the downshift
    samples = struct.pack(">3H", 0x1234, 0xABCD, 0x00FF)
    w, h, c, px = mm.decode_png(_mk_png(3, 1, 16, 0, b"\x00" + samples))
    assert (w, h, c, px) == (3, 1, 1, bytes([0x12, 0xAB, 0x00]))
    # Sub filter at 16-bit: bpp is 2 BYTES, so defiltering must reach
    # back one full sample, not one byte
    orig = np.frombuffer(struct.pack(">4H", 0x1000, 0x2010, 0x3020, 0x4030), np.uint8)
    filt = orig.copy()
    filt[2:] = (orig[2:].astype(int) - orig[:-2].astype(int)) % 256
    w, h, c, px = mm.decode_png(_mk_png(4, 1, 16, 0, b"\x01" + filt.tobytes()))
    assert px == bytes([0x10, 0x20, 0x30, 0x40])


def test_png_alpha_roundtrip_and_boundaries():
    # RGBA and gray+alpha round-trip through encode_png/decode_png
    rgba = bytes(range(32))  # 2x4 RGBA
    assert mm.decode_png(mm.encode_png(rgba, 4, 2, 4)) == (4, 2, 4, rgba)
    ga = bytes(range(16))  # 4x2 gray+alpha
    assert mm.decode_png(mm.encode_png(ga, 4, 2, 2)) == (4, 2, 2, ga)
    # Adam7 interlace is supported: a 1x1 interlaced gray PNG is a
    # single pass-1 sample
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    adam = mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
    assert mm.decode_png(
        adam
        + mm._png_chunk(b"IDAT", zlib.compress(b"\x00\x7f"))
        + mm._png_chunk(b"IEND", b"")
    ) == (1, 1, 1, b"\x7f")
    # unknown interlace methods stay an honest boundary
    ihdr_bad = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)
    bad = mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr_bad)
    with pytest.raises(NotImplementedError, match="interlace"):
        mm.decode_png(bad + mm._png_chunk(b"IDAT", zlib.compress(b"\x00\x00")) + mm._png_chunk(b"IEND", b""))
    # palette without PLTE is corrupt, not silently black
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_png(_mk_png(1, 1, 8, 3, b"\x00\x00"))


def test_sniff_mime_table():
    assert mm.sniff_mime(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    assert mm.sniff_mime(b"RIFF....WAVE") == "audio/wav"
    assert mm.sniff_mime(b"RIFF....AVI ") == "video/avi"
    assert mm.sniff_mime(b"RIFF....WEBP") == "application/octet-stream"
    assert mm.sniff_mime(b"\x00\x00\x00\x18ftypmp42") == "video/mp4"
    assert mm.sniff_mime(None) == "application/octet-stream"
    assert mm.sniff_mime(b"plain") == "application/octet-stream"


def test_decode_images_real(spark, media):
    from e_commerce_lakehouse_spark.operators.jpeg import decode_jpeg

    decoded = mm.decode_images(media)
    rows = decoded.collect()
    assert len(rows) == 50
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows:
        assert (r["width"], r["height"], r["channels"]) == (8, 8, 1)
        # distributed decode == local reference decode, byte-exact
        # (per-payload codec dispatch: PNG or baseline/progressive JPEG)
        payload = raw[r["media_id"]]
        decode = mm.decode_png if mm.sniff_mime(payload) == "image/png" else decode_jpeg
        assert bytes(r["pixels"]) == decode(payload)[3]


def test_decode_images_rejects_truncated_jpeg(spark):
    # JPEG decode is REAL now (operators/jpeg.py, round 3) — a
    # truncated/garbage JPEG must error loudly, not pass through
    jpeg_like = spark.createDataFrame(
        [(1, "image", bytearray(b"\xff\xd8\xff\xe0fakejpeg"))],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception) as ei:
        mm.decode_images(jpeg_like).collect()
    assert "marker" in str(ei.value) or "SOS" in str(ei.value)


def test_resize_real_nearest_neighbor(spark, media):
    decoded = mm.decode_images(media)
    resized = mm.resize_images(decoded, out_w=4, out_h=4).collect()
    assert len(resized) == 50
    src = {r["media_id"]: bytes(r["pixels"]) for r in decoded.collect()}
    for r in resized:
        assert (r["width"], r["height"]) == (4, 4)
        assert len(bytes(r["pixels"])) == 4 * 4 * r["channels"]
        # nearest-neighbor on an 8x8 source with out=4: pick every 2nd px
        img = np.frombuffer(src[r["media_id"]], dtype=np.uint8).reshape(8, 8)
        assert bytes(r["pixels"]) == img[::2, ::2].tobytes()


def test_wav_round_trip_mono_and_stereo():
    mono = (np.sin(np.arange(800) / 5.0) * 3000).astype(np.int16)
    rate, ch, out = mm.decode_wav(mm.encode_wav(mono, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, ch, out = mm.decode_wav(mm.encode_wav(stereo, 44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, stereo)


def _wav_bytes(audio_fmt, channels, rate, bits, payload, fact=None, fmt_extra=b""):
    """Hand-rolled RIFF container for codec-family tests."""
    block = channels * max(bits // 8, 1)
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, channels, rate, rate * block, block, bits
    ) + fmt_extra
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        body += b"\x00"
    if fact is not None:
        body += b"fact" + struct.pack("<II", 4, fact)
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_rejects_unknown_codecs():
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxJUNK")
    # a genuinely external codec (GSM 6.10, fmt tag 0x31) refuses
    with pytest.raises(NotImplementedError):
        mm.decode_wav(_wav_bytes(0x31, 1, 8000, 0, b""))
    # and so does an unknown EXTENSIBLE SubFormat
    sub = struct.pack("<H", 0x31) + bytes(14)
    extra = struct.pack("<HHI", 22, 16, 0x4) + sub
    with pytest.raises(NotImplementedError):
        mm.decode_wav(_wav_bytes(0xFFFE, 1, 8000, 16, b"", fmt_extra=extra))


def test_wav_g711_mulaw_alaw_match_audioop():
    """G.711 decode (WAV fmt tags 7 / 6) equals CPython's audioop —
    an INDEPENDENT implementation of the same ITU tables — across all
    256 code bytes, and the header-only frame count needs no fact
    chunk (one byte per sample, no padding ambiguity)."""
    audioop = pytest.importorskip("audioop")
    codes = bytes(range(256)) * 2
    for tag, ref_fn in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        wav = _wav_bytes(tag, 1, 8000, 8, codes)
        rate, ch, out = mm.decode_wav(wav)
        assert (rate, ch) == (8000, 1)
        ref = np.frombuffer(ref_fn(codes, 2), dtype="<i2")
        assert np.array_equal(out[:, 0], ref)
        assert mm.wav_header_info(wav) == (8000, 1, 512)
    # stereo interleave survives the table gather
    wav = _wav_bytes(7, 2, 8000, 8, bytes([0x00, 0xFF] * 10))
    _, _, out = mm.decode_wav(wav)
    assert out.shape == (10, 2)
    assert len(set(out[:, 0])) == 1 and len(set(out[:, 1])) == 1


def test_wav_pcm_widths_and_float():
    """8/24/32-bit integer PCM and 32/64-bit float PCM land as the
    canonical int16 (recenter / high-16 / clip-scale), with
    header-only frame counts from the right byte widths."""
    # u8: recentered, full scale
    wav = _wav_bytes(1, 1, 8000, 8, bytes([0, 128, 255]))
    _, _, out = mm.decode_wav(wav)
    assert list(out[:, 0]) == [-32768, 0, (255 - 128) << 8]
    assert mm.wav_header_info(wav) == (8000, 1, 3)
    # 24-bit: high 16 bits, sign preserved
    vals = [-(1 << 23), -1, 0, 1 << 22, (1 << 23) - 1]
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    wav = _wav_bytes(1, 1, 44100, 24, payload)
    _, _, out = mm.decode_wav(wav)
    assert list(out[:, 0]) == [v >> 8 for v in vals]
    assert mm.wav_header_info(wav) == (44100, 1, 5)
    # 32-bit int: high 16 bits
    arr = np.array([-(1 << 31), 0, (1 << 31) - 1], dtype="<i4")
    wav = _wav_bytes(1, 1, 16000, 32, arr.tobytes())
    _, _, out = mm.decode_wav(wav)
    assert list(out[:, 0]) == [-32768, 0, 32767]
    # float32: clipped + scaled; float64 likewise
    f = np.array([-2.0, -1.0, 0.0, 0.5, 1.0, 2.0], dtype="<f4")
    wav = _wav_bytes(3, 1, 16000, 32, f.tobytes())
    _, _, out = mm.decode_wav(wav)
    assert list(out[:, 0]) == [-32767, -32767, 0, 16384, 32767, 32767]
    f64 = np.array([-0.25, 0.25], dtype="<f8")
    wav = _wav_bytes(3, 1, 16000, 64, f64.tobytes())
    _, _, out = mm.decode_wav(wav)
    assert list(out[:, 0]) == [-8192, 8192]
    assert mm.wav_header_info(wav) == (16000, 1, 2)


def test_wav_extensible_wraps_pcm16():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) containers resolve through the
    SubFormat GUID's leading WORD — a 16-bit PCM stream wrapped in the
    Windows >2-channel container decodes identically to the plain
    tag."""
    samples = np.arange(-6, 6, dtype=np.int16).reshape(-1, 3)
    sub = struct.pack("<H", 1) + bytes(14)
    extra = struct.pack("<HHI", 22, 16, 0x7) + sub
    wav = _wav_bytes(
        0xFFFE, 3, 48000, 16, samples.tobytes(), fmt_extra=extra
    )
    rate, ch, out = mm.decode_wav(wav)
    assert (rate, ch) == (48000, 3)
    assert np.array_equal(out, samples)
    assert mm.wav_header_info(wav) == (48000, 3, 4)


def test_audio_pipeline_real(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(30)
    audio = mm.synthesize_media(docs, kind="audio")
    row = audio.first()
    assert mm.sniff_mime(bytes(row["payload"])) == "audio/wav"
    feats = mm.extract_audio_features(audio).collect()
    assert len(feats) == 30
    raw = {r["media_id"]: bytes(r["payload"]) for r in audio.collect()}
    seen_channels = set()
    for r in feats:
        assert r["sample_rate"] == 16000
        assert r["channels"] in (1, 2)  # d[3] parity mixes mono/stereo
        seen_channels.add(r["channels"])
        assert r["duration_ms"] == r["n_frames"] * 1000 // 16000
        assert 0 < r["rms"] <= r["peak"] <= 32767
        # a sine tone crosses zero ~2x per period: ZCR tracks frequency
        rate, ch, samples = mm.decode_wav(raw[r["media_id"]])
        assert (r["n_frames"], r["channels"]) == (len(samples), ch)
    assert seen_channels == {1, 2}  # 30 docs: both layouts occur
    # image payloads are skipped, not mangled
    images = mm.synthesize_media(docs, kind="image")
    assert mm.extract_audio_features(images).count() == 0


def test_avi_container_roundtrip():
    """encode_avi → iter_avi_frames returns the exact JPEG chunk bytes
    in order, and the container carries the spec headers (hdrl/avih/
    strh 'vids'+'MJPG'/movi/idx1)."""
    from e_commerce_lakehouse_spark.operators.jpeg import encode_jpeg

    frames = [
        encode_jpeg(bytes([(i * 31 + j) % 256 for j in range(64)]), 8, 8, 1)
        for i in range(4)
    ]
    avi = mm.encode_avi(frames, 8, 8, fps=4)
    assert mm.sniff_mime(avi) == "video/avi"
    for tag in (b"hdrl", b"avih", b"strh", b"vids", b"MJPG", b"movi", b"idx1"):
        assert tag in avi, tag
    assert list(mm.iter_avi_frames(avi)) == frames
    # odd-length frames are word-padded in the container, not corrupted
    odd = [b"\xff\xd8" + b"x" * 7 + b"\xff\xd9"]  # 11 bytes
    assert list(mm.iter_avi_frames(mm.encode_avi(odd, 8, 8))) == odd
    with pytest.raises(ValueError, match="RIFF/AVI"):
        list(mm.iter_avi_frames(b"RIFF\x04\x00\x00\x00WAVE"))


def test_frame_sampling_real_decode(spark):
    """REAL frame sampling: synthesized MJPEG AVIs → sample_frames
    extracts and DECODES every frame with the in-repo JPEG codec;
    frame count matches the synthesis parameter (2 + d[3] % 6) and
    pixels match a local reference decode byte-for-byte."""
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    videos = mm.synthesize_media(docs, kind="video")
    raw = {r["media_id"]: bytes(r["payload"]) for r in videos.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    frames = mm.sample_frames(videos, every_n=1).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(raw)
    from e_commerce_lakehouse_spark.operators.jpeg import decode_jpeg

    for mid, rs in by_media.items():
        d = hashlib.md5((texts[mid] or "").encode()).digest()
        assert len(rs) == 2 + d[3] % 6  # synthesis-deterministic count
        local = [decode_jpeg(f) for f in mm.iter_avi_frames(raw[mid])]
        rs.sort(key=lambda r: r["frame_no"])
        for r, (w, h, c, px) in zip(rs, local):
            assert (r["width"], r["height"], r["channels"]) == (w, h, c) == (8, 8, 1)
            assert bytes(r["pixels"]) == px


def test_frame_sampling_every_n_and_boundaries(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(12)
    videos = mm.synthesize_media(docs, kind="video")
    all_f = mm.sample_frames(videos, every_n=1)
    some_f = mm.sample_frames(videos, every_n=2)
    # every-2nd sampling keeps exactly the even frame_nos
    kept = {(r["media_id"], r["frame_no"]) for r in some_f.collect()}
    want = {
        (r["media_id"], r["frame_no"])
        for r in all_f.collect()
        if r["frame_no"] % 2 == 0
    }
    assert kept == want
    # non-video rows are dropped, not mangled
    images = mm.synthesize_media(docs, kind="image")
    assert mm.sample_frames(images, every_n=1).count() == 0
    with pytest.raises(ValueError, match="every_n"):
        mm.sample_frames(videos, every_n=0)
    # a non-MJPEG frame chunk fails loudly (honest codec boundary)
    bogus = mm.encode_avi([b"NOTJPEGDATA!"], 8, 8)
    bad = spark.createDataFrame(
        [(1, "video", bytearray(bogus))], "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="MJPEG"):
        mm.sample_frames(bad, every_n=1).collect()


def test_media_manifest_equals_composed_operators(spark):
    """The fused one-pass manifest kernel must produce EXACTLY the rows
    the composed form (sniff ⊕ image decode ⊕ audio decode ⊕ frame
    sampling + joins) produces — it is an I/O optimization (one payload
    scan instead of two, no joins), not a semantic variant."""
    docs = load_table(spark, SF_SMALL, "documents").limit(25)
    frames = [mm.synthesize_media(docs, kind=k) for k in ("image", "audio", "video")]
    union = frames[0].unionByName(frames[1]).unionByName(frames[2]).localCheckpoint()
    images = union.filter(F.col("kind") == "image")
    audio = union.filter(F.col("kind") == "audio")
    videos = union.filter(F.col("kind") == "video")

    fused = {
        (r["media_id"], r["kind"]): (
            r["sniffed_mime"], r["width"], r["height"], r["channels"],
            r["duration_ms"], r["n_frames"],
        )
        for r in mm.media_manifest(union).collect()
    }
    sniff = {
        (r["media_id"], r["kind"]): r["sniffed_mime"]
        for r in mm.extract_features(union).collect()
    }
    dims = {r["media_id"]: r for r in mm.decode_images(images).collect()}
    sound = {r["media_id"]: r for r in mm.extract_audio_features(audio).collect()}
    vframes = {}
    for r in mm.sample_frames(videos, every_n=1).collect():
        vframes.setdefault(r["media_id"], []).append(r)

    composed = {}
    for (mid, kind), mime in sniff.items():
        w = h = c = dur = nf = None
        if kind == "image":
            d = dims[mid]
            w, h, c = d["width"], d["height"], d["channels"]
        elif kind == "audio":
            s = sound[mid]
            c, dur, nf = s["channels"], s["duration_ms"], s["n_frames"]
        else:
            fs = vframes[mid]
            nf = len(fs)
            w = max(f["width"] for f in fs)
            h = max(f["height"] for f in fs)
            c = max(f["channels"] for f in fs)
        composed[(mid, kind)] = (mime, w, h, c, dur, nf)
    assert fused == composed
    # unknown payloads pass through with a sniff row, null modality cols
    odd = spark.createDataFrame(
        [(99, "blob", bytearray(b"not a known container"))],
        "media_id long, kind string, payload binary",
    )
    row = mm.media_manifest(odd).collect()[0]
    assert row["sniffed_mime"] == "application/octet-stream"
    assert row["width"] is None and row["n_frames"] is None


def test_resize_bilinear_interpolates(spark, media):
    """Bilinear mode: identity-size resize reproduces the source
    exactly (sample grid aligns with pixel centers), and a 2x
    downscale of a linear horizontal ramp stays a linear ramp (the
    interpolation property nearest-neighbor lacks)."""
    decoded = mm.decode_images(media)
    same = mm.resize_images(decoded, out_w=8, out_h=8, method="bilinear")
    src = {r["media_id"]: bytes(r["pixels"]) for r in decoded.collect()}
    for r in same.collect():
        assert bytes(r["pixels"]) == src[r["media_id"]]

    ramp = np.tile(np.arange(0, 256, 16, dtype=np.uint8), (4, 1))  # 4x16 ramp
    frame = spark.createDataFrame(
        [(1, 16, 4, 1, bytearray(ramp.tobytes()))],
        "media_id long, width int, height int, channels int, pixels binary",
    )
    out = mm.resize_images(frame, out_w=8, out_h=4, method="bilinear").collect()[0]
    vals = np.frombuffer(bytes(out["pixels"]), dtype=np.uint8).reshape(4, 8)
    diffs = np.diff(vals[0].astype(int))
    assert all(d == diffs[0] for d in diffs[1:-1])  # interior steps uniform
    import pytest as _pytest
    with _pytest.raises(Exception):
        mm.resize_images(decoded, method="bicubic").collect()


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x11)
# ---------------------------------------------------------------------------


def test_adpcm_roundtrip_snr_and_exact_length():
    """Lossy but bounded: a sine tone round-trips at > 30 dB SNR with
    the exact frame count restored from the fact chunk (including
    non-block-multiple lengths), at ~3.8x compression."""
    n = 5000
    ts = np.arange(n) / 16000.0
    tone = (np.sin(2 * np.pi * 440 * ts) * 12000).astype(np.int16)
    wav = mm.encode_wav_adpcm(tone, 16000)
    rate, ch, out = mm.decode_wav(wav)
    out = out.reshape(-1)
    assert (rate, ch, len(out)) == (16000, 1, n)
    noise = (out.astype(np.float64) - tone.astype(np.float64)) ** 2
    snr = 10 * np.log10((tone.astype(np.float64) ** 2).mean() / noise.mean())
    assert snr > 30.0
    assert len(wav) < len(tone.tobytes()) // 3


def test_adpcm_edge_lengths():
    for m in (0, 1, 2, 504, 505, 506, 1011):
        t = (np.arange(m, dtype=np.int64) % 200 - 100).astype(np.int16)
        w = mm.encode_wav_adpcm(t, 8000)
        r, c, o = mm.decode_wav(w)
        assert (r, c, len(o.reshape(-1))) == (8000, 1, m)


def test_adpcm_batch_encode_byte_identical():
    """The batched encoder (one coder pass over every payload's
    stacked block rows — the make_wav kernel's shape) must be
    BYTE-identical to the per-payload path, across mixed mono/stereo
    and edge lengths including the empty batch."""
    payloads = []
    for i, m in enumerate((0, 1, 2, 504, 505, 506, 1011, 2048, 5680)):
        t = ((np.arange(m, dtype=np.int64) * (i + 3)) % 400 - 200).astype(np.int16)
        if i % 2:
            t = np.stack([t, (t // 2).astype(np.int16)], axis=1)
        payloads.append(t)
    singles = [mm.encode_wav_adpcm(t, 16000) for t in payloads]
    assert mm.encode_wav_adpcm_batch(payloads, 16000) == singles
    assert mm.encode_wav_adpcm_batch([], 16000) == []


def test_decode_wav_batch_identical():
    """decode_wav_batch == per-payload decode_wav across PCM, G.711-
    free synthetic mixes of mono/stereo PCM and ADPCM — the decode
    mirror of the batch encoder's identity."""
    payloads = []
    for i, m in enumerate((1, 2, 504, 505, 1011, 2048)):
        t = ((np.arange(m, dtype=np.int64) * (i + 5)) % 500 - 250).astype(np.int16)
        if i % 2:
            t = np.stack([t, (t // 3).astype(np.int16)], axis=1)
        payloads.append(
            mm.encode_wav_adpcm(t, 16000) if i % 3 else mm.encode_wav(t, 16000)
        )
    singles = [mm.decode_wav(p) for p in payloads]
    batch = mm.decode_wav_batch(payloads)
    assert len(batch) == len(singles)
    for (r1, c1, s1), (r2, c2, s2) in zip(singles, batch):
        assert (r1, c1) == (r2, c2)
        assert np.array_equal(s1, s2)
    assert mm.decode_wav_batch([]) == []


def test_adpcm_deterministic_and_sniffable():
    t = (np.arange(1000, dtype=np.int64) % 500 - 250).astype(np.int16)
    a = mm.encode_wav_adpcm(t, 16000)
    assert a == mm.encode_wav_adpcm(t, 16000)
    assert mm.sniff_mime(a) == "audio/wav"


def test_adpcm_first_sample_exact():
    """The block header carries the first sample verbatim — it must
    decode bit-exact even though the stream is lossy."""
    t = np.array([-32768, 100, 200, 32767], dtype=np.int16)
    _, _, o = mm.decode_wav(mm.encode_wav_adpcm(t, 8000))
    assert o.reshape(-1)[0] == -32768


def test_stereo_adpcm_roundtrip():
    """Stereo IMA ADPCM: per-channel headers + 4-byte nibble-group
    interleave; each channel round-trips at > 30 dB SNR with the exact
    frame count, and a channel decodes IDENTICALLY whether it travels
    alone (mono stream) or interleaved (the coder state is strictly
    per-channel)."""
    n = 5000
    ts = np.arange(n) / 16000.0
    left = (np.sin(2 * np.pi * 440 * ts) * 12000).astype(np.int16)
    right = (np.sin(2 * np.pi * 523 * ts) * 9000).astype(np.int16)
    stereo = np.stack([left, right], axis=1)
    wav = mm.encode_wav_adpcm(stereo, 16000)
    rate, ch, out = mm.decode_wav(wav)
    assert (rate, ch, out.shape) == (16000, 2, (n, 2))
    assert mm.wav_header_info(wav) == (16000, 2, n)  # header-only path agrees
    for c, src in ((0, left), (1, right)):
        err = (out[:, c].astype(np.float64) - src.astype(np.float64)) ** 2
        snr = 10 * np.log10((src.astype(np.float64) ** 2).mean() / err.mean())
        assert snr > 30.0, c
    _, _, mono_left = mm.decode_wav(mm.encode_wav_adpcm(left, 16000))
    assert np.array_equal(out[:, 0], mono_left.reshape(-1))


def test_stereo_adpcm_edge_lengths():
    for m in (1, 2, 504, 505, 506, 1011):
        t = np.stack(
            [
                (np.arange(m, dtype=np.int64) % 200 - 100).astype(np.int16),
                (np.arange(m, dtype=np.int64) % 90 - 45).astype(np.int16),
            ],
            axis=1,
        )
        r, c, o = mm.decode_wav(mm.encode_wav_adpcm(t, 8000))
        assert (r, c, o.shape) == (8000, 2, (m, 2))


def test_adpcm_inconsistent_block_align_rejected():
    """A fmt whose block_align disagrees with samplesPerBlock at the
    declared channel count would decode garbage — explicit boundary,
    not a silent mis-decode (stereo at spb=505 needs 512, not 256)."""
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 256, 4, 2, 505)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        mm.decode_wav(wav)
    with pytest.raises(NotImplementedError):
        mm.wav_header_info(wav)


def test_stereo_pcm_and_adpcm_features(spark):
    """extract_audio_features mono-mixes stereo payloads (PCM and
    ADPCM) and reports channels=2 with the exact frame count."""
    n = 2000
    ts = np.arange(n) / 16000.0
    tone = (np.sin(2 * np.pi * 300 * ts) * 8000).astype(np.int16)
    stereo = np.stack([tone, (tone // 2).astype(np.int16)], axis=1)
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(mm.encode_wav(stereo, 16000))),
            (2, "audio", bytearray(mm.encode_wav_adpcm(stereo, 16000))),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = {r["media_id"]: r for r in mm.extract_audio_features(media).collect()}
    for mid in (1, 2):
        r = rows[mid]
        assert (r["channels"], r["n_frames"], r["sample_rate"]) == (2, n, 16000)
        assert r["duration_ms"] == n * 1000 // 16000
        assert r["rms"] > 0 and r["peak"] > 0


# -- perceptual hash (dHash) tier -------------------------------------------


def _ref_dhash(gray: np.ndarray) -> int:
    h, w = gray.shape
    out = 0
    for r in range(h):
        for c in range(w - 1):
            if int(gray[r, c + 1]) > int(gray[r, c]):
                out |= 1 << (r * (w - 1) + c)
    return out - (1 << 64) if out >= 1 << 63 else out


def test_dhash_bits_matches_reference_and_wraps():
    rng = np.random.default_rng(11)
    for shape in [(8, 8), (8, 9), (3, 4), (1, 9)]:
        g = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert mm.dhash_bits(g) == _ref_dhash(g), shape
    # 9x8 ramp sets all 64 bits -> two's-complement -1
    assert mm.dhash_bits(np.tile(np.arange(9, dtype=np.uint8), (8, 1))) == -1
    # brightness invariance: +40 on every pixel, same hash
    g = rng.integers(0, 200, size=(8, 9), dtype=np.uint8)
    assert mm.dhash_bits(g) == mm.dhash_bits(g + 40)
    with pytest.raises(ValueError):
        mm.dhash_bits(np.zeros((1, 1), dtype=np.uint8))  # 0 bits
    with pytest.raises(ValueError):
        mm.dhash_bits(np.zeros((9, 9), dtype=np.uint8))  # 72 bits


def test_gray2d_channels():
    # gray and gray+alpha take the luma plane
    ga = np.array([[10, 255, 20, 0]], dtype=np.uint8)  # 2 px, gray+alpha
    assert mm._gray2d(ga.tobytes(), 2, 1, 2).tolist() == [[10, 20]]
    # RGB uses fixed-point BT.601: (77R + 150G + 29B) >> 8
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    assert mm._gray2d(rgb, 3, 1, 3).tolist() == [
        [(77 * 255) >> 8, (150 * 255) >> 8, (29 * 255) >> 8]
    ]


def test_image_dhash_native_exact_and_standard_grid(spark):
    """Native-grid dhash of a PNG equals the hash of the source pixels
    (lossless round trip); the standard 9x8 path is deterministic and
    equal for identical images."""
    rng = np.random.default_rng(5)
    pix = rng.integers(0, 256, size=64, dtype=np.uint8)
    png = mm.encode_png(pix.tobytes(), 8, 8, 1)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(png))],
        "media_id long, kind string, payload binary",
    )
    dec = mm.decode_images(media)
    native = {r.media_id: r.dhash for r in mm.image_dhash(dec, grid=None).collect()}
    assert native[1] == mm.dhash_bits(pix.reshape(8, 8))
    std = {r.media_id: r.dhash for r in mm.image_dhash(dec).collect()}
    assert std[1] == std[2] and std[1] is not None


def test_image_neardup_pairs_planted(spark):
    """A lightly-perturbed copy (few pixels nudged across a comparison
    boundary) pairs with its source within max_hamming; an unrelated
    image does not. Exercises banding guarantee: hamming <= bands-1
    always shares a band."""
    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    base[2, 2:5] = (50, 100, 150)  # comparisons (2,2)=1, (2,3)=1
    near = base.copy()
    near[2, 3] = 160  # (2,2) stays 1, (2,3) flips to 0 -> exactly 1 bit
    other = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    rows = [
        (i + 1, int(mm.dhash_bits(g))) for i, g in enumerate((base, near, other))
    ]
    hashes = spark.createDataFrame(rows, "media_id long, dhash long")
    d12 = bin(rows[0][1] ^ rows[1][1]).count("1")
    assert 0 < d12 <= 3, d12  # genuinely near, not identical
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in mm.image_neardup_pairs(hashes, bands=4, bits=64, max_hamming=3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == d12
    assert (1, 3) not in got and (2, 3) not in got
    with pytest.raises(ValueError):
        mm.image_neardup_pairs(hashes, bands=5, bits=64)


def test_jpeg_roundtrip_dhash_stability(spark):
    """Perceptual robustness: a smooth gradient survives quality-90
    JPEG round trip with a near-identical dhash (the property that
    makes dHash a re-encode dedup key), while an unrelated gradient
    stays far away."""
    from e_commerce_lakehouse_spark.operators.jpeg import encode_jpeg

    y, x = np.mgrid[0:16, 0:16]
    smooth = (8 * x + 4 * y).astype(np.uint8)
    flipped = (8 * (15 - x) + 4 * y).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(mm.encode_png(smooth.tobytes(), 16, 16, 1))),
            (2, "image", bytearray(encode_jpeg(smooth.tobytes(), 16, 16, 1, quality=90))),
            (3, "image", bytearray(mm.encode_png(flipped.tobytes(), 16, 16, 1))),
        ],
        "media_id long, kind string, payload binary",
    )
    h = {r.media_id: r.dhash for r in mm.image_dhash(mm.decode_images(media)).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[1], h[2]) <= 4, ham(h[1], h[2])
    assert ham(h[1], h[3]) > 20, ham(h[1], h[3])


def test_manifest_dhash_matches_image_dhash_native(spark, media):
    """The fused manifest's thumbnail dhash column is the same hash
    image_dhash(grid=None) computes from the composed decode path —
    for EVERY container (PNG exact; JPEG via the same lossy decode)."""
    man = {r.media_id: r.dhash for r in mm.media_manifest(media).collect()}
    native = {
        r.media_id: r.dhash
        for r in mm.image_dhash(mm.decode_images(media), grid=None).collect()
    }
    assert len(man) == len(native) == 50
    assert man == native
    assert all(v is not None for v in man.values())


# -- audio fingerprint tier -------------------------------------------------


def test_audio_envelope_bits_reference_and_gain_invariance():
    rng = np.random.default_rng(3)
    x = (rng.normal(0, 3000, size=65 * 50)).astype(np.int16)

    def ref(sig, blocks):
        n = len(sig) // blocks
        e = [
            sum(int(v) ** 2 for v in sig[i * n : (i + 1) * n])
            for i in range(blocks)
        ]
        out = 0
        for i in range(blocks - 1):
            if e[i + 1] > e[i]:
                out |= 1 << i
        return out - (1 << 64) if out >= 1 << 63 else out

    for blocks in (5, 17, 65):
        assert mm.audio_envelope_bits(x, blocks) == ref(x, blocks), blocks
    # uniform gain (x2) preserves every energy comparison
    assert mm.audio_envelope_bits(x.astype(np.int64) * 2, 65) == mm.audio_envelope_bits(x, 65)
    with pytest.raises(ValueError):
        mm.audio_envelope_bits(x, blocks=66)
    with pytest.raises(ValueError):
        mm.audio_envelope_bits(x[:10], blocks=65)


def test_audio_fingerprint_neardup_pairs_planted(spark):
    """A lightly-noised copy of an amplitude-modulated tone lands
    within small Hamming distance of its source; a reversed-envelope
    signal lands far. The pairing op is the SAME generic Hamming
    banding the image tier uses."""
    rng = np.random.default_rng(9)
    n = 65 * 200
    t = np.arange(n)
    env = np.linspace(0.1, 1.0, n)  # rising envelope
    base = (np.sin(2 * np.pi * 440 * t / 16000) * env * 12000).astype(np.int16)
    near = (base.astype(np.int64) + rng.integers(-150, 151, size=n)).astype(np.int16)
    far = base[::-1].copy()  # falling envelope: ~all delta signs flip
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(mm.encode_wav(base, 16000))),
            (2, "audio", bytearray(mm.encode_wav(near, 16000))),
            (3, "audio", bytearray(mm.encode_wav_adpcm(base, 16000))),
            (4, "audio", bytearray(mm.encode_wav(far, 16000))),
        ],
        "media_id long, kind string, payload binary",
    )
    fps = mm.audio_fingerprint(media)
    h = {r.media_id: r.afp for r in fps.collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[1], h[2]) <= 6, ham(h[1], h[2])   # noised copy: near
    assert ham(h[1], h[3]) <= 6, ham(h[1], h[3])   # ADPCM re-encode: near
    assert ham(h[1], h[4]) >= 20, ham(h[1], h[4])  # reversed: far
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in mm.hamming_neardup_pairs(
            fps, hash_col="afp", bands=8, max_hamming=6
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) not in pairs


def test_hamming_pairs_guarantee_guard(spark):
    """max_hamming >= bands would silently drop in-threshold pairs
    (d flips can corrupt d bands) — the op refuses the combination."""
    hashes = spark.createDataFrame([(1, 5), (2, 6)], "media_id long, dhash long")
    with pytest.raises(ValueError, match="banding guarantee"):
        mm.hamming_neardup_pairs(hashes, bands=4, max_hamming=6)


def test_media_neardup_pipeline_end_to_end(spark):
    """The full media-dedup chain COMPOSES across tiers: synthesize
    real images → decode → perceptual dHash → Hamming-banded pairs →
    star-contraction duplicate clusters → dedup keeps one canonical
    copy per perceptual cluster. Planted: three re-encodes of the same
    image (PNG twice with a brightness shift, JPEG once) plus two
    unrelated images — one cluster, exactly its min-id survivor
    dropped siblings; unrelated images untouched."""
    from e_commerce_lakehouse_spark.operators import dedup

    rng = np.random.default_rng(13)
    y, x = np.mgrid[0:8, 0:9]
    base = (20 * x + 5 * y).astype(np.uint8)  # smooth: survives JPEG
    bright = np.clip(base.astype(np.int64) + 30, 0, 255).astype(np.uint8)
    other1 = (255 - 20 * x - 5 * y).astype(np.uint8)
    other2 = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    from e_commerce_lakehouse_spark.operators.jpeg import encode_jpeg

    rows = [
        (1, "image", bytearray(mm.encode_png(base.tobytes(), 9, 8, 1))),
        (2, "image", bytearray(mm.encode_png(bright.tobytes(), 9, 8, 1))),
        (3, "image", bytearray(encode_jpeg(base.tobytes(), 9, 8, 1, quality=90))),
        (4, "image", bytearray(mm.encode_png(other1.tobytes(), 9, 8, 1))),
        (5, "image", bytearray(mm.encode_png(other2.tobytes(), 9, 8, 1))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    hashes = mm.image_dhash(mm.decode_images(media), grid=None)
    pairs = mm.hamming_neardup_pairs(
        hashes, bands=8, bits=64, max_hamming=4
    ).select(F.col("a_id"), F.col("b_id"))
    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert 4 not in clusters and 5 not in clusters
    docs = media.select(F.col("media_id").alias("doc_id"))
    kept = {
        r.doc_id for r in dedup.dedup_by_clusters(docs, pairs).collect()
    }
    assert kept == {1, 4, 5}
