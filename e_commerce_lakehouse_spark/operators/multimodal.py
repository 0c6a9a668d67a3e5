"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (engine extension; BASELINE.json north star).

Real here: the Spark-side plumbing — schema, Arrow-batched mapInPandas
pipelines, partition sizing, batch shapes, magic-byte sniffing, feature
extraction — AND a real PNG codec: ``encode_png``/``decode_png`` cover
8/16-bit gray, RGB, gray+alpha, RGBA and 1/2/4/8-bit palette
(PLTE/tRNS LUT expansion, 16→8 downshift) on stdlib zlib/struct +
numpy (no external image library), with full 5-filter defiltering,
Adam7 interlace, and CRC checks — the complete PNG surface.
``synthesize_media`` emits real decodable PNGs and (baseline and
progressive) JPEGs, so ``decode_images`` and ``resize_images`` run
genuine codec work end-to-end in this container.

Also real: a WAV audio codec — ``encode_wav``/``decode_wav`` handle
RIFF/PCM 16-bit mono/stereo AND mono/stereo (any channel count) IMA
ADPCM (format tag 0x11, public IMA/DVI spec; both codec directions
vectorized across (block, channel) rows, fact-chunk-exact frame
counts, per-channel headers + 4-byte nibble-group interleave) on
stdlib struct + numpy, and ``extract_audio_features`` computes
duration / RMS energy / zero-crossing rate / peak over decoded,
mono-mixed samples (the audio-quality filters a training pipeline
gates on). Round 12 closes the common-WAV tail: integer PCM at
8/16/24/32 bits, IEEE float PCM (32/64), G.711 mu-law/A-law
telephony bytes (256-entry tables, validated against CPython's
audioop), and WAVE_FORMAT_EXTENSIBLE wrapping of any of them —
all vectorized to the canonical int16. Truly external codecs
(MP3-in-WAV, GSM 6.10) raise NotImplementedError.

Also real: a baseline JPEG codec (operators/jpeg.py — pure
stdlib+numpy DCT/Huffman): ``decode_images`` handles baseline
sequential 8-bit gray and color JPEG at any dividing sampling grid
(4:4:4 / 4:2:2 / 4:2:0 / 4:4:0 / 4:1:1 — i.e. essentially every real
camera/web JPEG), and ``encode_images`` transcodes decoded pixel
frames back to PNG or JPEG (4:4:4/4:2:2/4:2:0 on encode). Progressive
(SOF2) decode is real too — spectral selection, successive
approximation, EOB runs — plus a progressive encoder used by the
synthesis mix; only arithmetic-coded, 12-bit, and lossless JPEG raise
NotImplementedError (a full libjpeg concern, not a plumbing one).

Also real: video frame sampling — ``encode_avi``/``iter_avi_frames``
implement the RIFF/AVI container (public AVI spec; the same chunk
grammar as the WAV codec, plus LIST nesting), and ``sample_frames``
walks each MJPEG AVI's 'movi' list and decodes every-nth frame with
the in-repo baseline JPEG codec — no ffmpeg. Non-MJPEG FourCCs raise
NotImplementedError (other codecs are a libavcodec concern, not a
plumbing one).

Also real: an image near-duplicate tier — ``dhash_bits``/
``image_dhash`` compute the classic 64-bit difference perceptual hash
over decoded pixels (grayscale luma → bilinear 9x8 → gradient-sign
bits; native-grid for thumbnails, fused into ``media_manifest``), and
``image_neardup_pairs`` blocks on Hamming-LSH hash bands (bounded via
``buckets.bucket_mate_pairs``) with an exact popcount verify — the
re-encoded/brightness-shifted crawl-image dedup step.

Scale notes: binary payloads ride the normal Parquet path (page-
compressed, column-pruned when untouched). mapInPandas streams Arrow
record batches — set spark.sql.execution.arrow.maxRecordsPerBatch so
batch_bytes ≈ rows × avg_payload stays inside executor memory. Decode/
resize/feature extraction are pure maps: no shuffle at any scale.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"ID3": "audio/mpeg",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
    b"\x00\x00\x00\x20ftyp": "video/mp4",
}

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_mime(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    if payload[:4] == b"RIFF":
        # RIFF is a container family — dispatch on the form type
        sub = payload[8:12]
        if sub == b"WAVE":
            return "audio/wav"
        if sub == b"AVI ":
            return "video/avi"
        return "application/octet-stream"
    for magic, mime in MAGIC.items():
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


# ---------------------------------------------------------------------------
# PNG codec (stdlib zlib/struct + numpy; RFC 2083). 8-bit depth,
# grayscale (color type 0) and truecolor RGB (color type 2), no
# interlace — the subset a training pipeline's thumbnail path needs.
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` ∈ {1: gray,
    2: gray+alpha, 3: RGB, 4: RGBA}) as a real PNG: IHDR + one zlib
    IDAT (filter 0 per scanline) + IEND."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# (color type, bit depth) -> raw channels per pixel, for the supported
# combos. Palette rows carry 1 index channel at 1/2/4/8 bits; gray/RGB
# (+alpha) carry 8- or 16-bit samples.
_PNG_SHAPES = {
    (0, 8): 1, (0, 16): 1,   # grayscale
    (2, 8): 3, (2, 16): 3,   # truecolor RGB
    (3, 1): 1, (3, 2): 1, (3, 4): 1, (3, 8): 1,  # palette indices
    (4, 8): 2, (4, 16): 2,   # gray + alpha
    (6, 8): 4, (6, 16): 4,   # RGBA
}


# Adam7 pass grid: (x start, y start, x step, y step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_defilter(raw: bytes, height: int, stride: int, bpp: int, offset: int) -> np.ndarray:
    """Reverse PNG scanline filtering for one (sub-)image: consumes
    ``(stride+1) * height`` bytes of ``raw`` starting at ``offset`` and
    returns the defiltered rows as (height, stride) uint8."""
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = raw[offset + y * (stride + 1) : offset + (y + 1) * (stride + 1)]
        ftype = row[0]
        line = np.frombuffer(row, dtype=np.uint8, offset=1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up — vectorized (uint8 addition wraps mod 256)
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def _png_rows_to_samples(
    rows: np.ndarray, width: int, raw_ch: int, depth: int
) -> np.ndarray:
    """Defiltered byte rows -> per-pixel sample grid (h, width, raw_ch):
    uint16 for depth 16, uint8 otherwise (palette rows yield indices)."""
    h = rows.shape[0]
    if depth == 16:
        b = rows[:, : width * raw_ch * 2].reshape(h, width, raw_ch, 2).astype(np.uint16)
        return (b[..., 0] << 8) | b[..., 1]
    if depth == 8:
        return rows[:, : width * raw_ch].reshape(h, width, raw_ch)
    # sub-byte depths (palette indices) pack big-endian within each byte
    bits = np.unpackbits(rows, axis=1)
    weights = 1 << np.arange(depth - 1, -1, -1)
    idx = (
        bits[:, : (rows.shape[1] * 8 // depth) * depth]
        .reshape(h, -1, depth)
        .dot(weights)
        .astype(np.uint8)
    )
    return idx[:, :width, None]


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to (width, height, channels, raw 8-bit pixel
    bytes). Full defiltering (None/Sub/Up/Average/Paeth) with CRC
    verification. Supported: 8/16-bit gray, RGB, gray+alpha, RGBA
    (16-bit downshifted to 8 — the thumbnail-path convention) and
    1/2/4/8-bit palette with PLTE (+ optional tRNS → RGBA) LUT
    expansion — each in both progressive-display (Adam7 interlaced)
    and non-interlaced layouts (each Adam7 pass is an independently
    filtered sub-image scattered onto the full grid, RFC 2083 §2.6).
    Output ``channels``: 1 gray, 2 gray+alpha, 3 RGB (incl. opaque
    palette), 4 RGBA (incl. palette with tRNS)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    width = height = color = depth = -1
    idat, plte, trns = b"", b"", None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if interlace not in (0, 1) or (color, depth) not in _PNG_SHAPES:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace}: "
                    "supported are 8/16-bit gray/RGB/alpha and 1/2/4/8-bit "
                    "palette, interlace 0 (none) or 1 (Adam7)"
                )
        elif tag == b"PLTE":
            plte = chunk
        elif tag == b"tRNS":
            trns = chunk
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width < 0:
        raise ValueError("no IHDR chunk")
    raw_ch = _PNG_SHAPES[(color, depth)]
    bpp = max(1, raw_ch * depth // 8)  # byte distance to the "left" sample
    raw = zlib.decompress(idat)
    if not interlace:
        # filtering operates on BYTES: stride = ceil(width·ch·depth/8)
        stride = (width * raw_ch * depth + 7) // 8
        if len(raw) != (stride + 1) * height:
            raise ValueError("IDAT length does not match dimensions")
        rows = _png_defilter(raw, height, stride, bpp, 0)
        samples = _png_rows_to_samples(rows, width, raw_ch, depth)
    else:
        # Adam7: seven independently filtered sub-images, scattered
        # onto the full grid by the pass lattice; empty passes (tiny
        # images) contribute zero bytes
        samples = np.zeros(
            (height, width, raw_ch), dtype=np.uint16 if depth == 16 else np.uint8
        )
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            pstride = (pw * raw_ch * depth + 7) // 8
            if offset + (pstride + 1) * ph > len(raw):
                raise ValueError("IDAT length does not match Adam7 passes")
            rows = _png_defilter(raw, ph, pstride, bpp, offset)
            offset += (pstride + 1) * ph
            samples[y0::dy, x0::dx] = _png_rows_to_samples(rows, pw, raw_ch, depth)
        if offset != len(raw):
            raise ValueError("IDAT length does not match Adam7 passes")

    if color == 3:
        # palette: LUT-expand indices via PLTE (+tRNS)
        if not plte or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE chunk")
        idx = samples[..., 0]
        lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if np.any(idx >= len(lut)):
            raise ValueError("palette index out of range")
        if trns is not None:
            alpha = np.full(len(lut), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            lut = np.concatenate([lut, alpha[:, None]], axis=1)
        px = lut[idx]
        return width, height, px.shape[-1], px.tobytes()

    if depth == 16:
        # big-endian 16-bit samples -> high-byte downshift to 8-bit
        samples = (samples >> 8).astype(np.uint8)
    return width, height, raw_ch, np.ascontiguousarray(samples).tobytes()


# ---------------------------------------------------------------------------
# WAV codec (RIFF/PCM, stdlib struct + numpy). 16-bit signed PCM,
# mono/stereo — the canonical uncompressed interchange format; the
# subset an audio-quality gate needs before handing compressed formats
# to an external decoder.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples (shape (n,) mono or (n, 2) stereo) as a
    RIFF/WAVE file: RIFF header + fmt chunk (PCM) + data chunk."""
    if samples.dtype != np.int16:
        raise ValueError(f"need int16 samples, got {samples.dtype}")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()  # int16 is little-endian on all our targets
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_wav_fmt(chunk: bytes) -> tuple[int, int, int, int | None, int]:
    """Validate a fmt chunk; return (audio_fmt, channels, sample_rate,
    samplesPerBlock-or-None, bits). The validation is SHARED between
    decode_wav and wav_header_info so the header-only path can never
    accept a stream the decoder would reject (or vice versa).

    Accepted codec families (everything a real speech/music training
    corpus actually contains): integer PCM at 8 (unsigned) / 16 / 24 /
    32 bits, IEEE float PCM at 32 / 64 bits (format tag 3), G.711
    mu-law (7) and A-law (6) telephony bytes, mono/stereo/n-channel
    IMA ADPCM (0x11), and any of those wrapped in WAVE_FORMAT_
    EXTENSIBLE (0xFFFE — the container Windows encoders emit for >2
    channels or >16 bits; the real tag is the first two bytes of the
    SubFormat GUID). Anything else (MP3-in-WAV, GSM 6.10, ...) raises
    NotImplementedError — external-decoder concern."""
    audio_fmt, channels, sample_rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", chunk[:16]
    )
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        if len(chunk) < 26:
            raise NotImplementedError(
                "WAVE_FORMAT_EXTENSIBLE fmt chunk without a SubFormat"
            )
        # bytes 24-26 are the leading WORD of the SubFormat GUID —
        # the actual format tag; valid-bits (18-20) may be < bits but
        # the container width is what the byte stream carries
        (audio_fmt,) = struct.unpack("<H", chunk[24:26])
    spb = None
    if audio_fmt == 0x11:
        if len(chunk) < 20:
            # 16/18-byte fmt without samplesPerBlock exists in
            # the wild — reject cleanly, don't struct.error
            raise NotImplementedError("IMA ADPCM fmt chunk without samplesPerBlock")
        (spb,) = struct.unpack("<H", chunk[18:20])
        # the declared block_align is authoritative — a stream whose
        # nibble count disagrees with samplesPerBlock would decode
        # garbage, not data
        if block_align != channels * (4 + spb // 2):
            raise NotImplementedError(
                f"IMA ADPCM block_align={block_align} inconsistent with "
                f"samplesPerBlock={spb} at {channels} channel(s)"
            )
    elif audio_fmt == 1:
        if bits not in (8, 16, 24, 32):
            raise NotImplementedError(
                f"WAV integer PCM bits={bits}: 8/16/24/32 only"
            )
    elif audio_fmt == 3:
        if bits not in (32, 64):
            raise NotImplementedError(
                f"WAV float PCM bits={bits}: 32/64 only"
            )
    elif audio_fmt in (6, 7):
        if bits != 8:
            raise NotImplementedError(
                f"G.711 WAV with bits={bits}: 8-bit log-PCM only"
            )
    else:
        raise NotImplementedError(
            f"WAV format={audio_fmt} bits={bits}: integer/float PCM, "
            "G.711 mu-law/A-law, and IMA ADPCM supported"
        )
    return audio_fmt, channels, sample_rate, spb, bits


def _g711_mulaw_table() -> np.ndarray:
    """256-entry mu-law byte -> linear int16 table (ITU-T G.711 /
    the classic Sun ulaw2linear: invert, 3-bit exponent + 4-bit
    mantissa around the 0x84 bias)."""
    t = np.empty(256, dtype=np.int16)
    for i in range(256):
        u = ~i & 0xFF
        mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        mag -= 0x84
        t[i] = -mag if (u & 0x80) else mag
    return t


def _g711_alaw_table() -> np.ndarray:
    """256-entry A-law byte -> linear int16 table (G.711 alaw2linear:
    XOR 0x55, segment 0 is linear, higher segments shift the biased
    mantissa; sign bit SET means positive in A-law)."""
    t = np.empty(256, dtype=np.int16)
    for i in range(256):
        a = i ^ 0x55
        seg = (a & 0x70) >> 4
        mag = (a & 0x0F) << 4
        if seg == 0:
            mag += 8
        elif seg == 1:
            mag += 0x108
        else:
            mag = (mag + 0x108) << (seg - 1)
        t[i] = mag if (a & 0x80) else -mag
    return t


_MULAW_TABLE = _g711_mulaw_table()
_ALAW_TABLE = _g711_alaw_table()


def _pcm_to_int16(pcm: bytes, audio_fmt: int, bits: int, channels: int) -> np.ndarray:
    """data-chunk bytes -> int16 frames (n, channels), vectorized per
    family: u8 recenters, 24/32-bit keep the high 16 bits, float
    clips to [-1, 1] and scales, G.711 bytes go through the 256-entry
    tables (np.take — one gather per payload)."""
    if audio_fmt == 7:
        s = np.take(_MULAW_TABLE, np.frombuffer(pcm, dtype=np.uint8))
    elif audio_fmt == 6:
        s = np.take(_ALAW_TABLE, np.frombuffer(pcm, dtype=np.uint8))
    elif audio_fmt == 3:
        f = np.frombuffer(pcm, dtype="<f4" if bits == 32 else "<f8")
        s = np.clip(f, -1.0, 1.0)
        s = np.round(s * 32767.0).astype(np.int16)
    elif bits == 8:
        s = ((np.frombuffer(pcm, dtype=np.uint8).astype(np.int16)) - 128) << 8
    elif bits == 16:
        s = np.frombuffer(pcm, dtype="<i2")
    elif bits == 24:
        b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
        # high 16 bits of the signed little-endian 24-bit value:
        # (b2<<8)|b1, reinterpreted as int16 (b2 carries the sign)
        s = (
            ((b[:, 2].astype(np.int32) << 8) | b[:, 1].astype(np.int32))
            .astype(np.uint16)
            .view(np.int16)
        )
    else:  # 32-bit integer PCM
        s = (np.frombuffer(pcm, dtype="<i4") >> 16).astype(np.int16)
    return s.reshape(-1, channels)


def _parse_wav(data: bytes):
    """RIFF walk shared by decode_wav and decode_wav_batch:
    (sample_rate, channels, audio_fmt, spb, bits, fact_frames, pcm)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sample_rate, channels, pcm = 12, None, None, None
    audio_fmt = spb = fact_frames = None
    bits = 16
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, spb, bits = _parse_wav_fmt(chunk)
        elif tag == b"fact":
            (fact_frames,) = struct.unpack("<I", chunk[:4])
        elif tag == b"data":
            pcm = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if audio_fmt == 0x11 and fact_frames is None:
        # the spec requires fact for compressed WAV; without it the
        # final-block padding is indistinguishable from data —
        # refuse rather than silently inflate duration/RMS
        raise ValueError("IMA ADPCM WAV without a fact chunk")
    return sample_rate, channels, audio_fmt, spb, bits, fact_frames, pcm


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a RIFF/WAVE file to (sample_rate, channels, int16 array
    of shape (n_frames, channels)). Integer PCM (8/16/24/32), IEEE
    float PCM (32/64), G.711 mu-law/A-law, and IMA ADPCM (format tag
    0x11, fact-chunk-trimmed) decode in-repo at any channel count —
    every non-16-bit family lands as int16 (high 16 bits / scaled /
    G.711 tables), the repo's canonical sample dtype. Other codecs
    raise NotImplementedError (external-decoder concern)."""
    sample_rate, channels, audio_fmt, spb, bits, fact_frames, pcm = _parse_wav(data)
    if audio_fmt == 0x11:
        samples = _adpcm_decode_blocks(pcm, spb, channels)[:fact_frames]
        return sample_rate, channels, samples
    samples = _pcm_to_int16(pcm, audio_fmt, bits, channels)
    return sample_rate, channels, samples


def decode_wav_batch(datas: list[bytes]) -> list[tuple[int, int, np.ndarray]]:
    """Batch form of :func:`decode_wav`, result-identical per payload.
    PCM/G.711 families decode per payload (already one numpy gather or
    view each); IMA ADPCM payloads — whose per-payload cost is the
    spb-1 sequential sample-steps, ~500 tiny numpy ops per WAV — are
    grouped by (samplesPerBlock), their independent block rows stacked,
    and the sequential steps run ONCE per group (the decode mirror of
    :func:`encode_wav_adpcm_batch`). This is the shape Arrow kernels
    over many small audio payloads should call."""
    out: list = [None] * len(datas)
    adpcm: dict[int, list] = {}  # spb -> [(slot, nib, pred, idx, nb, ch, fact)]
    for slot, data in enumerate(datas):
        sample_rate, channels, audio_fmt, spb, bits, fact_frames, pcm = _parse_wav(
            data
        )
        if audio_fmt == 0x11:
            nib, pred, idx, nb = _adpcm_parse_rows(pcm, spb, channels)
            adpcm.setdefault(spb, []).append(
                (slot, sample_rate, nib, pred, idx, nb, channels, fact_frames)
            )
        else:
            out[slot] = (
                sample_rate,
                channels,
                _pcm_to_int16(pcm, audio_fmt, bits, channels),
            )
    for spb, items in adpcm.items():
        decoded = _adpcm_decode_rows(
            np.concatenate([it[2] for it in items]),
            np.concatenate([it[3] for it in items]),
            np.concatenate([it[4] for it in items]),
            spb,
        )
        row = 0
        for slot, sample_rate, _nib, _pred, _idx, nb, ch, fact in items:
            r = nb * ch
            frames = _adpcm_rows_to_frames(decoded[row : row + r], nb, ch)[:fact]
            out[slot] = (sample_rate, ch, frames)
            row += r
    return out


def wav_header_info(data: bytes) -> tuple[int, int, int]:
    """(sample_rate, channels, n_frames) from the RIFF headers ALONE —
    no sample decode. For fixed-width families (integer/float PCM,
    G.711) the frame count is data_len/(ch x bytes-per-sample); for
    IMA ADPCM it is the fact chunk (required by spec for compressed
    WAV; its absence raises like :func:`decode_wav` — G.711 needs no
    fact: one byte per sample leaves no padding ambiguity). The
    manifest path uses this: reporting duration must not cost a
    sample decode at 100 TB. Validation is literally shared with
    ``decode_wav`` (:func:`_parse_wav_fmt`)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sample_rate, channels, data_len = 12, None, None, None
    audio_fmt = fact_frames = None
    bits = 16
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _spb, bits = _parse_wav_fmt(chunk)
        elif tag == b"fact":
            (fact_frames,) = struct.unpack("<I", chunk[:4])
        elif tag == b"data":
            data_len = ln
        pos += 8 + ln + (ln & 1)
    if sample_rate is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    if audio_fmt == 0x11:
        if fact_frames is None:
            raise ValueError("IMA ADPCM WAV without a fact chunk")
        return sample_rate, channels, fact_frames
    return sample_rate, channels, data_len // (channels * (bits // 8))


# IMA/DVI ADPCM (public spec: IMA Recommended Practices for Enhancing
# Digital Audio Compatibility, rev 3.00 — WAV format tag 0x11). 4-bit
# code per sample; the standard 89-entry step table and code→index
# adjustment table. Blocks are independent (header carries predictor +
# step index), which is exactly what lets both codec directions run
# VECTORIZED: sequential only in the 505 sample-steps, numpy across
# all blocks of the payload at each step.
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int64,
)
_ADPCM_BLOCK_ALIGN = 256  # 4-byte header + 252 nibble bytes
_ADPCM_SPB = 1 + (_ADPCM_BLOCK_ALIGN - 4) * 2  # 505 samples per block


def _adpcm_block_rows(samples: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(n,)/(n, ch) int16 frames → ((nb·ch, spb) per-channel block
    rows, nb, ch). The last block is padded by repeating the final
    frame; callers record the true frame count in the WAV fact
    chunk. Each row is one channel of one block — the unit the coder
    state vectorizes over."""
    x = samples.astype(np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    spb = _ADPCM_SPB
    nb = max(1, -(-n // spb))
    pad = np.repeat(
        x[-1:] if n else np.zeros((1, ch), dtype=np.int64), nb * spb - n, axis=0
    )
    blocks = np.concatenate([x, pad]).reshape(nb, spb, ch).transpose(0, 2, 1).reshape(
        nb * ch, spb
    )
    return blocks, nb, ch


def _adpcm_code_rows(blocks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The sequential coder core: (rows, spb) block rows → (packed
    nibble bytes (rows, (spb-1)/2), per-row start index). Rows are
    INDEPENDENT (the header carries predictor AND step index, which
    the decoder honors) — each row's start index is seeded from its
    first delta magnitude instead of carrying state across blocks,
    avoiding both the slope-overload of a cold index-0 start and any
    cross-row sequential dependency. That independence is what lets
    callers stack the block rows of MANY payloads and pay the spb-1
    sequential sample-steps ONCE per batch instead of once per
    payload (the per-payload loop was ~500 tiny numpy steps per WAV —
    the dominant cost of the audio synthesis kernel)."""
    spb = blocks.shape[1]
    pred = blocks[:, 0].copy()
    idx0 = np.clip(
        np.searchsorted(_IMA_STEP_TABLE, np.abs(blocks[:, 1] - blocks[:, 0])),
        0,
        88,
    ).astype(np.int64)
    idx = idx0.copy()
    codes = np.zeros((blocks.shape[0], spb - 1), dtype=np.uint8)
    for j in range(spb - 1):
        step = _IMA_STEP_TABLE[idx]
        diff = blocks[:, j + 1] - pred
        sign = diff < 0
        mag = np.abs(diff)
        b4 = mag >= step
        mag = mag - b4 * step
        b2 = mag >= step >> 1
        mag = mag - b2 * (step >> 1)
        b1 = mag >= step >> 2
        code = sign * 8 + b4 * 4 + b2 * 2 + b1
        # reconstruct exactly as the decoder will, so no drift
        delta = (step >> 3) + b1 * (step >> 2) + b2 * (step >> 1) + b4 * step
        pred = np.clip(pred + np.where(sign, -delta, delta), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX_TABLE[code & 7], 0, 88)
        codes[:, j] = code
    nib = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)  # low first
    return nib, idx0


def _adpcm_assemble(
    blocks: np.ndarray, nib: np.ndarray, idx0: np.ndarray, nb: int, ch: int
) -> bytes:
    """Headers + tag-0x11 nibble interleave for ONE payload's rows."""
    headers = np.zeros((nb * ch, 4), dtype=np.uint8)
    h16 = blocks[:, 0].astype(np.int16)
    headers[:, 0] = h16.view(np.uint16) & 0xFF
    headers[:, 1] = h16.view(np.uint16) >> 8
    headers[:, 2] = idx0.astype(np.uint8)  # per-block start index (see above)
    # block layout: ch headers back-to-back, then 4-byte nibble groups
    # alternating per channel (the tag-0x11 interleave). (spb-1)/2 is a
    # multiple of 4 by construction (_ADPCM_SPB), so groups are exact.
    hdrs = headers.reshape(nb, ch * 4)
    payload = nib.reshape(nb, ch, -1, 4).transpose(0, 2, 1, 3).reshape(nb, -1)
    return np.concatenate([hdrs, payload], axis=1).tobytes()


def _adpcm_encode_blocks(samples: np.ndarray) -> bytes:
    """int16 → IMA ADPCM block stream (shape (n,) mono or (n, ch)
    interleaved frames); see :func:`_adpcm_code_rows` for the coder
    contract. Single-payload form — batch encoders should use
    :func:`_adpcm_encode_blocks_batch`."""
    blocks, nb, ch = _adpcm_block_rows(samples)
    nib, idx0 = _adpcm_code_rows(blocks)
    return _adpcm_assemble(blocks, nib, idx0, nb, ch)


def _adpcm_encode_blocks_batch(samples_list: list[np.ndarray]) -> list[bytes]:
    """Encode MANY payloads in one coder pass: stack every payload's
    independent block rows, run the spb-1 sequential sample-steps once
    over the stacked matrix, split the coded rows back per payload.
    Byte-identical to per-payload :func:`_adpcm_encode_blocks` (the
    coder state is per row; stacking changes nothing but the loop
    count) — pinned by tests/test_multimodal.py digests."""
    if not samples_list:
        return []
    parts = [_adpcm_block_rows(s) for s in samples_list]
    stacked = np.concatenate([p[0] for p in parts])
    nib, idx0 = _adpcm_code_rows(stacked)
    out: list[bytes] = []
    row = 0
    for blocks, nb, ch in parts:
        r = nb * ch
        out.append(
            _adpcm_assemble(blocks, nib[row : row + r], idx0[row : row + r], nb, ch)
        )
        row += r
    return out


def _adpcm_parse_rows(
    data: bytes, spb: int, channels: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """ADPCM block stream → (per-channel nibble rows (nb·ch,
    per_ch_bytes), per-row predictor, per-row step index, nb).
    Multi-channel expects the tag-0x11 interleave: ch headers, then
    4-byte nibble groups alternating per channel — which requires
    (spb-1)/2 per-channel nibble bytes to be a multiple of 4 (true of
    every spec-conformant multi-channel stream; rejected loudly
    otherwise)."""
    per_ch_bytes = (spb - 1 + 1) // 2  # == spb // 2 for the odd spb the spec implies
    block_align = channels * (4 + per_ch_bytes)
    raw = np.frombuffer(data, dtype=np.uint8)
    if len(raw) % block_align:
        raise ValueError("ADPCM data is not block-aligned")
    if channels > 1 and per_ch_bytes % 4:
        raise NotImplementedError(
            f"multi-channel IMA ADPCM needs 4-byte nibble groups; "
            f"samplesPerBlock={spb} leaves {per_ch_bytes} bytes/channel"
        )
    nb = len(raw) // block_align
    blocks = raw.reshape(nb, block_align)
    hdrs = blocks[:, : 4 * channels].reshape(nb * channels, 4)
    pred = (
        hdrs[:, 0].astype(np.uint16) | (hdrs[:, 1].astype(np.uint16) << 8)
    ).astype(np.uint16).view(np.int16).astype(np.int64)
    idx = np.clip(hdrs[:, 2].astype(np.int64), 0, 88)
    if channels > 1:
        nib = (
            blocks[:, 4 * channels :]
            .reshape(nb, -1, channels, 4)
            .transpose(0, 2, 1, 3)
            .reshape(nb * channels, -1)
        )
    else:
        nib = blocks[:, 4:]
    return nib, pred, idx, nb


def _adpcm_decode_rows(
    nib: np.ndarray, pred: np.ndarray, idx: np.ndarray, spb: int
) -> np.ndarray:
    """The sequential decoder core: packed nibble rows + per-row
    header state → (rows, spb) int16. Rows are independent (mirror of
    :func:`_adpcm_code_rows`), so callers may stack MANY payloads'
    rows (same spb) and pay the spb-1 sequential sample-steps once
    per batch instead of once per payload."""
    codes = np.empty((nib.shape[0], nib.shape[1] * 2), dtype=np.uint8)
    codes[:, 0::2] = nib & 0x0F
    codes[:, 1::2] = nib >> 4
    out = np.empty((nib.shape[0], spb), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    pred = pred.copy()
    idx = idx.copy()
    for j in range(spb - 1):
        code = codes[:, j].astype(np.int64)
        step = _IMA_STEP_TABLE[idx]
        delta = (
            (step >> 3)
            + np.where(code & 1, step >> 2, 0)
            + np.where(code & 2, step >> 1, 0)
            + np.where(code & 4, step, 0)
        )
        pred = np.clip(pred + np.where(code & 8, -delta, delta), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX_TABLE[code & 7], 0, 88)
        out[:, j + 1] = pred.astype(np.int16)
    return out


def _adpcm_rows_to_frames(out: np.ndarray, nb: int, channels: int) -> np.ndarray:
    """(nb·ch, spb) per-channel rows → interleaved (frames, ch)."""
    spb = out.shape[1]
    return out.reshape(nb, channels, spb).transpose(0, 2, 1).reshape(-1, channels)


def _adpcm_decode_blocks(data: bytes, spb: int, channels: int = 1) -> np.ndarray:
    """IMA ADPCM block stream → int16 frames of shape (n, channels)
    (incl. any final-block padding — callers trim via the fact chunk).
    Single-payload form; batch decoders stack rows through
    :func:`_adpcm_decode_rows` directly (see decode_wav_batch)."""
    nib, pred, idx, nb = _adpcm_parse_rows(data, spb, channels)
    return _adpcm_rows_to_frames(_adpcm_decode_rows(nib, pred, idx, spb), nb, channels)


def _wav_adpcm_wrap(
    data: bytes, n_frames: int, ch: int, sample_rate: int
) -> bytes:
    """RIFF/WAVE container for an IMA ADPCM block stream (format tag
    0x11, block_align 256·ch, fact chunk carrying the exact frame
    count so decode round-trips the true length)."""
    spb = _ADPCM_SPB
    block_align = ch * _ADPCM_BLOCK_ALIGN
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _check_adpcm_input(samples: np.ndarray) -> int:
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("ADPCM encode needs int16 samples, (n,) or (n, ch)")
    return 1 if samples.ndim == 1 else samples.shape[1]


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples (shape (n,) mono or (n, ch) interleaved —
    stereo is the common real-world case) as an IMA ADPCM RIFF/WAVE
    file."""
    ch = _check_adpcm_input(samples)
    return _wav_adpcm_wrap(
        _adpcm_encode_blocks(samples), len(samples), ch, sample_rate
    )


def encode_wav_adpcm_batch(
    samples_list: list[np.ndarray], sample_rate: int = 16000
) -> list[bytes]:
    """Batch form of :func:`encode_wav_adpcm` — one coder pass over
    every payload's stacked block rows (:func:`_adpcm_encode_blocks_
    batch`), byte-identical per payload. This is the shape Arrow
    encode kernels should call: per-payload encode pays the spb-1
    sequential sample-steps once per WAV; the batch pays them once
    per Arrow batch."""
    chs = [_check_adpcm_input(s) for s in samples_list]
    datas = _adpcm_encode_blocks_batch(samples_list)
    return [
        _wav_adpcm_wrap(d, len(s), ch, sample_rate)
        for d, s, ch in zip(datas, samples_list, chs)
    ]


# ---------------------------------------------------------------------------
# AVI container codec (RIFF, stdlib struct — the same chunk grammar
# decode_wav walks, with LIST nesting). MJPEG video: each frame is a
# standalone baseline JPEG in a '00dc' chunk, decodable by
# operators/jpeg.py — so frame sampling needs no external ffmpeg.
# ---------------------------------------------------------------------------


def encode_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack pre-encoded JPEG frames as a minimal spec-correct MJPEG
    AVI: RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh 'vids'/
    'MJPG', strf BITMAPINFOHEADER } }, LIST movi { '00dc' chunks },
    idx1 } — readable by standard players, walkable by
    :func:`sample_frames`."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    n = len(jpeg_frames)
    bufsz = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        bufsz * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n, 0, 1, bufsz,  # frames, initial, streams, suggested buffer
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0,  # flags, priority, language, initial frames
            1, fps,  # dwScale / dwRate: frame time = scale/rate s
            0, n, bufsz, 0xFFFFFFFF, 0,  # start, length, bufsz, quality -1, samplesize
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = lst(b"movi", movi_body)
    # idx1: offsets are relative to the 'movi' fourcc position,
    # pointing at each chunk header (the convention players expect)
    idx_entries, off = [], 4
    for f in jpeg_frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_avi_frames(data: bytes):
    """Yield the raw codec payload of every video frame chunk
    ('00dc'/'00db', including inside 'rec ' groups) of a RIFF/AVI
    stream, in stream order. Pure chunk walking — no decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    # (start, end) byte ranges of chunk sequences still to walk,
    # beginning with the top-level body; LIST movi / rec bodies are
    # pushed as new ranges (explicit stack — no recursion depth limit)
    stack = [(12, len(data))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + ln, end)
            if tag == b"LIST" and data[body_start : body_start + 4] in (
                b"movi",
                b"rec ",
            ):
                stack.append((body_end + (ln & 1), end))  # resume after LIST
                pos, end = body_start + 4, body_end  # walk into it
                continue
            if tag[2:4] in (b"dc", b"db"):
                yield data[body_start:body_end]
            pos = body_end + (ln & 1)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def synthesize_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic media table derived from `documents` (the container
    ships no binary fixtures): each IMAGE payload is a REAL 8×8
    grayscale image whose pixels are the md5 stream of the text, in a
    per-row container chosen by d[4] mod 3 — PNG, baseline JPEG, or
    progressive JPEG — the way a crawled corpus mixes formats; each
    AUDIO payload is a REAL 16 kHz mono WAV of a short md5-seeded sine
    tone; each VIDEO payload is a REAL MJPEG-in-AVI of 2 + (d[3] mod 6)
    8×8 grayscale JPEG frames (frame i's pixels are the md5 stream
    shifted by i) — all decodable by this module's codecs (or any
    standard reader), so the whole codec path runs for real.
    Arrow-batched encode kernel; one map, no shuffle. The ``mime``
    column is computed JVM-side from the same md5 rule the kernel
    uses, so a codec-dispatch drift surfaces as a mime/payload
    mismatch."""
    from pyspark.sql.functions import pandas_udf

    from .jpeg import encode_jpeg, encode_jpeg_progressive
    from .parallelize import spread_for_cpu

    if kind not in ("image", "audio", "video"):
        raise ValueError(f"kind must be image|audio|video, got {kind!r}")
    # encode kernels are heavy per-row compute (DCT/Huffman for video);
    # a single-split documents scan would run them on one core — and the
    # downstream _shared_media checkpoint would FREEZE that narrow
    # partitioning for every decode consumer. No-op on wide scans.
    documents = spread_for_cpu(documents)

    @pandas_udf("binary")
    def make_image(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            d = hashlib.md5(("" if t is None else t).encode()).digest()
            pix = (d * 4)[:64]
            which = d[4] % 3
            if which == 0:
                out.append(encode_png(pix, 8, 8, 1))
            elif which == 1:
                out.append(encode_jpeg(pix, 8, 8, 1, quality=90))
            else:
                out.append(encode_jpeg_progressive(pix, 8, 8, 1, quality=90))
        return pd.Series(out)

    @pandas_udf("binary")
    def make_wav(text: pd.Series) -> pd.Series:
        out: list[bytes | None] = []
        adpcm_tones: list[np.ndarray] = []
        adpcm_slots: list[int] = []
        for t in text:
            d = hashlib.md5(("" if t is None else t).encode()).digest()
            freq = 200 + d[0] * 8  # 200-2240 Hz, text-deterministic
            n = 1600 + d[1] * 16  # 0.1-0.35 s at 16 kHz
            ts = np.arange(n, dtype=np.float64) / 16000.0
            tone = (np.sin(2 * np.pi * freq * ts) * (d[2] + 1) * 100).astype(np.int16)
            # container cycles PCM / IMA ADPCM by d[2] parity and
            # mono / stereo by d[3] parity — the way a crawled corpus
            # mixes codecs and layouts, so all four combinations are
            # hash-gated; the fact chunk keeps the ADPCM frame count
            # exact, so duration stays an arithmetic function of d[1]
            # and channels of d[3] for the oracle on EVERY path
            if d[3] & 1:
                tone = np.stack([tone, (tone // 2).astype(np.int16)], axis=1)
            if d[2] & 1:
                # defer: the ADPCM coder pays ~spb sequential numpy
                # steps per CALL — batch every ADPCM row of this Arrow
                # batch into one coder pass (byte-identical; see
                # encode_wav_adpcm_batch)
                adpcm_slots.append(len(out))
                adpcm_tones.append(tone)
                out.append(None)
            else:
                out.append(encode_wav(tone, 16000))
        for slot, wav in zip(
            adpcm_slots, encode_wav_adpcm_batch(adpcm_tones, 16000)
        ):
            out[slot] = wav
        return pd.Series(out)

    @pandas_udf("binary")
    def make_avi(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            d = hashlib.md5(("" if t is None else t).encode()).digest()
            n_frames = 2 + d[3] % 6  # 2..7 frames, text-deterministic
            base = np.frombuffer((d * 4)[:64], dtype=np.uint8).astype(np.int64)
            frames = [
                encode_jpeg(
                    ((base + i) % 256).astype(np.uint8).tobytes(), 8, 8, 1, quality=90
                )
                for i in range(n_frames)
            ]
            out.append(encode_avi(frames, 8, 8, fps=4))
        return pd.Series(out)

    payload = {"image": make_image, "audio": make_wav, "video": make_avi}[kind](
        F.col("text")
    )
    if kind == "image":
        # same d[4] % 3 rule as the kernel, computed JVM-side: md5 hex
        # chars 9..10 are digest byte 4
        mime = F.when(
            F.conv(F.substring(F.md5(F.coalesce(F.col("text"), F.lit(""))), 9, 2), 16, 10)
            .cast("int") % 3 == 0,
            F.lit("image/png"),
        ).otherwise(F.lit("image/jpeg"))
    else:
        mime = F.lit({"audio": "audio/wav", "video": "video/avi"}[kind])
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        mime.alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sniffed_mime", StringType()),
        StructField("digest", StringType()),
    ]
)


def extract_features(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas): size, magic-byte mime, content digest. The UDF
    receives pandas batches — the canonical shape for plugging in
    heavier per-payload work."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "sniffed_mime": pdf["payload"].map(
                        lambda b: sniff_mime(bytes(b) if b is not None else None)
                    ),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                }
            )
            yield out

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return media.mapInPandas(featurize, MEDIA_FEATURES_SCHEMA)


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def decode_images(media: DataFrame) -> DataFrame:
    """Decode image payloads to (w, h, c, raw pixels) with the REAL
    in-repo codecs — stdlib-zlib PNG (``decode_png``) and baseline
    DCT/Huffman JPEG (``jpeg.decode_jpeg``); null payloads and
    non-image rows are dropped; other image formats raise
    NotImplementedError. Pure map over Arrow batches."""
    from .jpeg import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                mime = sniff_mime(data)
                if mime == "image/png":
                    w, h, c, pix = decode_png(data)
                elif mime == "image/jpeg":
                    w, h, c, pix = decode_jpeg(data)
                elif mime.startswith("image/"):
                    raise NotImplementedError(
                        f"{mime} decode: only PNG and baseline JPEG codecs "
                        "are implemented in-repo"
                    )
                else:
                    continue  # non-image payloads pass through other operators
                rows.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "pixels": pix,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "pixels"]
            )

    return media.mapInPandas(run, DECODED_IMAGE_SCHEMA)


def encode_images(decoded: DataFrame, fmt: str = "png", quality: int = 90) -> DataFrame:
    """Transcode decoded pixel frames (``decode_images``/
    ``resize_images`` output) back to an interchange format — the
    write half of an image-normalization pipeline (decode → resize →
    re-encode). ``fmt`` is "png" (lossless) or "jpeg" (baseline,
    ``quality``). One row per image: (media_id, mime, payload). Pure
    map over Arrow batches, no shuffle at any scale."""
    from .jpeg import encode_jpeg

    if fmt not in ("png", "jpeg"):
        raise ValueError(f"fmt must be png|jpeg, got {fmt!r}")
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("mime", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for w, h, c, pix in zip(
                pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
            ):
                w, h, c, pix = int(w), int(h), int(c), bytes(pix)
                if fmt == "png":
                    payloads.append(encode_png(pix, w, h, c))
                else:
                    payloads.append(encode_jpeg(pix, w, h, c, quality))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "image/png" if fmt == "png" else "image/jpeg",
                    "payload": payloads,
                }
            )

    return decoded.mapInPandas(run, schema)


def resize_images(
    decoded: DataFrame, out_w: int = 32, out_h: int = 32, method: str = "nearest"
) -> DataFrame:
    """REAL resize over decoded pixel buffers (vectorized numpy — no
    external image library): ``method="nearest"`` (integer index maps)
    or ``method="bilinear"`` (align-corners-false sample-grid
    interpolation, the convention of the mainstream tensor libraries).
    Input is ``decode_images`` output; one row per image, bounded
    output size (out_w × out_h × channels bytes)."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"method must be nearest|bilinear, got {method!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for w, h, c, pix in zip(
                pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
            ):
                w, h, c = int(w), int(h), int(c)
                img = np.frombuffer(bytes(pix), dtype=np.uint8).reshape(h, w, c)
                if method == "nearest":
                    ys = (np.arange(out_h) * h) // out_h
                    xs = (np.arange(out_w) * w) // out_w
                    out_px.append(img[ys][:, xs].tobytes())
                    continue
                # bilinear: source sample positions at output-pixel
                # centers (align_corners=False), edge-clamped
                fy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
                fx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
                y0 = np.floor(fy).astype(np.int64)
                x0 = np.floor(fx).astype(np.int64)
                y1 = np.minimum(y0 + 1, h - 1)
                x1 = np.minimum(x0 + 1, w - 1)
                wy = (fy - y0)[:, None, None]
                wx = (fx - x0)[None, :, None]
                f = img.astype(np.float64)
                top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
                bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
                out = top * (1 - wy) + bot * wy
                out_px.append(
                    np.clip(np.round(out), 0, 255).astype(np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "channels": pdf["channels"],
                    "pixels": out_px,
                }
            )

    return decoded.mapInPandas(run, DECODED_IMAGE_SCHEMA)


def _gray2d(pix: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Decoded pixel buffer -> 2-D uint8 luma grid. Gray / gray+alpha
    take the luma channel directly; RGB / RGBA use fixed-point BT.601
    weights ((77R + 150G + 29B) >> 8) so the result is bit-stable
    across platforms (no float rounding)."""
    img = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
    if c <= 2:
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def dhash_bits(gray: np.ndarray) -> int:
    """Difference hash (dHash) of a 2-D luma grid: bit (r, c) = 1 iff
    gray[r, c+1] > gray[r, c], packed at position r*(w-1) + c. The
    classic gradient-direction perceptual hash — invariant to global
    brightness/contrast shifts, and a small pixel perturbation flips
    only the bits whose adjacent comparison it straddles, so perceptual
    near-duplicates land at small Hamming distance.

    Requires 0 < (w-1)*h <= 64; a 64-bit result (the standard 9x8
    grid) wraps into a signed int64 two's-complement — XOR / bit_count
    Hamming semantics are unaffected by the sign bit."""
    h, w = gray.shape
    nbits = (w - 1) * h
    if not 0 < nbits <= 64:
        raise ValueError(f"dhash needs 0 < (w-1)*h <= 64 bits, got {w}x{h}")
    bits = (gray[:, 1:] > gray[:, :-1]).astype(np.uint64).ravel()
    total = int((bits << np.arange(nbits, dtype=np.uint64)).sum())
    return total - (1 << 64) if total >= 1 << 63 else total


IMAGE_DHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("dhash", LongType())]
)


def image_dhash(decoded: DataFrame, grid: tuple[int, int] | None = (9, 8)) -> DataFrame:
    """Per-image perceptual hash over DECODED pixel frames
    (``decode_images`` output): grayscale -> (optionally) bilinear
    resize to ``grid=(w, h)`` -> :func:`dhash_bits`. The default 9x8
    grid is the standard 64-bit dHash; ``grid=None`` hashes at native
    resolution (requires (w-1)*h <= 64 per image — the thumbnail
    path, exact for lossless codecs since no resampling happens).

    Pure Arrow map, no shuffle; output (media_id, dhash BIGINT) is the
    input to :func:`image_neardup_pairs`."""
    if grid is not None:
        decoded = resize_images(
            decoded, out_w=grid[0], out_h=grid[1], method="bilinear"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                dhash_bits(_gray2d(bytes(pix), int(w), int(h), int(c)))
                for w, h, c, pix in zip(
                    pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
                )
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "dhash": hashes})

    return decoded.mapInPandas(run, IMAGE_DHASH_SCHEMA)


def hamming_neardup_pairs(
    hashes: DataFrame,
    bands: int = 4,
    bits: int = 64,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    hot_cap: int | None = None,
    hot_mode: str = "star",
) -> DataFrame:
    """Near-duplicate pairs from ANY fixed-width perceptual hash
    column (image dHash, audio fingerprint, ...): Hamming-LSH band
    blocking (candidates share >= 1 of ``bands`` contiguous
    ``bits/bands``-wide hash slices — d bit flips corrupt at most d
    bands, so pairs within ``max_hamming < bands`` Hamming distance
    are guaranteed a surviving band) then an exact
    ``bit_count(a XOR b) <= max_hamming`` verify. The media analog of
    the SimHash text tier (``dedup.simhash_edit_pairs``), downstream
    of real decode: re-encoded / brightness-shifted / volume-shifted /
    lightly-edited crawl media collapse to the same cluster.

    The default tightened from max_hamming=6 to 3 when the guard below
    landed: the old default silently violated the banding guarantee
    (a distance-4 pair can corrupt all 4 bands). Callers wanting a
    wider radius must also widen ``bands`` (e.g. bands=8 for
    max_hamming<=7, costing one more band row per hash).

    Scale: identical viral payloads make degenerate hot buckets, so
    pairing goes through ``buckets.bucket_mate_pairs`` (per-task
    memory bounded by ``hot_cap``; over-cap buckets star-paired, never
    silently truncated). Candidate ids are deduped before hashes are
    re-attached; the two id->hash joins are plain shuffle-hash joins.
    All post-kernel math (band slices, XOR popcount) is pure Column —
    codegen, no Python."""
    from . import buckets

    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    if max_hamming >= bands:
        # d bit flips can corrupt up to d bands: only max_hamming <
        # bands guarantees a surviving shared band. Beyond that the
        # blocking silently drops in-threshold pairs — refuse instead.
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming "
            f"(got {bands}) for the banding guarantee"
        )
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = hashes.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"shiftrightunsigned({hash_col}, {i * band_bits}) & {mask}"
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    kw = {} if hot_cap is None else {"hot_cap": hot_cap}
    cand = (
        buckets.bucket_mate_pairs(
            banded, ["band_idx", "band_val"], id_col, hot_mode=hot_mode, **kw
        )
        .withColumnsRenamed({"a": "a_id", "b": "b_id"})
        .distinct()
    )
    ha = hashes.select(F.col(id_col).alias("a_id"), F.col(hash_col).alias("h_a"))
    hb = hashes.select(F.col(id_col).alias("b_id"), F.col(hash_col).alias("h_b"))
    return (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


#: Image-named alias — same implementation, documented generic.
image_neardup_pairs = hamming_neardup_pairs


def audio_envelope_bits(samples: np.ndarray, blocks: int = 65) -> int:
    """Energy-envelope perceptual hash of a mono PCM signal: split
    into ``blocks`` equal-length windows, take exact int64 energy
    (sum of squared samples) per window, and emit bit i = 1 iff
    energy[i+1] > energy[i] — the sign-of-delta chain the published
    audio fingerprints (Chromaprint/AcoustID, Haitsma-Kalker) apply
    per spectral band, here over the time-domain envelope so the hash
    stays exact-integer and engine-portable. Uniform gain scales every
    window energy identically, so the hash is volume-invariant; a
    localized edit flips only the bits whose windows it straddles.
    Trailing samples that don't fill the equal-division grid are
    dropped (deterministic for any length >= blocks)."""
    if blocks < 2 or blocks > 65:
        raise ValueError(f"blocks must be in [2, 65], got {blocks}")
    n = len(samples) // blocks
    if n == 0:
        raise ValueError(f"need >= {blocks} samples, got {len(samples)}")
    x = samples[: n * blocks].astype(np.int64).reshape(blocks, n)
    e = (x * x).sum(axis=1)  # exact: n * 32767^2 < 2^63 for n < 8.5e9
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    total = int((bits << np.arange(blocks - 1, dtype=np.uint64)).sum())
    return total - (1 << 64) if total >= 1 << 63 else total


AUDIO_FINGERPRINT_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("afp", LongType())]
)


def audio_fingerprint(media: DataFrame, blocks: int = 65) -> DataFrame:
    """Per-payload audio perceptual hash: decode WAV (PCM or ADPCM)
    with the in-repo codec, mono-mix, and compute the 64-bit
    energy-envelope hash (:func:`audio_envelope_bits`). Output
    (media_id, afp BIGINT) feeds :func:`hamming_neardup_pairs` — the
    audio leg of the media near-dup tier. Non-audio / null / too-short
    payloads are dropped. Pure Arrow map, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # batch-decode the WAVs (decode_wav_batch): the ADPCM
            # payloads of the whole Arrow batch pay the sequential
            # sample-steps once instead of once per payload
            ids, datas = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                if sniff_mime(data) != "audio/wav":
                    continue
                ids.append(media_id)
                datas.append(data)
            rows = []
            for media_id, (_rate, _ch, samples) in zip(
                ids, decode_wav_batch(datas)
            ):
                mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
                if len(mono) < blocks:
                    continue
                rows.append(
                    {"media_id": media_id, "afp": audio_envelope_bits(mono, blocks)}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FINGERPRINT_SCHEMA.fields]
            )

    return media.mapInPandas(run, AUDIO_FINGERPRINT_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", IntegerType()),
        StructField("peak", IntegerType()),
        StructField("zero_cross_rate_ppm", IntegerType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads with the REAL stdlib codec and compute the
    audio-quality features a training pipeline gates on: duration, RMS
    energy, peak amplitude, zero-crossing rate (all integer-quantized
    so results are bit-stable across partitionings — rms/peak in int16
    units, ZCR in crossings per million frame steps). Non-audio and
    null rows are dropped; numpy-vectorized per payload, pure map, no
    shuffle at any scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # batch-decode (see audio_fingerprint): one sequential
            # ADPCM pass per Arrow batch, not per payload
            ids, datas = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                if sniff_mime(data) != "audio/wav":
                    continue
                ids.append(media_id)
                datas.append(data)
            rows = []
            for media_id, (rate, ch, samples) in zip(ids, decode_wav_batch(datas)):
                mono = samples.astype(np.int64).mean(axis=1)
                n = len(mono)
                crossings = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": rate,
                        "channels": ch,
                        "n_frames": n,
                        "duration_ms": int(n * 1000 // rate),
                        "rms": int(np.sqrt(np.mean(mono**2))) if n else 0,
                        "peak": int(np.abs(samples).max()) if n else 0,
                        "zero_cross_rate_ppm": int(crossings * 1_000_000 // max(1, n - 1)),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


MEDIA_MANIFEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("sniffed_mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def media_manifest(media: DataFrame) -> DataFrame:
    """ONE-PASS multimodal manifest: magic-byte sniff + kind-specific
    decode (PNG/JPEG dims + native-resolution perceptual dhash for
    thumbnail-sized images, WAV duration + frame count, MJPEG-AVI
    frame count + frame dims) fused into a single Arrow kernel.

    Why it exists next to the composable operators: at 100 TB the
    payload column IS the table — composing ``extract_features`` +
    ``decode_images`` + ``extract_audio_features`` + ``sample_frames``
    scans the payload bytes twice (the sniff pass and the per-kind
    decode pass) and reassembles rows through three metadata joins.
    This kernel reads each payload ONCE and emits the finished manifest
    row: half the payload I/O, zero joins, zero shuffle at any scale.
    The composed form stays available for pipelines that need the
    intermediate frames; ``tests/test_multimodal.py`` pins the two
    forms equivalent. Unknown payload kinds get a sniff row with null
    modality columns (they pass through, not error — the dominant case
    in a crawled corpus)."""
    from .jpeg import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else None
                mime = sniff_mime(data)
                w = h = c = dur = nf = dh = None
                if mime == "image/png":
                    w, h, c, pix = decode_png(data)
                elif mime == "image/jpeg":
                    w, h, c, pix = decode_jpeg(data)
                if mime in ("image/png", "image/jpeg") and 0 < (w - 1) * h <= 64:
                    # thumbnail-sized images hash at NATIVE resolution
                    # (exact for lossless codecs — no resampling);
                    # larger images get the standard resized 9x8 hash
                    # via image_dhash, not here (the fused manifest
                    # stays a cheap metadata pass)
                    dh = dhash_bits(_gray2d(pix, w, h, c))
                elif mime == "audio/wav":
                    # header-only: duration/frame-count are RIFF facts
                    # (PCM data length; ADPCM fact chunk) — the fused
                    # manifest must not pay a sample decode for them.
                    # Sample-level decode (incl. the vectorized ADPCM
                    # path) runs in extract_audio_features + the codec
                    # round-trip tests.
                    rate, c, nf = wav_header_info(data)
                    dur = nf * 1000 // rate
                elif mime == "video/avi":
                    nf = 0
                    for frame in iter_avi_frames(data):
                        if frame[:2] != b"\xff\xd8":
                            raise NotImplementedError(
                                "non-MJPEG video frame chunk: only MJPEG AVIs "
                                "decode in-repo"
                            )
                        fw, fh, fc, _ = decode_jpeg(frame)
                        w = fw if w is None else max(w, fw)
                        h = fh if h is None else max(h, fh)
                        c = fc if c is None else max(c, fc)
                        nf += 1
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "sniffed_mime": mime,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "duration_ms": dur,
                        "n_frames": nf,
                        "dhash": dh,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_MANIFEST_SCHEMA.fields]
            )

    return media.mapInPandas(run, MEDIA_MANIFEST_SCHEMA)


SAMPLED_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL video frame sampling (no ffmpeg): walk each MJPEG-in-AVI
    payload's RIFF 'movi' list (:func:`iter_avi_frames` — the same
    chunk grammar ``decode_wav`` walks), keep every ``every_n``-th
    frame, and decode it with the in-repo baseline JPEG codec
    (``jpeg.decode_jpeg``). One row per sampled frame, decoded to raw
    pixels — the schema ``decode_images`` emits plus ``frame_no``, so
    sampled frames feed ``resize_images``/``encode_images`` directly.

    Null and non-AVI rows are dropped (pass through other operators);
    a frame chunk that is not a JPEG raises NotImplementedError — a
    non-MJPEG FourCC needs its own codec, an honest external boundary.

    One-to-many Arrow mapInPandas, pure map: no shuffle at any scale.
    Skipped frames cost only the chunk walk (header reads), not a
    decode — sampling 1-in-100 does ~1/100th of the DCT work."""
    from .jpeg import decode_jpeg

    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                if sniff_mime(data) != "video/avi":
                    continue
                for idx, frame in enumerate(iter_avi_frames(data)):
                    if idx % every_n:
                        continue
                    if frame[:2] != b"\xff\xd8":
                        raise NotImplementedError(
                            "non-MJPEG video frame chunk: only MJPEG AVIs "
                            "decode in-repo"
                        )
                    w, h, c, px = decode_jpeg(frame)
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_no": idx,
                            "width": w,
                            "height": h,
                            "channels": c,
                            "pixels": px,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SAMPLED_FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(run, SAMPLED_FRAME_SCHEMA)
