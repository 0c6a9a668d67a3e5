"""Fuzzed invariants for the real codec kernels (hypothesis, no Spark)
plus the winnowing guarantee (one batched Spark job): these are the
components whose failure modes are silent data corruption, so they get
adversarial inputs, not just the fixture corpus."""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from e_commerce_lakehouse_spark.operators import multimodal as mm

# -- PNG --------------------------------------------------------------------


@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    channels=st.sampled_from([1, 3]),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_shape(w, h, channels, data):
    n = w * h * channels
    pix = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    assert mm.decode_png(mm.encode_png(pix, w, h, channels)) == (w, h, channels, pix)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    channels=st.sampled_from([1, 3]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_decoder_defilters_random_filter_choices(w, h, channels, data):
    """Encode with RANDOM per-scanline filter types (our encoder only
    emits filter 0, but real PNGs use all five) and require the decoder
    to recover the exact pixels."""
    stride = w * channels
    img = np.frombuffer(
        bytes(data.draw(st.binary(min_size=stride * h, max_size=stride * h))),
        dtype=np.uint8,
    ).reshape(h, stride)
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    lines, prev = [], np.zeros(stride, dtype=int)
    for y, f in enumerate(filters):
        cur = img[y].astype(int)
        enc = np.zeros(stride, dtype=int)
        for x in range(stride):
            a = cur[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
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
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + mm._png_chunk(b"IEND", b"")
    )
    assert mm.decode_png(png) == (w, h, channels, img.tobytes())


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 8),
    channels=st.sampled_from([2, 4]),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_png_alpha_roundtrip_any_shape(w, h, channels, data):
    n = w * h * channels
    pix = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    assert mm.decode_png(mm.encode_png(pix, w, h, channels)) == (w, h, channels, pix)


@given(
    w=st.integers(1, 17),
    h=st.integers(1, 6),
    depth=st.sampled_from([1, 2, 4, 8]),
    n_colors=st.integers(2, 16),
    with_trns=st.booleans(),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_palette_lut_any_depth(w, h, depth, n_colors, with_trns, data):
    """Random palette, random indices, every sub-byte depth: decode
    must reproduce LUT[idx] exactly (RGBA when tRNS present)."""
    n_colors = min(n_colors, 1 << depth)
    plte = bytes(data.draw(st.binary(min_size=n_colors * 3, max_size=n_colors * 3)))
    idx = np.array(
        [data.draw(st.integers(0, n_colors - 1)) for _ in range(w * h)],
        dtype=np.uint8,
    ).reshape(h, w)
    # pack rows at the given depth (big-endian within byte)
    stride = (w * depth + 7) // 8
    raw = b""
    for y in range(h):
        # take the low `depth` bits of each index, big-endian
        rowbits = np.unpackbits(idx[y][:, None], axis=1)[:, 8 - depth :].ravel()
        padded = np.pad(rowbits, (0, stride * 8 - len(rowbits)))
        raw += b"\x00" + np.packbits(padded).tobytes()
    trns = (
        bytes(data.draw(st.binary(min_size=1, max_size=n_colors)))
        if with_trns
        else None
    )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    png = mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr) + mm._png_chunk(b"PLTE", plte)
    if trns is not None:
        png += mm._png_chunk(b"tRNS", trns)
    png += mm._png_chunk(b"IDAT", zlib.compress(raw)) + mm._png_chunk(b"IEND", b"")
    got_w, got_h, got_c, got_px = mm.decode_png(png)
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if trns is not None:
        alpha = np.full(n_colors, 255, dtype=np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        lut = np.concatenate([lut, alpha[:, None]], axis=1)
    assert (got_w, got_h, got_c) == (w, h, lut.shape[1])
    assert got_px == lut[idx].tobytes()


@given(
    w=st.integers(1, 16),
    h=st.integers(1, 6),
    channels=st.sampled_from([1, 3]),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_png_16bit_high_byte_downshift(w, h, channels, data):
    n = w * h * channels
    raw16 = bytes(data.draw(st.binary(min_size=n * 2, max_size=n * 2)))
    rows = b"".join(
        b"\x00" + raw16[y * w * channels * 2 : (y + 1) * w * channels * 2]
        for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0 if channels == 1 else 2, 0, 0, 0)
    png = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(rows))
        + mm._png_chunk(b"IEND", b"")
    )
    want = np.frombuffer(raw16, dtype=np.uint8).reshape(-1, 2)[:, 0]  # high bytes
    assert mm.decode_png(png) == (w, h, channels, want.tobytes())


# -- WAV --------------------------------------------------------------------


@given(
    n=st.integers(1, 4000),
    rate=st.sampled_from([8000, 16000, 44100]),
    stereo=st.booleans(),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_any_signal(n, rate, stereo, data):
    raw = bytes(data.draw(st.binary(min_size=n * 2 * (2 if stereo else 1),
                                    max_size=n * 2 * (2 if stereo else 1))))
    samples = np.frombuffer(raw, dtype=np.int16)
    if stereo:
        samples = samples.reshape(-1, 2)
    out_rate, out_ch, out = mm.decode_wav(mm.encode_wav(samples, rate))
    assert (out_rate, out_ch) == (rate, 2 if stereo else 1)
    assert np.array_equal(out, samples.reshape(-1, 2 if stereo else 1))


# -- Winnowing guarantee (batched Spark) -------------------------------------


def test_winnowing_guarantee_planted_substrings(spark):
    """Schleimer/Wilkerson/Aiken theorem: any shared substring of
    k + window - 1 tokens forces a shared fingerprint. Plant a common
    run of exactly that length into 40 otherwise-disjoint random doc
    pairs (one Spark job, seeded RNG) and require overlap in every
    pair; also require disjoint-vocabulary pairs to share nothing."""
    import random

    from e_commerce_lakehouse_spark.operators.text import winnowing_fingerprints

    k, window = 3, 4
    guarantee = k + window - 1  # 6 shared tokens
    rng = random.Random(7)
    rows = []
    for i in range(40):
        shared = [f"s{i}_{j}" for j in range(guarantee)]
        mk = lambda tag: [
            f"{tag}{i}_{rng.randrange(1000)}" for _ in range(rng.randrange(4, 30))
        ]
        rows.append((2 * i, " ".join(mk("a") + shared + mk("b"))))
        rows.append((2 * i + 1, " ".join(mk("c") + shared + mk("d"))))
    # 10 control pairs with fully disjoint vocabularies
    for i in range(40, 50):
        rows.append((2 * i, " ".join(f"x{i}_{j}" for j in range(12))))
        rows.append((2 * i + 1, " ".join(f"y{i}_{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fps"].split(","))
        for r in winnowing_fingerprints(docs, k=k, window=window).collect()
    }
    for i in range(40):
        assert fps[2 * i] & fps[2 * i + 1], f"planted pair {i} shares no fingerprint"
    for i in range(40, 50):
        assert not (fps[2 * i] & fps[2 * i + 1]), f"control pair {i} overlaps"


# -- JPEG -------------------------------------------------------------------


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    channels=st.sampled_from([1, 3]),
    quality=st.integers(30, 100),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_any_shape(w, h, channels, quality, data):
    """Baseline JPEG must decode to the ORIGINAL dims/channels for any
    image shape (including non-multiple-of-8 and 1-pixel edges) and
    stay within lossy-codec error of the source. Error bound: DCT
    quantization at q>=30 keeps smooth images close; pure noise is the
    worst case, so the bound is loose but still catches structural
    bugs (plane swaps, off-by-one defiltering, block misalignment)."""
    from e_commerce_lakehouse_spark.operators import jpeg

    n = w * h * channels
    pix = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    blob = jpeg.encode_jpeg(pix, w, h, channels, quality=quality)
    W, H, C, out = jpeg.decode_jpeg(blob)
    assert (W, H, C) == (w, h, channels)
    assert len(out) == n
    a = np.frombuffer(pix, dtype=np.uint8).astype(int)
    b = np.frombuffer(out, dtype=np.uint8).astype(int)
    # worst-case (noise) quantization error at q=30 stays far below a
    # structural failure, which shifts/permutes whole blocks (err~85+)
    assert np.abs(a - b).mean() < 70


@given(
    w=st.integers(8, 32),
    h=st.integers(8, 32),
    restart=st.integers(1, 9),
    data=st.data(),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_restart_interval_equivalence(w, h, restart, data):
    """RSTn markers are resync metadata — any restart interval must
    decode to the IDENTICAL pixels as the no-restart encoding."""
    from e_commerce_lakehouse_spark.operators import jpeg

    n = w * h
    pix = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(pix, w, h, 1, quality=80))
    rst = jpeg.decode_jpeg(
        jpeg.encode_jpeg(pix, w, h, 1, quality=80, restart_interval=restart)
    )
    assert plain == rst


def _interlaced_png(samples, depth, color, plte=None, trns=None):
    """Assemble an Adam7-interlaced PNG (filter 0 rows) from a
    (h, w, raw_ch) sample grid — indices for palette color."""
    h, w, _ch = samples.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in mm._ADAM7:
        sub = samples[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        for y in range(ph):
            vals = sub[y].reshape(-1)
            if depth == 8:
                rowb = bytes(vals.astype(np.uint8))
            elif depth == 16:
                rowb = b"".join(struct.pack(">H", int(v)) for v in vals)
            else:
                bits = np.unpackbits(
                    vals.astype(np.uint8)[:, None], axis=1
                )[:, 8 - depth :].ravel()
                stride = (pw * depth + 7) // 8
                rowb = np.packbits(
                    np.pad(bits, (0, stride * 8 - len(bits)))
                ).tobytes()
            raw += b"\x00" + rowb
    png = mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
    if plte is not None:
        png += mm._png_chunk(b"PLTE", plte)
    if trns is not None:
        png += mm._png_chunk(b"tRNS", trns)
    return png + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw))) + mm._png_chunk(
        b"IEND", b""
    )


@given(
    w=st.integers(1, 21),
    h=st.integers(1, 19),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_adam7_exact_any_shape(w, h, channels, data):
    """Adam7 is a pixel permutation: decoding the interlaced layout
    must reproduce the sample grid exactly at every dimension parity
    (sub-8 dims leave some passes empty)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    img = np.array(
        [data.draw(st.integers(0, 255)) for _ in range(w * h * channels)],
        dtype=np.uint8,
    ).reshape(h, w, channels)
    got_w, got_h, got_c, got_px = mm.decode_png(_interlaced_png(img, 8, color))
    assert (got_w, got_h, got_c) == (w, h, channels)
    assert got_px == img.tobytes()


@given(w=st.integers(1, 12), h=st.integers(1, 12), data=st.data())
@settings(max_examples=20, deadline=None)
def test_png_adam7_16bit_and_palette(w, h, data):
    """Interlaced 16-bit gray downshifts the high byte; interlaced
    4-bit palette LUT-expands — same contracts as the plain layouts."""
    img16 = np.array(
        [data.draw(st.integers(0, 65535)) for _ in range(w * h)], dtype=np.uint16
    ).reshape(h, w, 1)
    got = mm.decode_png(_interlaced_png(img16, 16, 0))
    assert got[:3] == (w, h, 1)
    assert got[3] == (img16[..., 0] >> 8).astype(np.uint8).tobytes()

    plte = bytes(data.draw(st.binary(min_size=48, max_size=48)))
    idx = np.array(
        [data.draw(st.integers(0, 15)) for _ in range(w * h)], dtype=np.uint8
    ).reshape(h, w, 1)
    got_w, got_h, got_c, got_px = mm.decode_png(_interlaced_png(idx, 4, 3, plte=plte))
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(16, 3)
    assert (got_w, got_h, got_c) == (w, h, 3)
    assert got_px == lut[idx[..., 0]].tobytes()
