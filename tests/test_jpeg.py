"""Baseline JPEG codec gates (operators/jpeg.py): round-trip fidelity
within quantization error, marker/restart handling, honest
NotImplementedError boundaries, and the Spark-side decode/transcode
plumbing over mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import multimodal
from e_commerce_lakehouse_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 5 + xx * 3) % 200
    img = np.stack([(base + 20 * i) % 256 for i in range(c)], axis=-1)
    img = np.clip(img + rng.integers(0, 12, (h, w, c)), 0, 255)
    return img.astype(np.uint8)


def test_huffman_specs_are_valid():
    # counts match symbols and Kraft inequality holds (prefix-free)
    for bits, vals in ((_DC_BITS, _DC_VALS), (_AC_BITS, _AC_VALS)):
        assert sum(bits) == len(vals)
        assert sum(n / (1 << (i + 1)) for i, n in enumerate(bits)) <= 1.0


@pytest.mark.parametrize("h,w,c", [(23, 37, 1), (16, 40, 3), (8, 8, 1), (9, 9, 3)])
def test_roundtrip_within_quantization_error(h, w, c):
    img = _gradient(h, w, c)
    blob = encode_jpeg(img.tobytes(), w, h, c, quality=90)
    assert blob[:3] == b"\xff\xd8\xff" and blob[-2:] == b"\xff\xd9"
    W, H, C, px = decode_jpeg(blob)
    assert (W, H, C) == (w, h, c)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 5.0 and err.max() <= 35


def test_restart_intervals_roundtrip():
    img = _gradient(64, 48, 3, seed=3)
    blob = encode_jpeg(img.tobytes(), 48, 64, 3, quality=85, restart_interval=5)
    assert b"\xff\xdd" in blob  # DRI segment present
    W, H, C, px = decode_jpeg(blob)
    out = np.frombuffer(px, dtype=np.uint8).reshape(64, 48, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 5.0


def test_quality_monotonic_size():
    img = _gradient(32, 32, 1, seed=1)
    sizes = [len(encode_jpeg(img.tobytes(), 32, 32, 1, quality=q)) for q in (30, 60, 95)]
    assert sizes == sorted(sizes)


def test_unsupported_shapes_raise_honestly():
    img = _gradient(16, 16, 1)
    blob = bytearray(encode_jpeg(img.tobytes(), 16, 16, 1))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    # a baseline stream RELABELED as progressive is invalid (a
    # progressive scan with Ss=0 must have Se=0) — fail loudly, not
    # decode garbage
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(blob))


def test_fill_bytes_and_parameterless_markers_tolerated():
    """ITU-T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes, and TEM/stray-RSTn markers carry no length field —
    foreign JPEGs using either must parse identically, not be misread
    as length-prefixed segments."""
    img = _gradient(16, 16, 1, seed=2)
    blob = encode_jpeg(img.tobytes(), 16, 16, 1)
    want = decode_jpeg(blob)
    # splice fill bytes + TEM + stray RST0 between SOI and APP0
    doctored = blob[:2] + b"\xff\xff" + b"\xff\x01" + b"\xff\xd0" + blob[2:]
    assert decode_jpeg(doctored) == want


def test_decode_images_handles_jpeg_and_png(spark):
    """decode_images must route per-payload by magic bytes: PNG rows
    through the zlib codec, JPEG rows through the DCT codec — one
    mixed frame, real pixels back from both."""
    img = _gradient(8, 8, 1, seed=5)
    png_blob = multimodal.encode_png(img.tobytes(), 8, 8, 1)
    jpg_blob = encode_jpeg(img.tobytes(), 8, 8, 1, quality=95)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png_blob)), (2, "image", bytearray(jpg_blob))],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r for r in multimodal.decode_images(media).collect()}
    assert rows[1].width == rows[2].width == 8
    assert rows[1].channels == rows[2].channels == 1
    # PNG is lossless; JPEG within quantization error of the PNG pixels
    a = np.frombuffer(bytes(rows[1].pixels), dtype=np.uint8).astype(int)
    b = np.frombuffer(bytes(rows[2].pixels), dtype=np.uint8).astype(int)
    assert np.array_equal(a, img.reshape(-1))
    assert np.abs(a - b).mean() < 6.0


def test_transcode_pipeline_decode_resize_reencode(spark):
    """The full normalization pipeline: synthesize PNG -> decode ->
    resize -> re-encode as JPEG -> decode again. Dims survive, pixels
    stay within lossy tolerance."""
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words", "test") for i in range(8)],
        "doc_id long, text string, source string",
    )
    media = multimodal.synthesize_media(docs, kind="image")
    decoded = multimodal.decode_images(media)
    resized = multimodal.resize_images(decoded, out_w=16, out_h=16)
    jpegs = multimodal.encode_images(resized, fmt="jpeg", quality=95)
    assert jpegs.count() == 8
    again = multimodal.decode_images(
        jpegs.select("media_id", F.lit("image").alias("kind"), "payload")
    )
    rows = again.collect()
    assert len(rows) == 8
    assert all(r.width == 16 and r.height == 16 and r.channels == 1 for r in rows)
    # and the round-trip is faithful per image
    orig = {r.media_id: np.frombuffer(bytes(r.pixels), dtype=np.uint8).astype(int)
            for r in resized.collect()}
    for r in rows:
        back = np.frombuffer(bytes(r.pixels), dtype=np.uint8).astype(int)
        assert np.abs(back - orig[r.media_id]).mean() < 8.0


@pytest.mark.parametrize("ss", ["4:2:2", "4:2:0"])
@pytest.mark.parametrize("h,w", [(16, 16), (17, 13), (64, 48), (9, 7), (1, 1)])
def test_subsampled_roundtrip(ss, h, w):
    """Chroma-subsampled encode -> decode stays within lossy tolerance
    at every dimension parity (odd dims exercise the padded MCU grid
    and the post-upsample crop)."""
    img = _gradient(h, w, 3, seed=11)
    blob = encode_jpeg(img.tobytes(), w, h, 3, quality=92, subsampling=ss)
    W, H, C, px = decode_jpeg(blob)
    assert (W, H, C) == (w, h, 3)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # luma must stay near-exact even though chroma is subsampled: check
    # the BT.601 luma projection separately from the raw channels
    luma = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert np.abs(luma(out.astype(float)) - luma(img.astype(float))).mean() < 6.0
    assert err.mean() < 16.0


def test_subsampled_flat_chroma_is_exact():
    """A gray-in-RGB image (chroma planes are constant 128) must
    round-trip 4:2:0 with the same fidelity as 4:4:4 — box-downsample
    and replication-upsample are exact inverses on flat chroma."""
    g = _gradient(24, 32, 1, seed=4)[..., 0]
    img = np.stack([g, g, g], axis=-1).astype(np.uint8)
    for ss in ("4:4:4", "4:2:0"):
        blob = encode_jpeg(img.tobytes(), 32, 24, 3, quality=95, subsampling=ss)
        _, _, _, px = decode_jpeg(blob)
        out = np.frombuffer(px, dtype=np.uint8).reshape(24, 32, 3)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0


def test_subsampled_restart_intervals():
    img = _gradient(40, 56, 3, seed=9)
    blob = encode_jpeg(
        img.tobytes(), 56, 40, 3, quality=88, restart_interval=3, subsampling="4:2:0"
    )
    assert b"\xff\xdd" in blob
    W, H, C, px = decode_jpeg(blob)
    out = np.frombuffer(px, dtype=np.uint8).reshape(40, 56, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 16.0


def test_sof_sampling_byte_is_written():
    """The SOF0 component spec must carry (h<<4)|v: 0x22 luma / 0x11
    chroma for 4:2:0 — what any foreign decoder keys on."""
    img = _gradient(16, 16, 3)
    blob = encode_jpeg(img.tobytes(), 16, 16, 3, subsampling="4:2:0")
    sof = blob.find(b"\xff\xc0")
    comps = blob[sof + 4 + 6 : sof + 4 + 6 + 9]
    assert comps[1] == 0x22 and comps[4] == 0x11 and comps[7] == 0x11


def test_non_dividing_factors_raise():
    """Fractional upsampling ratios (e.g. 3x1 luma in a 2-max grid)
    are out of scope and must fail loudly, not decode wrong."""
    img = _gradient(16, 16, 3)
    blob = bytearray(encode_jpeg(img.tobytes(), 16, 16, 3, subsampling="4:2:0"))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 4 + 6 + 1] = 0x32  # luma h=3, v=2
    blob[sof + 4 + 6 + 4] = 0x21  # chroma h=2: 2 does not divide hmax=3
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(bytes(blob))


def test_bad_subsampling_arg_raises():
    img = _gradient(8, 8, 3)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img.tobytes(), 8, 8, 3, subsampling="4:1:1")


# ---------------------------------------------------------------------------
# Progressive (SOF2) codec gates
# ---------------------------------------------------------------------------


def _prog_cases():
    return [
        (8, 8, 1, "4:4:4"),
        (23, 37, 1, "4:4:4"),
        (16, 40, 3, "4:4:4"),
        (9, 9, 3, "4:4:4"),
        (17, 13, 3, "4:2:0"),
        (64, 48, 3, "4:2:2"),
        (1, 1, 1, "4:4:4"),
        (9, 7, 3, "4:2:0"),
    ]


@pytest.mark.parametrize("h,w,c,ss", _prog_cases())
def test_progressive_decode_is_bitexact_vs_baseline(h, w, c, ss):
    """Progressive and baseline encode the SAME quantized coefficients
    at a given quality, so a full progressive decode must be
    bit-identical to the baseline decode — the strongest possible
    cross-check of the EOB-run / refinement scan paths."""
    from e_commerce_lakehouse_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient(h, w, c, seed=h * w + c)
    blob = encode_jpeg_progressive(img.tobytes(), w, h, c, quality=90, subsampling=ss)
    assert b"\xff\xc2" in blob  # SOF2 frame header
    base = decode_jpeg(encode_jpeg(img.tobytes(), w, h, c, quality=90, subsampling=ss))
    assert decode_jpeg(blob) == base


def test_progressive_noise_fuzz_bitexact():
    """Random-noise images maximize coefficient density (ZRL runs,
    high magnitudes, correction-bit traffic in refinement scans) —
    every seed must stay bit-exact vs baseline at a random quality."""
    from e_commerce_lakehouse_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    for _ in range(12):
        h, w = int(rng.integers(1, 60)), int(rng.integers(1, 60))
        c = int(rng.choice([1, 3]))
        ss = str(rng.choice(["4:4:4", "4:2:2", "4:2:0"])) if c == 3 else "4:4:4"
        q = int(rng.integers(5, 99))
        img = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img.tobytes(), w, h, c, quality=q, subsampling=ss))
        prog = decode_jpeg(
            encode_jpeg_progressive(img.tobytes(), w, h, c, quality=q, subsampling=ss)
        )
        assert prog == base, (h, w, c, ss, q)


def test_progressive_partial_prefix_renders():
    """The point of progressive: a stream truncated at any scan
    boundary still decodes to a coarser approximation of the image.
    Every prefix must decode without error and the error must shrink
    as scans accumulate."""
    import re

    from e_commerce_lakehouse_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient(32, 24, 3, seed=6)
    blob = encode_jpeg_progressive(img.tobytes(), 24, 32, 3, quality=90)
    sos = [m.start() for m in re.finditer(b"\xff\xda", blob)]
    assert len(sos) >= 6  # DC first, split AC firsts, refinements, DC refine
    errs = []
    for i in range(1, len(sos) + 1):
        end = sos[i] if i < len(sos) else len(blob) - 2
        W, H, C, px = decode_jpeg(blob[:end] + b"\xff\xd9")
        assert (W, H, C) == (24, 32, 3)
        out = np.frombuffer(px, dtype=np.uint8).reshape(32, 24, 3).astype(int)
        errs.append(np.abs(out - img.astype(int)).mean())
    # complete stream is at least as faithful as the DC-only prefix
    assert errs[-1] < errs[0]
    assert errs[-1] < 6.0


def test_noninterleaved_baseline_multiscan_decodes():
    """Legal baseline streams may carry one scan per component
    (non-interleaved); the multi-scan path must decode them to the
    same pixels as the interleaved form (identical coefficients at
    4:4:4 where the component grid equals the MCU grid)."""
    import struct as _struct

    from e_commerce_lakehouse_spark.operators import jpeg as J

    img = _gradient(24, 40, 3, seed=8)
    interleaved = encode_jpeg(img.tobytes(), 40, 24, 3, quality=90)
    want = decode_jpeg(interleaved)

    comp_coeffs, factors, mcu_x, mcu_y, ql, qc = J._quantized_components(
        img.tobytes(), 40, 24, 3, 90, "4:4:4"
    )
    dc_codes = J._huffman_codes(J._DC_BITS, J._DC_VALS)
    ac_codes = J._huffman_codes(J._AC_BITS, J._AC_VALS)
    out = J._frame_headers(
        0xFFC0, 40, 24, 3, factors, ql, qc, (J._AC_BITS, J._AC_VALS)
    )
    for ci in range(3):
        bw = J._BitWriter()
        prev = [0, 0, 0]
        qz = comp_coeffs[ci]
        for by in range(qz.shape[0]):
            for bx in range(qz.shape[1]):
                J._encode_block(bw, qz[by, bx], ci, prev, dc_codes, ac_codes)
        sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0])
        out += _struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos + bw.flush()
    out += b"\xff\xd9"
    assert decode_jpeg(bytes(out)) == want
