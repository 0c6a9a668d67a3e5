"""Baseline JPEG codec — pure stdlib + numpy (no external image
library), closing the codec-table gap called out in round 2: real
corpora are mostly JPEG, and `decode_images` previously raised for
them.

Scope (and honest boundaries):
  - ENCODE: baseline sequential DCT (SOF0) and progressive (SOF2, one
    successive-approximation level + a spectral split), 8-bit,
    grayscale or RGB as YCbCr at 4:4:4, 4:2:2, or 4:2:0 (box-filter
    chroma downsampling), standard-shaped quant tables scaled by
    `quality`, canonical Huffman tables written to DHT.
  - DECODE: sequential (SOF0/SOF1) — interleaved or one-scan-per-
    component — and progressive (SOF2) with any spectral-selection /
    successive-approximation scan script (ITU-T.81 Annex G: EOB runs,
    DC/AC refinement correction bits); 8-bit, 1- or 3-component, any
    sampling-factor grid where each component's factors divide the
    maximum (covers 4:4:4, 4:2:2, 4:2:0, 4:4:0, 4:1:1 — i.e.
    essentially every real camera/web JPEG), restart intervals
    supported. Chroma upsampling is sample replication (nearest), the
    ITU-T.81 default. Arithmetic coding, 12-bit, lossless, and
    hierarchical raise NotImplementedError — exotica a training
    pipeline hands to a full libjpeg.

Determinism: encode is pure integer/float math with fixed tables — the
same pixels always produce the same bytes; decode reads quant/Huffman
tables from the stream, so round-trip correctness is self-contained
(tables in the file, not assumptions in the reader).

Performance shape: the per-payload work is Python+numpy inside Arrow
`mapInPandas` batches (operators/multimodal.py) — a pure map, no
shuffle, linear scale-out; a production cluster would swap this kernel
for libjpeg-turbo behind the same DataFrame signature.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: index i of the scan -> (row, col) flat index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex-K-shaped base quantization tables (luminance / chrominance)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Huffman table specs: (bits[1..16] code-length histogram, symbol list).
# DC symbols are magnitude categories 0..11; AC symbols are
# (run << 4) | size pairs covering every value the encoder can emit
# (all runs 0..15 x sizes 1..10, plus EOB 0x00 and ZRL 0xF0). Written
# to DHT verbatim, so decode correctness never depends on these being
# any particular "standard" ordering.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))


def _ac_table_spec() -> tuple[list[int], list[int]]:
    """A valid canonical AC Huffman spec covering all 162 baseline AC
    symbols: EOB and ZRL get short codes, low-run/low-size symbols get
    mid-length codes, everything else shares the long tail. Simple flat
    assignment: 2 symbols at 4 bits, 30 at 8 bits, 130 at 12 bits
    (Kraft sum 2/16 + 30/256 + 130/4096 = 0.274 < 1 — prefix-free)."""
    syms = [0x00, 0xF0]  # EOB, ZRL first (shortest codes)
    for run in range(16):
        for size in range(1, 11):
            syms.append((run << 4) | size)
    bits = [0] * 16
    bits[3] = 2  # 4-bit codes (bits[i] = count of (i+1)-bit codes)
    bits[7] = 30  # 8-bit codes
    bits[11] = 130  # 12-bit codes
    assert sum(bits) == len(syms) == 162
    return bits, syms


_AC_BITS, _AC_VALS = _ac_table_spec()


def _ac_prog_table_spec() -> tuple[list[int], list[int]]:
    """AC Huffman spec for progressive scans: the baseline symbol set
    plus the EOBn run-length symbols 0x10..0xE0 (ITU-T.81 G.1.2.2 —
    (r << 4) with r 1..14 encodes an End-Of-Band run of 2^r..2^(r+1)-1
    blocks). Kraft sum 2/16 + 30/256 + 144/4096 = 0.277 < 1."""
    syms = [0x00, 0xF0]  # EOB0, ZRL (shortest codes)
    for run in range(16):
        for size in range(1, 11):
            syms.append((run << 4) | size)
    syms += [(r << 4) for r in range(1, 15)]  # EOBn, n = 1..14
    bits = [0] * 16
    bits[3] = 2
    bits[7] = 30
    bits[11] = 144
    assert sum(bits) == len(syms) == 176
    return bits, syms


_AC_PROG_BITS, _AC_PROG_VALS = _ac_prog_table_spec()

# 8x8 type-II DCT basis: C[u, x] = alpha(u)/2 * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (
            (np.sqrt(1 / 8) if _u == 0 else 0.5)
            * np.cos((2 * _x + 1) * _u * np.pi / 16)
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> scaled table clamped to
    [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        # trim emitted high bits — an unbounded Python-int accumulator
        # makes every shift O(stream length), i.e. quadratic encode
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def marker(self, byte2: int) -> None:
        """Emit a raw 0xFF xx marker (byte-aligned, no stuffing)."""
        self.byte_align()
        self.buf += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _blocks(plane: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to multiples of 8 and return
    (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return p.reshape(p.shape[0] // 8, 8, p.shape[1] // 8, 8).transpose(0, 2, 1, 3)


SUBSAMPLING_FACTORS = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a plane up to exactly (ph, pw)."""
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _quantized_components(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int,
    subsampling: str,
) -> tuple[list[np.ndarray], list[tuple[int, int]], int, int, np.ndarray, np.ndarray]:
    """Shared encode front half (baseline and progressive): validate,
    color-convert, chroma-downsample, forward-DCT and quantize. Returns
    (comp_coeffs, factors, mcu_x, mcu_y, ql, qc) where comp_coeffs[i]
    is the (by, bx, 8, 8) quantized coefficient grid padded to the full
    MCU block grid."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if subsampling not in SUBSAMPLING_FACTORS:
        raise ValueError(
            f"subsampling must be one of {sorted(SUBSAMPLING_FACTORS)}, "
            f"got {subsampling!r}"
        )
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"need {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0].astype(np.float64)]

    # sampling factors: luma carries the max factors, chroma is 1x1 —
    # the standard JFIF arrangement for every common layout
    hmax, vmax = SUBSAMPLING_FACTORS[subsampling] if channels == 3 else (1, 1)
    factors = [(hmax, vmax)] + [(1, 1)] * (len(planes) - 1)
    mcu_x = -(-width // (8 * hmax))
    mcu_y = -(-height // (8 * vmax))
    if channels == 3 and (hmax, vmax) != (1, 1):
        # box-filter chroma downsampling: pad to the factor grid, then
        # average each hmax x vmax cell
        for i in (1, 2):
            p = _pad_to(planes[i], -(-height // vmax) * vmax, -(-width // hmax) * hmax)
            planes[i] = p.reshape(
                p.shape[0] // vmax, vmax, p.shape[1] // hmax, hmax
            ).mean(axis=(1, 3))

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    quants = [ql] + [qc] * (len(planes) - 1)

    # quantized coefficients per component: forward DCT is
    # C @ block @ C.T batched over all blocks. Each component is padded
    # to its full MCU block grid (mcu_y*v x mcu_x*h blocks) so an
    # interleaved scan can index blocks uniformly.
    comp_coeffs = []
    for plane, q, (hi, vi) in zip(planes, quants, factors):
        padded = _pad_to(plane, mcu_y * vi * 8, mcu_x * hi * 8)
        blk = _blocks(padded) - 128.0
        by, bx = blk.shape[:2]
        dct = _C @ blk.reshape(-1, 8, 8) @ _C.T
        qz = np.round(dct / q.reshape(8, 8)).astype(np.int64)
        comp_coeffs.append(qz.reshape(by, bx, 8, 8))
    return comp_coeffs, factors, mcu_x, mcu_y, ql, qc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _frame_headers(
    sof_marker: int,
    width: int,
    height: int,
    nplanes: int,
    factors: list[tuple[int, int]],
    ql: np.ndarray,
    qc: np.ndarray,
    ac_spec: tuple[list[int], list[int]],
) -> bytearray:
    """SOI + JFIF APP0 + DQT + SOFn + DHT segments shared by the
    baseline and progressive encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if nplanes == 3:
        out += _seg(0xFFDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    # SOFn: precision 8, dims, components (id, sampling (h<<4)|v, quant id)
    comps = b"".join(
        bytes([i + 1, (factors[i][0] << 4) | factors[i][1], 0 if i == 0 else 1])
        for i in range(nplanes)
    )
    out += _seg(sof_marker, struct.pack(">BHHB", 8, height, width, nplanes) + comps)
    ac_bits, ac_vals = ac_spec
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if nplanes == 3:
        out += _seg(0xFFC4, bytes([0x01]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        out += _seg(0xFFC4, bytes([0x11]) + bytes(ac_bits) + bytes(ac_vals))
    return out


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "4:4:4",
) -> bytes:
    """Encode raw 8-bit pixels (row-major, channels in {1: gray,
    3: RGB}) as a baseline sequential JFIF JPEG. ``subsampling``
    selects the chroma layout (4:4:4 / 4:2:2 / 4:2:0 — box-filter
    downsampled; ignored for grayscale). ``restart_interval`` > 0
    writes a DRI segment and RSTn markers every N MCUs — the resync
    points a parallel or fault-tolerant reader keys on."""
    comp_coeffs, factors, mcu_x, mcu_y, ql, qc = _quantized_components(
        pixels, width, height, channels, quality, subsampling
    )
    planes = comp_coeffs
    dc_codes = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huffman_codes(_AC_BITS, _AC_VALS)

    # entropy-code interleaved MCUs: each MCU carries h*v blocks per
    # component in raster order (ITU-T.81 A.2.3); 4:4:4 degenerates to
    # one block per component
    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for y in range(mcu_y):
        for x in range(mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                prev_dc = [0] * len(planes)
            mcu_count += 1
            for ci, qz in enumerate(comp_coeffs):
                hi, vi = factors[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        _encode_block(
                            bw,
                            qz[y * vi + byi, x * hi + bxi],
                            ci,
                            prev_dc,
                            dc_codes,
                            ac_codes,
                        )
    scan = bw.flush()

    out = _frame_headers(
        0xFFC0, width, height, len(planes), factors, ql, qc, (_AC_BITS, _AC_VALS)
    )
    # SOS: every component uses (dc table, ac table) = (0,0) for luma,
    # (1,1) for chroma
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)]) + b"".join(
        bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(len(planes))
    ) + bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_block(
    bw: "_BitWriter",
    block8x8: np.ndarray,
    ci: int,
    prev_dc: list[int],
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """Entropy-code one quantized 8x8 block (DC diff + AC run-length)."""
    block = block8x8.reshape(64)[ZIGZAG]
    diff = int(block[0]) - prev_dc[ci]
    prev_dc[ci] = int(block[0])
    size, mag = _magnitude(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(mag, size)
    run = 0
    last_nz = int(np.max(np.nonzero(block)[0])) if np.any(block[1:]) else 0
    for k in range(1, 64):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, mag = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(mag, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — ITU-T.81 Annex G.1. The scan script
# deliberately exercises every progressive decode path: interleaved DC
# first (Al=1), per-component AC first scans with a spectral split
# (1..5 / 6..63) and EOB runs (Al=1), per-component AC refinement
# (Ah=1, Al=0 — correction bits, G.1.2.3), and DC refinement (raw
# bits). The quantized coefficients are identical to the baseline
# encoder's, so a full progressive decode is bit-identical to the
# baseline decode of the same pixels at the same quality.
# ---------------------------------------------------------------------------


def _comp_grid(width: int, height: int, h: int, v: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Non-interleaved block grid of one component (ITU-T.81 A.1.1):
    ceil of the downsampled dimensions over 8."""
    cw = -(-width * h // hmax)
    ch = -(-height * v // vmax)
    return -(-ch // 8), -(-cw // 8)  # (hb, wb)


class _EobState:
    """End-of-band run accumulator for progressive AC scans: counts
    blocks that end in EOB and (for refinement scans) buffers the
    correction bits that belong to those blocks — emitted together
    after the EOBn symbol (G.1.2.3)."""

    def __init__(self, bw: _BitWriter, ac_codes: dict[int, tuple[int, int]]) -> None:
        self.bw = bw
        self.ac_codes = ac_codes
        self.run = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.run:
            r = self.run.bit_length() - 1
            code, ln = self.ac_codes[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.run - (1 << r), r)
            self.run = 0
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits.clear()

    def add_block(self, bits: list[int]) -> None:
        self.run += 1
        self.bits += bits
        if self.run == 0x7FFF:  # EOBn ceiling with r <= 14
            self.flush()


def _emit_ac_first(
    bw: _BitWriter,
    blocks: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """One AC first scan (Ah=0) over a component's zigzag coefficient
    rows: magnitude point transform, run-length symbols, EOB runs."""
    eob = _EobState(bw, ac_codes)
    for blk in blocks:
        band = blk[ss : se + 1]
        t = np.where(band >= 0, band >> al, -((-band) >> al))
        nz = np.nonzero(t)[0]
        if not len(nz):
            eob.add_block([])
            continue
        eob.flush()
        prev = -1
        for k in nz:
            run = int(k) - prev - 1
            prev = int(k)
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size, mag = _magnitude(int(t[k]))
            code, ln = ac_codes[(run << 4) | size]
            bw.write(code, ln)
            bw.write(mag, size)
        if int(nz[-1]) < se - ss:
            eob.add_block([])
    eob.flush()


def _emit_ac_refine(
    bw: _BitWriter,
    blocks: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """One AC refinement scan (Ah=Al+1): newly-nonzero coefficients as
    (run<<4)|1 symbols with a sign bit; already-nonzero coefficients as
    correction bits buffered until the next symbol (the libjpeg
    BE/BR discipline, reimplemented from G.1.2.3)."""
    eob = _EobState(bw, ac_codes)
    for blk in blocks:
        band = blk[ss : se + 1]
        t = np.where(band >= 0, band >> al, -((-band) >> al))
        absvals = np.abs(t)
        newly = np.nonzero(absvals == 1)[0]
        eobpos = int(newly[-1]) if len(newly) else -1
        cur_bits: list[int] = []  # correction bits since the last symbol
        run = 0
        for k in range(len(band)):
            temp = int(absvals[k])
            if temp == 0:
                run += 1
                continue
            while run > 15 and k <= eobpos:
                eob.flush()
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
                for b in cur_bits:
                    bw.write(b, 1)
                cur_bits.clear()
            if temp > 1:
                cur_bits.append(temp & 1)  # history nonzero: correction bit
                continue
            # newly nonzero (|point-transformed| == 1)
            eob.flush()
            code, ln = ac_codes[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if int(t[k]) > 0 else 0, 1)
            for b in cur_bits:
                bw.write(b, 1)
            cur_bits.clear()
            run = 0
        if run > 0 or cur_bits:
            eob.add_block(cur_bits)
    eob.flush()


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 90,
    subsampling: str = "4:4:4",
) -> bytes:
    """Encode raw 8-bit pixels as a progressive (SOF2) JFIF JPEG with
    successive approximation (one AC/DC refinement level) and a
    spectral split on the first component. Quantized coefficients are
    identical to :func:`encode_jpeg` at the same quality, so decoding
    the complete stream reproduces the baseline decode bit-exactly."""
    comp_coeffs, factors, mcu_x, mcu_y, ql, qc = _quantized_components(
        pixels, width, height, channels, quality, subsampling
    )
    n = len(comp_coeffs)
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    # zigzag-order coefficient rows per component, full MCU grid
    czz = [
        cc.reshape(cc.shape[0], cc.shape[1], 64)[:, :, ZIGZAG] for cc in comp_coeffs
    ]
    dc_codes = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huffman_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    out = _frame_headers(
        0xFFC2, width, height, n, factors, ql, qc, (_AC_PROG_BITS, _AC_PROG_VALS)
    )

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)]) + b"".join(
            bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in comp_ids
        ) + bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, body)

    # --- scan 1: DC first, interleaved over all components, Al=1 ---
    bw = _BitWriter()
    prev = [0] * n
    for my in range(mcu_y):
        for mx in range(mcu_x):
            for ci in range(n):
                hi, vi = factors[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        dc = int(czz[ci][my * vi + byi, mx * hi + bxi, 0]) >> 1
                        size, mag = _magnitude(dc - prev[ci])
                        prev[ci] = dc
                        code, ln = dc_codes[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(mag, size)
    out += sos(list(range(n)), 0, 0, 0, 1) + bw.flush()

    # per-component non-interleaved grids (AC scans never pad to MCU)
    grids = [
        _comp_grid(width, height, h, v, hmax, vmax) for h, v in factors
    ]

    def comp_blocks(ci: int) -> np.ndarray:
        hb, wb = grids[ci]
        return czz[ci][:hb, :wb].reshape(hb * wb, 64)

    # --- AC first scans, Al=1: spectral split 1..5 / 6..63 on comp 0,
    # full band on chroma ---
    bands = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, n)]
    for ci, ss, se in bands:
        bw = _BitWriter()
        _emit_ac_first(bw, comp_blocks(ci), ss, se, 1, ac_codes)
        out += sos([ci], ss, se, 0, 1) + bw.flush()

    # --- AC refinement scans, Ah=1 -> Al=0 ---
    for ci in range(n):
        bw = _BitWriter()
        _emit_ac_refine(bw, comp_blocks(ci), 1, 63, 0, ac_codes)
        out += sos([ci], 1, 63, 1, 0) + bw.flush()

    # --- DC refinement, interleaved, raw bits (no Huffman) ---
    bw = _BitWriter()
    for my in range(mcu_y):
        for mx in range(mcu_x):
            for ci in range(n):
                hi, vi = factors[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        bw.write(int(czz[ci][my * vi + byi, mx * hi + bxi, 0]) & 1, 1)
    out += sos(list(range(n)), 0, 0, 1, 0) + bw.flush()

    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker consumed by caller via sync(); landing
                # here means coefficients overran the interval
                raise ValueError("unexpected restart marker inside block")
            else:
                raise ValueError(f"unexpected marker 0xff{nxt:02x} in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def _try_fill(self) -> bool:
        """Append one data byte to the accumulator if one is available
        — stops (False) at any marker or EOF WITHOUT consuming it, so
        the strict per-bit path keeps its error semantics there."""
        pos = self.pos
        data = self.data
        if pos >= len(data):
            return False
        byte = data[pos]
        if byte == 0xFF:
            if pos + 1 >= len(data) or data[pos + 1] != 0x00:
                return False  # marker (RSTn/EOI/...) — slow path decides
            self.pos = pos + 2  # stuffed 0xFF data byte
        else:
            self.pos = pos + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def peek16(self) -> int | None:
        """Left-aligned next-16-bits view for LUT symbol decode, or
        None when fewer than 16 bits remain before a marker/EOF (the
        tree walk handles that tail)."""
        while self.nbits < 16:
            if not self._try_fill():
                return None
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        # trim the consumed high bit — see _BitWriter.write (quadratic
        # decode otherwise)
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()  # raises at markers, like the per-bit path did
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.nbits = 0
        self.acc = 0
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if 0xD0 <= nxt <= 0xD7:
                self.pos += 2
                return
            break
        raise ValueError("expected restart marker")


def _huffman_tree(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for canonical codes."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huffman_lut(bits: bytes, vals: bytes) -> np.ndarray:
    """Flat 2^16 lookup: left-aligned 16-bit prefix -> (code length
    << 8) | symbol, 0 = invalid. One array read decodes a symbol
    instead of a per-bit tree walk — the decode hot path (a ~500-byte
    scan is ~4000 bits; per-bit Python costs dominate tiny-image
    corpora like thumbnail/frame tables)."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            lut[start : start + (1 << (16 - length))] = (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


# (bits ‖ vals) -> (lut, tree), shared across payloads: a corpus of
# same-encoder images (and every frame of an MJPEG video) reuses
# identical DHT specs, so table construction amortizes to zero.
# Bounded; worst case (adversarial distinct tables) falls back to
# per-stream construction, never unbounded growth.
_HUFF_CACHE: dict[bytes, tuple[np.ndarray, dict]] = {}


def _huffman_tables(bits: bytes, vals: bytes) -> tuple[np.ndarray, dict]:
    key = bytes(bits) + bytes(vals)
    hit = _HUFF_CACHE.get(key)
    if hit is None:
        hit = (_huffman_lut(bits, vals), _huffman_tree(bits, vals))
        if len(_HUFF_CACHE) < 64:
            _HUFF_CACHE[key] = hit
    return hit


def _decode_symbol(br: _BitReader, lut: np.ndarray, tree: dict) -> int:
    peek = br.peek16()
    if peek is not None:
        v = int(lut[peek])
        if v == 0:
            raise ValueError("invalid Huffman code in scan")
        br.consume(v >> 8)
        return v & 0xFF
    # <16 bits left before a marker/EOF: strict per-bit walk keeps the
    # truncation/overrun error semantics
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _parse_dqt(payload: bytes, quant: dict[int, np.ndarray]) -> None:
    p = 0
    while p < len(payload):
        prec, tid = payload[p] >> 4, payload[p] & 0xF
        if prec:
            raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
        tbl = np.zeros(64, dtype=np.int64)
        tbl[ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
        quant[tid] = tbl
        p += 65


def _parse_dht(
    payload: bytes, huff_dc: dict[int, tuple], huff_ac: dict[int, tuple]
) -> None:
    p = 0
    while p < len(payload):
        cls, tid = payload[p] >> 4, payload[p] & 0xF
        bits = payload[p + 1 : p + 17]
        n = sum(bits)
        vals = payload[p + 17 : p + 17 + n]
        (huff_dc if cls == 0 else huff_ac)[tid] = _huffman_tables(bits, vals)
        p += 17 + n


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a sequential (SOF0/SOF1, interleaved or one-scan-per-
    component) or progressive (SOF2) JPEG to (width, height, channels,
    raw 8-bit pixels — gray or RGB). Any sampling-factor grid whose
    factors divide the maximum is handled (4:4:4 / 4:2:2 / 4:2:0 /
    4:4:0 / 4:1:1); chroma upsampling is sample replication.
    Arithmetic / 12-bit / lossless inputs raise NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, quant_id)
    width = height = -1
    restart_interval = 0
    progressive = False
    scan_comps: list[tuple[int, int, int]] = []
    scan_start = -1
    sos_pos = -1

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # legal JPEGs may pad with any number of 0xFF fill bytes
        # before the marker byte (ITU-T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # parameterless markers: TEM, stray RSTn, repeated SOI —
            # no length field follows; treating them as length-prefixed
            # segments would misparse the rest of the stream
            pos += 2
            continue
        if marker == 0x00 or pos + 4 > len(data):
            raise ValueError(f"invalid marker 0xff{marker:02x} at {pos}")
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            _parse_dqt(payload, quant)
        elif marker == 0xC4:
            _parse_dht(payload, huff_dc, huff_ac)
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG (only 8-bit)")
            for i in range(nc):
                cid, samp, qid = payload[6 + 3 * i : 9 + 3 * i]
                if not (1 <= samp >> 4 <= 4 and 1 <= (samp & 0xF) <= 4):
                    raise ValueError(
                        f"sampling factors out of range: 0x{samp:02x}"
                    )
                comps.append((cid, samp, qid))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} JPEG (lossless/arithmetic/hierarchical) — "
                "sequential and progressive Huffman only"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            ns = payload[0]
            for i in range(ns):
                cid, tids = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_comps.append((cid, tids >> 4, tids & 0xF))
            scan_start = pos + 2 + ln
            sos_pos = pos
            break
        pos += 2 + ln

    if scan_start < 0 or width < 0:
        raise ValueError("missing SOS/SOF segment")
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"{len(comps)}-component JPEG (1 or 3 only)")
    if progressive or len(scan_comps) != len(comps):
        # progressive streams and non-interleaved (one-scan-per-
        # component) baseline streams both need the generic multi-scan
        # path; the single interleaved-scan fast path below stays on
        # the tuned hot loop
        return _decode_multiscan(
            data,
            sos_pos,
            quant,
            huff_dc,
            huff_ac,
            comps,
            width,
            height,
            restart_interval,
            progressive,
        )

    br = _BitReader(data[scan_start:])
    comp_by_id = {c[0]: c for c in comps}
    # sampling geometry: a single-component scan has no interleave, so
    # its factors are irrelevant — treat as 1x1 (ITU-T.81 A.2.2); for
    # 3-component scans any grid whose factors divide the max works
    # with replication upsampling (covers every common layout)
    if len(comps) == 1:
        factors = [(1, 1)]
    else:
        # aligned to SCAN order (scan_comps), which may differ from SOF
        # order in a legal stream
        factors = [
            (comp_by_id[cid][1] >> 4, comp_by_id[cid][1] & 0xF)
            for cid, _, _ in scan_comps
        ]
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    if any(hmax % h or vmax % v for h, v in factors):
        raise NotImplementedError(
            f"non-dividing sampling factors {factors} (fractional chroma "
            "upsampling) — common layouts only"
        )
    mcu_y = -(-height // (8 * vmax))
    mcu_x = -(-width // (8 * hmax))
    prev_dc = [0] * len(comps)
    mcu_count = 0
    # entropy-decode into per-component raster-order coefficient rows
    # (plain Python lists — scalar writes beat numpy here), then do
    # dequant + de-zigzag + IDCT as ONE batched numpy pass per
    # component instead of two 8x8 matmuls per block: per-block numpy
    # call overhead dominates on small images (thumbnail/frame
    # corpora). Peak extra memory is ~3x the pixel buffer (64 int
    # coefficients per 64-pixel block).
    coeff_rows: list[list[list[int]]] = [[] for _ in comps]
    for _my in range(mcu_y):
        for _mx in range(mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                prev_dc = [0] * len(comps)
            mcu_count += 1
            for ci, (cid, dc_id, ac_id) in enumerate(scan_comps):
                dc_lut, dc_tree = huff_dc[dc_id]
                ac_lut, ac_tree = huff_ac[ac_id]
                # h*v blocks per component per MCU, raster order
                # (ITU-T.81 A.2.3); 1 for unsubsampled components
                for _blk in range(factors[ci][0] * factors[ci][1]):
                    coeff = [0] * 64
                    size = _decode_symbol(br, dc_lut, dc_tree)
                    diff = _extend(br.read_bits(size), size) if size else 0
                    prev_dc[ci] += diff
                    coeff[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        sym = _decode_symbol(br, ac_lut, ac_tree)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            # only EOB (0x00) and ZRL (0xF0) may carry
                            # size 0; anything else is a corrupt stream —
                            # fail cleanly, not with a negative-shift
                            # error inside _extend
                            raise ValueError(
                                f"invalid AC symbol 0x{sym:02x} (run>0, size=0) in scan"
                            )
                        k += run
                        if k > 63:
                            raise ValueError("AC coefficient index overrun")
                        coeff[k] = _extend(br.read_bits(size), size)
                        k += 1
                    coeff_rows[ci].append(coeff)

    planes = []
    for ci, (cid, _dc, _ac) in enumerate(scan_comps):
        hi, vi = factors[ci]
        qtbl = quant[comp_by_id[cid][2]]
        nblocks = mcu_y * mcu_x * vi * hi
        cz = np.asarray(coeff_rows[ci], dtype=np.int64)  # (nblocks, 64) zigzag
        cf = np.zeros((nblocks, 64), dtype=np.float64)
        cf[:, ZIGZAG] = cz * qtbl[ZIGZAG]  # dequant + de-zigzag, batched
        spatial = _C.T @ cf.reshape(-1, 8, 8) @ _C + 128.0
        # block order is MCU-major: (my, mx, byi, bxi) -> raster grid
        plane = (
            spatial.reshape(mcu_y, mcu_x, vi, hi, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcu_y * vi * 8, mcu_x * hi * 8)
        )
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            # replication upsampling to full resolution (ITU-T.81's
            # stated default; box-downsample -> replicate round-trips
            # flat regions exactly)
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane)

    return _planes_to_pixels(planes, width, height)


def _planes_to_pixels(
    planes: list[np.ndarray], width: int, height: int
) -> tuple[int, int, int, bytes]:
    """Crop decoded component planes to the frame size and convert
    YCbCr -> RGB (3 components) or clamp gray (1 component)."""
    planes = [p[:height, :width] for p in planes]
    if len(planes) == 3:
        yy, cb, cr = planes
        r = yy + 1.402 * (cr - 128.0)
        g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = yy + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return width, height, 3, out.tobytes()
    out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return width, height, 1, out.tobytes()


# ---------------------------------------------------------------------------
# Generic multi-scan decoder: progressive (SOF2) streams and
# non-interleaved (one-scan-per-component) baseline streams. ITU-T.81
# Annex G.2: DC scans carry successive-approximation point transforms,
# AC scans carry spectral bands with End-Of-Band runs, refinement
# scans carry correction bits (G.1.2.3 in reverse). Coefficients
# accumulate across scans in zigzag order; dequant + IDCT run once at
# the end as the same batched numpy pass the baseline path uses.
# ---------------------------------------------------------------------------


def _refine_ac_block(
    br: _BitReader,
    cf: list[int],
    ss: int,
    se: int,
    al: int,
    lut: np.ndarray,
    tree: dict,
    eobrun: int,
) -> int:
    """AC successive-approximation refinement for one block (decoder
    side of G.1.2.3): newly-nonzero coefficients arrive as (run<<4)|1
    symbols with a sign bit; history-nonzero coefficients read one
    correction bit inline as the band walk passes them."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _decode_symbol(br, lut, tree)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    # EOBn covers THIS block and N-1 more; the tail
                    # below still reads this block's remaining
                    # correction bits, then decrements
                    eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                    break
                # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        f"invalid AC refinement symbol 0x{sym:02x} (size != 1)"
                    )
                val = p1 if br.read_bit() else m1
            while k <= se:
                c = cf[k]
                if c != 0:
                    # history-nonzero: inline correction bit
                    if br.read_bit() and (c & p1) == 0:
                        cf[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                cf[k] = val
            k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for the rest of the band
        while k <= se:
            c = cf[k]
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    cf[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _first_ac_block(
    br: _BitReader,
    cf: list[int],
    k0: int,
    se: int,
    al: int,
    lut: np.ndarray,
    tree: dict,
    eobrun: int,
    progressive: bool,
) -> int:
    """First-pass (Ah=0) AC decode for one block: sequential baseline
    run-length coding, plus EOBn runs and the Al point transform in
    progressive scans."""
    if eobrun > 0:
        return eobrun - 1
    k = k0
    while k <= se:
        sym = _decode_symbol(br, lut, tree)
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run and not progressive:
                raise ValueError(
                    f"invalid AC symbol 0x{sym:02x} (run>0, size=0) in scan"
                )
            # EOB (baseline) or EOBn (progressive)
            return (1 << run) - 1 + (br.read_bits(run) if run else 0)
        k += run
        if k > se:
            raise ValueError("AC coefficient index overrun")
        cf[k] = _extend(br.read_bits(size), size) << al
        k += 1
    return 0


def _decode_multiscan(
    data: bytes,
    sos_pos: int,
    quant: dict[int, np.ndarray],
    huff_dc: dict[int, tuple],
    huff_ac: dict[int, tuple],
    comps: list[tuple[int, int, int]],
    width: int,
    height: int,
    restart_interval: int,
    progressive: bool,
) -> tuple[int, int, int, bytes]:
    """Decode every scan from the first SOS (at ``sos_pos``) to EOI,
    accumulating zigzag-order coefficients per component, then finish
    with one batched dequant + IDCT pass per component."""
    factors = (
        [(1, 1)]
        if len(comps) == 1
        else [(c[1] >> 4, c[1] & 0xF) for c in comps]
    )
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    if any(hmax % h or vmax % v for h, v in factors):
        raise NotImplementedError(
            f"non-dividing sampling factors {factors} (fractional chroma "
            "upsampling) — common layouts only"
        )
    mcu_y = -(-height // (8 * vmax))
    mcu_x = -(-width // (8 * hmax))
    # per component: full interleaved grid (nby, nbx) and the
    # non-interleaved grid (hb, wb) a single-component scan walks
    geom = []
    coeff: list[list[list[int]]] = []
    for h, v in factors:
        nby, nbx = mcu_y * v, mcu_x * h
        hb, wb = _comp_grid(width, height, h, v, hmax, vmax)
        geom.append((nby, nbx, hb, wb))
        coeff.append([[0] * 64 for _ in range(nby * nbx)])
    ci_by_id = {c[0]: i for i, c in enumerate(comps)}

    pos = sos_pos
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes (B.1.1.2)
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if marker == 0x00 or pos + 4 > len(data):
            raise ValueError(f"invalid marker 0xff{marker:02x} at {pos}")
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            _parse_dqt(payload, quant)
        elif marker == 0xC4:
            _parse_dht(payload, huff_dc, huff_ac)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            ns = payload[0]
            scomps = []
            for i in range(ns):
                cid, tids = payload[1 + 2 * i], payload[2 + 2 * i]
                if cid not in ci_by_id:
                    raise ValueError(f"scan references unknown component {cid}")
                scomps.append((ci_by_id[cid], tids >> 4, tids & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            consumed = _decode_scan(
                data[pos + 2 + ln :],
                scomps,
                ss,
                se,
                ah,
                al,
                factors,
                geom,
                coeff,
                huff_dc,
                huff_ac,
                restart_interval,
                progressive,
                mcu_y,
                mcu_x,
            )
            # resume the marker walk at the next real marker (skip any
            # trailing entropy padding and RSTn the reader left behind)
            p = pos + 2 + ln + consumed
            while p + 1 < len(data) and not (
                data[p] == 0xFF
                and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)
            ):
                p += 1
            pos = p
            continue
        pos += 2 + ln

    planes = []
    for ci, (cid, _samp, qid) in enumerate(comps):
        h, v = factors[ci]
        nby, nbx, _hb, _wb = geom[ci]
        q = quant.get(qid)
        if q is None:
            raise ValueError(f"missing quantization table {qid}")
        cz = np.asarray(coeff[ci], dtype=np.int64)  # (nblocks, 64) zigzag
        cf = np.zeros((len(cz), 64), dtype=np.float64)
        cf[:, ZIGZAG] = cz * q[ZIGZAG]  # dequant + de-zigzag, batched
        spatial = _C.T @ cf.reshape(-1, 8, 8) @ _C + 128.0
        plane = (
            spatial.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        ry, rx = vmax // v, hmax // h
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane)
    return _planes_to_pixels(planes, width, height)


def _decode_scan(
    scan_data: bytes,
    scomps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    factors: list[tuple[int, int]],
    geom: list[tuple[int, int, int, int]],
    coeff: list[list[list[int]]],
    huff_dc: dict[int, tuple],
    huff_ac: dict[int, tuple],
    restart_interval: int,
    progressive: bool,
    mcu_y: int,
    mcu_x: int,
) -> int:
    """Entropy-decode one scan into the coefficient store; returns the
    number of scan bytes consumed."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0 (G.1.1.1)")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("progressive AC scans are single-component")
        if not (0 <= ss <= se <= 63):
            raise ValueError(f"invalid spectral band {ss}..{se}")
    br = _BitReader(scan_data)
    n = len(scomps)
    interleaved = n > 1
    preds = [0] * n
    eobrun = 0

    # the per-MCU unit list: (scan index, block index) pairs
    if interleaved:
        n_mcus = mcu_y * mcu_x

        def mcu_units(m: int):
            my, mx = divmod(m, mcu_x)
            for si, (ci, _dc, _ac) in enumerate(scomps):
                h, v = factors[ci]
                nbx = geom[ci][1]
                for byi in range(v):
                    for bxi in range(h):
                        yield si, (my * v + byi) * nbx + (mx * h + bxi)
    else:
        ci0 = scomps[0][0]
        _nby, nbx0, hb, wb = geom[ci0]
        n_mcus = hb * wb

        def mcu_units(m: int):
            by, bx = divmod(m, wb)
            yield 0, by * nbx0 + bx

    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            br.sync_restart()
            preds = [0] * n
            eobrun = 0
        for si, bidx in mcu_units(m):
            ci, dc_id, ac_id = scomps[si]
            cf = coeff[ci][bidx]
            if ah == 0:
                if ss == 0:  # DC first (or full sequential scan)
                    if dc_id not in huff_dc:
                        raise ValueError(f"missing DC Huffman table {dc_id}")
                    lut, tree = huff_dc[dc_id]
                    size = _decode_symbol(br, lut, tree)
                    preds[si] += _extend(br.read_bits(size), size) if size else 0
                    cf[0] = preds[si] << al
                if se >= max(ss, 1):  # AC portion / AC scan
                    if ac_id not in huff_ac:
                        raise ValueError(f"missing AC Huffman table {ac_id}")
                    lut, tree = huff_ac[ac_id]
                    eobrun = _first_ac_block(
                        br, cf, max(ss, 1), se, al, lut, tree, eobrun, progressive
                    )
            else:
                if ss == 0:  # DC refinement: one raw bit per block
                    cf[0] |= br.read_bit() << al
                else:
                    if ac_id not in huff_ac:
                        raise ValueError(f"missing AC Huffman table {ac_id}")
                    lut, tree = huff_ac[ac_id]
                    eobrun = _refine_ac_block(
                        br, cf, ss, se, al, lut, tree, eobrun
                    )
    return br.pos
