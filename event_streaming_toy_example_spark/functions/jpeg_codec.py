"""Minimal real JPEG (JFIF) codec (pure stdlib ``struct`` + numpy).

Fourth real image format after ``png_codec`` / ``bmp_codec`` /
``gif_codec`` (same role, same boundary).  The decoder implements the
full baseline sequential scheme — marker parse, multi-table DQT/DHT
segments, Huffman entropy decode with byte-unstuffing, restart-marker
handling (DRI/RSTn), arbitrary h/v sampling factors with replicate
chroma upsampling, dequantize + inverse zigzag + IDCT, and YCbCr→RGB —
AND the full progressive Huffman scheme (SOF2): spectral selection,
successive approximation (DC/AC first and refinement scans, EOBRUN,
ZRL, correction bits — T.81 G.2), interleaved or single-component DC
scans, and the non-interleaved block grids that exclude MCU-padding
dummy blocks.  It reads JPEGs produced by any conforming Huffman
encoder, not just this module's.

The encoder is spec-valid and deliberately simple: the Annex K example
quantization tables scaled by the libjpeg quality formula and the
Annex K typical Huffman tables (baseline), or a fixed flat-length AC
table carrying the EOBn symbols (progressive — the standard 10-scan
script; progressive and baseline encodings of the same image carry
identical quantized coefficients, so they decode pixel-identically,
which the tests pin).  Output is deterministic and byte-stable, which
the oracle-checked catalog entries require.

JPEG is lossy by construction, so unlike the PNG/BMP/GIF paths the
pixel round-trip is approximate; the *dimensions* round-trip exactly
(that is what the arithmetic SQL oracle checks) and the tests bound the
pixel error of an encode→decode cycle on smooth images.

Scope (documented, asserted): baseline DCT (SOF0, 8-bit), extended
sequential DCT (SOF1, 8- or 12-bit — the precision scientific/medical
corpora carry; round 6 closed this gap with :func:`encode_jpeg12_gray`
as the conforming producer), and progressive Huffman DCT (SOF2,
8-bit), 1- or 3-component frames, 8- and 16-bit quantization tables.
Arithmetic coding, lossless, hierarchical, and 12-bit progressive
modes raise ``NotImplementedError`` naming the feature; truncated or
corrupt streams raise ``ValueError`` naming the offending structure.

Codec boundary only — the Spark-side plumbing (Arrow batches,
``mapInPandas`` signatures, schemas) lives in
``functions/multimodal.py`` and is codec-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants

#: Annex K example luminance / chrominance quantization tables (natural
#: row-major order).
_QUANT_LUMA = np.array(
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
_QUANT_CHROMA = np.array(
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

#: zigzag[i] = natural index of the i-th coefficient in zigzag order.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: Progressive AC table: the Annex K baseline AC tables have no EOBn
#: symbols (r<<4 with s=0, r=1..14 — they exist only in progressive
#: streams), so progressive scans use this fixed table instead: all
#: 176 possible AC symbols (EOB0..EOB14, ZRL, and (r,s) for s=1..10)
#: at a flat 9-bit length.  2^9 = 512 > 176 keeps the all-ones code
#: unassigned as the spec requires; flat-length is bigger on the wire
#: than an optimized table but deterministic, which the oracle-checked
#: entries need.
_AC_PROG_VALS = sorted(
    [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_PROG_BITS = [0] * 8 + [len(_AC_PROG_VALS)] + [0] * 7

#: 8x8 DCT-II basis matrix: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_IDCT = _DCT.T.copy()


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


# ------------------------------------------------------------- encode


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables (1..100)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


_CODE_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]],
                  dict[int, tuple[int, int]]] = {}


def _build_code_strings(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical code assignment.
    Cached by table content — the encoder always uses the four module
    constants, so the build runs once per process."""
    key = (tuple(bits), tuple(vals))
    cached = _CODE_CACHE.get(key)
    if cached is not None:
        return cached
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    _CODE_CACHE[key] = codes
    return codes


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def _component_blocks(plane: np.ndarray, n_by: int, n_bx: int) -> np.ndarray:
    """Pad (edge-replicate) to exactly ``n_by x n_bx`` 8x8 blocks ->
    (n_by, n_bx, 8, 8)."""
    h, w = plane.shape
    ph, pw = n_by * 8 - h, n_bx * 8 - w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane.reshape(n_by, 8, n_bx, 8).transpose(0, 2, 1, 3)


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Mean-pool by (fy, fx) with edge-replicate padding to multiples."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = -h % fy, -w % fx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: list[int], ci: int,
                  dc_codes, ac_codes) -> None:
    tbl = 0 if ci == 0 else 1
    vals = zz.tolist()  # one conversion; per-index numpy scalars are slow
    dcv = vals[0]
    cat, bits = _magnitude(dcv - pred[ci])
    pred[ci] = dcv
    code, length = dc_codes[tbl][cat]
    bw.write(code, length)
    if cat:
        bw.write(bits, cat)
    ac = ac_codes[tbl]
    nz = [k for k in range(1, 64) if vals[k]]
    prev = 0
    for k in nz:
        run = k - prev - 1
        while run > 15:
            code, length = ac[0xF0]
            bw.write(code, length)
            run -= 16
        cat, bits = _magnitude(vals[k])
        code, length = ac[(run << 4) | cat]
        bw.write(code, length)
        bw.write(bits, cat)
        prev = k
    if not nz or nz[-1] < 63:
        code, length = ac[0x00]
        bw.write(code, length)


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                restart_interval: int = 0,
                subsample: bool = False,
                progressive: bool = False) -> bytes:
    """Encode a uint8 ``(h, w, 3)`` RGB array as a JFIF JPEG.

    Deterministic: fixed tables (Annex K scaled by ``quality``), fixed
    marker layout. ``subsample=True`` emits 4:2:0 (2x2 luma blocks per
    MCU, box-filtered chroma) — the layout real camera files use;
    default is 4:4:4. ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that many MCUs. Both options exist so the
    decoder's sampling-factor and restart paths round-trip against a
    conforming producer.

    ``progressive=True`` emits SOF2 with the standard 10-scan script
    (DC Al=1 first; luma AC split 1-5/6-63 at Al=2 with an Ah=2->1
    refinement; chroma AC at Al=1; then the Al=0 refinements) —
    spectral selection AND successive approximation, so a full decode
    reconstructs exactly the same quantized coefficients as the
    baseline encoding of the same image (the tests pin pixel-identical
    output).  Progressive + restart intervals is refused (keep one
    resync scheme per stream)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"invalid image dimensions {w}x{h}")
    if progressive and restart_interval:
        raise ValueError(
            "progressive encode does not support restart intervals"
        )
    q_luma, q_chroma = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(arr)
    sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_codes = [_build_code_strings(_DC_LUMA_BITS, _DC_LUMA_VALS),
                _build_code_strings(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [_build_code_strings(_AC_LUMA_BITS, _AC_LUMA_VALS),
                _build_code_strings(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    # DCT + quantize each component up front (vectorized over blocks).
    comp_zz = []
    for ci, (hs, vs) in enumerate(sampling):
        plane = _box_downsample(ycc[:, :, ci], vmax // vs, hmax // hs)
        blocks = _component_blocks(plane, mcus_y * vs, mcus_x * hs) - 128.0
        coef = np.einsum("ux,byxw,wv->byuv", _DCT, blocks, _IDCT)
        q = (q_luma if ci == 0 else q_chroma).reshape(8, 8).astype(np.float64)
        qz = np.round(coef / q).astype(np.int64)
        n_by, n_bx = qz.shape[:2]
        comp_zz.append(qz.reshape(n_by, n_bx, 64)[:, :, _ZIGZAG])

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, q_luma), (1, q_chroma)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(q[i]) for i in _ZIGZAG)
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        hs, vs = sampling[cid - 1]
        out += bytes([cid, (hs << 4) | vs, qid])
    ac_defs = (
        ((0x10, _AC_PROG_BITS, _AC_PROG_VALS),)
        if progressive
        else (
            (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        )
    )
    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        *ac_defs,
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if progressive:
        prog_ac = _build_code_strings(_AC_PROG_BITS, _AC_PROG_VALS)
        out += _encode_progressive_scans(
            comp_zz, sampling, mcus_y, mcus_x, h, w, dc_codes, prog_ac
        )
        out += b"\xff\xd9"
        return bytes(out)

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                pred = [0, 0, 0]
            mcu_count += 1
            for ci, (hs, vs) in enumerate(sampling):
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_zz[ci][my * vs + by, mx * hs + bx]
                        _encode_block(bw, zz, pred, ci, dc_codes, ac_codes)
    bw.flush()

    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tbls in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tbls])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------- 12-bit extended sequential
#
# 12-bit JPEG is the precision real scientific/medical corpora carry
# (DICOM's lossy transfer syntaxes, astronomy quick-looks).  The
# entropy model is identical to baseline — only the ranges widen: DC
# difference categories reach 15, AC magnitude categories reach 14 —
# so the Annex K tables (built for 8-bit ranges) can't encode it;
# conforming 12-bit files embed custom DHT tables, and so do we.  The
# tables below are flat canonical codes (all DC symbols at 5 bits, all
# AC symbols at 8) — deliberately simple over optimal: correctness and
# round-trip verification are the point, and the decoder reads
# WHATEVER tables the DHT declares, so real files with tuned tables
# decode identically.

_DC12_VALS = list(range(16))  # categories 0..15 (cat 16 not emitted)
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_AC12_VALS = [0x00, 0xF0] + [
    (r << 4) | c for r in range(16) for c in range(1, 15)
]
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, 226] + [0] * 8


def encode_jpeg12_gray(arr: np.ndarray, quality: int = 90,
                       restart_interval: int = 0) -> bytes:
    """Encode a uint16 ``(h, w)`` grayscale array (values 0..4095) as
    a 12-bit EXTENDED SEQUENTIAL (SOF1) Huffman JPEG.  Deterministic
    like :func:`encode_jpeg`; the quant table is the Annex K luma
    table scaled by ``quality`` (values stay <= 255, so Pq=0).  Level
    shift is 2048 per the spec's ``2^(P-1)``."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError(f"expected (h, w) grayscale array, got {arr.shape}")
    if arr.dtype != np.uint16 or int(arr.max(initial=0)) > 4095:
        raise ValueError("12-bit encode needs uint16 samples in 0..4095")
    h, w = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"invalid image dimensions {w}x{h}")
    q_luma, _ = _quality_tables(quality)
    mcus_y, mcus_x = -(-h // 8), -(-w // 8)
    blocks = _component_blocks(arr.astype(np.float64), mcus_y, mcus_x)
    blocks = blocks - 2048.0
    coef = np.einsum("ux,byxw,wv->byuv", _DCT, blocks, _IDCT)
    q = q_luma.reshape(8, 8).astype(np.float64)
    qz = np.round(coef / q).astype(np.int64)
    comp_zz = qz.reshape(mcus_y, mcus_x, 64)[:, :, _ZIGZAG]

    dc_codes = [_build_code_strings(_DC12_BITS, _DC12_VALS)]
    ac_codes = [_build_code_strings(_AC12_BITS, _AC12_VALS)]

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
    out += bytes(int(q_luma[i]) for i in _ZIGZAG)
    out += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, h, w, 1)
    out += bytes([1, 0x11, 0])  # component 1, 1x1 sampling, qtable 0
    for tc_th, bits, vals in (
        (0x00, _DC12_BITS, _DC12_VALS),
        (0x10, _AC12_BITS, _AC12_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    bw = _BitWriter()
    pred = [0]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                pred = [0]
            mcu_count += 1
            _encode_block(bw, comp_zz[my, mx], pred, 0, dc_codes, ac_codes)
    bw.flush()
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00])
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------- progressive scan encoding


def _sos_header(comp_specs: list[tuple[int, int]], ss: int, se: int,
                ah: int, al: int) -> bytes:
    """SOS segment: ``comp_specs`` = [(cid, TdTa byte)]."""
    body = bytearray([len(comp_specs)])
    for cid, tdta in comp_specs:
        body += bytes([cid, tdta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + bytes(body)


def _ni_grid(ci: int, sampling, mcus_x: int, h: int, w: int,
             hmax: int, vmax: int) -> tuple[int, int, int]:
    """(row_stride, rows, cols) of component ``ci``'s non-interleaved
    block grid (dummy MCU-padding blocks excluded, T.81 A.2.2)."""
    hs, vs = sampling[ci]
    comp_w = -(-(w * hs) // hmax)
    comp_h = -(-(h * vs) // vmax)
    return mcus_x * hs, -(-comp_h // 8), -(-comp_w // 8)


def _flush_eobrun(bw: _BitWriter, ac, st: dict) -> None:
    """Emit the pending EOB run symbol + its buffered correction bits
    (jcphuff's emit_eobrun)."""
    if st["eobrun"] > 0:
        nbits = st["eobrun"].bit_length() - 1
        code, length = ac[nbits << 4]
        bw.write(code, length)
        if nbits:
            bw.write(st["eobrun"] - (1 << nbits), nbits)
        st["eobrun"] = 0
        for b in st["pending"]:
            bw.write(b, 1)
        st["pending"] = []


def _encode_ac_first_block(bw, ac, st, vals, ss, se, al) -> None:
    """One block of an AC first scan (point transform + EOBRUN/ZRL)."""
    r = 0
    for k in range(ss, se + 1):
        v = vals[k]
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        _flush_eobrun(bw, ac, st)
        while r > 15:
            code, length = ac[0xF0]
            bw.write(code, length)
            r -= 16
        cat, _ = _magnitude(t)
        code, length = ac[(r << 4) | cat]
        bw.write(code, length)
        tv = t if v > 0 else -t
        bw.write(tv if tv > 0 else tv + (1 << cat) - 1, cat)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac, st)


def _encode_ac_refine_block(bw, ac, st, vals, ss, se, al) -> None:
    """One block of an AC refinement scan (jcphuff's
    encode_mcu_AC_refine: correction bits buffered across EOB runs)."""
    absv = [abs(vals[k]) >> al for k in range(ss, se + 1)]
    eob = -1  # index (band-relative) of the last NEWLY-nonzero coef
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    br_bits: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            _flush_eobrun(bw, ac, st)
            code, length = ac[0xF0]
            bw.write(code, length)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:
            # history coefficient: append its next magnitude bit
            br_bits.append(t & 1)
            continue
        # newly nonzero at this level
        _flush_eobrun(bw, ac, st)
        code, length = ac[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if vals[ss + i] > 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        st["eobrun"] += 1
        st["pending"].extend(br_bits)
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac, st)


def _encode_progressive_scans(comp_zz, sampling, mcus_y, mcus_x, h, w,
                              dc_codes, prog_ac) -> bytes:
    """The standard 10-scan progressive script (libjpeg's default):
    DC first at Al=1 (interleaved), per-component AC first scans with
    spectral selection, one successive-approximation refinement chain
    down to Al=0, and the DC refinement."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    out = bytearray()

    def dc_scan(ah: int, al: int) -> None:
        out.extend(
            _sos_header([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, ah, al)
        )
        bw = _BitWriter()
        pred = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (hs, vs) in enumerate(sampling):
                    tbl = dc_codes[0 if ci == 0 else 1]
                    for by in range(vs):
                        for bx in range(hs):
                            dc = int(comp_zz[ci][my * vs + by, mx * hs + bx, 0])
                            if ah == 0:
                                v = dc >> al  # arithmetic shift (G.1.2.1)
                                cat, bits = _magnitude(v - pred[ci])
                                pred[ci] = v
                                code, length = tbl[cat]
                                bw.write(code, length)
                                if cat:
                                    bw.write(bits, cat)
                            else:
                                bw.write((dc >> al) & 1, 1)
        bw.flush()
        out.extend(bw.out)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> None:
        cid = ci + 1
        # every AC scan uses the shared progressive table (Ta = 0)
        out.extend(_sos_header([(cid, 0x00)], ss, se, ah, al))
        ac = prog_ac
        bw = _BitWriter()
        st = {"eobrun": 0, "pending": []}
        row_stride, rows, cols = _ni_grid(
            ci, sampling, mcus_x, h, w, hmax, vmax
        )
        grid = comp_zz[ci].reshape(-1, 64)
        for rr in range(rows):
            for cc in range(cols):
                vals = grid[rr * row_stride + cc].tolist()
                if ah == 0:
                    _encode_ac_first_block(bw, ac, st, vals, ss, se, al)
                else:
                    _encode_ac_refine_block(bw, ac, st, vals, ss, se, al)
        _flush_eobrun(bw, ac, st)
        bw.flush()
        out.extend(bw.out)

    dc_scan(0, 1)
    ac_scan(0, 1, 5, 0, 2)
    ac_scan(2, 1, 63, 0, 1)
    ac_scan(1, 1, 63, 0, 1)
    ac_scan(0, 6, 63, 0, 2)
    ac_scan(0, 1, 63, 2, 1)
    dc_scan(1, 0)
    ac_scan(2, 1, 63, 1, 0)
    ac_scan(1, 1, 63, 1, 0)
    ac_scan(0, 1, 63, 1, 0)
    return bytes(out)


# ------------------------------------------------------------- decode


class _BitReader:
    """MSB-first entropy-segment reader: unstuffs 0xFF00, stops at
    markers, and can resynchronise at RSTn boundaries."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # trim already-consumed high bits so acc stays a machine int
        self.acc &= (1 << self.nbits) - 1
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG: entropy data ended early")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG: dangling 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # A real marker (RSTn / EOI / next segment): per spec
                # the entropy decoder pads with 1-bits past the segment
                # end — peek16 may legitimately prefetch into the pad
                # just before a restart boundary, so the marker is NOT
                # consumed here (align_to_restart / the caller owns it).
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def peek16(self) -> int:
        """Next 16 bits without consuming (1-padded past stream end)."""
        while self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def drop(self, n: int) -> None:
        self.nbits -= n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_restart(self) -> None:
        """Discard pad bits and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # tolerate stuffing remnants: scan to the next 0xFF
        while self.pos < len(d) and d[self.pos] != 0xFF:
            self.pos += 1
        if self.pos + 1 >= len(d) or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected RSTn marker at restart interval")
        self.pos += 2


#: (BITS, HUFFVAL) -> flat 2^16 lookup list: peek 16 bits, one index,
#:  entry = (code_length << 8) | symbol; 0 marks an invalid prefix.
#: Cached globally — every file reusing the Annex K tables (most files,
#: including this encoder's) pays the build exactly once per process.
_LUT_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], list[int]] = {}

#: each cached LUT is ~0.5 MB of Python ints; files with optimized
#: per-image Huffman tables (mozjpeg etc.) would otherwise grow the
#: cache without bound in a long-lived executor — FIFO-evict instead
_LUT_CACHE_MAX = 16


def _build_decode_table(bits: list[int], vals: list[int]) -> list[int]:
    if sum(bits) != len(vals):
        raise ValueError(
            "invalid JPEG: DHT value count does not match its BITS table"
        )
    key = (tuple(bits), tuple(vals))
    lut = _LUT_CACHE.get(key)
    if lut is not None:
        return lut
    arr = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("invalid JPEG: DHT code space overflow")
            start = code << (16 - length)
            arr[start : start + (1 << (16 - length))] = (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    lut = arr.tolist()
    if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    _LUT_CACHE[key] = lut
    return lut


def _huff_decode(br: _BitReader, lut: list[int]) -> int:
    entry = lut[br.peek16()]
    if entry == 0:
        raise ValueError("invalid JPEG: Huffman code longer than 16 bits")
    br.drop(entry >> 8)
    return entry & 0xFF


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential (SOF0) or progressive (SOF2)
    Huffman JPEG to a uint8 ``(h, w, 3)`` RGB array (grayscale streams
    are replicated across channels)."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, qid)]
    precision = 8
    progressive = False
    state = None  # progressive: per-component coefficient accumulators
    restart_interval = 0
    n = len(data)

    while True:
        if pos + 4 > n and not (pos + 2 <= n and data[pos : pos + 2] == b"\xff\xd9"):
            raise ValueError("truncated JPEG: ran out of markers")
        if data[pos] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at byte {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # legal fill bytes before a marker
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and state is not None and state["scans"] > 0:
                return _finish_progressive(frame, qtables, state)
            raise ValueError("invalid JPEG: EOI before scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length segment
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0), extended sequential (SOF1) and "
                f"progressive (SOF2) Huffman DCT are supported; "
                f"got SOF marker 0xFF{marker:02X}"
            )
        if pos + 2 > n:
            raise ValueError("truncated JPEG: marker length missing")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg_end = pos + seg_len
        if seg_len < 2 or seg_end > n:
            raise ValueError("truncated JPEG: segment overruns payload")
        body_pos = pos + 2

        if marker == 0xDB:  # DQT (possibly several tables)
            p = body_pos
            while p < seg_end:
                pq, tq = data[p] >> 4, data[p] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"invalid JPEG: DQT precision {pq}")
                width = 2 if pq else 1
                if p + 1 + 64 * width > seg_end:
                    raise ValueError(
                        "truncated JPEG: DQT table overruns the segment"
                    )
                dt = ">u2" if pq else np.uint8
                zz = np.frombuffer(data, dtype=dt, count=64,
                                   offset=p + 1).astype(np.int64)
                natural = np.empty(64, dtype=np.int64)
                natural[_ZIGZAG] = zz
                qtables[tq] = natural.reshape(8, 8)
                p += 1 + 64 * width
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = body_pos
            while p < seg_end:
                tc_th = data[p]
                bits = list(data[p + 1:p + 17])
                nvals = sum(bits)
                if p + 17 + nvals > seg_end:
                    raise ValueError(
                        "truncated JPEG: DHT values overrun the segment"
                    )
                vals = list(data[p + 17:p + 17 + nvals])
                htables[tc_th] = _build_decode_table(bits, vals)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            progressive = marker == 0xC2
            if body_pos + 6 > seg_end:
                raise ValueError("truncated JPEG: SOF0 header too short")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", data, body_pos)
            if marker == 0xC0 and prec != 8:
                raise ValueError(
                    f"invalid JPEG: baseline SOF0 requires 8-bit "
                    f"precision, got {prec}"
                )
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"only 8- or 12-bit precision supported, got {prec}"
                )
            if progressive and prec != 8:
                raise NotImplementedError(
                    "12-bit progressive (SOF2) decode is not supported; "
                    "use extended sequential (SOF1)"
                )
            precision = prec
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"only 1- or 3-component frames supported, got {nc}"
                )
            if body_pos + 6 + 3 * nc > seg_end:
                raise ValueError("truncated JPEG: SOF0 components cut off")
            comps = []
            for i in range(nc):
                cid, hv, qid = data[body_pos + 6 + 3 * i:body_pos + 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(
                        f"invalid JPEG: sampling factors {hs}x{vs} out of "
                        "the spec range 1..4"
                    )
                comps.append((cid, hs, vs, qid))
            # replicate upsampling divides hmax/vmax by each
            # component's factor — non-integral ratios (e.g. 3 and 2,
            # both inside the 1..4 spec range) would yield undersized
            # planes and die later in np.stack with a generic shape
            # mismatch; reject them here, loudly, by name
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            bad = [
                (cid, hs, vs)
                for cid, hs, vs, _ in comps
                if hmax % hs or vmax % vs
            ]
            if bad:
                raise NotImplementedError(
                    "non-integral chroma sampling ratios are not "
                    f"supported: components {bad} vs max {hmax}x{vmax}"
                )
            frame = (fh, fw, comps)
        elif marker == 0xDD:  # DRI
            if body_pos + 2 > seg_end:
                raise ValueError("truncated JPEG: DRI segment too short")
            restart_interval = struct.unpack_from(">H", data, body_pos)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF0")
            ns = data[body_pos]
            if body_pos + 1 + 2 * ns + 3 > seg_end:
                raise ValueError("truncated JPEG: SOS components cut off")
            scan_comps = []  # (cid, td, ta) in scan order
            scan_tbl = {}
            for i in range(ns):
                cid = data[body_pos + 1 + 2 * i]
                td_ta = data[body_pos + 2 + 2 * i]
                scan_comps.append((cid, td_ta >> 4, td_ta & 0x0F))
                scan_tbl[cid] = (td_ta >> 4, td_ta & 0x0F)
            p = body_pos + 1 + 2 * ns
            ss, se, ahal = data[p], data[p + 1], data[p + 2]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = seg_end
            if not progressive:
                return _decode_scan(
                    data, pos, frame, scan_tbl, qtables, htables,
                    restart_interval, precision,
                )
            if state is None:
                state = _init_progressive_state(frame)
            pos = _decode_progressive_scan(
                data, pos, frame, scan_comps, ss, se, ah, al,
                state, htables, restart_interval,
            )
            state["scans"] += 1
            # the bit reader stops at whole-byte granularity: skip any
            # unconsumed pad/stuffing remnants up to the next marker
            while pos + 1 < n and not (
                data[pos] == 0xFF and data[pos + 1] != 0x00
            ):
                pos += 1
            continue
        # APPn / COM / anything else: skip
        pos = seg_end


# ----------------------------------------------- progressive (SOF2)


def _init_progressive_state(frame) -> dict:
    """Per-component zigzag-order coefficient accumulators, shared by
    every scan of a progressive stream."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    st = {
        "scans": 0,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "coefs": {},
        "grid": {},  # cid -> (row_stride, ni_rows, ni_cols)
    }
    for cid, hs, vs, _qid in comps:
        n_bx, n_by = mcus_x * hs, mcus_y * vs
        st["coefs"][cid] = np.zeros((n_by * n_bx, 64), dtype=np.int32)
        # non-interleaved (single-component) scans cover only the
        # component's true block grid — MCU-padding dummy blocks are
        # not coded in them (T.81 A.2.2)
        comp_w = -(-(fw * hs) // hmax)
        comp_h = -(-(fh * vs) // vmax)
        st["grid"][cid] = (n_bx, -(-comp_h // 8), -(-comp_w // 8))
    return st


def _decode_progressive_scan(
    data, pos, frame, scan_comps, ss, se, ah, al, state, htables, ri
) -> int:
    """Decode one progressive scan into the coefficient state; returns
    the byte position after the scan's entropy data.

    Implements all four scan kinds of T.81 G.2: DC first (interleaved
    or single-component), DC refinement (one bit per block), AC first
    (EOBRUN + ZRL over a spectral band), and AC refinement
    (correction bits; the G.1.2.3 successive-approximation algorithm).
    """
    fh, fw, comps = frame
    bycid = {c[0]: c for c in comps}
    for cid, _td, _ta in scan_comps:
        if cid not in bycid:
            raise ValueError(f"invalid JPEG: scan names unknown component {cid}")
    if not 0 <= al <= 13 or not 0 <= ah <= 13:
        raise ValueError(f"invalid JPEG: successive approximation {ah}/{al}")
    br = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("invalid JPEG: DC scan with Se != 0")
        _decode_prog_dc(br, scan_comps, bycid, ah, al, state, htables, ri)
    else:
        if se > 63 or ss > se:
            raise ValueError(f"invalid JPEG: spectral band {ss}..{se}")
        if len(scan_comps) != 1:
            raise ValueError(
                "invalid JPEG: progressive AC scans must be single-component"
            )
        _decode_prog_ac(
            br, scan_comps[0], ss, se, ah, al, state, htables, ri
        )
    return br.pos


def _decode_prog_dc(br, scan_comps, bycid, ah, al, state, htables, ri):
    mcus_x, mcus_y = state["mcus_x"], state["mcus_y"]
    luts = {}
    if ah == 0:
        for cid, td, _ta in scan_comps:
            lut = htables.get(td)
            if lut is None:
                raise ValueError("invalid JPEG: missing DC table for scan")
            luts[cid] = lut
    preds = {cid: 0 for cid, _td, _ta in scan_comps}

    def one_block(cid, bi):
        coefs = state["coefs"][cid]
        if ah == 0:
            sym = _huff_decode(br, luts[cid])
            if sym > 11:
                raise ValueError("invalid JPEG: DC category > 11")
            preds[cid] += _extend(br.receive(sym), sym)
            coefs[bi, 0] = preds[cid] << al
        else:
            if br.read_bit():
                coefs[bi, 0] |= 1 << al

    if len(scan_comps) > 1:  # interleaved MCU walk (incl. dummy blocks)
        count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and count and count % ri == 0:
                    br.align_to_restart()
                    preds.update({c: 0 for c in preds})
                for cid, _td, _ta in scan_comps:
                    _, hs, vs, _ = bycid[cid]
                    n_bx = mcus_x * hs
                    for by in range(vs):
                        for bx in range(hs):
                            one_block(
                                cid, (my * vs + by) * n_bx + (mx * hs + bx)
                            )
                count += 1
    else:  # non-interleaved raster over the component's true grid
        cid = scan_comps[0][0]
        row_stride, ni_rows, ni_cols = state["grid"][cid]
        count = 0
        for r in range(ni_rows):
            for c in range(ni_cols):
                if ri and count and count % ri == 0:
                    br.align_to_restart()
                    preds.update({k: 0 for k in preds})
                one_block(cid, r * row_stride + c)
                count += 1


def _decode_prog_ac(br, scan_comp, ss, se, ah, al, state, htables, ri):
    cid, _td, ta = scan_comp
    ac = htables.get(0x10 | ta)
    if ac is None:
        raise ValueError("invalid JPEG: missing AC table for scan")
    coefs = state["coefs"][cid]
    row_stride, ni_rows, ni_cols = state["grid"][cid]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    count = 0
    for rr in range(ni_rows):
        for cc in range(ni_cols):
            if ri and count and count % ri == 0:
                br.align_to_restart()
                eobrun = 0
            count += 1
            row = coefs[rr * row_stride + cc]
            if ah == 0:  # ----------------------------- first scan
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, ac)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.receive(r)
                            break
                        k += 16  # ZRL
                    else:
                        k += r
                        if k > se:
                            raise ValueError(
                                "invalid JPEG: AC run past the band end"
                            )
                        row[k] = _extend(br.receive(s), s) << al
                        k += 1
            else:  # ------------------------------ refinement scan
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(br, ac)
                        r, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.receive(r)
                                break
                            # ZRL: advance past 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "invalid JPEG: refinement magnitude != 1"
                                )
                            val = p1 if br.read_bit() else m1
                        while k <= se:
                            coef = int(row[k])
                            if coef != 0:
                                if br.read_bit() and (coef & p1) == 0:
                                    row[k] = coef + (p1 if coef >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            row[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        coef = int(row[k])
                        if coef != 0 and br.read_bit() and (coef & p1) == 0:
                            row[k] = coef + (p1 if coef >= 0 else m1)
                        k += 1
                    eobrun -= 1


def _finish_progressive(frame, qtables, state) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for cid, hs, vs, qid in comps:
        if qid not in qtables:
            raise ValueError(f"invalid JPEG: missing DQT table {qid}")
        out.append(
            (
                hs,
                vs,
                qtables[qid].astype(np.float64),
                state["coefs"][cid],
                state["mcus_x"] * hs,
            )
        )
    return _assemble(fh, fw, hmax, vmax, out, state["mcus_y"])


def _decode_scan(data, pos, frame, scan_tbl, qtables, htables,
                 restart_interval, precision=8) -> np.ndarray:
    fh, fw, comps = frame
    if fh == 0 or fw == 0:
        raise ValueError(f"invalid JPEG dimensions {fw}x{fh}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-fw // mcu_w)
    mcus_y = -(-fh // mcu_h)

    meta = []  # (hs, vs, q, dc_lut, ac_lut, coefs, n_bx_total)
    for cid, hs, vs, qid in comps:
        if cid not in scan_tbl:
            raise NotImplementedError(
                "non-interleaved multi-scan streams are not supported"
            )
        if qid not in qtables:
            raise ValueError(f"invalid JPEG: missing DQT table {qid}")
        td, ta = scan_tbl[cid]
        dc = htables.get(td)
        ac = htables.get(0x10 | ta)
        if dc is None or ac is None:
            raise ValueError("invalid JPEG: missing DHT table for scan")
        # zigzag-order coefficients for ALL of this component's blocks,
        # entropy-decoded sparsely here and transformed in one batch
        # (unzigzag + dequantize + IDCT) after the scan loop
        coefs = np.zeros((mcus_y * vs * mcus_x * hs, 64), dtype=np.int32)
        meta.append(
            (hs, vs, qtables[qid].astype(np.float64), dc, ac, coefs,
             mcus_x * hs)
        )

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_to_restart()
                pred = [0] * len(comps)
            for ci, (hs, vs, _q, dc, ac, coefs, n_bx) in enumerate(meta):
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * n_bx + (mx * hs + bx)
                        sym = _huff_decode(br, dc)
                        if sym > (11 if precision == 8 else 15):
                            if precision == 12 and sym == 16:
                                raise NotImplementedError(
                                    "12-bit DC difference category 16 "
                                    "(diff = 32768) is not supported"
                                )
                            raise ValueError(
                                "invalid JPEG: DC category out of range"
                            )
                        pred[ci] += _extend(br.receive(sym), sym)
                        row = coefs[bi]
                        row[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac)
                            s = rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError(
                                    "invalid JPEG: AC run past block end"
                                )
                            row[k] = _extend(br.receive(s), s)
                            k += 1
            mcu_count += 1

    return _assemble(
        fh,
        fw,
        hmax,
        vmax,
        [
            (hs, vs, q, coefs, n_bx)
            for (hs, vs, q, _dc, _ac, coefs, n_bx) in meta
        ],
        mcus_y,
        precision,
    )


def _assemble(fh, fw, hmax, vmax, comps, mcus_y, precision=8) -> np.ndarray:
    """Shared decode tail (baseline and progressive): batch transform
    per component — unzigzag + dequantize + IDCT over all blocks at
    once — then stitch the block grid into the plane and upsample
    (replicate) to full frame resolution."""
    center = float(1 << (precision - 1))
    peak = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    full = []
    for (hs, vs, q, coefs, n_bx) in comps:
        n_by = mcus_y * vs
        nat = np.zeros_like(coefs, dtype=np.float64)
        nat[:, _ZIGZAG] = coefs
        blocks = (nat * q.reshape(1, 64)).reshape(-1, 8, 8)
        px = np.einsum("ux,nxw,wv->nuv", _IDCT, blocks, _DCT) + center
        plane = (
            px.reshape(n_by, n_bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(n_by * 8, n_bx * 8)
        )
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(plane[:fh, :fw])

    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, peak).astype(dtype)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, peak).astype(dtype)
