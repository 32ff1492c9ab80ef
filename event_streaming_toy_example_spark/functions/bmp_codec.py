"""Minimal real BMP codec (pure stdlib ``struct`` + numpy).

Second real image format after ``png_codec`` (same role, same
boundary): BMP needs no compression library at all — a
BITMAPFILEHEADER + BITMAPINFOHEADER + raw BGR rows — so it is fully
decodable in this container without Pillow.

Scope (documented, asserted): 24-bit uncompressed (BI_RGB)
BITMAPINFOHEADER files, bottom-up or top-down row order. That covers
what a training-data pipeline writes itself; anything else (palette,
16/32-bit, RLE, V4/V5 extra fields beyond the core header) raises
``ValueError``/``NotImplementedError`` with the unsupported field
named. Truncated pixel data refuses loudly rather than misreading.

This is the codec boundary only — the Spark-side plumbing (Arrow
batches, ``mapInPandas`` signatures, schemas) lives in
``functions/multimodal.py`` and is codec-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np

#: BITMAPFILEHEADER (14 bytes): magic, file size, 2 reserved, data offset
_FILE_HDR = struct.Struct("<2sIHHI")
#: BITMAPINFOHEADER (40 bytes): size, w, h, planes, bpp, compression,
#: image size, x/y ppm, colors used, colors important
_INFO_HDR = struct.Struct("<IiiHHIIiiII")

_BI_RGB = 0


def is_bmp(data: bytes) -> bool:
    return bytes(data[:2]) == b"BM"


def _row_stride(width: int) -> int:
    """BMP rows are padded to 4-byte boundaries."""
    return (width * 3 + 3) & ~3


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an 8-bit RGB array (h, w, 3) to a 24-bit BI_RGB BMP
    (bottom-up, the canonical orientation)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, _ = a.shape
    stride = _row_stride(w)
    pad = b"\x00" * (stride - w * 3)
    # BGR byte order, bottom row first
    bgr = a[::-1, :, ::-1]
    body = b"".join(bgr[y].tobytes() + pad for y in range(h))
    offset = _FILE_HDR.size + _INFO_HDR.size
    info = _INFO_HDR.pack(
        _INFO_HDR.size, w, h, 1, 24, _BI_RGB, len(body), 2835, 2835, 0, 0
    )
    file_hdr = _FILE_HDR.pack(b"BM", offset + len(body), 0, 0, offset)
    return file_hdr + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP -> uint8 RGB array (h, w, 3).

    Validates the header fields it relies on and refuses everything
    outside the documented scope loudly rather than misreading it."""
    payload = bytes(payload)
    if len(payload) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError(f"BMP too short: {len(payload)} bytes")
    magic, _file_size, _r1, _r2, offset = _FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP stream")
    (
        hdr_size,
        width,
        height,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _clr_used,
        _clr_imp,
    ) = _INFO_HDR.unpack_from(payload, _FILE_HDR.size)
    if hdr_size < _INFO_HDR.size:
        raise NotImplementedError(
            f"BITMAPCOREHEADER (size={hdr_size}) not supported"
        )
    if bpp != 24 or compression != _BI_RGB:
        raise NotImplementedError(
            f"only 24-bit BI_RGB supported (bpp={bpp}, "
            f"compression={compression})"
        )
    if planes != 1 or width <= 0 or height == 0:
        raise ValueError(
            f"corrupt BMP header (planes={planes}, w={width}, h={height})"
        )
    top_down = height < 0
    h, w = abs(height), width
    stride = _row_stride(w)
    if offset < _FILE_HDR.size + hdr_size:
        raise ValueError(
            f"corrupt BMP: pixel offset {offset} points inside the "
            f"{_FILE_HDR.size + hdr_size}-byte headers"
        )
    if len(payload) - offset < stride * h:
        raise ValueError(
            f"truncated BMP: pixel data declares {stride * h} bytes but "
            f"only {len(payload) - offset} present"
        )
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, : w * 3]
    rgb = rows.reshape(h, w, 3)[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
