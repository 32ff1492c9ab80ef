"""Minimal real PNG codec (pure stdlib ``zlib``/``struct`` + numpy).

The execution environment has no Pillow/ffmpeg, but PNG itself needs
only DEFLATE (stdlib ``zlib``) plus the five scanline filters — so the
image-decode step of the multimodal pipeline can be REAL for PNG
payloads rather than stubbed: any 8-bit non-interlaced grayscale /
RGB / RGBA PNG decodes to a numpy array, and the matching encoder
produces payloads other decoders (including this one) accept.

Scope (documented, asserted): bit depth 8, color types 0 (gray),
2 (RGB), 6 (RGBA), sequential or Adam7-interlaced. That covers what a
training-data pipeline writes itself plus the interlaced files web
crawls commonly contain; anything else (palette, 16-bit) raises
``ValueError`` with the unsupported field named.

This is the codec boundary only — the Spark-side plumbing (Arrow
batches, ``mapInPandas`` signatures, schemas) lives in
``functions/multimodal.py`` and is codec-agnostic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color_type -> samples per pixel


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _PNG_SIG


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass, the
#: order the PNG spec (ISO/IEC 15948 §8.2) transmits them in
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def encode_png(
    arr: np.ndarray, compress_level: int = 6, interlace: bool = False
) -> bytes:
    """Encode an 8-bit image array to PNG bytes.

    ``arr``: shape (h, w) -> grayscale, (h, w, 3) -> RGB,
    (h, w, 4) -> RGBA; dtype coercible to uint8. Filter type 0 (None)
    on every scanline — simple and always valid.  ``interlace=True``
    writes Adam7 (each pass an independently-filtered sub-image;
    empty passes transmit nothing, per spec).
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = a[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (int16 math)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _defilter(
    raw: bytes, offset: int, h: int, w: int, ch: int
) -> tuple[np.ndarray, int]:
    """De-filter one sequentially-transmitted sub-image of ``h`` rows
    × ``w`` pixels starting at ``offset`` in the decompressed stream;
    returns the (h, w*ch) sample array and the offset just past it.
    Filter context (left/up neighbors) is local to the sub-image, per
    spec — each Adam7 pass filters as if it were its own image."""
    stride = w * ch
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError(
            f"IDAT truncated: need {need} bytes at {offset}, "
            f"have {len(raw) - offset}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = offset + y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: recurrence along x, per-channel lag
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                line[x] = (
                    line[x]
                    + int(
                        _paeth(
                            np.uint8(left), np.uint8(prev[x]), np.uint8(ul)
                        )
                    )
                ) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype} at row {y}")
        out[y] = line
        prev = out[y]
    return out, offset + need


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a uint8 array of shape (h, w, channels).

    Full filter support (None/Sub/Up/Average/Paeth), vectorized across
    each scanline; the only per-pixel Python loop PNG fundamentally
    requires (Sub/Paeth recurrence along x) runs over scanline slices,
    not scalars.  Adam7 interlacing is supported: the seven passes
    de-filter as independent sub-images and scatter back onto the pass
    grid.  Raises ``ValueError`` on anything outside the documented
    scope (palette, 16-bit).
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR chunk")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type} (0/2/6)")
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    if not interlace:
        block, end = _defilter(raw, 0, h, w, ch)
        if end != len(raw):
            raise ValueError(f"IDAT size {len(raw)} != expected {end}")
        return block.reshape(h, w, ch)
    out = np.empty((h, w, ch), dtype=np.uint8)
    offset = 0
    for x0, y0, xs, ys in _ADAM7:
        ph = -(-(h - y0) // ys) if h > y0 else 0
        pw = -(-(w - x0) // xs) if w > x0 else 0
        if ph == 0 or pw == 0:
            continue  # empty pass transmits nothing
        block, offset = _defilter(raw, offset, ph, pw, ch)
        out[y0::ys, x0::xs] = block.reshape(ph, pw, ch)
    if offset != len(raw):
        raise ValueError(f"IDAT size {len(raw)} != expected {offset}")
    return out


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, ch) uint8 array — the
    deterministic, dependency-free downsample a training pipeline uses
    for thumbnailing/normalizing before feature extraction."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]
