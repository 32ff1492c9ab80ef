"""Minimal real GIF87a codec (pure stdlib ``struct`` + numpy).

Third real image format after ``png_codec`` / ``bmp_codec`` (same role,
same boundary).  The decoder implements the full GIF LZW scheme —
variable-width codes LSB-first, clear/end codes, dictionary growth to
12 bits, and the deferred-clear ``next_code`` edge case — so it reads
GIFs produced by any conforming encoder, not just this module's.

The encoder is spec-valid but deliberately simple: it emits literal
codes only, interleaving Clear codes before the decoder's dictionary
would force a code-width bump (the classic "uncompressed GIF" scheme).
Output is deterministic and byte-stable, which the oracle-checked
catalog entries require; it trades ~12% size for never exercising the
encoder-side dictionary.

Scope (documented, asserted): GIF87a/89a; global AND local color
tables (a frame's local table overrides the global one, and a stream
with no global table is legal when every frame carries its own);
interlaced frames (4-pass row order, decode and encode); no
transparency.  Multi-frame streams are supported
(``encode_gif_frames`` / ``decode_gif_frames`` — the real video-like
frame-sampling substrate); truncated or corrupt streams raise
``ValueError`` naming the offending structure.

Codec boundary only — the Spark-side plumbing (Arrow batches,
``mapInPandas`` signatures, schemas) lives in
``functions/multimodal.py`` and is codec-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np

_LSD = struct.Struct("<HHBBB")  # logical screen descriptor (after 6-byte sig)
_IMG = struct.Struct("<HHHHB")  # image descriptor body (after 0x2C)

_MAX_CODE_WIDTH = 12


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------- decode


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Full GIF LZW decode: LSB-first variable-width codes."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # dictionary as a list of index-tuples; entries < clear are literals
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = bits = 0
    pos = 0
    while True:
        while bits < code_size:
            if pos >= len(data):
                raise ValueError(
                    "truncated GIF: LZW stream ended before the End code"
                )
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            # widen when the NEXT code would not fit (deferred at 12 bits)
            if len(table) == (1 << code_size) and code_size < _MAX_CODE_WIDTH:
                code_size += 1
        prev = entry
        if len(out) > n_pixels:
            raise ValueError(
                f"corrupt GIF: LZW produced {len(out)} indices for "
                f"{n_pixels} pixels"
            )
    if len(out) != n_pixels:
        raise ValueError(
            f"truncated GIF: {len(out)} of {n_pixels} pixels decoded"
        )
    return np.asarray(out, dtype=np.uint8)


def _interlace_order(h: int) -> np.ndarray:
    """Row storage order of a GIF interlaced image: four passes
    starting at rows 0/4/2/1 with strides 8/8/4/2 (GIF89a spec
    appendix E)."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )


def _decode_frame(
    payload: bytes, pos: int, palette: np.ndarray | None, gct_len: int
) -> tuple[np.ndarray, int]:
    """Decode one image block starting at its descriptor body.

    ``palette`` is the global color table (None if the stream has
    none); a local color table on the frame (descriptor bit 0x80)
    overrides it, as the spec requires."""
    _left, _top, w, h, ipacked = _IMG.unpack_from(payload, pos)
    pos += _IMG.size
    if ipacked & 0x80:  # local color table overrides the global one
        lct_len = 2 << (ipacked & 0x07)
        lct_end = pos + 3 * lct_len
        if len(payload) < lct_end:
            raise ValueError("truncated GIF: local color table cut short")
        palette = np.frombuffer(
            payload, np.uint8, 3 * lct_len, pos
        ).reshape(lct_len, 3)
        gct_len = lct_len
        pos = lct_end
    if palette is None:
        raise ValueError(
            "corrupt GIF: frame has neither a local nor a global color table"
        )
    interlaced = bool(ipacked & 0x40)
    if w == 0 or h == 0:
        raise ValueError(f"corrupt GIF: zero image dimension {w}x{h}")
    if pos >= len(payload):
        raise ValueError("truncated GIF: missing LZW minimum code size")
    min_code_size = payload[pos]
    pos += 1
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"corrupt GIF: LZW min code size {min_code_size}")
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF: unterminated image data")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(payload):
            raise ValueError("truncated GIF: image sub-block cut short")
        chunks.append(payload[pos : pos + n])
        pos += n
    idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
    if int(idx.max(initial=0)) >= gct_len:
        raise ValueError("corrupt GIF: pixel index outside the color table")
    rows = idx.reshape(h, w)
    if interlaced:
        deinterlaced = np.empty_like(rows)
        deinterlaced[_interlace_order(h)] = rows
        rows = deinterlaced
    return palette[rows].copy(), pos


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Decode the frames of a GIF87a/89a stream -> list of uint8 RGB
    arrays (at most ``max_frames`` if given — the early exit a
    first-frame caller needs to skip the rest of an animation's LZW).
    Frames may differ in size (each image descriptor carries its own
    dimensions)."""
    payload = bytes(payload)
    if not is_gif(payload):
        raise ValueError("not a GIF stream")
    if len(payload) < 6 + _LSD.size:
        raise ValueError(f"GIF too short: {len(payload)} bytes")
    _sw, _sh, packed, _bg, _aspect = _LSD.unpack_from(payload, 6)
    pos = 6 + _LSD.size
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        gct_end = pos + 3 * gct_len
        if len(payload) < gct_end:
            raise ValueError("truncated GIF: global color table cut short")
        palette = np.frombuffer(payload, np.uint8, 3 * gct_len, pos).reshape(
            gct_len, 3
        )
        pos = gct_end
    else:
        # legal when every frame carries a local color table; the frame
        # decoder raises if one has neither
        palette, gct_len = None, 0
    frames: list[np.ndarray] = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF: no trailer before EOF")
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF: unterminated extension")
                n = payload[pos]
                pos += 1 + n
                if n == 0:
                    break
        elif block == 0x2C:
            frame, pos = _decode_frame(payload, pos, palette, gct_len)
            frames.append(frame)
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif block == 0x3B:
            if not frames:
                raise ValueError("GIF trailer reached with no image frame")
            return frames
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a -> uint8 RGB (h, w, 3);
    stops parsing after it (no LZW work on later animation frames)."""
    return decode_gif_frames(payload, max_frames=1)[0]


# ------------------------------------------------------------- encode


def _rgb(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"unsupported array shape {arr.shape}")
    return a


def _literal_lzw_body(idx: np.ndarray) -> bytes:
    """Pack palette indices as literal-codes-only LZW sub-blocks (see
    module docstring), min code size 8."""
    mcs = 8
    clear, end = 1 << mcs, (1 << mcs) + 1
    code_size = mcs + 1
    # decoder adds one table entry per code after the first; reset before
    # its next_code (= 258 + emitted-since-clear - 1) reaches 1 << 9
    span = (1 << code_size) - (clear + 2)
    lits = idx.reshape(-1).astype(np.uint32)
    n_clears = (len(lits) - 1) // span if len(lits) else 0
    codes = np.insert(
        lits, np.arange(1, n_clears + 1) * span, np.uint32(clear)
    )
    codes = np.concatenate(([np.uint32(clear)], codes, [np.uint32(end)]))
    # vectorized LSB-first 9-bit packing: each code lands at bit offset
    # 9*i, spreading over at most two bytes (9 + 7 shift = 16 bits)
    offs = np.arange(len(codes), dtype=np.int64) * code_size
    v = codes << (offs & 7).astype(np.uint32)
    byte0 = offs >> 3
    out = np.zeros(int((offs[-1] + code_size + 7) // 8), dtype=np.uint8)
    np.bitwise_or.at(out, byte0, (v & 0xFF).astype(np.uint8))
    np.bitwise_or.at(out, byte0 + 1, (v >> 8).astype(np.uint8))
    raw = out.tobytes()
    body = bytearray([mcs])
    for i in range(0, len(raw), 255):
        chunk = raw[i : i + 255]
        body.append(len(chunk))
        body.extend(chunk)
    body.append(0)
    return bytes(body)


def _frame_palette(flat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(colors, indices) for one flattened (n, 3) pixel block."""
    if (flat[:, 0] == flat[:, 1]).all() and (flat[:, 1] == flat[:, 2]).all():
        vals = np.unique(flat[:, 0])
        return np.repeat(vals[:, None], 3, axis=1), np.searchsorted(
            vals, flat[:, 0]
        )
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    return colors, inverse


def encode_gif_frames(
    frames: list[np.ndarray],
    interlace: bool = False,
    local_tables: bool = False,
) -> bytes:
    """Encode one or more frames (8-bit RGB (h, w, 3) or grayscale
    (h, w), possibly different sizes) as a multi-frame GIF87a.

    Default: one global color table — the union of all frames' colors
    must fit in 256 entries.  ``local_tables=True`` gives every frame
    its own 256-entry color table instead (no global table at all), so
    an animation's total palette may exceed 256 as long as each frame
    fits.  ``interlace=True`` stores each frame's rows in the 4-pass
    GIF interlace order and sets the descriptor flag."""
    if not frames:
        raise ValueError("encode_gif_frames needs at least one frame")
    rgb = [_rgb(f) for f in frames]
    flats = [a.reshape(-1, 3) for a in rgb]
    if local_tables:
        per_frame = [_frame_palette(f) for f in flats]
        for colors, _ in per_frame:
            if len(colors) > 256:
                raise ValueError(
                    f"GIF frame needs <=256 distinct colors, got {len(colors)}"
                )
        idxs = [idx for _, idx in per_frame]
    else:
        allpx = np.concatenate(flats, axis=0)
        if (allpx[:, 0] == allpx[:, 1]).all() and (
            allpx[:, 1] == allpx[:, 2]
        ).all():
            # grayscale fast path: unique over one uint8 channel instead
            # of the row-sorting unique(axis=0) (~3x cheaper per call)
            vals = np.unique(allpx[:, 0])
            colors = np.repeat(vals[:, None], 3, axis=1)
            idxs = [np.searchsorted(vals, f[:, 0]) for f in flats]
        else:
            colors, inverse = np.unique(allpx, axis=0, return_inverse=True)
            offsets = np.cumsum([len(f) for f in flats])[:-1]
            idxs = np.split(inverse, offsets)
        if len(colors) > 256:
            raise ValueError(
                f"GIF needs <=256 distinct colors, got {len(colors)}"
            )
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
    # logical screen must contain every frame (conforming decoders
    # clip/reject images that extend past it)
    sw = max(a.shape[1] for a in rgb)
    sh = max(a.shape[0] for a in rgb)
    lsd_packed = 0x07 if local_tables else (0x80 | 0x07)
    parts = [b"GIF87a" + _LSD.pack(sw, sh, lsd_packed, 0, 0)]
    if not local_tables:
        parts.append(palette.tobytes())
    for fi, (a, idx) in enumerate(zip(rgb, idxs)):
        h, w, _ = a.shape
        ipacked = 0
        if local_tables:
            ipacked |= 0x80 | 0x07  # 256-entry local table
        if interlace:
            ipacked |= 0x40
        parts.append(b"\x2c" + _IMG.pack(0, 0, w, h, ipacked))
        if local_tables:
            lct = np.zeros((256, 3), dtype=np.uint8)
            colors_f = per_frame[fi][0]
            lct[: len(colors_f)] = colors_f
            parts.append(lct.tobytes())
        if interlace:
            idx = idx.reshape(h, w)[_interlace_order(h)].reshape(-1)
        parts.append(_literal_lzw_body(idx))
    parts.append(b"\x3b")
    return b"".join(parts)


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode a single frame as GIF87a (see ``encode_gif_frames``)."""
    return encode_gif_frames([arr])
