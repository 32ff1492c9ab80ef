"""Minimal in-repo WAV (RIFF) codec — stdlib ``struct`` + numpy only,
so the engine's REAL audio-decode path has zero external dependencies
(the audio twin of ``png_codec``).

Decode scope (what a 100 TB crawled-audio corpus actually contains):

- a real RIFF chunk WALKER — ``fmt ``/``data`` located by iterating
  chunks with even-byte padding per the RIFF spec, so the ubiquitous
  extra chunks (``LIST`` metadata, ``fact``, ``cue ``, broadcast-WAV
  ``bext``) in crawled files no longer refuse;
- uncompressed integer PCM at 8 (unsigned), 16, 24 and 32 bits;
- IEEE float at 32 and 64 bits (format code 3);
- ``WAVE_FORMAT_EXTENSIBLE`` (0xFFFE) wrappers resolving to PCM or
  IEEE float via the SubFormat GUID.

- G.711 companded telephony audio: a-law (format code 6) and mu-law
  (7), expanded to int16 with the ITU-T G.711 tables built once by
  inverting the standard segment/quantization layout;
- IMA/DVI ADPCM (format code 0x11): Microsoft block layout — per
  channel 4-byte (predictor, step-index) header whose predictor IS
  the block's first sample, then low-nibble-first 4-bit deltas in
  4-byte per-channel interleave groups — decoded with the standard
  89-step table (the nibble recursion is checked sample-by-sample
  against CPython's independent ``audioop.adpcm2lin``).

Other compressed codecs (MS ADPCM 0x02, GSM, MP3-in-RIFF …) raise
``NotImplementedError`` naming the format code — loud gates, never a
misread.  The encoder stays PCM16 (the staging interchange format the
synthetic corpus uses).
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sI4s4sIHHIIHH4sI")  # canonical-layout encoder header

#: fixed 14-byte tail of the KSDATAFORMAT_SUBTYPE_* GUIDs; the leading
#: 2 bytes of the GUID are the little-endian format code
_KS_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_ALAW = 6
_WAVE_FORMAT_MULAW = 7
_WAVE_FORMAT_IMA_ADPCM = 0x11
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE

#: IMA ADPCM quantizer step sizes (the standard 89-entry table)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)

#: step-index adjustment by the nibble's 3 magnitude bits
_IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_core(nibbles, predictor: int, index: int):
    """Decode a nibble stream with the standard IMA recursion; returns
    (int16 samples, final predictor, final index)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, nib in enumerate(nibbles):
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        predictor = predictor - diff if nib & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + _IMA_INDEX_ADJUST[nib & 7]))
        out[i] = predictor
    return out, predictor, index


def _build_mulaw_table() -> np.ndarray:
    """int16 expansion of all 256 mu-law codes (ITU-T G.711): invert
    the encoder's bias-33, segment-exponent, 4-bit-mantissa layout."""
    codes = np.arange(256, dtype=np.int32) ^ 0xFF  # transmitted inverted
    sign = codes & 0x80
    exponent = (codes >> 4) & 0x07
    mantissa = codes & 0x0F
    magnitude = (((mantissa << 1) + 33) << exponent) - 33
    out = np.where(sign, -magnitude, magnitude) * 4  # 14-bit -> 16-bit
    return out.astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    """int16 expansion of all 256 a-law codes (ITU-T G.711): even bits
    inverted on the wire (XOR 0x55); segment 0 is linear."""
    codes = np.arange(256, dtype=np.int32) ^ 0x55
    sign = codes & 0x80
    exponent = (codes >> 4) & 0x07
    mantissa = codes & 0x0F
    # np.where evaluates BOTH branches: keep the discarded shift count
    # non-negative (a negative shift is undefined in numpy)
    magnitude = np.where(
        exponent == 0,
        (mantissa << 1) + 1,
        ((mantissa << 1) + 33) << np.maximum(exponent, 1) - 1,
    )
    # a-law MSB=1 encodes POSITIVE (opposite of mu-law's post-invert)
    out = np.where(sign, magnitude, -magnitude) * 8  # 13-bit -> 16-bit
    return out.astype(np.int16)


_MULAW_TABLE = _build_mulaw_table()
_ALAW_TABLE = _build_alaw_table()

#: (format_code, bits) -> numpy little-endian dtype for frombuffer
_SAMPLE_DTYPES = {
    (_WAVE_FORMAT_PCM, 8): np.dtype("u1"),  # 8-bit PCM is unsigned
    (_WAVE_FORMAT_PCM, 16): np.dtype("<i2"),
    (_WAVE_FORMAT_PCM, 32): np.dtype("<i4"),
    (_WAVE_FORMAT_IEEE_FLOAT, 32): np.dtype("<f4"),
    (_WAVE_FORMAT_IEEE_FLOAT, 64): np.dtype("<f8"),
}


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 encode: ``samples`` is int16 of shape (n,) mono or
    (n, channels); interleaved little-endian output."""
    if samples.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {samples.dtype}")
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2:
        channels = samples.shape[1]
    else:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {samples.shape}")
    data = samples.astype("<i2").tobytes()
    block_align = 2 * channels
    header = _HDR.pack(
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
        b"data",
        len(data),
    )
    return header + data


def _walk_chunks(payload: bytes):
    """Yield ``(chunk_id, body_start, body_size)`` for every RIFF chunk
    after the 12-byte RIFF/WAVE header; chunk bodies are padded to even
    offsets per the spec."""
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > n:
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes but "
                f"only {n - body} present"
            )
        yield cid, body, size
        pos = body + size + (size & 1)  # odd sizes carry a pad byte


def _resolve_format(payload: bytes, body: int, size: int) -> tuple[int, int, int, int]:
    """Parse a ``fmt `` chunk body -> (format_code, channels,
    sample_rate, bits), resolving WAVE_FORMAT_EXTENSIBLE through its
    SubFormat GUID."""
    if size < 16:
        raise ValueError(f"corrupt WAV: fmt chunk of {size} bytes")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = (
        struct.unpack_from("<HHIIHH", payload, body)
    )
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        # fmt(16) + cbSize(2) + validBits(2) + channelMask(4) + GUID(16)
        if size < 40:
            raise ValueError(
                f"corrupt WAV: EXTENSIBLE fmt chunk of {size} bytes (need 40)"
            )
        guid = payload[body + 24 : body + 40]
        if guid[2:] != _KS_GUID_TAIL:
            raise NotImplementedError(
                f"unknown EXTENSIBLE SubFormat GUID {guid.hex()}"
            )
        audio_format = struct.unpack_from("<H", guid, 0)[0]
    return audio_format, channels, sample_rate, bits


def _decode_ima_adpcm(
    raw: bytes, channels: int, block_align: int, samples_per_block: int
) -> np.ndarray:
    """Microsoft IMA ADPCM data chunk -> int16 samples of shape
    (n,) mono or (n, channels)."""
    header_bytes = 4 * channels
    if block_align <= header_bytes:
        raise ValueError(
            f"corrupt WAV: IMA block align {block_align} cannot hold "
            f"{channels}-channel headers"
        )
    nibbles_per_chan = (block_align - header_bytes) * 2 // channels
    if samples_per_block - 1 > nibbles_per_chan:
        raise ValueError(
            f"corrupt WAV: {samples_per_block} samples/block exceeds the "
            f"{nibbles_per_chan + 1} a {block_align}-byte block can hold"
        )
    if (block_align - header_bytes) % (4 * channels):
        raise ValueError(
            f"corrupt WAV: IMA block data {block_align - header_bytes} B "
            f"is not whole 4-byte words per channel"
        )
    if len(raw) % block_align:
        raise ValueError(
            f"corrupt WAV: IMA data size {len(raw)} is not a multiple of "
            f"block align {block_align}"
        )
    blocks = []
    for off in range(0, len(raw), block_align):
        block = raw[off : off + block_align]
        out = np.empty((samples_per_block, channels), dtype=np.int16)
        preds, idxs = [], []
        for c in range(channels):
            pred, idx, _reserved = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError(f"corrupt WAV: IMA step index {idx} > 88")
            out[0, c] = pred  # the header predictor IS sample 0
            preds.append(pred)
            idxs.append(idx)
        data = np.frombuffer(block, dtype=np.uint8)[header_bytes:]
        # channels interleave in 4-byte words: ch0[0:4], ch1[0:4], ...
        words = data.reshape(-1, channels, 4)
        for c in range(channels):
            per_chan = words[:, c, :].ravel()
            nibs = np.empty(per_chan.size * 2, dtype=np.uint8)
            nibs[0::2] = per_chan & 0x0F  # LOW nibble first (MS layout)
            nibs[1::2] = per_chan >> 4
            dec, _, _ = _ima_core(nibs[: samples_per_block - 1], preds[c], idxs[c])
            out[1:, c] = dec  # trailing pad nibbles ignored
        blocks.append(out)
    samples = np.concatenate(blocks) if blocks else np.empty((0, channels), np.int16)
    return samples[:, 0] if channels == 1 else samples


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV -> (samples of shape (n,) or (n, channels),
    sample_rate).  Sample dtype follows the stream: uint8 (PCM8),
    int16, int32 (PCM24 sign-extended / PCM32), float32 or float64.
    Walks RIFF chunks, skipping metadata (LIST/fact/cue/bext/...);
    refuses compressed codecs loudly rather than misreading them."""
    if len(payload) < 12 or not is_wav(payload):
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    fmt_loc = None
    data = None
    for cid, body, size in _walk_chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = _resolve_format(payload, body, size)
            fmt_loc = (body, size)
        elif cid == b"data" and data is None:
            data = (body, size)
        # all other chunks (LIST, fact, cue , bext, id3 , ...) skipped
    if fmt is None:
        raise ValueError("corrupt WAV: no fmt chunk")
    if data is None:
        raise ValueError("corrupt WAV: no data chunk")
    audio_format, channels, sample_rate, bits = fmt
    if channels < 1:
        raise ValueError(f"corrupt WAV: channel count {channels}")
    if sample_rate < 1:
        raise ValueError(f"corrupt WAV: sample rate {sample_rate}")

    body, size = data

    if audio_format == _WAVE_FORMAT_IMA_ADPCM:
        if bits != 4:
            raise NotImplementedError(
                f"IMA ADPCM with {bits}-bit deltas is not supported"
            )
        fbody, fsize = fmt_loc
        declared_align = struct.unpack_from("<H", payload, fbody + 12)[0]
        if fsize >= 20:  # fmt(16) + cbSize(2) + samplesPerBlock(2)
            spb = struct.unpack_from("<H", payload, fbody + 18)[0]
        else:  # derive from the block geometry when the extension is absent
            spb = (declared_align - 4 * channels) * 2 // channels + 1
        samples = _decode_ima_adpcm(
            payload[body : body + size], channels, declared_align, spb
        )
        return samples, sample_rate

    block_align = channels * (bits // 8)
    if bits % 8 or block_align == 0:
        raise NotImplementedError(f"unsupported bit depth {bits}")
    if size % block_align != 0:
        raise ValueError(
            f"corrupt WAV: data size {size} is not a multiple of "
            f"block align {block_align}"
        )
    raw = payload[body : body + size]

    if audio_format in (_WAVE_FORMAT_ALAW, _WAVE_FORMAT_MULAW):
        if bits != 8:
            raise ValueError(f"corrupt WAV: G.711 with {bits}-bit samples")
        table = _ALAW_TABLE if audio_format == _WAVE_FORMAT_ALAW else _MULAW_TABLE
        samples = table[np.frombuffer(raw, dtype=np.uint8)]
    elif audio_format == _WAVE_FORMAT_PCM and bits == 24:
        # no 3-byte numpy dtype: widen each LE triple to int32 and
        # sign-extend via the arithmetic shift
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
        widened = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)) << 8
        samples = (widened.astype(np.int32)) >> 8
    else:
        dtype = _SAMPLE_DTYPES.get((audio_format, bits))
        if dtype is None:
            raise NotImplementedError(
                f"unsupported WAV encoding (format_code={audio_format}, "
                f"bits={bits}) — integer PCM 8/16/24/32, IEEE float "
                f"32/64 and G.711 a-law/mu-law are supported; other "
                f"compressed codecs are not"
            )
        samples = np.frombuffer(raw, dtype=dtype)
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, sample_rate
