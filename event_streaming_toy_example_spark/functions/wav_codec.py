"""Minimal in-repo WAV (RIFF PCM16) codec — stdlib ``struct`` +
numpy only, so the engine's REAL audio-decode path has zero external
dependencies (the audio twin of ``png_codec``).

Scope: uncompressed PCM, 16-bit signed little-endian, mono or
interleaved multi-channel — the canonical training-data audio interchange
format. Anything else (compressed codecs, floats, 24-bit) raises
``NotImplementedError`` naming the field that differed.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<4sI4s4sIHHIIHH4sI")


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


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM16 WAV -> (samples int16 of shape (n,) or
    (n, channels), sample_rate). Validates the RIFF/fmt fields and
    refuses non-PCM16 content loudly rather than misreading it."""
    if len(payload) < _HDR.size:
        raise ValueError(f"WAV too short: {len(payload)} bytes")
    (
        riff,
        _riff_size,
        wave,
        fmt,
        fmt_size,
        audio_format,
        channels,
        sample_rate,
        _byte_rate,
        _block_align,
        bits,
        data_tag,
        data_size,
    ) = _HDR.unpack_from(payload, 0)
    if riff != b"RIFF" or wave != b"WAVE" or fmt != b"fmt ":
        raise ValueError("not a RIFF/WAVE stream")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (audio_format={audio_format}, bits={bits})"
        )
    if fmt_size != 16 or data_tag != b"data":
        # fmt extensions / extra chunks between fmt and data are rare in
        # training corpora; refuse rather than guess at offsets
        raise NotImplementedError(
            f"non-canonical chunk layout (fmt_size={fmt_size}, "
            f"next_chunk={data_tag!r})"
        )
    if channels < 1:
        raise ValueError(f"corrupt WAV: channel count {channels}")
    block_align = channels * (bits // 8)
    if len(payload) - _HDR.size < data_size:
        raise ValueError(
            f"truncated WAV: data chunk declares {data_size} bytes but "
            f"only {len(payload) - _HDR.size} present"
        )
    if data_size % block_align != 0:
        raise ValueError(
            f"corrupt WAV: data size {data_size} is not a multiple of "
            f"block align {block_align}"
        )
    body = payload[_HDR.size : _HDR.size + data_size]
    samples = np.frombuffer(body, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, sample_rate
