"""Adversarial truncation sweeps for the WAV and progressive-JPEG
decoders (VERDICT r4 item 8).

The round-4 fuzz tests covered random garbage and RIFF-shaped garbage;
these sweep byte-exact truncation points over REAL streams of every
supported format family — the failure mode a crawled corpus actually
produces (interrupted download, chopped object) — and pin the
decode-or-refuse-by-name contract:

- a truncated stream either raises ValueError/NotImplementedError or
  decodes to EXACTLY the original samples (possible only when the lost
  tail was non-data: trailing metadata chunks or a pad byte) — never a
  silently shorter sample array, never a raw IndexError/struct.error/
  numpy shape crash.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from event_streaming_toy_example_spark.functions import wav_codec
from tests.test_functions import _fmt_body, _riff


def _ima_fmt(channels: int, align: int, spb: int, rate: int = 8000) -> bytes:
    return _fmt_body(0x11, channels, rate, 4)[:12] + struct.pack(
        "<HH", align, 4
    ) + struct.pack("<HH", 2, spb)


def _wav_streams() -> dict[str, bytes]:
    """One real stream per supported decode family, data chunk last
    (the common layout), plus one with trailing metadata."""
    rng = np.random.default_rng(17)
    mono16 = rng.integers(-32768, 32767, 50, dtype=np.int16)
    f32 = rng.standard_normal((30, 2)).astype("<f4")
    pcm24 = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little")
        for v in rng.integers(-(2**23), 2**23 - 1, 40)
    )
    codes = rng.integers(0, 256, 64, dtype=np.uint8)
    # IMA ADPCM: one 256-byte mono block
    nibs = rng.integers(0, 16, 504, dtype=np.uint8)
    ms = bytes(
        (int(nibs[i + 1]) << 4) | int(nibs[i]) for i in range(0, 504, 2)
    )
    ima_block = struct.pack("<hBB", 321, 17, 0) + ms
    guid = struct.pack("<H", 1) + wav_codec._KS_GUID_TAIL
    ext = _fmt_body(0xFFFE, 1, 16000, 16) + struct.pack(
        "<HHI", 22, 16, 0x4
    ) + guid
    return {
        "pcm16": _riff(
            [(b"fmt ", _fmt_body(1, 1, 8000, 16)),
             (b"data", mono16.tobytes())]
        ),
        "pcm24": _riff(
            [(b"fmt ", _fmt_body(1, 1, 44100, 24)), (b"data", pcm24)]
        ),
        "float32_stereo": _riff(
            [(b"fmt ", _fmt_body(3, 2, 48000, 32)), (b"data", f32.tobytes())]
        ),
        "mulaw": _riff(
            [(b"fmt ", _fmt_body(7, 1, 8000, 8)), (b"data", codes.tobytes())]
        ),
        "alaw_stereo": _riff(
            [(b"fmt ", _fmt_body(6, 2, 8000, 8)), (b"data", codes.tobytes())]
        ),
        "ima_adpcm": _riff(
            [(b"fmt ", _ima_fmt(1, 256, 505)), (b"data", ima_block)]
        ),
        "extensible_pcm16": _riff(
            [(b"fmt ", ext), (b"data", mono16.tobytes())]
        ),
        "metadata_tail": _riff(
            [
                (b"fmt ", _fmt_body(1, 1, 8000, 16)),
                (b"data", mono16.tobytes()),
                (b"LIST", b"INFOIART" + struct.pack("<I", 3) + b"abc"),
                (b"junk", b"\x01\x02\x03"),
            ]
        ),
    }


@pytest.mark.parametrize("name", sorted(_wav_streams()))
def test_wav_truncation_every_byte(name):
    """EVERY byte-truncation of a valid stream either refuses by name
    or decodes the exact original samples (trailing-metadata loss)."""
    payload = _wav_streams()[name]
    full, full_rate = wav_codec.decode_wav(payload)
    for cut in range(len(payload)):
        try:
            out, rate = wav_codec.decode_wav(payload[:cut])
        except (ValueError, NotImplementedError):
            continue
        # decoded a prefix: only legal if nothing audible was lost
        assert rate == full_rate, (name, cut)
        assert out.shape == full.shape and np.array_equal(out, full), (
            f"{name}: cut at {cut} silently decoded "
            f"{out.shape} of {full.shape} samples"
        )


def test_wav_truncation_inside_data_never_returns_short():
    """Sharper form of the sweep for the byte-counted formats: any cut
    strictly inside the data chunk must raise (the decoder knows the
    declared size and must not shorten the answer)."""
    rng = np.random.default_rng(23)
    mono = rng.integers(-32768, 32767, 50, dtype=np.int16)
    payload = _riff(
        [(b"fmt ", _fmt_body(1, 1, 8000, 16)), (b"data", mono.tobytes())]
    )
    data_start = payload.index(b"data") + 8
    for cut in range(data_start + 1, len(payload)):
        with pytest.raises((ValueError, NotImplementedError)):
            wav_codec.decode_wav(payload[:cut])


def test_ima_adpcm_truncation_every_block_boundary():
    """Multi-block ADPCM: cuts at and around every block boundary
    refuse rather than dropping trailing blocks."""
    rng = np.random.default_rng(29)
    spb, align, n_blocks = 505, 256, 3
    blocks = b""
    for b in range(n_blocks):
        nibs = rng.integers(0, 16, 504, dtype=np.uint8)
        ms = bytes(
            (int(nibs[i + 1]) << 4) | int(nibs[i]) for i in range(0, 504, 2)
        )
        blocks += struct.pack("<hBB", 100 * b, 10, 0) + ms
    payload = _riff([(b"fmt ", _ima_fmt(1, align, spb)), (b"data", blocks)])
    full, _ = wav_codec.decode_wav(payload)
    assert full.shape == (n_blocks * spb,)
    data_start = payload.index(b"data") + 8
    cuts = set()
    for b in range(1, n_blocks + 1):
        edge = data_start + b * align
        cuts.update((edge - 1, edge, edge + 1))
    for cut in sorted(c for c in cuts if c < len(payload)):
        with pytest.raises((ValueError, NotImplementedError)):
            wav_codec.decode_wav(payload[:cut])


# ------------------------------------------------- progressive JPEG


def _marker_positions(data: bytes) -> list[int]:
    """Offsets of every 0xFF-marker segment start (not byte-stuffed
    0xFF00 and not fill bytes)."""
    out = []
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] not in (0x00, 0xFF):
            out.append(i)
            i += 2
        else:
            i += 1
    return out


def test_progressive_jpeg_truncation_at_every_marker_boundary():
    """Cut the 10-scan progressive stream at every marker segment
    start and one byte after it: each cut must refuse by name (the
    stream lost scans or its EOI), never crash with a raw error."""
    from event_streaming_toy_example_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = encode_jpeg(img, progressive=True)
    markers = _marker_positions(data)
    assert len(markers) >= 12  # SOI, tables, SOF2, 10 scans, EOI
    for pos in markers:
        for cut in (pos, pos + 1):
            if cut == 0 or cut >= len(data):
                continue
            with pytest.raises((ValueError, NotImplementedError)):
                decode_jpeg(data[:cut])


def test_progressive_jpeg_truncation_stride_sweep():
    """Byte-level sweep at a stride through the whole stream: the
    decoder must refuse every proper prefix (no EOI yet) and never
    raise anything but its named errors."""
    from event_streaming_toy_example_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(img, progressive=True)
    for cut in range(1, len(data), 7):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(data[:cut])


def test_baseline_jpeg_truncation_stride_sweep():
    """Same contract for the baseline (SOF0) decoder."""
    from event_streaming_toy_example_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(img)
    for cut in range(1, len(data), 7):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(data[:cut])
