"""GIF87a codec: round-trips, real-LZW interop, refuse paths."""

import numpy as np
import pytest

from event_streaming_toy_example_spark.functions.gif_codec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
    is_gif,
)


def _gradient(h, w, seed=0):
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    return ((3 * x + 2 * y + seed) % 256).astype(np.uint8)


def test_roundtrip_grayscale_various_dims():
    for h, w in [(1, 1), (5, 10), (8, 9), (33, 47), (64, 64)]:
        arr = _gradient(h, w, seed=h * w)
        payload = encode_gif(arr)
        assert is_gif(payload)
        out = decode_gif(payload)
        assert out.shape == (h, w, 3)
        assert (out == np.repeat(arr[:, :, None], 3, axis=2)).all()


def test_roundtrip_color_palette():
    rng = np.random.default_rng(3)
    # 200 distinct colors repeated over a 30x40 image
    colors = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, size=(30, 40))
    arr = colors[idx]
    out = decode_gif(encode_gif(arr))
    assert (out == arr).all()


def test_too_many_colors_refused():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert len(np.unique(arr.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(arr)


def _lzw_compress(indices, mcs=8):
    """Reference dictionary-building LZW encoder (bit-for-bit the GIF
    scheme, including width growth) used ONLY to prove the decoder
    handles streams this module's literal-only encoder never emits."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = bits = 0
    code_size = mcs + 1

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = ()
    for k in map(int, indices):
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # the decoder is one entry BEHIND (its first post-clear code adds
        # nothing), so the encoder widens one add later than the decoder's
        # "table reached 1<<cs" point: at next_code == (1<<cs) + 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        w = (k,)
    if w:
        emit(table[w])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_decoder_handles_real_lzw_with_dictionary_growth():
    # repetitive data drives real dictionary use incl. the KwKwK case
    arr = np.tile(_gradient(8, 12, seed=5), (5, 5))  # 40 x 60
    arr3 = np.repeat(arr[:, :, None], 3, axis=2)
    # compress the same palette indices encode_gif would assign (indices
    # into the SORTED unique-color table, not raw gray values)
    _colors, inv = np.unique(arr3.reshape(-1, 3), axis=0, return_inverse=True)
    stream = _lzw_compress(inv.reshape(-1))
    # splice the compressed stream into an encode_gif container
    container = bytearray(encode_gif(arr))
    # container layout: 6 sig + 7 LSD + 768 GCT + 10 img desc + 1 mcs
    head = bytes(container[: 6 + 7 + 768 + 10 + 1])
    body = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        body.append(len(chunk))
        body.extend(chunk)
    body.append(0)
    payload = head + bytes(body) + b"\x3b"
    out = decode_gif(payload)
    assert (out == arr3).all()


def test_truncated_and_corrupt_refused():
    payload = encode_gif(_gradient(9, 11))
    with pytest.raises(ValueError, match="truncated|short"):
        decode_gif(payload[: len(payload) // 2])
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JUNK" + payload[4:])
    # a stream with neither global nor local color table is refused
    no_gct = bytearray(payload)
    no_gct[6 + 4] &= 0x7F  # clear the GCT flag in the LSD
    del no_gct[6 + 7 : 6 + 7 + 768]  # drop the table bytes
    with pytest.raises(ValueError, match="neither a local nor a global"):
        decode_gif(bytes(no_gct))


def test_interlaced_roundtrip_all_heights():
    """Interlaced storage (4-pass row order) must deinterlace exactly,
    including heights where later passes are empty."""
    import numpy as np

    rng = np.random.default_rng(3)
    for h in (1, 2, 3, 4, 5, 7, 8, 9, 16, 33):
        arr = (rng.integers(0, 250, (h, 6, 3)).astype(np.uint8) // 16) * 16
        data = encode_gif_frames([arr], interlace=True)
        assert (decode_gif(data) == arr).all(), h
    # the flag round-trips: interlaced and plain encodings of the same
    # image decode identically but differ on the wire
    arr = _gradient(9, 11)
    plain = encode_gif(arr)
    inter = encode_gif_frames([arr], interlace=True)
    assert plain != inter
    assert (decode_gif(plain) == decode_gif(inter)).all()


def test_local_color_tables_override_and_allow_big_unions():
    """A frame's local table overrides the global one, and per-frame
    tables let an animation exceed 256 colors in union."""
    import numpy as np

    fa = np.arange(200, dtype=np.uint8).reshape(10, 20)
    fb = (np.arange(200, dtype=np.uint8) + 37).reshape(10, 20)
    data = encode_gif_frames([fa, fb], local_tables=True)
    out = decode_gif_frames(data)
    assert (out[0][:, :, 0] == fa).all()
    assert (out[1][:, :, 0] == fb).all()
    # no global table on the wire: LSD flag clear
    assert data[6 + 4] & 0x80 == 0
    # the RGB pair the shared-table encoder refuses (union > 256, see
    # test_multiframe_shared_palette_overflow_rejected) round-trips
    # with per-frame tables
    a = np.zeros((16, 16, 3), dtype=np.uint8)
    a[:, :, 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    b = a.copy()
    b[:, :, 1] = 9
    out2 = decode_gif_frames(encode_gif_frames([a, b], local_tables=True))
    assert (out2[0] == a).all() and (out2[1] == b).all()


def test_extension_blocks_are_skipped():
    payload = bytearray(encode_gif(_gradient(4, 6)))
    img_off = 6 + 7 + 768
    # inject a GIF89a-style comment extension before the image descriptor
    ext = b"\x21\xfe\x05hello\x00"
    spliced = bytes(payload[:img_off]) + ext + bytes(payload[img_off:])
    out = decode_gif(spliced)
    assert out.shape == (4, 6, 3)


def test_multiframe_roundtrip():
    import numpy as np

    from event_streaming_toy_example_spark.functions.gif_codec import (
        decode_gif_frames,
        encode_gif_frames,
    )

    frames = [
        (np.arange(20, dtype=np.uint8).reshape(4, 5) * 3) % 200,
        (np.arange(12, dtype=np.uint8).reshape(3, 4) + 7) % 200,
        np.zeros((2, 2), dtype=np.uint8),
    ]
    payload = encode_gif_frames(frames)
    got = decode_gif_frames(payload)
    assert len(got) == 3
    for orig, dec in zip(frames, got):
        assert dec.shape == (*orig.shape, 3)
        assert (dec[:, :, 0] == orig).all()
        assert (dec[:, :, 1] == orig).all()


def test_multiframe_shared_palette_overflow_rejected():
    import numpy as np
    import pytest

    from event_streaming_toy_example_spark.functions.gif_codec import (
        encode_gif_frames,
    )

    # two RGB frames whose color UNION exceeds 256
    a = np.zeros((16, 16, 3), dtype=np.uint8)
    a[:, :, 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    b = a.copy()
    b[:, :, 1] = 9  # 256 more distinct colors
    with pytest.raises(ValueError, match="<=256 distinct colors"):
        encode_gif_frames([a, b])


def test_single_frame_decode_returns_first_frame():
    import numpy as np

    from event_streaming_toy_example_spark.functions.gif_codec import (
        decode_gif,
        encode_gif_frames,
    )

    frames = [
        np.full((2, 3), 11, dtype=np.uint8),
        np.full((4, 5), 99, dtype=np.uint8),
    ]
    first = decode_gif(encode_gif_frames(frames))
    assert first.shape == (2, 3, 3)
    assert (first == 11).all()
