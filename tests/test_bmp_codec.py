"""The in-repo BMP codec must be REAL: spec-correct header parse,
4-byte row padding, BGR/bottom-up handling, round-trip fidelity — plus
the Spark-side real decode path over Arrow batches."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from event_streaming_toy_example_spark.functions.bmp_codec import (
    _FILE_HDR,
    _INFO_HDR,
    _row_stride,
    decode_bmp,
    encode_bmp,
    is_bmp,
)


def _gradient(h, w):
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    return ((3 * x + 5 * y + 7 * c) % 256).astype(np.uint8)


# widths chosen to hit every padding class: w*3 % 4 in {0, 1, 2, 3}
@pytest.mark.parametrize("h,w", [(23, 37), (8, 8), (11, 5), (3, 2), (5, 7)])
def test_roundtrip(h, w):
    arr = _gradient(h, w)
    data = encode_bmp(arr)
    assert is_bmp(data)
    out = decode_bmp(data)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, arr)


def test_grayscale_2d_input_roundtrips_as_rgb():
    g = (np.arange(54) % 256).astype(np.uint8).reshape(6, 9)
    out = decode_bmp(encode_bmp(g))
    assert out.shape == (6, 9, 3)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], g)


def test_top_down_rows_decode_correctly():
    """Negative height = top-down row order per the BMP spec; the
    decoder must not flip those."""
    arr = _gradient(6, 4)
    data = bytearray(encode_bmp(arr))
    # encoder wrote bottom-up; flipping the sign of height AND the rows
    # in the body yields the same logical image top-down
    offset = _FILE_HDR.size + _INFO_HDR.size
    stride = _row_stride(4)
    body = bytes(data[offset:])
    rows = [body[i * stride : (i + 1) * stride] for i in range(6)]
    data[offset:] = b"".join(reversed(rows))
    struct.pack_into("<i", data, _FILE_HDR.size + 8, -6)
    assert np.array_equal(decode_bmp(bytes(data)), arr)


def test_rejects_non_bmp_truncated_and_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG?" + b"\x00" * 60)
    with pytest.raises(ValueError, match="too short"):
        decode_bmp(b"BM\x00\x00")
    arr = _gradient(5, 5)
    data = encode_bmp(arr)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(data[:-8])
    bad = bytearray(data)
    struct.pack_into("<H", bad, _FILE_HDR.size + 14, 32)  # bpp = 32
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_bmp(bytes(bad))
    bad = bytearray(data)
    struct.pack_into("<I", bad, _FILE_HDR.size + 16, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_bmp(bytes(bad))


def test_extract_media_features_real_bmp(spark):
    """fake=False on real generated BMPs: width/height must be the TRUE
    decoded dims (arithmetic function of doc_id with the BMP moduli),
    n_bytes the true payload size."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_bmp_payload,
        extract_media_features,
    )

    ids = spark.range(1, 41).withColumnRenamed("id", "doc_id")
    mm = attach_bmp_payload(ids)
    payload_sizes = {r["doc_id"]: len(r["payload"]) for r in mm.collect()}
    out = extract_media_features(mm, fake=False).collect()
    assert len(out) == 40
    for r in out:
        d = r["doc_id"]
        assert r["width"] == 12 + d % 40
        assert r["height"] == 6 + d % 20
        assert r["n_bytes"] == payload_sizes[d]


def test_pixel_offset_inside_headers_rejected():
    """A corrupt pixel-data offset pointing inside the headers must be
    refused, not silently decoded as garbage pixels."""
    import struct

    import numpy as np
    import pytest

    from event_streaming_toy_example_spark.functions.bmp_codec import (
        decode_bmp,
        encode_bmp,
    )

    payload = bytearray(encode_bmp(np.zeros((4, 4), dtype=np.uint8)))
    struct.pack_into("<I", payload, 10, 14)  # offset -> inside headers
    with pytest.raises(ValueError, match="inside the"):
        decode_bmp(bytes(payload))
