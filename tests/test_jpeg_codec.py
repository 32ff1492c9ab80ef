"""The in-repo baseline JPEG codec must be REAL: spec-correct marker
parse, Huffman entropy coding, DCT/IDCT round-trip within lossy bounds,
restart markers, 4:2:0 sampling, loud gates on unsupported modes — plus
the Spark-side real decode path over Arrow batches."""

from __future__ import annotations

import numpy as np
import pytest

from event_streaming_toy_example_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _smooth(h, w):
    """Wrap-free gradient: DCT error stays small without 0/255 edges."""
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    return ((2 * x + 3 * y + 10 * c) % 200 + 20).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (17, 23), (1, 1), (64, 48), (33, 9)])
def test_roundtrip_dims_exact_pixels_bounded(h, w):
    arr = _smooth(h, w)
    data = encode_jpeg(arr, quality=92)
    assert is_jpeg(data)
    out = decode_jpeg(data)
    assert out.shape == (h, w, 3)
    err = np.abs(out.astype(int) - arr.astype(int))
    # lossy but bounded: smooth tiles decode within a few quant steps
    # (the wrap seam of the %200 gradient dominates larger tiles)
    assert err.max() <= 40, err.max()
    assert (err.astype(float) ** 2).mean() ** 0.5 <= 6.0


def test_flat_image_is_near_lossless_at_q100():
    flat = np.full((16, 24, 3), 77, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=100))
    assert np.array_equal(out, flat)


def test_noise_image_q100_within_rounding():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=100))
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.max() <= 4  # q=1 tables: only DCT float rounding remains


def test_restart_markers_roundtrip():
    """DRI + RSTn every 2 MCUs: the decoder must resync bit alignment
    and reset DC predictors at each restart."""
    arr = _smooth(40, 56)
    plain = decode_jpeg(encode_jpeg(arr, quality=92))
    rst = decode_jpeg(encode_jpeg(arr, quality=92, restart_interval=2))
    assert np.array_equal(plain, rst)


def test_chroma_subsampling_roundtrip():
    """4:2:0 stream: 2x2 luma blocks per MCU + box-filtered chroma.
    Luma must stay tight; chroma smoothing loosens the color bound.
    The tile is a wrap-free linear ramp so the bounds measure the
    sampling pipeline, not DCT ringing at a synthetic seam."""
    y = np.arange(32)[:, None, None]
    x = np.arange(48)[None, :, None]
    c = np.arange(3)[None, None, :]
    arr = (20 + 2 * x + 3 * y + 10 * c).astype(np.uint8)  # max 227
    data = encode_jpeg(arr, quality=92, subsample=True)
    out = decode_jpeg(data)
    assert out.shape == arr.shape
    # luminance of the decode tracks the original closely
    to_y = np.array([0.299, 0.587, 0.114])
    y_err = np.abs(out.astype(float) @ to_y - arr.astype(float) @ to_y)
    assert y_err.max() <= 12, y_err.max()
    err = np.abs(out.astype(int) - arr.astype(int))
    # replicate upsampling of a linear chroma ramp costs ~1 chroma step
    assert err.max() <= 24, err.max()


def test_subsampled_odd_dims_crop_exactly():
    """Frame dims not divisible by the 16px MCU: padding must be
    cropped, never leaked into the output shape."""
    for h, w in [(17, 33), (15, 16), (9, 7)]:
        arr = _smooth(h, w)
        out = decode_jpeg(encode_jpeg(arr, subsample=True))
        assert out.shape == (h, w, 3)


def test_rejects_non_jpeg_truncated_and_unsupported():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"BM" + b"\x00" * 64)
    arr = _smooth(9, 9)
    data = encode_jpeg(arr)
    with pytest.raises(ValueError, match="truncated|entropy"):
        decode_jpeg(data[:40])
    with pytest.raises(ValueError, match="truncated|entropy"):
        decode_jpeg(data[:-30])
    bad = bytearray(data)
    i = bytes(bad).find(bytes([0xFF, 0xC0]))
    bad[i + 1] = 0xC3  # pretend lossless sequential
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(bad))


def test_rejects_non_integral_sampling_ratios():
    """Sampling factors 3 and 2 are each inside the 1..4 spec range,
    but 3/2 replicate upsampling is non-integral — the decoder must
    reject it by name at SOF0 parse, not die later in np.stack with a
    generic shape mismatch."""
    arr = _smooth(16, 16)
    data = bytearray(encode_jpeg(arr, subsample=True))
    i = bytes(data).find(bytes([0xFF, 0xC0]))
    assert i >= 0
    # SOF0 layout: FF C0 len(2) prec(1) h(2) w(2) nc(1) then per
    # component (cid, hv, qid); patch Y to 3x2 and Cb to 2x2 so Cb's
    # horizontal upsample ratio is hmax/hs = 3/2 — non-integral
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert data[hv_off] == 0x22
    data[hv_off] = 0x32
    assert data[hv_off + 3] == 0x11
    data[hv_off + 3] = 0x22
    with pytest.raises(NotImplementedError, match="non-integral"):
        decode_jpeg(bytes(data))


def test_quality_range_validated():
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(_smooth(4, 4), quality=0)
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(_smooth(4, 4), quality=101)


def test_quality_monotone_size():
    arr = _smooth(48, 64)
    sizes = [len(encode_jpeg(arr, quality=q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_random_images_roundtrip_dims_and_bounded_error():
    """Property sweep (seeded, no Spark): arbitrary dims and content
    must round-trip the exact dimensions in every mode combination,
    with q=100 error within DCT float rounding."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 40),
        st.integers(1, 40),
        st.integers(0, 2**31 - 1),
        st.booleans(),
        st.integers(0, 3),
    )
    def check(h, w, seed, subsample, restart):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_jpeg(
            arr, quality=100, subsample=subsample, restart_interval=restart
        )
        out = decode_jpeg(data)
        assert out.shape == (h, w, 3)
        if not subsample:
            err = np.abs(out.astype(int) - arr.astype(int))
            assert err.max() <= 4, err.max()

    check()


def test_corrupt_payloads_raise_never_hang():
    """Fuzz: random corruption of a valid stream must either decode
    (harmless bit damage) or raise a loud ValueError /
    NotImplementedError — never crash with an unrelated exception."""
    rng = np.random.default_rng(3)
    data = bytearray(encode_jpeg(_smooth(16, 16), quality=90))
    for _ in range(1500):
        bad = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            bad[rng.integers(2, len(bad))] = rng.integers(0, 256)
        try:
            out = decode_jpeg(bytes(bad))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass
    # pure-garbage prefixes must be rejected by the SOI probe
    with pytest.raises(ValueError):
        decode_jpeg(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))


def test_extract_media_features_real_jpeg(spark):
    """fake=False on real generated JPEGs: width/height must be the
    TRUE decoded dims (arithmetic function of doc_id with the JPEG
    moduli), n_bytes the true payload size."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_jpeg_payload,
        extract_media_features,
    )

    ids = spark.range(1, 41).withColumnRenamed("id", "doc_id")
    mm = attach_jpeg_payload(ids)
    payload_sizes = {r["doc_id"]: len(r["payload"]) for r in mm.collect()}
    out = extract_media_features(mm, fake=False).collect()
    assert len(out) == 40
    for r in out:
        d = r["doc_id"]
        assert r["width"] == 14 + d % 34
        assert r["height"] == 7 + d % 17
        assert r["n_bytes"] == payload_sizes[d]


# ----------------------------------------------- progressive (SOF2)


def _color_grad(h, w):
    y = np.arange(h)[:, None] + np.zeros((1, w), int)
    x = np.arange(w)[None, :] + np.zeros((h, 1), int)
    return np.stack(
        [(3 * x + 2 * y) % 256, (x * 5) % 256, (y * 7) % 256], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (17, 19), (64, 48)])
@pytest.mark.parametrize("quality", [50, 90])
@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_decodes_pixel_identical_to_baseline(h, w, quality,
                                                         subsample):
    """The 10-scan progressive script carries exactly the same quantized
    coefficients as the baseline encoding, so the decodes must be
    PIXEL-IDENTICAL — any slip anywhere in the successive-approximation
    chain (EOBRUN, ZRL, correction bits, DC refinement, non-interleaved
    grids) breaks the equality."""
    arr = _color_grad(h, w)
    base = decode_jpeg(encode_jpeg(arr, quality=quality, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg(arr, quality=quality, subsample=subsample,
                    progressive=True)
    )
    assert (base == prog).all()


def test_progressive_noise_and_flat_images_identical():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (33, 29, 3)).astype(np.uint8)
    flat = np.full((24, 40, 3), 77, dtype=np.uint8)  # long EOB runs
    for arr in (noise, flat):
        b = decode_jpeg(encode_jpeg(arr, quality=90))
        p = decode_jpeg(encode_jpeg(arr, quality=90, progressive=True))
        assert (b == p).all()


def test_progressive_stream_is_sof2_multiscan():
    data = encode_jpeg(_color_grad(16, 16), progressive=True)
    assert bytes([0xFF, 0xC2]) in data  # SOF2
    assert data.count(bytes([0xFF, 0xDA])) == 10  # the 10-scan script


def test_progressive_truncation_raises():
    data = encode_jpeg(_color_grad(32, 32), progressive=True)
    for cut in (len(data) // 4, len(data) // 2, len(data) - 10):
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])


def test_progressive_rejects_restart_combination():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(_color_grad(16, 16), progressive=True,
                    restart_interval=4)


def test_progressive_partial_scan_prefix_is_viewable():
    """The point of progressive: a prefix of scans already renders a
    coarse image.  Decode a stream truncated AT a scan boundary (keep
    the first 5 scans + EOI) and check it approximates the full image."""
    arr = _color_grad(48, 40)
    data = bytearray(encode_jpeg(arr, quality=90, progressive=True))
    # find the 6th SOS and cut there, appending EOI
    offs = []
    j = 0
    while True:
        j = bytes(data).find(bytes([0xFF, 0xDA]), j + 1)
        if j < 0:
            break
        offs.append(j)
    cut = bytes(data[: offs[5]]) + b"\xff\xd9"
    coarse = decode_jpeg(cut)
    full = decode_jpeg(bytes(data))
    assert coarse.shape == full.shape
    err = np.abs(coarse.astype(int) - full.astype(int)).mean()
    assert 0 < err < 24, err  # coarse but recognizable


def test_progressive_corrupt_payloads_raise_never_hang():
    """Fuzz the progressive marker/scan machinery the same way the
    baseline fuzz does: corruption decodes or raises loudly, never an
    unrelated exception or a hang."""
    rng = np.random.default_rng(5)
    data = bytearray(
        encode_jpeg(_color_grad(16, 16), quality=90, progressive=True)
    )
    for _ in range(600):
        bad = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            bad[rng.integers(2, len(bad))] = rng.integers(0, 256)
        try:
            out = decode_jpeg(bytes(bad))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass


# --------------------------------- 12-bit extended sequential (round 6)


def test_jpeg12_roundtrip_dims_and_bounded_error():
    from event_streaming_toy_example_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg12_gray,
    )

    yy, xx = np.mgrid[0:24, 0:17]
    arr = ((yy * 64 + xx * 32) % 4096).astype(np.uint16)
    out = decode_jpeg(encode_jpeg12_gray(arr, quality=100))
    assert out.shape == (24, 17, 3) and out.dtype == np.uint16
    assert int(out.max()) <= 4095
    # grayscale replicates across channels; q100 on smoothish content
    # stays within a small absolute error at 12-bit scale
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    err = np.abs(out[:, :, 0].astype(np.int64) - arr.astype(np.int64))
    assert err.max() <= 32, int(err.max())


def test_jpeg12_flat_image_near_lossless_and_restarts():
    from event_streaming_toy_example_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg12_gray,
    )

    flat = np.full((16, 16), 3000, dtype=np.uint16)
    out = decode_jpeg(encode_jpeg12_gray(flat, quality=100))
    assert np.abs(out[:, :, 0].astype(np.int64) - 3000).max() <= 1
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 4096, size=(24, 24), dtype=np.uint16)
    plain = decode_jpeg(encode_jpeg12_gray(arr, quality=95))
    rst = decode_jpeg(
        encode_jpeg12_gray(arr, quality=95, restart_interval=2)
    )
    assert np.array_equal(plain, rst)


def test_jpeg12_16bit_quant_tables_decode():
    """Pq=1 (16-bit DQT entries) — the table precision real 12-bit
    files use.  Rewrite the encoder's Pq=0 segment to Pq=1 with the
    same values; the decode must be bit-identical."""
    import struct

    from event_streaming_toy_example_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg12_gray,
    )

    yy, xx = np.mgrid[0:16, 0:16]
    arr = ((yy * 100 + xx * 50) % 4096).astype(np.uint16)
    data = encode_jpeg12_gray(arr, quality=90)
    i = data.find(b"\xff\xdb")
    assert i >= 0
    vals = data[i + 5 : i + 5 + 64]
    wide = b"".join(struct.pack(">H", v) for v in vals)
    patched = (
        data[:i]
        + b"\xff\xdb"
        + struct.pack(">H", 3 + 128)
        + bytes([0x10])  # Pq=1, Tq=0
        + wide
        + data[i + 69 :]
    )
    assert np.array_equal(decode_jpeg(patched), decode_jpeg(data))


def test_jpeg12_gates_and_validation():
    from event_streaming_toy_example_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg12_gray,
    )

    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg12_gray(np.full((8, 8), 5000, dtype=np.uint16))
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg12_gray(np.zeros((8, 8, 3), dtype=np.uint16))
    # a 12-bit PROGRESSIVE frame is refused by name (SOF2 + prec 12)
    data = bytearray(
        encode_jpeg12_gray(np.zeros((8, 8), dtype=np.uint16))
    )
    i = data.find(b"\xff\xc1")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="12-bit progressive"):
        decode_jpeg(bytes(data))
    # baseline SOF0 claiming 12-bit precision is invalid, not a gate
    data = bytearray(
        encode_jpeg12_gray(np.zeros((8, 8), dtype=np.uint16))
    )
    i = data.find(b"\xff\xc1")
    data[i + 1] = 0xC0
    with pytest.raises(ValueError, match="baseline SOF0 requires 8-bit"):
        decode_jpeg(bytes(data))
