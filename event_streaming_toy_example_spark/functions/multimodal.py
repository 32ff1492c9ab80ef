"""Multimodal columns: opaque binary payloads with typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a path reference for very large blobs) next to a
typed metadata struct; run decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` operators so each task
processes a columnar batch, not a row.

Decode is REAL for PNG payloads: ``functions/png_codec.py`` is a
dependency-free 8-bit PNG codec (stdlib zlib + numpy), so
``fake=False`` genuinely parses IHDR/IDAT, unfilters scanlines, and
reports true width/height — and resize genuinely re-encodes a
nearest-neighbor-downsampled PNG. Pillow, when importable, handles
non-PNG formats; with neither (this environment has no Pillow), a
non-PNG payload raises ``NotImplementedError`` naming the gap. The
deterministic ``fake=True`` decode (byte-length + md5 + fake
dimensions) remains for oracle-checkable catalog entries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

#: Metadata struct carried next to every payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image|audio|video|text
        T.StructField("format", T.StringType(), True),        # png|wav|mp4|utf-8 ...
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal-shaped table from a text table: payload =
    utf-8 bytes of the text (stand-in for real media bytes), plus the
    typed metadata struct. Pure projection — the shape production data
    would arrive in."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text").alias("media_type"),
        F.lit("utf-8").alias("format"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.concat(F.lit("mem://doc/"), F.col(id_col).cast("string")).alias("source_uri"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("media_meta")
    )


PNG_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _ids_spread(df: DataFrame, id_col: str) -> DataFrame:
    """Id projection repartitioned to the session's parallelism.

    Every payload attacher maps a codec over Arrow batches; the id
    source is typically ONE small parquet file, so without this the
    whole per-payload codec loop runs in a single task (measured 14.8 s
    -> 1.1 s for the JPEG entry at sf0.1 on local[32]).  The shuffle
    moves only the 8-byte ids — the payloads are born distributed.  In
    production, payload tables arrive in many files and a no-op
    round-robin of ids is noise next to the codec work."""
    ids = df.select(F.col(id_col).cast("long").alias(id_col))
    return ids.repartition(df.sparkSession.sparkContext.defaultParallelism)


def attach_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL (decodable) PNG payload per row: an RGB gradient
    whose dimensions derive arithmetically from the id —
    ``w = 16 + id % 48``, ``h = 8 + id % 24``, pixel (y, x, c) =
    ``(x + y + id + c) % 256``. Because the true decoded dimensions are
    a pure function of the id, a SQL oracle can hash-check the output
    of the real decode path without being able to parse PNG itself."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import png_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 16 + d % 48, 8 + d % 24
                y = np.arange(h)[:, None, None]
                x = np.arange(w)[None, :, None]
                c = np.arange(3)[None, None, :]
                arr = ((x + y + d + c) % 256).astype(np.uint8)
                rows.append((d, png_codec.encode_png(arr)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


def attach_bmp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """BMP twin of :func:`attach_png_payload`: a REAL (decodable) 24-bit
    BI_RGB BMP per row, dims derived arithmetically from the id —
    ``w = 12 + id % 40``, ``h = 6 + id % 20`` (different moduli than the
    PNG attacher so a codec that confuses the two fails the oracle),
    pixel (y, x, c) = ``(2*x + y + id + c) % 256``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import bmp_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 12 + d % 40, 6 + d % 20
                y = np.arange(h)[:, None, None]
                x = np.arange(w)[None, :, None]
                c = np.arange(3)[None, None, :]
                arr = ((2 * x + y + d + c) % 256).astype(np.uint8)
                rows.append((d, bmp_codec.encode_bmp(arr)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


def decode_image_stub(payload: bytes, fake: bool) -> dict:
    """The codec boundary: one payload in, feature dict out.

    ``fake=False``: REAL decode — PNG via the in-repo codec
    (``png_codec.decode_png``: true IHDR dims, unfiltered pixel data),
    other formats via Pillow when importable, else
    ``NotImplementedError`` naming the missing codec.
    ``fake=True``: deterministic digest-derived pseudo-decode kept for
    oracle-checkable catalog entries (DuckDB can reproduce md5, not a
    pixel pipeline)."""
    payload = bytes(payload)
    digest = hashlib.md5(payload).hexdigest()
    if fake:
        return {
            "n_bytes": len(payload),
            "digest": digest,
            # deterministic fake dimensions derived from the digest
            "width": int(digest[:4], 16) % 1920,
            "height": int(digest[4:8], 16) % 1080,
        }
    arr = decode_image(payload)
    return {
        "n_bytes": len(payload),
        "digest": digest,
        "width": int(arr.shape[1]),
        "height": int(arr.shape[0]),
    }


def decode_image(payload: bytes):
    """THE image-decode dispatch (shared by every real-pixel path —
    feature extraction and perceptual hashing must not each carry
    their own probe list): PNG/BMP/GIF87a/baseline-JPEG via the in-repo
    codecs, anything else via Pillow when importable, else a loud
    ``NotImplementedError``.  Returns a uint8 ``(h, w, 3)`` array."""
    import numpy as np

    from event_streaming_toy_example_spark.functions import (
        bmp_codec,
        gif_codec,
        jpeg_codec,
        png_codec,
    )

    payload = bytes(payload)
    for probe, decode in (
        (png_codec.is_png, png_codec.decode_png),
        (bmp_codec.is_bmp, bmp_codec.decode_bmp),
        (gif_codec.is_gif, gif_codec.decode_gif),
        (jpeg_codec.is_jpeg, jpeg_codec.decode_jpeg),
    ):
        if probe(payload):
            arr = decode(payload)
            break
    else:
        try:
            from PIL import Image  # optional; absent in this environment
        except ImportError as exc:
            raise NotImplementedError(
                "real decode implemented for PNG, BMP, GIF87a, and "
                "baseline JPEG (in-repo codecs); other formats need "
                "Pillow, which is not installed"
            ) from exc
        import io

        with Image.open(io.BytesIO(payload)) as img:
            arr = np.asarray(img)
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    return arr[:, :, :3]


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each task receives columnar batches; the stub
    decode runs per payload inside the batch loop exactly where a real
    codec call would. Output schema is fixed (FEATURE_SCHEMA)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p, fake) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(op, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("stride", T.IntegerType(), True),
        T.StructField("payload_resized", T.BinaryType(), True),
        T.StructField("resized_n_bytes", T.LongType(), True),
    ]
)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload_resized", T.BinaryType(), True),
        T.StructField("resized_n_bytes", T.LongType(), True),
    ]
)


def resize_images(df: DataFrame, max_side: int = 64) -> DataFrame:
    """REAL image resize, Arrow-batched: decode each PNG payload
    (in-repo codec), nearest-neighbor downsample so the longer side is
    at most ``max_side`` (aspect preserved, never upscaled), re-encode
    as PNG. Output dims are the resized dims; the payload round-trips
    through ``png_codec.decode_png``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from event_streaming_toy_example_spark.functions import png_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = png_codec.decode_png(bytes(payload))
                h, w = arr.shape[:2]
                scale = max(h, w) / max_side
                if scale > 1:
                    out_w = max(1, int(w / scale))
                    out_h = max(1, int(h / scale))
                    arr = png_codec.resize_nearest(arr, out_w, out_h)
                else:
                    out_w, out_h = w, h
                rb = png_codec.encode_png(arr)
                rows.append((doc_id, out_w, out_h, rb, len(rb)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "payload_resized", "resized_n_bytes",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(op, RESIZED_IMAGE_SCHEMA)


def resize_media_stub(df: DataFrame, target_bytes: int = 128,
                      fake: bool = True) -> DataFrame:
    """Resize / downsample plumbing, Arrow-batched like the decode path.

    ``fake=False`` routes to ``resize_images`` — the REAL PNG
    decode -> nearest-neighbor -> re-encode path (note its schema has
    true width/height instead of a byte stride). The deterministic
    fake keeps every ``stride``-th byte with
    ``stride = ceil(n/target_bytes)`` — a 1-D nearest-neighbor
    downsample, so output size, stride, and bytes are all reproducible
    and the numeric columns are SQL-checkable."""
    if not fake:
        return resize_images(df)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                stride = max(1, -(-n // target_bytes))
                rb = b[::stride]
                rows.append((doc_id, n, stride, rb, len(rb)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "stride",
                    "payload_resized", "resized_n_bytes",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(op, RESIZE_SCHEMA)


def sample_frames_stub(df: DataFrame, every_n_bytes: int = 64,
                       max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: split each payload into fixed-size
    chunks ("frames") — the Spark-side shape of video frame sampling
    (explode to one row per sampled frame) with a byte-slice standing in
    for the codec's frame decode. Pure column expressions."""
    n = F.least(
        F.ceil(F.length("payload") / every_n_bytes).cast("int"), F.lit(max_frames)
    )
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col("payload").cast("string"), i * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        ),
    )
    return (
        df.select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", "f.frame_idx", "f.frame_bytes")
    )


# --------------------------------------------------------------------------
# Audio (REAL in-repo WAV codec — the audio twin of the PNG path)
# --------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_abs", T.LongType(), True),
    ]
)

#: keep the synthetic clips small: 8 kHz, 256..1279 samples (32-160 ms)
_WAV_RATE = 8000


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL (decodable) PCM16 WAV payload per row whose
    samples are a pure integer function of the id —
    ``n = 256 + id % 1024``, ``s[i] = (i * (id + 3)) % 65536 - 32768``
    at 8 kHz mono. Because every decoded feature is integer arithmetic
    on the id, a SQL oracle can hash-check the REAL decode path
    (including mean absolute amplitude) without parsing RIFF itself."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import wav_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = 256 + d % 1024
                i = np.arange(n, dtype=np.int64)
                s = ((i * (d + 3)) % 65536 - 32768).astype(np.int16)
                rows.append((d, wav_codec.encode_wav(s, _WAV_RATE)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


def attach_jpeg_payload(
    df: DataFrame, id_col: str = "doc_id", progressive: bool = False
) -> DataFrame:
    """JPEG twin of :func:`attach_png_payload`: a REAL (decodable)
    JFIF JPEG per row, dims derived arithmetically from the id
    — ``w = 14 + id % 34``, ``h = 7 + id % 17`` (a fourth moduli pair,
    so any codec mix-up fails the oracle).  JPEG is lossy, so unlike
    the PNG/BMP/GIF attachers the pixels don't round-trip exactly —
    but the decoded *dimensions* do, which is what the arithmetic SQL
    oracle checks; the wrap-free gradient keeps the pixel error bounded
    (asserted in the codec tests).

    ``progressive=True`` emits SOF2 multi-scan streams (the 10-scan
    successive-approximation script) instead of baseline — same image,
    same dims, so the SAME oracle verifies the progressive decode
    path end-to-end."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import jpeg_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 14 + d % 34, 7 + d % 17
                y = np.arange(h)[:, None, None]
                x = np.arange(w)[None, :, None]
                c = np.arange(3)[None, None, :]
                arr = ((2 * x + 3 * y + d + 10 * c) % 200 + 20).astype(
                    np.uint8
                )
                rows.append(
                    (
                        d,
                        jpeg_codec.encode_jpeg(
                            arr, quality=92, progressive=progressive
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


def attach_jpeg12_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """12-BIT extended-sequential JPEG twin (SOF1, precision 12 — the
    format scientific/medical corpora carry): a REAL decodable
    grayscale 12-bit stream per row, dims from a FIFTH moduli pair —
    ``w = 12 + id % 31``, ``h = 6 + id % 13`` — so a precision-path
    mix-up with the baseline entry fails the oracle.  Sample values
    span the full 12-bit range; every 4th doc also exercises restart
    markers (the two encoder paths must agree, pinned in
    ``tests/test_jpeg_codec.py:316-350``)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import jpeg_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 12 + d % 31, 6 + d % 13
                y = np.arange(h)[:, None]
                x = np.arange(w)[None, :]
                arr = ((64 * y + 32 * x + 7 * d) % 4096).astype(np.uint16)
                rows.append(
                    (
                        d,
                        jpeg_codec.encode_jpeg12_gray(
                            arr,
                            quality=95,
                            restart_interval=2 if d % 4 == 0 else 0,
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


def attach_gif_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """GIF twin of :func:`attach_png_payload` / :func:`attach_bmp_payload`:
    a REAL (decodable) single-frame GIF87a per row — grayscale, so the
    palette constraint is trivially met — with dims derived
    arithmetically from the id: ``w = 10 + id % 30``, ``h = 5 + id % 15``
    (a third moduli pair, so any codec mix-up fails the oracle),
    pixel (y, x) = ``(3*x + 2*y + id) % 256``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import gif_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 10 + d % 30, 5 + d % 15
                y = np.arange(h)[:, None]
                x = np.arange(w)[None, :]
                arr = ((3 * x + 2 * y + d) % 256).astype(np.uint8)
                rows.append((d, gif_codec.encode_gif(arr)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


def attach_gif_anim_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Multi-FRAME GIF87a per row — the video-like payload for REAL
    frame sampling (vs the byte-slice plumbing of
    :func:`sample_payload_frames`).  ``n_frames = 1 + id % 4``; frame
    ``f`` is a grayscale tile ``h = 4 + (id + f) % 5``,
    ``w = 5 + (id + 2f) % 6``, flat pixel ``i`` valued
    ``(id + 17*f + i) % 241`` — every decoded feature is integer
    arithmetic on (id, f), so a SQL oracle checks the real multi-frame
    decode without parsing GIF."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import gif_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                frames = []
                for f in range(1 + d % 4):
                    h = 4 + (d + f) % 5
                    w = 5 + (d + 2 * f) % 6
                    i = np.arange(h * w, dtype=np.int64)
                    frames.append(
                        (((d + 17 * f + i) % 241).astype(np.uint8)).reshape(
                            h, w
                        )
                    )
                rows.append((d, gif_codec.encode_gif_frames(frames)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_px", T.LongType(), True),
    ]
)


def extract_gif_frames(df: DataFrame) -> DataFrame:
    """REAL frame sampling: decode every frame of each multi-frame GIF
    payload (full LZW per frame) and emit one row per frame with its
    dimensions and exact integer mean pixel value.  One Arrow batch
    pass; the explode happens inside pandas, so each payload is
    decoded exactly once."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import gif_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = gif_codec.decode_gif_frames(bytes(payload))
                for f, arr in enumerate(frames):
                    h, w, _ = arr.shape
                    mean_px = int(arr[:, :, 0].astype(np.int64).sum()) // (
                        h * w
                    )
                    rows.append(
                        (int(doc_id), f, len(frames), w, h, mean_px)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_FRAME_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(op, GIF_FRAME_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("dhash", T.StringType(), True),
    ]
)

#: dHash grid: 8x8 bits from an 8-row x 9-col luminance reduction.
_DHASH_H, _DHASH_W = 8, 9


def attach_scaled_tile_bmp(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL BMP payload that is a nearest-neighbor UPSCALE of
    one of 7 fixed 9x8 "seed tiles" (tile pixel = first md5 byte of
    ``tile:<class>:<x>:<y>``, class = ``id % 7``; scale =
    ``(1 + id % 4, 1 + id % 3)``).  Integer block-mean downscale of such
    an image recovers the seed tile EXACTLY, so every doc of a class
    has the same perceptual dHash regardless of its pixel dimensions —
    the ground truth for the image near-dup catalog entry is therefore
    the pure arithmetic ``doc_id % 7``, which a SQL oracle can compute
    without decoding a pixel."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import bmp_codec

        tiles = {
            cls: np.array(
                [
                    [
                        int(
                            hashlib.md5(
                                f"tile:{cls}:{x}:{y}".encode()
                            ).hexdigest()[:2],
                            16,
                        )
                        for x in range(_DHASH_W)
                    ]
                    for y in range(_DHASH_H)
                ],
                dtype=np.uint8,
            )
            for cls in range(7)
        }
        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                tile = tiles[d % 7]
                sx, sy = 1 + d % 4, 1 + d % 3
                img = np.repeat(np.repeat(tile, sy, axis=0), sx, axis=1)
                arr = np.repeat(img[:, :, None], 3, axis=2)
                rows.append((d, bmp_codec.encode_bmp(arr)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _ids_spread(df, id_col).mapInPandas(op, PNG_PAYLOAD_SCHEMA)


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash over REAL decoded pixels, Arrow-batched.

    Per payload: decode (the shared ``decode_image`` dispatch —
    PNG/BMP/GIF87a in-repo codecs, loud gate beyond), integer
    luminance (channel mean), reduce to
    an 8x9 grid (exact integer block mean when dims divide evenly, else
    deterministic nearest-neighbor cell sampling), then 64 bits of
    "is the right neighbor brighter" — the classic dHash.  Scale- and
    re-encode-invariant for block-constant images, so it groups resized
    copies of the same picture that byte-level dedup can never see.

    Downstream the hash is an ordinary 16-hex-char column: exact
    grouping is a hash aggregate (mergeable, O(distinct images)); for
    Hamming-tolerant matching feed it to the same block-permutation
    equi-join used by ``minhash.simhash_near_dup_pairs`` — never an
    all-pairs compare."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        decode = decode_image  # the one shared dispatch

        def reduce_grid(gray: "np.ndarray") -> "np.ndarray":
            h, w = gray.shape
            if h % _DHASH_H == 0 and w % _DHASH_W == 0:
                by, bx = h // _DHASH_H, w // _DHASH_W
                return (
                    gray.astype(np.int64)
                    .reshape(_DHASH_H, by, _DHASH_W, bx)
                    .sum(axis=(1, 3))
                    // (by * bx)
                )
            ys = (np.arange(_DHASH_H) * h) // _DHASH_H
            xs = (np.arange(_DHASH_W) * w) // _DHASH_W
            return gray[np.ix_(ys, xs)].astype(np.int64)

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode(bytes(payload))
                h, w = arr.shape[:2]
                gray = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
                grid = reduce_grid(gray)
                bits = 0
                for y in range(_DHASH_H):
                    for x in range(_DHASH_W - 1):
                        bits = (bits << 1) | int(grid[y, x + 1] > grid[y, x])
                rows.append((int(doc_id), w, h, format(bits, "016x")))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DHASH_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(op, DHASH_SCHEMA)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """REAL audio decode over Arrow batches: RIFF header fields +
    per-clip mean absolute amplitude (integer floor-division, so the
    value is exact and cross-engine checkable). Non-WAV payloads raise
    the codec's loud error — garbage audio must not silently pass a
    feature extractor."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import wav_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                samples, rate = wav_codec.decode_wav(payload)
                n = int(samples.shape[0])
                mean_abs = (
                    int(np.abs(samples.astype(np.int64)).sum()) // n if n else 0
                )
                rows.append(
                    (
                        int(doc_id),
                        len(payload),
                        rate,
                        n,
                        n * 1000 // rate,
                        mean_abs,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(op, AUDIO_FEATURE_SCHEMA)


AUDIO_DSP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("ms_energy", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("peak_abs", T.LongType(), True),
    ]
)


def extract_audio_dsp(df: DataFrame) -> DataFrame:
    """Signal-level features over REAL decoded PCM: mean-square energy
    (integer floor-division of the exact int64 sum of squares),
    zero-crossing count (sign products < 0 — the classic voiced/
    unvoiced + pitch-proxy feature), and peak absolute amplitude.

    All three are exact integer functions of the samples, so the
    arithmetic oracle checks the full decode → DSP path bit-for-bit.
    Vectorized numpy inside one Arrow batch pass — the per-payload
    Python loop only spans payloads, never samples."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from event_streaming_toy_example_spark.functions import wav_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate = wav_codec.decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n = int(s.shape[0])
                if n == 0:
                    rows.append((int(doc_id), 0, 0, 0, 0))
                    continue
                ms_energy = int((s * s).sum()) // n
                zc = int(((s[:-1] * s[1:]) < 0).sum())
                peak = int(np.abs(s).max())
                rows.append((int(doc_id), n, ms_energy, zc, peak))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_DSP_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(op, AUDIO_DSP_SCHEMA)


BOXDOWN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("out_w", T.LongType(), True),
        T.StructField("out_h", T.LongType(), True),
        T.StructField("px_sum", T.LongType(), True),
    ]
)


def extract_boxdown2(df: DataFrame) -> DataFrame:
    """REAL image resize: exact 2x2 box downsample (integer floor-mean
    of each 2x2 block, odd edge rows/cols dropped) over REAL decoded
    pixels — the arithmetic resize kernel whose output the oracle can
    reproduce exactly, unlike float bilinear.  Emits the downsampled
    dimensions and the exact integer sum of all output samples, so a
    wrong decode, wrong block alignment, or wrong rounding all fail
    the value hash.  One Arrow batch pass, vectorized numpy reshape —
    the same cost model as every real-decode op in this module."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_image(bytes(payload)).astype(np.int64)
                h, w, _ = arr.shape
                oh, ow = h // 2, w // 2
                a = arr[: oh * 2, : ow * 2, :]
                down = (
                    a.reshape(oh, 2, ow, 2, 3).sum(axis=(1, 3)) // 4
                )
                rows.append(
                    (int(doc_id), ow, oh, int(down.sum()))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in BOXDOWN_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(op, BOXDOWN_SCHEMA)
