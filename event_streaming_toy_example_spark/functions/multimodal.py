"""Multimodal columns: opaque binary payloads with typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a path reference for very large blobs) next to a
typed metadata struct; run decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` operators so each task
processes a columnar batch, not a row.

The decode step itself needs codec libraries (Pillow/ffmpeg/...) that
are NOT in this environment — it is STUBBED: ``decode_image_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake "decode" (byte-length + md5 digest + fake
dimensions) exercises the full Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — end to end.
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


def decode_image_stub(payload: bytes, fake: bool) -> dict:
    """The stubbed codec boundary. Real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))``; codecs are not available
    in this environment."""
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries (Pillow/ffmpeg) not "
            "present in this environment; pass fake=True for the "
            "deterministic plumbing-test decode"
        )
    digest = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "digest": digest,
        # deterministic fake dimensions derived from the digest
        "width": int(digest[:4], 16) % 1920,
        "height": int(digest[4:8], 16) % 1080,
    }


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


def resize_media_stub(df: DataFrame, target_bytes: int = 128,
                      fake: bool = True) -> DataFrame:
    """Resize / downsample plumbing, Arrow-batched like the decode path.

    Real implementation would be ``PIL.Image.resize`` / ffmpeg ``scale``
    per payload inside the batch loop; the deterministic fake keeps
    every ``stride``-th byte with ``stride = ceil(n/target_bytes)`` — a
    1-D nearest-neighbor downsample, so output size, stride, and bytes
    are all reproducible and the numeric columns are SQL-checkable."""
    if not fake:
        raise NotImplementedError(
            "media resize requires codec libraries (Pillow/ffmpeg) not "
            "present in this environment; pass fake=True for the "
            "deterministic plumbing-test resize"
        )

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
