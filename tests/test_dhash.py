"""Perceptual dHash: scale invariance, class separation, decode gates."""

import numpy as np
import pytest

from event_streaming_toy_example_spark.functions.multimodal import (
    attach_scaled_tile_bmp,
    image_dhash,
)


@pytest.fixture(scope="module")
def hashed(spark):
    # 84 docs = each of the 7 classes at all 12 (sx, sy) scale variants
    docs = spark.range(84).withColumnRenamed("id", "doc_id")
    return image_dhash(attach_scaled_tile_bmp(docs)).collect()


def test_dhash_invariant_across_scales(hashed):
    by_class = {}
    for r in hashed:
        by_class.setdefault(r["doc_id"] % 7, set()).add(r["dhash"])
    assert set(by_class) == set(range(7))
    for cls, hashes in by_class.items():
        assert len(hashes) == 1, f"class {cls} split across {hashes}"


def test_dhash_separates_classes(hashed):
    classes = {r["doc_id"] % 7: r["dhash"] for r in hashed}
    assert len(set(classes.values())) == 7


def test_dhash_dims_vary_within_class(hashed):
    dims = {(r["width"], r["height"]) for r in hashed if r["doc_id"] % 7 == 0}
    assert len(dims) == 12  # 4 x-scales times 3 y-scales


def test_dhash_png_path_and_nondivisible_fallback(spark):
    # PNG payloads (attach_png_payload dims are not multiples of 9x8)
    # exercise the other codec branch and the nearest-neighbor fallback
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_png_payload,
    )

    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    rows = image_dhash(attach_png_payload(docs)).collect()
    assert len(rows) == 6
    assert all(len(r["dhash"]) == 16 for r in rows)
    again = {r["doc_id"]: r["dhash"] for r in image_dhash(attach_png_payload(docs)).collect()}
    assert {r["doc_id"]: r["dhash"] for r in rows} == again  # deterministic


def test_dhash_rejects_unknown_format(spark):
    from pyspark.sql import functions as F

    bad = spark.range(1).select(
        F.col("id").alias("doc_id"), F.lit(b"not an image").alias("payload")
    )
    with pytest.raises(Exception, match="(?i)png, bmp, gif"):
        image_dhash(bad).collect()


def test_dhash_blockmean_matches_tile_exactly():
    # the reduce path used for divisible dims is an exact inverse of
    # np.repeat upscaling — verified here without Spark in the loop
    rng = np.random.default_rng(7)
    tile = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    up = np.repeat(np.repeat(tile, 3, axis=0), 4, axis=1).astype(np.int64)
    grid = up.reshape(8, 3, 9, 4).sum(axis=(1, 3)) // 12
    assert (grid == tile).all()
