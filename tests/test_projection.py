"""Integer JL projection: matrix determinism, exactness, and the
distance-preservation sanity that justifies using it for clustering."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.functions.projection import (
    SCALE,
    project_quantized,
    signed_projection_matrix,
)


def test_matrix_is_deterministic_and_signed():
    a = signed_projection_matrix(8, 64)
    b = signed_projection_matrix(8, 64)
    assert a == b
    assert all(s in (-1, 1) for row in a for s in row)
    # not degenerate: both signs occur in every row
    assert all(len(set(row)) == 2 for row in a)


def test_projection_matches_python_reference(spark):
    m = signed_projection_matrix(4, 6)
    vecs = [
        (1, [0.5, -1.25, 0.0, 3.0, -0.001, 2.5]),
        (2, [1e-7, 0.999999, -0.5, 0.25, 0.125, -2.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    got = {
        r.vec_id: [r.p0, r.p1, r.p2, r.p3]
        for r in project_quantized(
            df, "embedding", out_dim=4, in_dim=6
        ).collect()
    }
    import struct

    for vid, vec in vecs:
        # reproduce the float32 storage then the quantize+project
        f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
        q = [round(x * SCALE) for x in f32]
        want = [sum(s * qi for s, qi in zip(m[j], q)) for j in range(4)]
        assert got[vid] == want


def test_norms_roughly_preserved(spark):
    """JL sanity: with E[p·p] = out_dim * |vq|^2, the normalized
    projected norm should be within 3x of the input norm for
    well-spread vectors (loose bound — this is a smoke test of
    usefulness, exactness is the oracle's job)."""
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {
        r.vec_id: [r[f"p{j}"] for j in range(8)]
        for r in project_quantized(
            df, "embedding", out_dim=8, in_dim=64
        ).collect()
    }
    for vid, vec in rows:
        in_norm = math.sqrt(sum((x * SCALE) ** 2 for x in vec))
        proj_norm = math.sqrt(sum(p * p for p in out[vid]) / 8)
        assert in_norm / 3 < proj_norm < in_norm * 3, (vid, in_norm, proj_norm)
