"""Grid-blocked proximity join: completeness vs brute force (the
failure mode of any blocking scheme is a silently missed candidate),
boundary inclusion, and cell-crossing pairs."""

from __future__ import annotations

import random

from event_streaming_toy_example_spark.functions.spatial import (
    proximity_join_pairs,
)


def _brute(rows, radius):
    out = set()
    for i, (ia, xa, ya) in enumerate(rows):
        for ib, xb, yb in rows[i + 1 :]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= radius * radius:
                a, b = sorted((ia, ib))
                out.add((a, b))
    return out


def _run(spark, rows, radius):
    df = spark.createDataFrame(rows, ["pid", "x", "y"])
    got = proximity_join_pairs(
        df, id_col="pid", x_col="x", y_col="y", radius=radius
    ).collect()
    pairs = {(r.a_id, r.b_id) for r in got}
    assert len(pairs) == len(got), "duplicate pair emitted"
    return pairs


def test_matches_brute_force_on_dense_cluster(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.randrange(0, 500), rng.randrange(0, 500)) for i in range(80)
    ]
    assert _run(spark, rows, 120) == _brute(rows, 120)


def test_boundary_and_cell_crossing(spark):
    rows = [
        (1, 100, 100),
        (2, 100, 200),  # exactly radius away from 1 (inclusive)
        (3, 100, 201),  # one past radius
        (4, 199, 100),  # same distance band, crosses a cell boundary
        (5, 1000, 1000),  # isolated
    ]
    pairs = _run(spark, rows, 100)
    assert pairs == _brute(rows, 100)
    assert (1, 2) in pairs and (1, 4) in pairs  # inclusive boundary
    assert (1, 3) not in pairs  # one past radius
    assert (2, 3) in pairs  # adjacent to the boundary point
    assert not any(5 in p for p in pairs)  # isolated point matches nothing


def test_distances_reported_exactly(spark):
    rows = [(1, 0, 0), (2, 3, 4)]
    df = spark.createDataFrame(rows, ["pid", "x", "y"])
    got = proximity_join_pairs(
        df, id_col="pid", x_col="x", y_col="y", radius=10
    ).collect()
    assert [(r.a_id, r.b_id, r.dist_sq) for r in got] == [(1, 2, 25)]
