"""Spatial proximity join via grid-cell blocking.

The reference has no spatial surface; a data-curation engine meets
proximity joins constantly (dedup by geo, store-to-customer matching,
sensor correlation).  The naive form is an all-pairs distance filter —
quadratic.  The scalable form implemented here is the standard
grid-cell blocking:

- bucket each point into a square cell of side ``radius`` (so any two
  points within ``radius`` are in the same or an adjacent cell);
- the PROBE side explodes to its 3x3 cell neighborhood, the BUILD
  side stays home — one equi-join on cell id, never all-pairs;
- an exact distance predicate verifies candidates.

Coordinates and distances are exact INTEGERS (squared Euclidean in
grid units): cross-engine trig (haversine) is not bit-reproducible,
and the blocking pattern — the thing this module exists to
demonstrate — is identical for any metric; a production deployment
swaps the verify predicate for haversine and sizes cells by latitude.

Each unordered pair is produced exactly once: the probe side finds
``b`` from ``a``'s neighborhood under ``a_id < b_id``; the reversed
meeting is excluded by the same ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def proximity_join_pairs(
    points: DataFrame,
    *,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All pairs (a_id < b_id) with squared Euclidean distance
    <= radius^2, via 3x3-neighborhood grid blocking.

    Coordinates must be non-negative integers (cell assignment uses
    truncating ``div``; shift negative domains before calling)."""
    cx = F.expr(f"{x_col} div {radius}")
    cy = F.expr(f"{y_col} div {radius}")
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
        cx.cast("long").alias("cx"),
        cy.cast("long").alias("cy"),
    )
    neighborhood = F.array(
        *[
            F.struct(
                (F.col("cx") + dx).alias("nx"), (F.col("cy") + dy).alias("ny")
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        F.col("pid").alias("a_id"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        F.explode(neighborhood).alias("n"),
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("n.nx") * (1 << 32) + F.col("n.ny")).alias("cell"),
    )
    home = pts.select(
        F.col("pid").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        (F.col("cx") * (1 << 32) + F.col("cy")).alias("cell"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(home, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .where(d2 <= radius * radius)
        .select("a_id", "b_id", d2.alias("dist_sq"))
    )
