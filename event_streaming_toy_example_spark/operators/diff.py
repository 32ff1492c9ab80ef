"""Snapshot diffing: derive an insert/update/delete change feed from
two keyed table snapshots.

The inverse of ``operators/upsert.py`` (which APPLIES a change feed):
``diff_snapshots(base, next)`` applied back onto ``base`` with
``upsert_snapshot`` reproduces ``next`` exactly — the round trip is
property-tested on random tables in ``tests/test_upsert.py``.

Scale: ONE full-outer join on the key; content compares as fixed-width
md5 fingerprints so wide rows never ship twice, and with both
snapshots bucketed by key on disk (``operators/bucketing.py``) the
join is shuffle-free.  The reference's only maintenance is an
overwrite-in-place write (``toy_glue.py:58-65``) — no diffing exists
there at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def diff_snapshots(
    base: DataFrame,
    nxt: DataFrame,
    key_col: str,
    content_cols: Sequence[str],
) -> DataFrame:
    """Change feed ``(key, change_type)`` between two snapshots:
    ``insert`` (key only in ``nxt``), ``delete`` (key only in
    ``base``), ``update`` (content fingerprint differs); unchanged
    keys (the bulk) drop out."""
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    b = base.select(F.col(key_col).alias("b_id"), fp.alias("b_fp"))
    n = nxt.select(F.col(key_col).alias("n_id"), fp.alias("n_fp"))
    j = b.join(n, b["b_id"] == n["n_id"], "full_outer")
    change = (
        F.when(F.col("b_id").isNull(), "insert")
        .when(F.col("n_id").isNull(), "delete")
        .when(F.col("b_fp") != F.col("n_fp"), "update")
    )
    return (
        j.select(
            F.coalesce("b_id", "n_id").alias(key_col),
            change.alias("change_type"),
        )
        .where(F.col("change_type").isNotNull())
    )
