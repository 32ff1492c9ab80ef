"""MERGE-style upsert: apply a CDC changes batch onto a snapshot table.

The reference has no table-maintenance story (its batch job overwrites
whole partitions, ``toy_glue.py:58-65``); an engine feeding a 100 TB
training store needs one. Without a transactional table format the
portable Spark formulation is read-modify-write:

    new_snapshot = latest row per key over (base ∪ changes)

expressed so the physical plan is ONE hash-partition shuffle on the key
with ``WindowGroupLimit`` pre-limiting each map task to its local
winner — shuffle volume is O(distinct keys), not O(rows). Combined
with ``partitioning.write_processed_parquet(dynamic=True)`` (dynamic
partition overwrite) only the partitions a batch touches get
rewritten. On Delta/Iceberg the same call maps onto ``MERGE INTO``.

Ties: changes beat base at equal ``order_by`` (a re-sent record with
the same timestamp must win), and a final unique tie-break column keeps
the survivor deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_SRC = "_upsert_src"
_RN = "_upsert_rn"


def upsert_snapshot(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Return the post-merge snapshot: newest row per ``keys`` across
    ``base`` and ``changes`` (changes win ties), dropping keys whose
    winning row has ``tombstone_col = true`` (CDC delete markers).

    ``order_by`` columns are compared descending (newest first); pass
    at least one globally unique column last for determinism.
    """
    combined = base.withColumn(_SRC, F.lit(0)).unionByName(
        changes.withColumn(_SRC, F.lit(1))
    )
    ordering = [
        (F.col(c) if isinstance(c, str) else c).desc() for c in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering, F.col(_SRC).desc())
    latest = (
        combined.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN, _SRC)
    )
    if tombstone_col is not None:
        latest = latest.where(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        ).drop(tombstone_col)
    return latest
