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


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tie_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream:
    one row per (key, attribute-version) with a validity interval.

    Steps, all over ONE key-partitioned sort (two window functions on
    the same (keys) partitioning share a single exchange):

    1. change detection — drop rows whose ``attr_cols`` equal the
       previous row's (no-op updates must not open a new version);
    2. interval assignment — ``valid_from = ts``,
       ``valid_to = lead(ts)`` over the surviving versions (NULL =
       currently valid).

    Attribute comparison is null-safe via an md5 over the null-marked
    concatenation, the same portable idiom the oracle runs. At 100 TB
    the cost is one shuffle on the dimension key — the stream is
    usually a day's CDC slice, far smaller than the corpus; history
    append then composes with dynamic partition overwrite like
    ``upsert_snapshot``.
    """
    fp = F.md5(
        F.concat_ws(
            "|",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in attr_cols
            ],
        )
    )
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    marked = changes.withColumn("_fp", fp).withColumn(
        "_prev_fp", F.lag("_fp").over(w)
    )
    versions = marked.where(
        F.col("_prev_fp").isNull() | (F.col("_fp") != F.col("_prev_fp"))
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    return (
        versions.withColumn("_next_ts", F.lead(F.col(ts_col)).over(w2))
        .select(
            *keys,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.col("_next_ts").alias("valid_to"),
            F.col("_next_ts").isNull().alias("is_current"),
        )
    )
