"""Bucketed-table co-located joins (SURVEY.md §4 shuffle strategy).

For fact-to-fact joins repeated on the same key (events x orders per
user, lineitem x orders per orderkey), the shuffle can be paid ONCE at
write time: ``bucketBy(n, key)`` hash-partitions files on disk, and a
join between two tables bucketed on the same key with the same bucket
count runs with ZERO exchanges — each task zips bucket i with bucket i.

At 100 TB this converts an every-query multi-TB shuffle into a one-time
layout decision; bucket count is chosen so a bucket of the larger table
fits an executor task (~1000 buckets per PB-scale table). Buckets also
serve point lookups (bucket pruning on the key).

Bucketed tables require the session catalog (``saveAsTable``); the
warehouse dir is set by ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table. Sorting within buckets additionally enables
    sort-merge joins without a sort step."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket specs the
    physical plan contains no Exchange on either side (verified in
    tests/test_bucketing.py by inspecting the executed plan)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
