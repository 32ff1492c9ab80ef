"""Small-file compaction: bin-pack many small parquet files into
target-size files, preserving the table's clustering layout.

The reference's own README targets 100 MB-1 GB parquet files
(``README.md:296-297``) but its pipeline — like any streaming ingest
with frequent triggers — emits one small file per task per micro-batch.
At 100 TB that is the classic small-files problem: footer/open overhead
per file, scheduler pressure proportional to file count, and min/max
stats too fine to prune effectively.  Real pipelines therefore compact
constantly; this module is the third pay-once-at-write layout operator
next to bucketing (`operators/bucketing.py`) and Z-order
(`operators/layout.py`).

Two modes:

- **Full** (``compact_files``): rewrite the whole directory as
  ``ceil(total_bytes / target_bytes)`` files.  With ``order_col`` the
  rewrite range-partitions + sorts on that column, so a Z-ordered or
  sorted table KEEPS its clustering (each output file covers a
  contiguous key range and footer stats stay selective); without it the
  rewrite is a shuffle-free ``coalesce``.
- **Selective** (``compact_files(..., small_file_bytes=...)``): only
  files below the threshold are read and repacked; files already at
  target size are left in place — no rewrite amplification, which is
  what makes continuous compaction affordable (rewriting a 100 TB table
  to fix 1% of its files must not cost 100 TB of IO).

Durability: the rewrite goes to a temp directory first and is published
by renames — new packed files move in under unique names before the
consumed originals are removed, so a crash mid-publish leaves either
extra (duplicate) files that a re-run replaces, never missing rows.
Plain directories cannot give concurrent readers a transactional cut —
at scale run this under a table format's commit protocol (the
generation-pointer pattern of ``streaming/upsert_sink.py`` is this
repo's form of it); the operator itself is format-agnostic IO layout.

Cites: reference sizing discussion ``README.md:296-304``; the staged
NDJSON one-file-per-minute layout it compacts from
(``toy_lambda_function.py:22-29``).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class CompactionResult:
    files_before: int
    files_after: int
    bytes_before: int
    rows: int


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(absolute path, size bytes) of every parquet data file directly
    under ``path`` — one FS listing, no file reads."""
    fs, hpath = _fs_and_path(spark, path)
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and not name.startswith("_"):
            out.append((st.getPath().toString(), st.getLen()))
    return sorted(out)


def compact_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_col: str | None = None,
    small_file_bytes: int | None = None,
) -> CompactionResult:
    """Compact the parquet directory at ``path`` toward
    ``target_bytes``-sized files.  See the module docstring for modes.

    Returns a :class:`CompactionResult`; ``rows`` counts the rows that
    were rewritten (selective mode rewrites only the small files'
    rows).  A no-op (nothing below threshold / already one file) is
    returned without touching the table.
    """
    files = list_data_files(spark, path)
    n_before = len(files)
    if small_file_bytes is not None:
        victims = [(p, s) for p, s in files if s < small_file_bytes]
    else:
        victims = files
    total = sum(s for _, s in victims)
    n_out = max(1, -(-total // target_bytes))
    if len(victims) <= n_out:
        return CompactionResult(n_before, n_before, total, 0)

    df = spark.read.parquet(*[p for p, _ in victims])
    if order_col is not None:
        packed = df.repartitionByRange(n_out, F.col(order_col)).sortWithinPartitions(
            order_col
        )
    else:
        packed = df.coalesce(n_out)

    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    packed.write.mode("overwrite").parquet(tmp)
    rows = spark.read.parquet(tmp).count()

    fs, dst_dir = _fs_and_path(spark, path)
    jvm = spark._jvm
    # publish: move packed files in first (transient duplicates are
    # re-runnable; missing rows would not be), then drop the originals
    moved = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp)):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            dest = jvm.org.apache.hadoop.fs.Path(
                f"{path.rstrip('/')}/compacted-{uuid.uuid4().hex[:8]}-{name}"
            )
            if not fs.rename(st.getPath(), dest):
                raise IOError(f"compaction publish failed moving {name}")
            moved.append(dest)
    for p, _ in victims:
        fs.delete(jvm.org.apache.hadoop.fs.Path(p), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)

    n_after = len(list_data_files(spark, path))
    return CompactionResult(n_before, n_after, total, rows)


def compaction_invariance(
    df_before: DataFrame, df_after: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """The property a compaction must preserve, as a relation: per-key
    row counts and exact value sums before vs after, with a boolean
    equality column — the deterministic oracle shape for the catalog
    entry (the oracle recomputes the 'before' side and predicts
    equal=1 everywhere)."""
    a = df_before.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(value_col).alias("sum_before"),
    )
    b = df_after.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_after"),
        F.sum(value_col).alias("sum_after"),
    )
    return (
        a.join(b, key_col, "full_outer")
        .select(
            key_col,
            F.coalesce("n_before", F.lit(0)).alias("n_rows"),
            F.coalesce("sum_before", F.lit(0)).alias("value_sum"),
            (
                F.col("n_before").eqNullSafe(F.col("n_after"))
                & F.col("sum_before").eqNullSafe(F.col("sum_after"))
            )
            .cast("int")
            .alias("invariant_ok"),
        )
    )
