"""LEGACY ADAPTER — manifest-protocol small-file compaction for PLAIN
parquet directories (no transaction log).  On the engine's unified
table stack the same operation is ``txtable.tx_compact`` — one commit
in the same log as append/MERGE/DELETE, snapshot-isolated against
readers.  This module remains for compacting directories that are not
transactional tables (staging areas, foreign datasets); its recovery
suite (``tests/test_compaction_recovery.py``) still runs.

Small-file compaction: bin-pack many small parquet files into
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
by renames under a MANIFEST protocol — the full plan (originals to
remove, packed names to move in) commits as ``_compaction_manifest.json``
inside the table dir before the first rename, packed files move in
before any original is deleted, and the manifest clears last.  A crash
in any window is recoverable to exactly-once by ``recover_compaction``
(also invoked automatically at the start of the next ``compact_files``):
if every original is still present it rolls BACK (drops moved packed
files — table byte-identical to before); if any original is gone, that
proves all moves completed, so it rolls FORWARD (drops the remaining
originals — the compaction finishes exactly).  Never missing rows, and
never the silent duplicates a manifest-less re-run would bake in.
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
    # clear any crashed publish first (exactly-once; see
    # recover_compaction) — a manifest means rows may be duplicated
    # between originals and already-moved packed files
    recover_compaction(spark, path)
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
    # publish protocol (see recover_compaction): plan every dest name,
    # commit the plan as a manifest INSIDE the table dir, move packed
    # files in, delete the originals, then clear the manifest.  A
    # crash in any window is recoverable to exactly-once from the
    # manifest alone — roll back if no original is gone yet, roll
    # forward (all moves precede any delete) otherwise.
    moves = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp)):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            moves.append(
                (
                    st.getPath(),
                    f"compacted-{uuid.uuid4().hex[:8]}-{name}",
                )
            )
    _write_manifest(
        spark,
        path,
        victims=[_basename(p) for p, _ in victims],
        dests=[d for _, d in moves],
        tmp=_basename(tmp),
    )
    for src, dest_name in moves:
        dest = jvm.org.apache.hadoop.fs.Path(
            f"{path.rstrip('/')}/{dest_name}"
        )
        if not fs.rename(src, dest):
            raise IOError(
                f"compaction publish failed moving {dest_name}"
            )
    for p, _ in victims:
        vic = jvm.org.apache.hadoop.fs.Path(p)
        # Hadoop delete reports failure by RETURNING false (perm
        # change, store inconsistency) — an unchecked false here,
        # followed by clearing the manifest, would bake the duplicate
        # in silently.  Raise and LEAVE the manifest: recovery rolls
        # forward next run.
        if not fs.delete(vic, False) and fs.exists(vic):
            raise IOError(
                f"compaction publish failed deleting original {p}; "
                "manifest left in place for recover_compaction"
            )
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(_manifest_path(path)), False)

    n_after = len(list_data_files(spark, path))
    return CompactionResult(n_before, n_after, total, rows)


_MANIFEST_NAME = "_compaction_manifest.json"


def _basename(p: str) -> str:
    return p.rstrip("/").rsplit("/", 1)[-1]


def _manifest_path(path: str) -> str:
    return f"{path.rstrip('/')}/{_MANIFEST_NAME}"


def _write_manifest(
    spark: SparkSession,
    path: str,
    victims: list[str],
    dests: list[str],
    tmp: str,
) -> None:
    """Commit the publish plan atomically: write to a side name, then
    rename into place (underscore-prefixed, so scans ignore it)."""
    import json

    fs, _ = _fs_and_path(spark, path)
    jvm = spark._jvm
    body = json.dumps(
        {"victims": victims, "dests": dests, "tmp": tmp}
    ).encode()
    side = jvm.org.apache.hadoop.fs.Path(
        f"{path.rstrip('/')}/._compaction_manifest.tmp"
    )
    out = fs.create(side, True)
    out.write(bytearray(body))
    out.close()
    final = jvm.org.apache.hadoop.fs.Path(_manifest_path(path))
    fs.delete(final, False)
    if not fs.rename(side, final):
        raise IOError("compaction manifest publish failed")


def recover_compaction(spark: SparkSession, path: str) -> str:
    """Restore exactly-once after a crash mid-publish; call before (or
    instead of) re-running compaction on a directory that may hold a
    manifest.  Returns ``"none"`` (no manifest — nothing in flight),
    ``"rolled_back"`` (no original had been deleted yet: any already-
    moved packed files are removed, the table is byte-identical to the
    pre-compaction state), or ``"rolled_forward"`` (some original was
    already gone — which proves every packed file had moved in, since
    deletes only start after the last move: the remaining originals
    are deleted, completing the compaction exactly).  Either way the
    manifest and temp dir are cleared.  Without this, a crash between
    move-in and delete leaves duplicate rows that a plain re-run would
    PACK but never remove."""
    import json

    fs, _ = _fs_and_path(spark, path)
    jvm = spark._jvm
    mpath = jvm.org.apache.hadoop.fs.Path(_manifest_path(path))
    if not fs.exists(mpath):
        return "none"
    stream = fs.open(mpath)
    try:
        # ONE gateway call for the whole body (a byte-per-call py4j
        # loop would pay thousands of round trips on larger manifests)
        raw = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    man = json.loads(raw.decode())
    base = path.rstrip("/")
    victims = [f"{base}/{v}" for v in man["victims"]]
    present = [
        v for v in victims if fs.exists(jvm.org.apache.hadoop.fs.Path(v))
    ]

    def _must_delete(target, recursive: bool, what: str) -> None:
        # failed deletes report as False, not exceptions; the manifest
        # must survive so a later recovery can finish the job
        if not fs.delete(target, recursive) and fs.exists(target):
            raise IOError(
                f"compaction recovery failed deleting {what}; "
                "manifest left in place"
            )

    if len(present) == len(victims):
        # deletes had not started -> roll BACK: drop any moved dests
        for d in man["dests"]:
            _must_delete(
                jvm.org.apache.hadoop.fs.Path(f"{base}/{d}"), False, d
            )
        outcome = "rolled_back"
    else:
        # a delete happened -> every move had completed -> roll FORWARD
        for v in present:
            _must_delete(jvm.org.apache.hadoop.fs.Path(v), False, v)
        outcome = "rolled_forward"
    # the temp dir is a SIBLING of the table dir (path + "__compact_…"):
    # resolve the parent via Hadoop Path (a string rsplit mis-resolves
    # single-segment relative paths to the table dir itself)
    parent = jvm.org.apache.hadoop.fs.Path(base).getParent()
    fs.delete(
        jvm.org.apache.hadoop.fs.Path(parent, man["tmp"]), True
    )
    fs.delete(mpath, False)
    return outcome


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
