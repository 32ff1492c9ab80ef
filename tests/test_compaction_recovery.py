"""Crash-window recovery for the compaction publish protocol
(``operators/compaction.py::recover_compaction``): each injected
failure state must restore exactly-once — never missing rows, never
baked-in duplicates.

The states are constructed directly from the manifest protocol's
definition (plan committed -> moves -> deletes -> clear), using local
filesystem operations to freeze the table mid-publish exactly as a
crash would.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.compaction import (
    _MANIFEST_NAME,
    compact_files,
    list_data_files,
    recover_compaction,
)


def _table(spark, path: str, rows: int = 3000, n_files: int = 16):
    (
        spark.range(rows)
        .select("id", (F.col("id") * 3).alias("v"))
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


def _content(spark, path):
    rows = spark.read.parquet(path).select("id", "v").collect()
    return sorted((r.id, r.v) for r in rows)


def _stage_crash(spark, path: str, n_moved: int, n_deleted: int):
    """Freeze the publish at 'n_moved packed files moved in,
    n_deleted originals deleted' with the manifest in place."""
    # list_data_files returns Hadoop URIs (file:/...); plain paths here
    victims = [
        p.removeprefix("file:") for p, _ in list_data_files(spark, path)
    ]
    tmp = f"{path}__compact_crash"
    (
        spark.read.parquet(*victims)
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    packed = sorted(
        f
        for f in os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    dests = [f"compacted-crash-{i}-{name}" for i, name in enumerate(packed)]
    manifest = {
        "victims": [os.path.basename(v) for v in victims],
        "dests": dests,
        "tmp": os.path.basename(tmp),
    }
    with open(os.path.join(path, _MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh)
    for name, dest in list(zip(packed, dests))[:n_moved]:
        os.rename(os.path.join(tmp, name), os.path.join(path, dest))
    for v in victims[:n_deleted]:
        os.remove(v)
    return victims


def test_crash_after_partial_move_rolls_back(spark, tmp_path):
    """Manifest written, ONE packed file moved in, no original deleted:
    recovery must roll back to the byte-identical original table (a
    naive re-run here would read originals + the moved file = dups)."""
    path = str(tmp_path / "tbl")
    _table(spark, path)
    want = _content(spark, path)
    _stage_crash(spark, path, n_moved=1, n_deleted=0)
    assert recover_compaction(spark, path) == "rolled_back"
    assert _content(spark, path) == want
    assert not os.path.exists(os.path.join(path, _MANIFEST_NAME))
    assert not os.path.exists(f"{path}__compact_crash")


def test_crash_between_moves_and_deletes_rolls_back(spark, tmp_path):
    """All packed files moved, no original deleted yet: every row is
    DUPLICATED on disk.  Recovery may pick either side; exactly-once
    content must come back either way (this state has all victims
    present, so it rolls back to the originals)."""
    path = str(tmp_path / "tbl")
    _table(spark, path)
    want = _content(spark, path)
    _stage_crash(spark, path, n_moved=2, n_deleted=0)
    assert recover_compaction(spark, path) == "rolled_back"
    assert _content(spark, path) == want


def test_crash_mid_delete_rolls_forward(spark, tmp_path):
    """Moves done, SOME originals deleted: rows now live only in the
    packed files for the deleted originals.  Recovery must roll
    forward (finish the deletes) — rolling back would lose rows."""
    path = str(tmp_path / "tbl")
    _table(spark, path)
    want = _content(spark, path)
    _stage_crash(spark, path, n_moved=2, n_deleted=5)
    assert recover_compaction(spark, path) == "rolled_forward"
    assert _content(spark, path) == want
    # only packed files remain
    names = [os.path.basename(p) for p, _ in list_data_files(spark, path)]
    assert all(n.startswith("compacted-") for n in names)


def test_compact_files_self_heals_a_crashed_publish(spark, tmp_path):
    """compact_files on a table with a crashed publish must first
    recover (dropping the in-flight state) and then compact exactly
    the original content."""
    path = str(tmp_path / "tbl")
    _table(spark, path)
    want = _content(spark, path)
    _stage_crash(spark, path, n_moved=1, n_deleted=0)
    res = compact_files(spark, path, target_bytes=1 << 30)
    assert res.files_after == 1
    assert _content(spark, path) == want


def test_recover_noop_without_manifest(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _table(spark, path)
    want = _content(spark, path)
    assert recover_compaction(spark, path) == "none"
    assert _content(spark, path) == want
