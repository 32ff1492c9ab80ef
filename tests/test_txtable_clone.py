"""Shallow (zero-copy) and deep CLONE (``txtable.tx_clone``): the
clone's first commit references the source snapshot's data files by
absolute path (no data movement), carries schema/stats/properties,
re-stages inherited deletion vectors with translated names, and gates
the table on the ``absolute-paths`` protocol feature.  After the
clone the tables diverge; rewrites materialize referenced data
locally; the clone's vacuum can never touch source files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx

_SCHEMA = "k int, grp int, amt double"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _rows(a, b):
    return [(i, i % 3, float(i)) for i in range(a, b)]


def _content(spark, p, version=None):
    return sorted(
        tuple(r) for r in tx.read_table(spark, p, version=version).collect()
    )


def _stage_src(spark, tmp_path, n=30):
    src = str(tmp_path / "src")
    tx.tx_append(_df(spark, _rows(0, n)).repartition(3), src)
    return src


def _data_parquets(p):
    out = []
    for root, _dirs, files in os.walk(os.path.join(p, "data")):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return out


def test_shallow_clone_is_zero_copy_and_value_identical(spark, tmp_path):
    src = _stage_src(spark, tmp_path)
    dst = str(tmp_path / "dst")
    v = tx.tx_clone(spark, src, dst)
    assert v == 1
    assert _content(spark, dst) == _content(spark, src)
    # zero-copy: no data parquet staged under the clone
    assert _data_parquets(dst) == []
    # every referenced file is absolute and points into the source
    snap = tx.snapshot(dst)
    assert all(os.path.isabs(f) and f.startswith(os.path.abspath(src))
               for f in snap.files)
    assert "absolute-paths" in (snap and tx.table_protocol(dst))["min_reader_features"]


def test_clone_at_version_time_travels(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=10)
    tx.tx_append(_df(spark, _rows(100, 105)), src)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst, version=1)
    assert _content(spark, dst) == _content(spark, src, version=1)


def test_clone_refuses_existing_destination(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=5)
    dst = str(tmp_path / "dst")
    tx.tx_append(_df(spark, _rows(0, 2)), dst)
    with pytest.raises(ValueError, match="already has commits"):
        tx.tx_clone(spark, src, dst)


def test_clone_diverges_both_ways(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=10)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    tx.tx_append(_df(spark, _rows(500, 503)), dst)
    tx.tx_delete(spark, dst, [("k", "=", 1)])
    tx.tx_append(_df(spark, _rows(900, 901)), src)
    assert _content(spark, src) == sorted(_rows(0, 10) + _rows(900, 901))
    assert _content(spark, dst) == sorted(
        [r for r in _rows(0, 10) if r[0] != 1] + _rows(500, 503)
    )


def test_clone_inherits_deletion_vectors(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=20)
    tx.tx_delete(spark, src, [("k", "in", (3, 7, 11))], merge_on_read=True)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    got = _content(spark, dst)
    assert got == [r for r in _rows(0, 20) if r[0] not in (3, 7, 11)]
    # the DV sidecar was re-staged locally with absolute file names
    snap = tx.snapshot(dst)
    assert snap.dvs and all(os.path.isabs(f) for f in snap.dvs)
    assert all(not os.path.isabs(s) for s in snap.dvs.values())


def test_mor_delete_on_cloned_file_uses_absolute_tags(spark, tmp_path):
    # a MOR delete on the CLONE punches a DV into a file it references
    # absolutely — the snapshot-name row tag must round-trip
    src = _stage_src(spark, tmp_path, n=20)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    tx.tx_delete(spark, dst, [("k", "in", (2, 15))], merge_on_read=True)
    assert _content(spark, dst) == [
        r for r in _rows(0, 20) if r[0] not in (2, 15)
    ]
    assert _content(spark, src) == _rows(0, 20)  # source untouched
    # and a second MOR pass stays cumulative
    tx.tx_delete(spark, dst, [("k", "=", 4)], merge_on_read=True)
    assert _content(spark, dst) == [
        r for r in _rows(0, 20) if r[0] not in (2, 4, 15)
    ]


def test_mor_update_on_clone(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=12)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    tx.tx_update(
        spark, dst, set={"amt": "amt + 100"}, where=[("grp", "=", 1)],
        merge_on_read=True,
    )
    assert _content(spark, dst) == sorted(
        (i, i % 3, float(i) + (100 if i % 3 == 1 else 0))
        for i in range(12)
    )
    assert _content(spark, src) == _rows(0, 12)


def test_clone_vacuum_never_deletes_source_files(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=10)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    # rewrite everything on the clone so the source refs go dead there
    tx.tx_update(spark, dst, set={"amt": "amt * 2"})
    deleted = tx.vacuum(dst, retain_versions=1, min_age_seconds=0.0, spark=spark)
    src_parquets = set(_data_parquets(src))
    assert src_parquets  # source data intact on disk
    assert _content(spark, src) == _rows(0, 10)
    assert all(not d.startswith(os.path.abspath(src)) for d in deleted or [])


def test_compact_materializes_clone_locally(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=30)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    v = tx.tx_compact(spark, dst, small_file_bytes=1 << 40)
    assert v is not None
    snap = tx.snapshot(dst)
    assert all(not os.path.isabs(f) for f in snap.files)
    assert _content(spark, dst) == _rows(0, 30)


def test_deep_clone_copies_data(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=10)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst, shallow=False)
    assert _content(spark, dst) == _content(spark, src)
    snap = tx.snapshot(dst)
    assert all(not os.path.isabs(f) for f in snap.files)
    assert _data_parquets(dst)


def test_clone_feed_emits_full_insert_set(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=8)
    tx.tx_delete(spark, src, [("k", "=", 2)], merge_on_read=True)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    rows = tx.commit_change_rows(dst, 1, ["k"], ["amt"])
    assert {r[-2] for r in rows} == {"insert"}
    assert sorted(r[0] for r in rows) == [i for i in range(8) if i != 2]


def test_clone_carries_stats_and_prunes(spark, tmp_path):
    src = str(tmp_path / "src")
    tx.tx_append(_df(spark, _rows(0, 10)).coalesce(1), src)
    tx.tx_append(_df(spark, _rows(100, 110)).coalesce(1), src)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    scan, skip = tx.prune_files(dst, [("k", "<", 50)])
    assert len(scan) == 1 and len(skip) == 1


def test_old_build_refuses_clone_table_by_name(spark, tmp_path, monkeypatch):
    src = _stage_src(spark, tmp_path, n=5)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    tx.invalidate_fold_memo(dst)
    monkeypatch.setattr(
        tx, "SUPPORTED_READER_FEATURES",
        frozenset({"deletion-vectors", "column-mapping",
                   "parquet-checkpoint"}),
    )
    with pytest.raises(tx.ProtocolUnsupportedError, match="absolute-paths"):
        tx.read_table(spark, dst)


def test_clone_of_a_clone_preserves_inherited_dvs(spark, tmp_path):
    # B's DVs name A's files ABSOLUTELY; cloning B->C must not prefix
    # those names again (a corrupted name would miss the anti-join and
    # resurrect deleted rows)
    a = _stage_src(spark, tmp_path, n=12)
    b = str(tmp_path / "b")
    tx.tx_clone(spark, a, b)
    tx.tx_delete(spark, b, [("k", "in", (2, 9))], merge_on_read=True)
    c = str(tmp_path / "c")
    tx.tx_clone(spark, b, c)
    assert _content(spark, c) == [
        r for r in _rows(0, 12) if r[0] not in (2, 9)
    ]
    # and C's own MOR delete stays cumulative over the inherited DV
    tx.tx_delete(spark, c, [("k", "=", 4)], merge_on_read=True)
    assert _content(spark, c) == [
        r for r in _rows(0, 12) if r[0] not in (2, 4, 9)
    ]


def test_merge_on_fresh_shallow_clone(spark, tmp_path):
    # ADVICE r10 (medium): the key-probe writers used to relativize
    # EVERY probe path via rsplit('/data/'), producing names not in
    # snap.files for a clone's external refs — merge/upsert/
    # delete_keys on a fresh shallow clone always failed.  The probe
    # now applies _read_files' own-prefix rule (_probe_rel).
    src = _stage_src(spark, tmp_path, n=12)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    source = _df(spark, [(2, 99, 200.0), (50, 99, 500.0)])
    tx.tx_merge(
        spark, dst, source, on=["k"],
        when_matched_update="all", when_not_matched_insert=True,
    )
    assert _content(spark, dst) == sorted(
        [r for r in _rows(0, 12) if r[0] != 2]
        + [(2, 99, 200.0), (50, 99, 500.0)]
    )
    assert _content(spark, src) == _rows(0, 12)  # source untouched


def test_merge_mor_on_fresh_shallow_clone(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=12)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    source = _df(spark, [(3, 99, 300.0)])
    tx.tx_merge(
        spark, dst, source, on=["k"],
        when_matched_update="all", when_not_matched_insert=True,
        merge_on_read=True,
    )
    assert _content(spark, dst) == sorted(
        [r for r in _rows(0, 12) if r[0] != 3] + [(3, 99, 300.0)]
    )


def test_upsert_on_fresh_shallow_clone(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=10)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    changes = _df(spark, [(4, 99, 400.0), (77, 99, 770.0)])
    tx.tx_upsert(spark, dst, changes, keys=["k"], order_by=["amt"])
    assert _content(spark, dst) == sorted(
        [r for r in _rows(0, 10) if r[0] != 4]
        + [(4, 99, 400.0), (77, 99, 770.0)]
    )
    assert _content(spark, src) == _rows(0, 10)


def test_delete_keys_on_fresh_shallow_clone(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=10)
    dst = str(tmp_path / "dst")
    tx.tx_clone(spark, src, dst)
    keys_df = spark.createDataFrame([(1,), (8,)], "k int")
    tx.tx_delete_keys(spark, dst, keys_df, ["k"])
    assert _content(spark, dst) == [
        r for r in _rows(0, 10) if r[0] not in (1, 8)
    ]
    assert _content(spark, src) == _rows(0, 10)


def test_vacuum_dry_run_commits_nothing(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=6)
    tx.tx_update(spark, src, set={"amt": "amt * 2"})
    before_log = tx.read_log(src)
    would = tx.vacuum(src, retain_versions=1, min_age_seconds=0.0,
                      dry_run=True, spark=spark)
    after_log = tx.read_log(src)
    assert [c.version for c in after_log] == [c.version for c in before_log]
    assert would  # the rewritten originals are reclaimable
    assert all(os.path.exists(os.path.join(src, f)) for f in would)
