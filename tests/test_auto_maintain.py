"""Auto-maintenance policy (``tx_set_maintenance`` +
``maybe_auto_maintain``, VERDICT r9 item 4): a declared small-file
trigger fires exactly one sized compaction after the commit that
crosses the threshold, content-invariant, with bloom filters rebuilt
for the rewritten files; no policy → no behavior change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx

_SCHEMA = "k int, grp int, amt double"


def _row_batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(lo, hi)], _SCHEMA
    ).coalesce(1)


def _actions(p):
    return [c.action for c in tx.read_log(p)]


def test_trigger_fires_exactly_once_and_is_content_invariant(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 5), p)
    tx.tx_set_maintenance(p, small_file_bytes=1 << 20, small_file_count=6)
    # merge-apply shaped workload: M small commits
    for i in range(1, 9):
        tx.tx_merge(
            spark, p, _row_batch(spark, i * 100, i * 100 + 5),
            on=["k"], when_not_matched_insert=True,
        )
    acts = _actions(p)
    assert acts.count("compact") == 1, acts
    # the compaction fired at the first commit that crossed 6 small
    # files and bounded the count; rows are exactly the merged set
    assert len(tx.snapshot(p).files) <= 7
    got = sorted(r["k"] for r in tx.read_table(spark, p).collect())
    want = sorted(
        list(range(5))
        + [i * 100 + j for i in range(1, 9) for j in range(5)]
    )
    assert got == want


def test_no_policy_no_compaction(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(8):
        tx.tx_append(_row_batch(spark, i * 10, i * 10 + 3), p)
    assert "compact" not in _actions(p)
    assert len(tx.snapshot(p).files) == 8


def test_policy_survives_and_retriggers_on_reaccumulation(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 3), p)
    tx.tx_set_maintenance(p, small_file_bytes=1 << 20, small_file_count=4)
    for i in range(1, 6):
        tx.tx_append(_row_batch(spark, i * 10, i * 10 + 3), p)
    assert _actions(p).count("compact") == 1
    # accumulate again: the policy keeps watching
    for i in range(6, 12):
        tx.tx_append(_row_batch(spark, i * 10, i * 10 + 3), p)
    assert _actions(p).count("compact") == 2
    assert len(tx.snapshot(p).files) <= 5


def test_auto_compaction_rebuilds_blooms(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 3), p)
    tx.tx_set_bloom_filters(p, ["k"])
    tx.tx_set_maintenance(p, small_file_bytes=1 << 20, small_file_count=3)
    for i in range(1, 6):
        tx.tx_append(_row_batch(spark, i * 10, i * 10 + 3), p)
    assert "compact" in _actions(p)
    snap = tx.snapshot(p)
    # every live file (all written or rewritten post-declaration)
    # carries a bloom on k, so an absent key prunes everything
    scan, _skip = tx.prune_files(p, [("k", "=", 987654)])
    assert scan == []


def test_policy_validation(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 2), p)
    with pytest.raises(ValueError, match="positive"):
        tx.tx_set_maintenance(p, small_file_bytes=0)
    with pytest.raises(ValueError, match="no commits"):
        tx.tx_set_maintenance(str(tmp_path / "nope"))


def test_big_files_do_not_trigger(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 3), p)
    # threshold below any real parquet file: nothing is "small"
    tx.tx_set_maintenance(p, small_file_bytes=16, small_file_count=2)
    for i in range(1, 6):
        tx.tx_append(_row_batch(spark, i * 10, i * 10 + 3), p)
    assert "compact" not in _actions(p)


# ------------------------- round 11: auto-vacuum + async maintenance


def test_auto_vacuum_fires_once_after_compaction(spark, tmp_path):
    """With vacuum in the policy, the compacted victims' bytes are
    physically deleted in the same maintenance cycle (min age 0 so the
    test's fresh files qualify) — and NO further vacuum walk happens
    on later trigger-free commits."""
    import os

    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 5), p)
    tx.tx_set_maintenance(
        p, small_file_bytes=1 << 20, small_file_count=6,
        vacuum_retain_versions=1, vacuum_min_age_seconds=0.0,
    )
    for i in range(1, 9):
        tx.tx_append(_row_batch(spark, i * 100, i * 100 + 5), p)
    acts = _actions(p)
    assert acts.count("compact") == 1, acts
    # every live data file exists; nothing unreferenced survives
    snap = tx.snapshot(p)
    live = set(snap.files) | set((snap.dvs or {}).values())
    store = tx.get_data_store(p)
    on_disk = {
        f"data/{name}"
        for name in store.list_files(os.path.join(p, "data"))
        # Spark's hidden .crc sidecars ride with their visible files
        # and are not part of vacuum's contract
        if not os.path.basename(name).startswith(".")
    }
    assert set(snap.files) <= on_disk
    assert on_disk == live, (sorted(on_disk - live))
    got = sorted(r["k"] for r in tx.read_table(spark, p).collect())
    assert len(got) == 5 + 8 * 5


def test_async_mode_never_blocks_the_writer(spark, tmp_path):
    """Structural proof the writer never runs the rewrite inline: the
    compaction is GATED on an event the test only opens after the
    write loop finishes — a sync hook would stall the triggering
    append on the gate, an async one sails through with the rewrite
    parked on the background worker.  drain_maintenance() then
    observes exactly one landed compaction, content-invariant."""
    import threading
    import unittest.mock as mock

    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 5), p)
    tx.tx_set_maintenance(
        p, small_file_bytes=1 << 20, small_file_count=6, mode="async"
    )
    real_compact = tx.tx_compact
    gate = threading.Event()

    def gated_compact(*a, **kw):
        assert gate.wait(timeout=120), "gate never opened"
        return real_compact(*a, **kw)

    with mock.patch.object(tx, "tx_compact", side_effect=gated_compact):
        for i in range(1, 9):
            tx.tx_append(_row_batch(spark, i * 100, i * 100 + 5), p)
        # the gate is still closed: had ANY append run its maintenance
        # cycle inline, it would be parked on the gate right now —
        # instead the loop completed and no compaction has landed
        assert "compact" not in _actions(p)
        gate.set()
        n = tx.drain_maintenance()
    assert n >= 1
    acts = _actions(p)
    assert acts.count("compact") == 1, acts
    got = sorted(r["k"] for r in tx.read_table(spark, p).collect())
    want = sorted(
        list(range(5))
        + [i * 100 + j for i in range(1, 9) for j in range(5)]
    )
    assert got == want


def test_async_cycle_failures_surface_in_drain(spark, tmp_path):
    import unittest.mock as mock

    import pytest as _pytest

    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 5), p)
    tx.tx_set_maintenance(
        p, small_file_bytes=1 << 20, small_file_count=2, mode="async"
    )
    with mock.patch.object(
        tx, "tx_compact", side_effect=RuntimeError("boom")
    ):
        for i in range(1, 4):
            tx.tx_append(_row_batch(spark, i * 100, i * 100 + 5), p)
        with _pytest.raises(RuntimeError, match="boom"):
            tx.drain_maintenance()
    tx.drain_maintenance()  # leftover cycles may also fail; clear them


def test_maintenance_mode_validation(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_row_batch(spark, 0, 3), p)
    with pytest.raises(ValueError, match="mode must be"):
        tx.tx_set_maintenance(p, mode="background")
    with pytest.raises(ValueError, match="vacuum_retain_versions"):
        tx.tx_set_maintenance(p, vacuum_retain_versions=0)
