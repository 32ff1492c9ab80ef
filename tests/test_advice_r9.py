"""Regression tests for the four round-8 ADVICE findings (one group
per finding, in severity order):

1. (medium) ``_FOLD_MEMO`` was never invalidated: a table deleted and
   recreated at the same path in-process served a STALE memoized
   prior-state to ``commit_change_rows`` and silently emitted wrong
   change-feed rows; the cache also evicted FIFO (docstring claimed
   LRU) and was unsynchronized.  Fix: the key carries the version's
   commit identity (txn uuid — a recreated log mints fresh ones), hits
   move to the back of the eviction order (true LRU), the cache is
   lock-guarded, and ``invalidate_fold_memo`` is exposed.
2. (low) ``checkpoint_files_df`` read the parquet inventory with
   ``spark.read.parquet`` straight from the filesystem even when the
   table's log store is NOT posix-backed (InMemoryLogStore) — the
   object exists only in the store and the read failed.  Fix: stores
   declare ``spark_visible``; invisible ones materialize through
   ``read_bytes``.
3. (low) the feed's unknown-column gate rejected columns absent from
   the CURRENT schema even when the requested commit's files
   physically contain them (column dropped after the feed started).
   Fix: columns also resolve against the schema logged at the
   requested version.
4. (low) ``tx_compact(zorder_by=...)`` on a non-numeric column with no
   numeric stats fell through to the aggregate fallback and raised a
   raw TypeError from ``float(hi - lo)``.  Fix: typed ValueError
   naming the column and its logged type, raised up front.
"""

from __future__ import annotations

import pytest

from event_streaming_toy_example_spark.operators import txtable as tx
from event_streaming_toy_example_spark.operators.logstore import (
    InMemoryLogStore,
    register_log_store,
    unregister_log_store,
)


def _df(spark, rows, schema="k int, ts int, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(n, v="r"):
    return [(i, 1, f"{v}{i}") for i in range(n)]


# ------------------------------------------------------------------ 1


def test_fold_memo_recreated_table_never_serves_stale_state(
    spark, tmp_path
):
    """Delete-and-recreate at the same path: the feed of the NEW
    table's v2 must diff against the NEW v1 (keys 100..102), not the
    cached fold of the old table's v1 (keys 0..2)."""
    import shutil

    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(3)).coalesce(1), p)
    tx.tx_upsert(spark, p, _df(spark, [(0, 2, "x0")]).coalesce(1), ["k"], ["ts"])
    # warm the memo with the OLD table's fold at version 1
    assert tx.commit_change_rows(p, 2, ["k"], ["v"])
    shutil.rmtree(p)
    rows2 = [(100 + i, 1, f"n{i}") for i in range(3)]
    tx.tx_append(_df(spark, rows2).coalesce(1), p)
    tx.tx_delete(spark, p, [("k", "=", 101)], merge_on_read=True)
    changes = tx.commit_change_rows(p, 2, ["k"], ["v"])
    assert changes == [(101, "n1", "delete", 2)]


def test_fold_memo_is_true_lru_and_invalidate_hook_drops_path(
    spark, tmp_path
):
    """A hit must move its key to the BACK of the eviction order, and
    ``invalidate_fold_memo(path)`` must drop exactly that path."""
    tx.invalidate_fold_memo()
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(4)).coalesce(1), p)
    tx.tx_upsert(spark, p, _df(spark, [(0, 2, "x")]).coalesce(1), ["k"], ["ts"])
    # round 10: every write's post-commit maintenance look also goes
    # through the memo, so (p, 2) is present alongside the feed's
    # prior-state fold (p, 1)
    tx.commit_change_rows(p, 2, ["k"], ["v"])  # miss → insert at v1
    keys = list(tx._FOLD_MEMO)
    assert (p, 1) in {(k[0], k[1]) for k in keys}
    k1 = next(k for k in keys if k[0] == p and k[1] == 1)
    ident = k1[2]
    assert isinstance(ident, str) and ident  # commit identity in key
    # fill with another path's entries, then HIT p's v1 entry: it must
    # move to the very back of the eviction order
    q = str(tmp_path / "u")
    tx.tx_append(_df(spark, _rows(2)).coalesce(1), q)
    tx.tx_upsert(spark, q, _df(spark, [(0, 2, "y")]).coalesce(1), ["k"], ["ts"])
    tx.commit_change_rows(q, 2, ["k"], ["v"])
    tx.commit_change_rows(p, 2, ["k"], ["v"])  # hit on (p, 1)
    order = list(tx._FOLD_MEMO)
    assert order[-1][:2] == (p, 1), "hit did not move to the back (not LRU)"
    tx.invalidate_fold_memo(p)
    assert {k[0] for k in tx._FOLD_MEMO} == {q}
    tx.invalidate_fold_memo()
    assert not tx._FOLD_MEMO


# ------------------------------------------------------------------ 2


def test_checkpoint_files_df_reads_through_a_non_posix_store(
    spark, tmp_path
):
    """On an InMemoryLogStore the parquet inventory exists ONLY in the
    store; checkpoint_files_df must materialize through read_bytes
    instead of handing Spark a path that does not exist on disk."""
    import os

    p = str(tmp_path / "t")
    store = InMemoryLogStore()
    register_log_store(p, store)
    try:
        # new tables carry the parquet-checkpoint reader feature from
        # commit 1, so write_checkpoint emits the columnar inventory
        tx.tx_append(_df(spark, _rows(5)).coalesce(1), p)
        v = tx.write_checkpoint(p)
        assert v is not None
        fp = tx._checkpoint_files_path(p, v)
        assert store.exists(fp) and not os.path.exists(fp)
        assert not store.spark_visible
        inv = tx.checkpoint_files_df(spark, p)
        assert inv.count() == 1  # one coalesced data file
        assert set(inv.columns) == {"file", "stats", "dv"}
    finally:
        unregister_log_store(p)


# ------------------------------------------------------------------ 3


def test_feed_reads_a_column_dropped_after_the_feed_started(
    spark, tmp_path
):
    """v2's files physically carry ``v``; dropping ``v`` at v3 must not
    make commit_change_rows(v2) unreadable — the column resolves via
    the schema logged at v2 and returns the real bytes."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(3)).coalesce(1), p)
    v2 = tx.tx_upsert(
        spark, p, _df(spark, [(1, 2, "new1")]).coalesce(1), ["k"], ["ts"]
    )
    tx.tx_drop_column(p, "v")
    changes = tx.commit_change_rows(p, v2, ["k"], ["v"])
    assert ("update" in {c[-2] for c in changes}) or changes
    upd = [c for c in changes if c[0] == 1]
    assert upd and upd[0][1] == "new1"


def test_feed_still_rejects_a_never_existed_column(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(3)).coalesce(1), p)
    tx.tx_upsert(spark, p, _df(spark, [(1, 2, "x")]).coalesce(1), ["k"], ["ts"])
    with pytest.raises(ValueError, match="nope"):
        tx.commit_change_rows(p, 2, ["k"], ["nope"])


# ------------------------------------------------------------------ 4


def test_zorder_on_unsupported_column_raises_typed_error(
    spark, tmp_path
):
    """Round 11 lifted the NUMERIC-only gate (string/date/timestamp
    keys now rescale monotonically), so the typed rejection moves to
    the genuinely unorderable-by-rescale types — a boolean key still
    refuses BY NAME before any arithmetic."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(8)], "k long, flag boolean"
    )
    tx.tx_append(df.repartition(4), p)
    with pytest.raises(ValueError, match="'flag' has type 'boolean'"):
        tx.tx_compact(spark, p, zorder_by=("k", "flag"))


def test_zorder_on_string_column_clusters_and_prunes(spark, tmp_path):
    """The round-11 string key: first-6-byte big-endian rescale —
    after OPTIMIZE ZORDER BY (name, k), range predicates on BOTH the
    string and the numeric axis prune files."""
    import os
    import random

    p = str(tmp_path / "t")
    rnd = random.Random(7)
    names = [f"{c}{i:03d}" for c in "abcdefgh" for i in range(200)]
    rnd.shuffle(names)
    df = spark.createDataFrame(
        [(n, i) for i, n in enumerate(names)], "name string, k long"
    )
    tx.tx_append(df.repartition(8), p)
    scan0, _ = tx.prune_files(p, [("name", "<", "b")])
    assert len(scan0) == len(tx.snapshot(p).files)
    total = sum(
        tx.get_data_store(p).size(os.path.join(p, f))
        for f in tx.snapshot(p).files
    )
    assert tx.tx_compact(
        spark, p, target_bytes=max(1, total // 16),
        zorder_by=("name", "k"),
    ) is not None
    n = len(tx.snapshot(p).files)
    _, skip_s = tx.prune_files(p, [("name", "<", "b")])
    _, skip_k = tx.prune_files(p, [("k", "<", len(names) // 8)])
    assert len(skip_s) >= n // 2, (len(skip_s), n)
    assert len(skip_k) >= n // 2, (len(skip_k), n)
    assert tx.read_table(spark, p).count() == len(names)


def test_zorder_on_date_column_clusters_and_prunes(spark, tmp_path):
    import datetime
    import os

    p = str(tmp_path / "t")
    d0 = datetime.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(d0 + datetime.timedelta(days=i % 365), i) for i in range(2000)],
        "d date, k long",
    )
    tx.tx_append(df.repartition(6), p)
    total = sum(
        tx.get_data_store(p).size(os.path.join(p, f))
        for f in tx.snapshot(p).files
    )
    assert tx.tx_compact(
        spark, p, target_bytes=max(1, total // 16), zorder_by=("d", "k")
    ) is not None
    n = len(tx.snapshot(p).files)
    _, skip_d = tx.prune_files(p, [("d", "<", "2024-02-01")])
    assert len(skip_d) >= n // 2, (len(skip_d), n)
    assert tx.read_table(spark, p).count() == 2000


def test_zorder_on_missing_column_still_raises_by_name(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(8)).repartition(4), p)
    with pytest.raises(ValueError, match="'ghost' not in the table"):
        tx.tx_compact(spark, p, zorder_by=("k", "ghost"))
