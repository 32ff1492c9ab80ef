"""Column mapping (`operators/txtable.py`, VERDICT r6 item 4): stable
physical column names per field, so RENAME and DROP are metadata-only
commits — no data file is rewritten, time travel reads each version
under its own logical names, and a dropped-then-re-added column maps
to a FRESH physical column instead of resurrecting the dropped bytes.

Every test checks both semantics (reads under the right names with the
right values) and the metadata-only accounting (add/remove empty, same
physical files before and after)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx


def _df(spark, rows, schema="k int, ts int, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(spark, path, version=None, cols=None):
    df = tx.read_table(spark, path, version)
    cols = cols or sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_rename_is_metadata_only_and_time_travel_reads_old_name(
    spark, tmp_path
):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(1, 1, "a"), (2, 1, "b")]).coalesce(1), p)
    files_before = set(tx.snapshot(p).files)
    v = tx.tx_rename_column(p, "k", "key_id")
    c = tx.read_log(p)[-1]
    assert c.action == "rename-column" and c.add == () and c.remove == ()
    assert set(tx.snapshot(p).files) == files_before  # nothing rewritten
    df = tx.read_table(spark, p)
    assert df.columns == ["key_id", "ts", "v"]
    assert _rows(spark, p, cols=["key_id", "v"]) == [(1, "a"), (2, "b")]
    # time travel BELOW the rename reads the old name
    old = tx.read_table(spark, p, version=v - 1)
    assert old.columns == ["k", "ts", "v"]
    assert sorted((r["k"], r["v"]) for r in old.collect()) == [
        (1, "a"), (2, "b"),
    ]


def test_append_after_rename_keeps_one_physical_mapping(spark, tmp_path):
    """Files written AFTER the rename use the ORIGINAL physical name,
    so one projection serves every era (no per-file schema tracking)."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(1, 1, "a")]).coalesce(1), p)
    tx.tx_rename_column(p, "v", "label")
    tx.tx_append(
        spark.createDataFrame([(2, 1, "b")], "k int, ts int, label string"),
        p,
    )
    assert _rows(spark, p, cols=["k", "label"]) == [(1, "a"), (2, "b")]
    # physical check: BOTH files carry the original column name on disk
    import os

    import pyarrow.parquet as pq

    for f in tx.snapshot(p).files:
        names = pq.ParquetFile(os.path.join(p, f)).schema_arrow.names
        assert "v" in names and "label" not in names, (f, names)


def test_upsert_delete_and_pruning_after_rename(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        _df(spark, [(i, 1, f"r{i}") for i in range(20)]).coalesce(2), p
    )
    tx.tx_rename_column(p, "k", "key_id")
    # MERGE on the new key name
    tx.tx_upsert(
        spark,
        p,
        spark.createDataFrame(
            [(3, 9, "up3"), (100, 1, "new")], "key_id int, ts int, v string"
        ),
        keys=["key_id"],
        order_by=["ts"],
    )
    got = dict(
        (r["key_id"], r["v"]) for r in tx.read_table(spark, p).collect()
    )
    assert got[3] == "up3" and got[100] == "new" and got[7] == "r7"
    # stats pruning fires on the NEW logical name (stats are physical)
    scan, skip = tx.prune_files(p, [("key_id", ">=", 100)])
    assert skip, "rename broke stats pruning"
    # predicate DELETE on the new name, incl. whole-file accounting
    tx.tx_delete(spark, p, [("key_id", ">=", 100)])
    assert 100 not in {
        r["key_id"] for r in tx.read_table(spark, p).collect()
    }


def test_drop_column_and_readd_gets_fresh_physical(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(1, 1, "secret"), (2, 1, "old")]).coalesce(1), p)
    v_drop = tx.tx_drop_column(p, "v")
    df = tx.read_table(spark, p)
    assert df.columns == ["k", "ts"]
    # time travel below the drop still reads it
    assert "v" in tx.read_table(spark, p, version=v_drop - 1).columns
    # re-add the same logical name: must NOT resurrect the old bytes
    tx.tx_append(
        spark.createDataFrame([(3, 1, "new")], "k int, ts int, v string"), p
    )
    rows = {r["k"]: r["v"] for r in tx.read_table(spark, p).collect()}
    assert rows == {1: None, 2: None, 3: "new"}
    # and the retired physical name is recorded
    assert "v" in tx.table_properties(p).get("__retired_phys", [])


def test_rename_round_trips_through_checkpoint_expiry_and_restore(
    spark, tmp_path
):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(1, 1, "a")]).coalesce(1), p)  # v1
    tx.tx_rename_column(p, "v", "label")  # v2
    tx.tx_append(
        spark.createDataFrame([(2, 1, "b")], "k int, ts int, label string"), p
    )  # v3
    tx.write_checkpoint(p)
    tx.expire_log(p, before_version=2)  # v1 readable only via checkpoint
    assert tx.read_table(spark, p, version=2).columns == ["k", "ts", "label"]
    assert _rows(spark, p, cols=["k", "label"]) == [(1, "a"), (2, "b")]
    # restore to the post-rename v2: schema restores EXACTLY (no
    # re-union of dropped/renamed names)
    tx.tx_restore(p, 2)
    assert tx.read_table(spark, p).columns == ["k", "ts", "label"]
    assert _rows(spark, p, cols=["k", "label"]) == [(1, "a")]


def test_rename_races_strictly_both_ways(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(1, 1, "a")]).coalesce(1), p)

    # writer racing a rename: the append loses
    orig = tx._stage_files
    fired = {"done": False}

    def hook(df, path_, schema_json=None):
        out = orig(df, path_, schema_json)
        if not fired["done"]:
            fired["done"] = True
            tx.tx_rename_column(p, "v", "label")
        return out

    monkeypatch.setattr(tx, "_stage_files", hook)
    with pytest.raises(tx.ConcurrentWriteError, match="rename-column"):
        tx.tx_append(_df(spark, [(2, 1, "b")]).coalesce(1), p)
    monkeypatch.undo()
    # rename racing a data commit: the rename loses (strict)
    state = tx._fold_state(p)
    tx.tx_append(
        spark.createDataFrame([(3, 1, "c")], "k int, ts int, label string"), p
    )
    with pytest.raises(tx.ConcurrentWriteError):
        tx.commit(
            p, "rename-column", [], [], state.schema, state.version
        )


def test_mor_delete_and_change_feed_compose_with_rename(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        _df(spark, [(i, 1, f"r{i}") for i in range(10)]).coalesce(1), p
    )
    tx.tx_rename_column(p, "v", "label")
    tx.tx_delete(spark, p, [("k", "<", 2)], merge_on_read=True)
    assert [r["k"] for r in tx.read_table(spark, p).collect()] == list(
        range(2, 10)
    )
    # the feed reads the holed rows under the CURRENT logical names
    rows = tx.commit_change_rows(
        p, tx.table_version(p), ["k"], ["label"]
    )
    assert sorted(rows) == [
        (0, "r0", "delete", 3), (1, "r1", "delete", 3),
    ]
