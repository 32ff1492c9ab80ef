"""Columnar (parquet) checkpoints (VERDICT r7 item 3): a checkpoint's
file inventory — the only part that scales with the table — is a
parquet object, not a field inside a driver-parsed JSON blob.  The
JSON keeps the O(1) scalar state plus the ``files_in`` pointer;
:func:`txtable.checkpoint_files_df` reads the inventory as a
DataFrame (the distributed cold-read surface for a million-file
table).  Pre-protocol tables keep the inline format — their readers
were never gated on the ``parquet-checkpoint`` feature.
"""

from __future__ import annotations

import json
import time

import pytest

from event_streaming_toy_example_spark.operators import txtable as tx
from event_streaming_toy_example_spark.operators.logstore import (
    get_log_store,
)


def _df(spark, rows, schema="k int, ts int, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(n, base=0):
    return [(base + i, 1, f"r{base + i}") for i in range(n)]


def test_checkpoint_is_columnar_and_round_trips(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(10)).coalesce(1), p)
    tx.tx_delete(spark, p, [("k", "<", 2)], merge_on_read=True)
    tx.tx_append(_df(spark, _rows(5, base=100)).coalesce(1), p)
    v = tx.write_checkpoint(p)
    store = get_log_store(p)
    # the JSON is scalar-only; the inventory lives in the parquet
    cp_raw = json.loads(store.read_bytes(tx._checkpoint_path(p, v)))
    assert "files" not in cp_raw and "dvs" not in cp_raw
    assert cp_raw["files_in"].endswith(".checkpoint.parquet")
    assert cp_raw["n_files"] == 2
    # the DataFrame surface: one row per live file, DV column set for
    # the holed file
    inv = tx.checkpoint_files_df(spark, p, v)
    assert inv.count() == 2
    assert inv.where("dv is not null").count() == 1
    assert inv.where("stats is not null").count() == 2
    # and the FOLD reads the same state back: drop the subsumed
    # commits, the table must still resolve bit-identically
    before = sorted(tuple(r) for r in tx.read_table(spark, p).collect())
    tx.expire_log(p, before_version=v)
    after = sorted(tuple(r) for r in tx.read_table(spark, p).collect())
    assert after == before
    assert tx.snapshot(p).dvs, "the DV mapping survived the checkpoint"


def test_checkpoint_composes_with_restore_feed_and_expiry(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(10)).coalesce(1), p)
    tx.tx_upsert(spark, p, _df(spark, [(3, 5, "u3")]), ["k"], ["ts"])
    tx.tx_delete(spark, p, [("k", "=", 7)])
    tx.write_checkpoint(p)
    tx.tx_restore(p, 1)
    assert tx.read_table(spark, p).count() == 10
    # feed reads through checkpointed history; AS-OF still resolves
    assert tx.commit_change_rows(p, 3, ["k"], ["v"]) == [
        (7, "r7", "delete", 3)
    ]
    assert tx.version_as_of(p, time.time() + 60) == tx.table_version(p)
    # expiry drops the parquet sibling together with its JSON
    tx.write_checkpoint(p)
    v = tx.table_version(p)
    tx.expire_log(p, before_version=v)
    store = get_log_store(p)
    for old_v in range(1, v):
        assert not store.exists(tx._checkpoint_files_path(p, old_v))
    assert store.exists(tx._checkpoint_files_path(p, v))


def test_pre_protocol_tables_keep_inline_checkpoints(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(5)).coalesce(1), p)
    # strip the protocol from the create commit (an old-build table)
    store = get_log_store(p)
    cp_path = tx._commit_path(p, 1)
    body = json.loads(store.read_bytes(cp_path))
    body.pop("protocol", None)
    store.delete(cp_path)
    assert store.put_if_absent(cp_path, json.dumps(body).encode())
    v = tx.write_checkpoint(p)
    cp_raw = json.loads(store.read_bytes(tx._checkpoint_path(p, v)))
    assert "files" in cp_raw and "files_in" not in cp_raw
    with pytest.raises(ValueError, match="no columnar checkpoint"):
        tx.checkpoint_files_df(spark, p)
    # and the inline checkpoint still folds
    tx.expire_log(p, before_version=v)
    assert tx.read_table(spark, p).count() == 5


def test_checkpoint_scaling_probe_inventory_parse_stays_flat(tmp_path):
    """The scaling claim, pinned: fold-from-checkpoint cost per file
    entry must not grow between a 1k-file and a 20k-file inventory
    (columnar parse is O(n) with a small constant — the old JSON blob
    was too, but at 20x the constant; the REAL win is the DataFrame
    surface, asserted above).  Uses raw commits — no Spark jobs."""
    schema = json.dumps({"type": "struct", "fields": []})
    times = {}
    for n in (1_000, 20_000):
        p = str(tmp_path / f"t{n}")
        files = [f"data/s-x/f{i}.parquet" for i in range(n)]
        tx.commit(p, "append", files, [], schema, 0)
        v = tx.write_checkpoint(p)
        t0 = time.perf_counter()
        state = tx._fold_state(p, v)
        times[n] = time.perf_counter() - t0
        assert len(state.files) == n
    per_entry_small = times[1_000] / 1_000
    per_entry_big = times[20_000] / 20_000
    assert per_entry_big <= per_entry_small * 3, times


# ------------------------------------------- multi-part inventory (r9)


def test_large_inventory_checkpoints_in_bounded_parts(spark, tmp_path):
    """VERDICT r8 item 3: above _CHECKPOINT_PART_ROWS entries the
    inventory splits into independently-serialized parquet parts — the
    write's peak driver allocation is ONE part, never the whole
    million-file table.  Round-trip, DataFrame read, and expiry must
    treat the parts exactly like the single-part form."""
    import tracemalloc

    schema = json.dumps({"type": "struct", "fields": []})
    p = str(tmp_path / "t")
    n = 250_000  # 3 parts at the 100k part size
    files = [f"data/s-x/f{i}.parquet" for i in range(n)]
    tx.commit(p, "append", files, [], schema, 0)

    tracemalloc.start()
    v = tx.write_checkpoint(p)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    store = get_log_store(p)
    cp_raw = json.loads(store.read_bytes(tx._checkpoint_path(p, v)))
    parts = cp_raw["files_parts"]
    assert len(parts) == 3 and "files_in" not in cp_raw
    assert cp_raw["n_files"] == n
    for rel in parts:
        assert store.exists(f"{p}/{rel}"), rel
    # bounded-write claim: peak python allocation during the write is
    # part-scale, not inventory-scale (one part ~ 100k * ~60B names;
    # 32 MB would fit the FULL inventory twice — the single-buffer
    # write peaked far above this)
    assert peak < 64 * 1024 * 1024, peak

    # fold round-trips all entries through the parts
    tx.expire_log(p, before_version=v)
    state = tx._fold_state(p, v)
    assert len(state.files) == n

    # the DataFrame surface reads ALL parts
    inv = tx.checkpoint_files_df(spark, p, v)
    assert inv.count() == n


def test_expiry_deletes_every_part_of_an_old_checkpoint(tmp_path):
    schema = json.dumps({"type": "struct", "fields": []})
    p = str(tmp_path / "t")
    files = [f"data/s-x/f{i}.parquet" for i in range(120_000)]
    tx.commit(p, "append", files, [], schema, 0)
    v1 = tx.write_checkpoint(p)  # 2 parts
    tx.commit(p, "append", ["data/s-y/g.parquet"], [], schema, 1)
    v2 = tx.write_checkpoint(p)
    store = get_log_store(p)
    old_parts = json.loads(
        store.read_bytes(tx._checkpoint_path(p, v1))
    )["files_parts"]
    deleted = tx.expire_log(p, before_version=v2)
    for rel in old_parts:
        assert not store.exists(f"{p}/{rel}"), rel
    assert any(".checkpoint." in d and d.endswith(".parquet") for d in deleted)
    # the newer checkpoint's parts survive and still resolve
    assert len(tx._fold_state(p, v2).files) == 120_001
