"""Protocol / feature gates in the transaction log (VERDICT r7 item
2): commits record ``min_reader_features`` / ``min_writer_features``,
the commit that FIRST uses a feature upgrades the requirement in the
same commit, and every read or write path refuses — typed and by name
(:class:`ProtocolUnsupportedError`) — a table demanding a feature this
build does not implement.  Without the gate, a pre-deletion-vectors
reader would silently RESURRECT deleted rows from a merge-on-read
table; Delta/Iceberg version exactly this (Delta PROTOCOL actions,
``delta-io/delta`` PROTOCOL.md).
"""

from __future__ import annotations

import json

import pytest

from event_streaming_toy_example_spark.operators import txtable as tx
from event_streaming_toy_example_spark.operators.logstore import (
    get_log_store,
)


def _df(spark, rows, schema="k int, ts int, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(n):
    return [(i, 1, f"r{i}") for i in range(n)]


def _inject_future_feature(path: str, feature: str) -> int:
    """Append a crafted commit requiring an unknown feature — what a
    NEWER engine would write after using it."""
    store = get_log_store(path)
    v = tx.table_version(path) + 1
    schema = tx.snapshot(path).schema
    body = {
        "version": v,
        "action": "append",
        "add": [],
        "remove": [],
        "schema": schema,
        "read_version": v - 1,
        "txn": "f" * 32,
        "ts": None,
        "protocol": {
            "min_reader_features": [feature],
            "min_writer_features": [feature],
        },
    }
    assert store.put_if_absent(
        tx._commit_path(path, v), json.dumps(body).encode()
    )
    return v


def test_create_records_baseline_protocol(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(5)), p)
    c = tx.read_log(p)[0]
    assert c.protocol == {
        "min_reader_features": ["parquet-checkpoint"],
        "min_writer_features": ["parquet-checkpoint"],
    }
    assert tx.table_protocol(p) == c.protocol


def test_first_dv_commit_upgrades_protocol_in_the_same_commit(
    spark, tmp_path
):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(10)).coalesce(1), p)
    tx.tx_delete(spark, p, [("k", "<", 2)], merge_on_read=True)
    c = tx.read_log(p)[-1]
    assert c.dv, "precondition: a MOR delete commits a DV"
    assert "deletion-vectors" in c.protocol["min_reader_features"]
    # a later feature-free commit does NOT rewrite the protocol (the
    # requirement is already recorded; features never shrink)
    tx.tx_append(_df(spark, [(100, 1, "x")]), p)
    assert tx.read_log(p)[-1].protocol is None
    assert "deletion-vectors" in tx.table_protocol(p)["min_reader_features"]


def test_first_rename_upgrades_to_column_mapping(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(5)), p)
    tx.tx_rename_column(p, "v", "val")
    assert (
        "column-mapping"
        in tx.read_log(p)[-1].protocol["min_reader_features"]
    )


def test_future_feature_gates_reads_and_writes_by_name(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(5)).coalesce(1), p)
    _inject_future_feature(p, "time-crystals")
    with pytest.raises(
        tx.ProtocolUnsupportedError, match="time-crystals"
    ):
        tx.snapshot(p)
    with pytest.raises(
        tx.ProtocolUnsupportedError, match="time-crystals"
    ):
        tx.read_table(spark, p)
    with pytest.raises(
        tx.ProtocolUnsupportedError, match="time-crystals"
    ):
        tx.tx_append(_df(spark, [(9, 1, "z")]), p)
    # the raw-commit path (commit()) is gated too
    with pytest.raises(tx.ProtocolUnsupportedError, match="time-crystals"):
        tx.commit(p, "append", [], [], tx._current_schema(p), 2)
    # and the change feed's per-commit read
    with pytest.raises(tx.ProtocolUnsupportedError, match="time-crystals"):
        tx.commit_change_rows(p, tx.table_version(p), ["k"], ["v"])


def test_gate_survives_checkpoint_and_expiry(spark, tmp_path):
    """The requirement must not evaporate when the commit that recorded
    it is expired into a checkpoint."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(10)).coalesce(1), p)
    v = _inject_future_feature(p, "quantum-stats")
    # a checkpoint AT the feature commit folds it in — write it by
    # hand (the fold itself refuses, so stage the checkpoint from a
    # permissive build's perspective)
    store = get_log_store(p)
    snap_body = json.loads(
        store.read_bytes(tx._checkpoint_path(p, 1))
        if store.exists(tx._checkpoint_path(p, 1))
        else "{}"
    )
    del snap_body  # not needed; build the checkpoint directly
    cp = {
        "version": v,
        "files": {f: None for f in ["data/ghost.parquet"]},
        "schema": tx._read_commit(p, 1).schema,
        "stream_txns": {},
        "properties": {},
        "dvs": {},
        "protocol": {
            "min_reader_features": ["quantum-stats"],
            "min_writer_features": ["quantum-stats"],
        },
        "txn": "c" * 32,
    }
    assert store.put_if_absent(
        tx._checkpoint_path(p, v), json.dumps(cp).encode()
    )
    # drop the commit files: the checkpoint is now the only source
    for cv in range(1, v + 1):
        store.delete(tx._commit_path(p, cv))
    with pytest.raises(
        tx.ProtocolUnsupportedError, match="quantum-stats"
    ):
        tx.snapshot(p)


def test_pre_protocol_tables_read_unchanged(spark, tmp_path):
    """A log written before the protocol field existed (no ``protocol``
    key anywhere) keeps reading and writing."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(5)).coalesce(1), p)
    # strip the protocol field from every commit, simulating an old log
    store = get_log_store(p)
    for c in tx.read_log(p):
        cp = tx._commit_path(p, c.version)
        body = json.loads(store.read_bytes(cp))
        body.pop("protocol", None)
        store.delete(cp)
        assert store.put_if_absent(cp, json.dumps(body).encode())
    assert tx.table_protocol(p) == {}
    assert tx.read_table(spark, p).count() == 5
    tx.tx_append(_df(spark, [(10, 1, "y")]), p)
    assert tx.read_table(spark, p).count() == 6


def test_protocol_round_trips_through_restore_and_model_surface(
    spark, tmp_path
):
    """Restore is schema-authoritative but must NOT downgrade the
    protocol: after restoring below the first DV commit, the table
    still declares deletion-vectors (files from the DV era may come
    back later via another restore)."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(10)).coalesce(1), p)
    tx.tx_delete(spark, p, [("k", "<", 2)], merge_on_read=True)
    tx.tx_restore(p, 1)
    assert (
        "deletion-vectors"
        in tx.table_protocol(p)["min_reader_features"]
    )


def test_concurrent_feature_upgrades_union_not_clobber(spark, tmp_path):
    """Two MOR deletes on DISJOINT files race at the put-if-absent
    step: the loser re-folds and re-derives its protocol field, so the
    deletion-vectors requirement lands exactly once and never
    regresses; a later rename UNIONS column-mapping on top."""
    from event_streaming_toy_example_spark.operators.logstore import (
        InMemoryLogStore,
        register_log_store,
        unregister_log_store,
    )

    prefix = str(tmp_path / "mem")
    store = InMemoryLogStore()
    register_log_store(prefix, store)
    try:
        p = f"{prefix}/t"
        tx.tx_append(_df(spark, _rows(10)).coalesce(1), p)
        tx.tx_append(
            _df(spark, [(100 + i, 1, f"x{i}") for i in range(10)])
            .coalesce(1),
            p,
        )
        fired = {"done": False}

        def hook(path: str) -> None:
            if not fired["done"] and path.endswith(".json"):
                fired["done"] = True
                tx.tx_delete(
                    spark, p, [("k", "=", 105)], merge_on_read=True
                )

        store.before_put = hook
        try:
            tx.tx_delete(spark, p, [("k", "=", 3)], merge_on_read=True)
        finally:
            store.before_put = None
        proto = tx.table_protocol(p)
        assert "deletion-vectors" in proto["min_reader_features"]
        # both deletes landed (disjoint files commute)
        ks = {r.k for r in tx.read_table(spark, p).collect()}
        assert 3 not in ks and 105 not in ks and len(ks) == 18
        tx.tx_rename_column(p, "v", "val")
        proto = tx.table_protocol(p)
        assert set(proto["min_reader_features"]) >= {
            "deletion-vectors", "column-mapping", "parquet-checkpoint"
        }
    finally:
        unregister_log_store(prefix)
