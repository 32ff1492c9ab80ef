"""Conditional MERGE (``txtable.tx_merge``, VERDICT r7 item 4): the
full WHEN MATCHED [AND cond] UPDATE/DELETE, WHEN NOT MATCHED INSERT,
WHEN NOT MATCHED BY SOURCE UPDATE/DELETE clause surface, compiled onto
the existing key-probed rewrite (copy-on-write) and deletion-vector
(merge-on-read) machinery.  OCC tests mirror ``tx_upsert``'s:
key-disjoint concurrent appends commute, overlapping ones abort, and a
by-source merge (which reads the whole table) validates strictly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx

_SCHEMA = "k int, ts int, amt double, status string"


def _df(spark, rows, schema=_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _content(spark, p):
    return sorted(tuple(r) for r in tx.read_table(spark, p).collect())


def _base_rows(n=10):
    return [(i, 1, float(i * 10), "open") for i in range(n)]


_SRC_ROWS = [
    (2, 2, 25.0, "open"),     # matched, amt 25 > 20 -> update
    (3, 2, 5.0, "open"),      # matched, amt 5 < 30 -> condition blocks
    (4, 2, 0.0, "cancel"),    # matched delete clause
    (50, 1, 500.0, "new"),    # unmatched -> insert
]

_EXPECT = sorted(
    [(i, 1, float(i * 10), "open") for i in range(10) if i not in (2, 4)]
    + [(2, 2, 25.0, "open"), (50, 1, 500.0, "new")]
)


@pytest.mark.parametrize("mor", [False, True])
def test_merge_clause_semantics_cow_and_mor_agree(spark, tmp_path, mor):
    p = str(tmp_path / f"t{mor}")
    tx.tx_append(_df(spark, _base_rows()).coalesce(2), p)
    v = tx.tx_merge(
        spark, p, _df(spark, _SRC_ROWS), on=["k"],
        when_matched_delete="source.status = 'cancel'",
        when_matched_update="all",
        when_matched_update_condition="source.amt > target.amt",
        when_not_matched_insert=True,
        merge_on_read=mor,
    )
    assert _content(spark, p) == _EXPECT
    c = tx.read_log(p)[-1]
    assert c.action == "merge"
    if mor:
        # O(changed rows): nothing rewritten, changes are DV-borne
        assert c.remove == () and c.dv
    # time travel below the merge is intact
    assert len(tx.read_table(spark, p, version=1).collect()) == 10
    assert v == 2


def test_merge_by_source_reconciles_full_snapshot(spark, tmp_path):
    """The anti-join side: rows absent from the source are deleted
    (condition) or stamped stale — the full-snapshot reconciliation
    shape."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(6)).coalesce(1), p)
    src = _df(spark, [(1, 2, 1.0, "x"), (3, 2, 3.0, "x")])
    tx.tx_merge(
        spark, p, src, on=["k"],
        when_matched_update={"status": "'seen'"},
        when_not_matched_by_source_delete="target.k >= 4",
        when_not_matched_by_source_update={"status": "'stale'"},
        merge_on_read=True,
    )
    got = sorted((r.k, r.status) for r in tx.read_table(spark, p).collect())
    assert got == [(0, "stale"), (1, "seen"), (2, "stale"), (3, "seen")]
    # and the change feed sees row-level effects of all three clauses
    rows = tx.commit_change_rows(p, 2, ["k"], ["status"])
    assert sorted(rows) == [
        (0, "stale", "update", 2), (1, "seen", "update", 2),
        (2, "stale", "update", 2), (3, "seen", "update", 2),
        (4, "open", "delete", 2), (5, "open", "delete", 2),
    ]


def test_merge_update_specific_columns_and_types_cast(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(4)).coalesce(1), p)
    src = _df(spark, [(1, 9, 999.0, "ignored")])
    tx.tx_merge(
        spark, p, src, on=["k"],
        when_matched_update={"amt": "target.amt + source.amt",
                             "ts": "source.ts"},
    )
    row = {r.k: r for r in tx.read_table(spark, p).collect()}[1]
    assert (row.amt, row.ts, row.status) == (1009.0, 9, "open")


def test_merge_guards(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(3)).coalesce(1), p)
    dup = _df(spark, [(1, 1, 1.0, "a"), (1, 2, 2.0, "b")])
    with pytest.raises(ValueError, match="duplicate keys"):
        tx.tx_merge(spark, p, dup, on=["k"], when_matched_update="all")
    with pytest.raises(ValueError, match="keys are immutable|invalid"):
        tx.tx_merge(
            spark, p, _df(spark, [(1, 1, 1.0, "a")]), on=["k"],
            when_matched_update={"k": "source.k + 1"},
        )
    # EXTRA source columns are legal (conditions reference them, they
    # are never written) — but UPDATING one is refused: merge does not
    # auto-evolve the table
    extra = spark.createDataFrame(
        [(1, "x")], "k int, brand_new string"
    )
    with pytest.raises(ValueError, match="invalid"):
        tx.tx_merge(
            spark, p, extra, on=["k"],
            when_matched_update={"brand_new": "source.brand_new"},
        )


def test_merge_respects_check_constraints(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(3)).coalesce(1), p)
    tx.tx_add_constraint(spark, p, "amt_nonneg", "amt >= 0")
    bad = _df(spark, [(1, 2, -5.0, "open")])
    with pytest.raises(ValueError, match="amt_nonneg"):
        tx.tx_merge(spark, p, bad, on=["k"], when_matched_update="all")


def test_merge_commutes_with_key_disjoint_append(
    spark, tmp_path, monkeypatch
):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(3)).coalesce(1), p)
    orig = tx._stage_files
    fired = {"done": False}

    def hook(df, path_, schema_json=None):
        if not fired["done"]:
            fired["done"] = True
            tx.tx_append(_df(spark, [(100, 1, 1.0, "far")]).coalesce(1), p)
        return orig(df, path_, schema_json)

    monkeypatch.setattr(tx, "_stage_files", hook)
    v = tx.tx_merge(
        spark, p, _df(spark, [(1, 2, 99.0, "upd")]), on=["k"],
        when_matched_update="all",
    )
    assert v == 3
    got = {r.k: r.amt for r in tx.read_table(spark, p).collect()}
    assert got[1] == 99.0 and 100 in got


def test_merge_aborts_on_key_overlapping_append(
    spark, tmp_path, monkeypatch
):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(3)).coalesce(1), p)
    orig = tx._stage_files
    fired = {"done": False}

    def hook(df, path_, schema_json=None):
        if not fired["done"]:
            fired["done"] = True
            tx.tx_append(_df(spark, [(1, 9, 0.0, "race")]).coalesce(1), p)
        return orig(df, path_, schema_json)

    monkeypatch.setattr(tx, "_stage_files", hook)
    with pytest.raises(tx.ConcurrentWriteError, match="disjoint"):
        tx.tx_merge(
            spark, p, _df(spark, [(1, 2, 99.0, "upd")]), on=["k"],
            when_matched_update="all",
        )


def test_by_source_merge_validates_strictly(spark, tmp_path, monkeypatch):
    """A by-source merge read EVERY live row; a concurrent append —
    even far away in key space — changes the not-matched-by-source
    set, so it must abort."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(3)).coalesce(1), p)
    orig = tx._stage_files
    fired = {"done": False}

    def hook(df, path_, schema_json=None):
        if not fired["done"]:
            fired["done"] = True
            tx.tx_append(_df(spark, [(100, 1, 1.0, "far")]).coalesce(1), p)
        return orig(df, path_, schema_json)

    monkeypatch.setattr(tx, "_stage_files", hook)
    with pytest.raises(tx.ConcurrentWriteError):
        tx.tx_merge(
            spark, p, _df(spark, [(1, 2, 9.0, "x")]), on=["k"],
            when_matched_update="all",
            when_not_matched_by_source_delete=True,
        )


def test_merge_after_rename_uses_logical_names(spark, tmp_path):
    """Column mapping composes: a merge addressed by the CURRENT
    logical names lands in the stable physical columns."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows(3)).coalesce(1), p)
    tx.tx_rename_column(p, "amt", "amount")
    src = spark.createDataFrame(
        [(1, 2, 77.0, "open")], "k int, ts int, amount double, status string"
    )
    tx.tx_merge(spark, p, src, on=["k"], when_matched_update="all")
    got = {r.k: r.amount for r in tx.read_table(spark, p).collect()}
    assert got[1] == 77.0 and got[0] == 0.0


def test_merge_stream_applies_clauses_exactly_once(spark, tmp_path):
    """tx_merge_stream: a CDC stream with tombstones CARRIED IN THE
    ROWS (op='d') applies per micro-batch through the conditional
    clauses; a restarted query on a FRESH checkpoint re-delivering the
    same batches commits zero new versions (the (app_id, batch_id)
    token short-circuits the replay)."""
    import os

    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame(
            [(i, 1, float(i), "keep") for i in range(6)],
            "k int, ts int, amt double, op string",
        ).coalesce(1),
        p,
    )
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    with open(os.path.join(feed_dir, "b0.json"), "w") as f:
        f.write('{"k": 1, "ts": 2, "amt": 111.0, "op": "u"}\n')
        f.write('{"k": 3, "ts": 2, "amt": 0.0, "op": "d"}\n')
        f.write('{"k": 50, "ts": 2, "amt": 500.0, "op": "u"}\n')

    def run(ck):
        stream = spark.readStream.schema(
            "k int, ts int, amt double, op string"
        ).json(feed_dir)
        q = tx.tx_merge_stream(
            stream, p, ck, on=["k"], app_id="merge-cdc",
            merge_on_read=True,
            when_matched_delete="source.op = 'd'",
            when_matched_update={"amt": "source.amt", "ts": "source.ts"},
            when_not_matched_insert="source.op != 'd'",
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ck1"))
    v1 = tx.table_version(p)
    got = {r.k: r.amt for r in tx.read_table(spark, p).collect()}
    assert got == {0: 0.0, 1: 111.0, 2: 2.0, 4: 4.0, 5: 5.0, 50: 500.0}
    # fresh checkpoint => full re-delivery; the token floor skips it
    run(str(tmp_path / "ck2"))
    assert tx.table_version(p) == v1
    assert {r.k: r.amt for r in tx.read_table(spark, p).collect()} == got


# ---------------------------------------------- schema evolution (r9)


_EVO_SRC = "k int, ts int, amt double, status string, origin string"


@pytest.mark.parametrize("mor", [False, True])
def test_merge_allow_evolution_adds_source_columns(spark, tmp_path, mor):
    """Delta's withSchemaEvolution(): an extra source column becomes a
    real table column in the same commit — old rows read NULL for it,
    updated/inserted rows carry the source value, and the evolved
    schema survives in the log."""
    p = str(tmp_path / f"t{mor}")
    tx.tx_append(_df(spark, _base_rows()).coalesce(2), p)
    src = _df(
        spark,
        [(2, 2, 25.0, "open", "cdc"), (50, 1, 500.0, "new", "cdc")],
        _EVO_SRC,
    )
    tx.tx_merge(
        spark, p, src, on=["k"],
        when_matched_update="all",
        when_not_matched_insert=True,
        merge_on_read=mor,
        allow_evolution=True,
    )
    out = tx.read_table(spark, p)
    assert out.columns == ["k", "ts", "amt", "status", "origin"]
    rows = {r.k: r.origin for r in out.collect()}
    assert rows[2] == "cdc" and rows[50] == "cdc"
    assert rows[1] is None  # pre-evolution row null-fills
    assert len(rows) == 11


def test_merge_without_evolution_still_never_writes_extras(
    spark, tmp_path
):
    """Default path unchanged: extras ride as condition-only columns
    and explicitly updating one is refused with the evolution hint."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows()).coalesce(2), p)
    src = _df(spark, [(2, 2, 25.0, "open", "cdc")], _EVO_SRC)
    tx.tx_merge(
        spark, p, src, on=["k"],
        when_matched_update="all",
        when_not_matched_insert=True,
    )
    assert tx.read_table(spark, p).columns == [
        "k", "ts", "amt", "status",
    ]
    with pytest.raises(ValueError, match="allow_evolution"):
        tx.tx_merge(
            spark, p, src, on=["k"],
            when_matched_update={"origin": "source.origin"},
        )


def test_merge_evolution_update_may_set_the_new_column(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows()).coalesce(2), p)
    src = _df(spark, [(3, 2, 30.0, "open", "cdc")], _EVO_SRC)
    tx.tx_merge(
        spark, p, src, on=["k"],
        when_matched_update={"origin": "source.origin"},
        allow_evolution=True,
    )
    rows = {r.k: r.origin for r in tx.read_table(spark, p).collect()}
    assert rows[3] == "cdc" and rows[0] is None


def test_merge_evolution_races_a_plain_append_additively(
    spark, tmp_path, monkeypatch
):
    """OCC: an evolution merge racing a key-disjoint append commits —
    and the published schema is the EVOLVED one (commit() re-unions
    against the intervening commit's schema)."""
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _base_rows()).coalesce(1), p)

    orig = tx._stage_files
    fired = {"done": False}

    def hook(df, path_, schema_json=None):
        if not fired["done"]:
            fired["done"] = True
            tx.tx_append(
                _df(spark, [(900, 1, 0.0, "ingest")]).coalesce(1), p
            )
        return orig(df, path_, schema_json)

    monkeypatch.setattr(tx, "_stage_files", hook)
    src = _df(spark, [(2, 2, 25.0, "open", "cdc")], _EVO_SRC)
    tx.tx_merge(
        spark, p, src, on=["k"],
        when_matched_update="all",
        allow_evolution=True,
    )
    out = tx.read_table(spark, p)
    assert "origin" in out.columns
    rows = {r.k: r.origin for r in out.collect()}
    assert rows[2] == "cdc" and rows[900] is None
    assert len(rows) == 11


def test_merge_evolution_never_resurrects_a_dropped_columns_bytes(
    spark, tmp_path
):
    """Evolving a column whose NAME matches a previously dropped one
    must mint a fresh physical name — the dropped bytes still sitting
    in old files stay dead."""
    p = str(tmp_path / "t")
    tx.tx_append(
        _df(
            spark,
            [(i, 1, float(i), "open", f"old{i}") for i in range(5)],
            _EVO_SRC,
        ).coalesce(1),
        p,
    )
    tx.tx_drop_column(p, "origin")
    src = _df(spark, [(2, 2, 25.0, "open", "fresh")], _EVO_SRC)
    tx.tx_merge(
        spark, p, src, on=["k"],
        when_matched_update="all",
        allow_evolution=True,
    )
    rows = {r.k: r.origin for r in tx.read_table(spark, p).collect()}
    assert rows[2] == "fresh"
    # rows 0,1,3,4 were never rewritten: their OLD origin bytes must
    # NOT resurface under the re-added name
    assert rows[0] is None and rows[4] is None
