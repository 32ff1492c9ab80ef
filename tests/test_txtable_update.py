"""SQL UPDATE (``txtable.tx_update``): assignment DML with the same
stats-pruned file selection, copy-on-write / deletion-vector write
paths, CHECK-constraint enforcement, and WHERE-clause conflict domain
as DELETE.  All assignments read the PRE-update row (standard SQL
UPDATE semantics) and cast to the column's existing type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx

_SCHEMA = "k int, grp int, amt double, status string"


def _df(spark, rows, schema=_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _rows(n=20):
    return [(i, i % 4, float(i), "open") for i in range(n)]


def _content(spark, p):
    return sorted(tuple(r) for r in tx.read_table(spark, p).collect())


def _stage(spark, tmp_path, n=20, parts=4):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(n)).repartition(parts), p)
    return p


@pytest.mark.parametrize("mor", [False, True])
def test_update_where_applies_assignments(spark, tmp_path, mor):
    p = _stage(spark, tmp_path)
    tx.tx_update(
        spark, p,
        set={"amt": "amt * 2 + grp", "status": "'hot'"},
        where=[("grp", "=", 1)],
        merge_on_read=mor,
    )
    expect = sorted(
        (i, i % 4, float(i) * 2 + 1 if i % 4 == 1 else float(i),
         "hot" if i % 4 == 1 else "open")
        for i in range(20)
    )
    assert _content(spark, p) == expect


def test_update_assignments_read_the_old_row(spark, tmp_path):
    # swap semantics: SET a = b, b = a must use the pre-update values
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(1, 7, 3.0, "x")]), p)
    tx.tx_update(spark, p, set={"k": "grp", "grp": "k"})
    assert _content(spark, p) == [(7, 1, 3.0, "x")]


def test_update_no_where_hits_every_row(spark, tmp_path):
    p = _stage(spark, tmp_path)
    tx.tx_update(spark, p, set={"status": "'done'"})
    assert all(r[3] == "done" for r in _content(spark, p))


def test_update_null_predicate_keeps_row(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        _df(spark, [(1, None, 1.0, "a"), (2, 1, 2.0, "b")]), p
    )
    tx.tx_update(spark, p, set={"amt": "0.0"}, where=[("grp", "=", 1)])
    assert _content(spark, p) == [(1, None, 1.0, "a"), (2, 1, 0.0, "b")]


def test_update_casts_to_existing_type(spark, tmp_path):
    p = _stage(spark, tmp_path, n=4, parts=1)
    tx.tx_update(spark, p, set={"amt": "7"})  # int literal -> double col
    snap = tx.snapshot(p)
    assert all(r[2] == 7.0 for r in _content(spark, p))
    import json

    fields = {f["name"]: f["type"] for f in json.loads(snap.schema)["fields"]}
    assert fields["amt"] == "double"


def test_update_unknown_column_raises_by_name(spark, tmp_path):
    p = _stage(spark, tmp_path, n=4, parts=1)
    with pytest.raises(ValueError, match="nope"):
        tx.tx_update(spark, p, set={"nope": "1"})


def test_update_prunes_disjoint_files(spark, tmp_path):
    # two files with disjoint k ranges: an update on one range must
    # carry the other file over BY REFERENCE (same name in the commit)
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(i, 0, float(i), "a") for i in range(10)]).coalesce(1), p)
    tx.tx_append(_df(spark, [(i, 0, float(i), "a") for i in range(100, 110)]).coalesce(1), p)
    before = set(tx.snapshot(p).files)
    tx.tx_update(spark, p, set={"status": "'z'"}, where=[("k", "<", 50)])
    after = set(tx.snapshot(p).files)
    carried = before & after
    assert len(carried) == 1  # the k>=100 file never rewritten
    assert _content(spark, p) == sorted(
        [(i, 0, float(i), "z") for i in range(10)]
        + [(i, 0, float(i), "a") for i in range(100, 110)]
    )


def test_update_mor_commits_dv_not_rewrite(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(20)).coalesce(1), p)
    files_before = set(tx.snapshot(p).files)
    v = tx.tx_update(
        spark, p, set={"amt": "amt + 100"},
        where=[("k", "=", 3)], merge_on_read=True,
    )
    snap = tx.snapshot(p)
    # original file still live (holed), one new file with the updated copy
    assert files_before <= set(snap.files)
    assert snap.dvs and any(f in snap.dvs for f in files_before)
    assert _content(spark, p) == sorted(
        (i, i % 4, float(i) + (100 if i == 3 else 0), "open")
        for i in range(20)
    )
    assert v == 2


def test_update_mor_fully_matched_file_drops_whole(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(i, 0, float(i), "a") for i in range(5)]).coalesce(1), p)
    tx.tx_append(_df(spark, [(i, 1, float(i), "a") for i in range(100, 105)]).coalesce(1), p)
    before = set(tx.snapshot(p).files)
    tx.tx_update(
        spark, p, set={"status": "'u'"}, where=[("grp", "=", 0)],
        merge_on_read=True,
    )
    snap = tx.snapshot(p)
    # the grp=0 file's every live row matched: dropped whole, no DV
    assert len(before & set(snap.files)) == 1
    assert not (snap.dvs or {})
    assert _content(spark, p) == sorted(
        [(i, 0, float(i), "u") for i in range(5)]
        + [(i, 1, float(i), "a") for i in range(100, 105)]
    )


def test_update_mor_does_not_resurrect_dv_dead_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, _rows(10)).coalesce(1), p)
    tx.tx_delete(spark, p, [("k", "=", 3)], merge_on_read=True)
    # k=3 is DV-dead; an update matching its (former) grp must not
    # re-emit it as an updated copy
    tx.tx_update(
        spark, p, set={"amt": "-1.0"}, where=[("grp", "=", 3)],
        merge_on_read=True,
    )
    got = _content(spark, p)
    assert all(r[0] != 3 for r in got)
    assert [r for r in got if r[0] == 7][0][2] == -1.0


def test_update_respects_check_constraints(spark, tmp_path):
    p = _stage(spark, tmp_path, n=4, parts=1)
    tx.tx_add_constraint(spark, p, "amt_nonneg", "amt >= 0")
    with pytest.raises(ValueError, match="amt_nonneg"):
        tx.tx_update(spark, p, set={"amt": "-5.0"}, where=[("k", "=", 1)])
    # table unchanged after the refused update
    assert _content(spark, p) == sorted(
        (i, i % 4, float(i), "open") for i in range(4)
    )


def test_update_clause_disjoint_append_commutes(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(i, 0, float(i), "a") for i in range(10)]).coalesce(1), p)
    state = tx._fold_state(p)
    # concurrent append of k >= 1000 lands first
    tx.tx_append(_df(spark, [(1000, 9, 1.0, "n")]).coalesce(1), p)
    # stale-read update on k < 50: provably disjoint -> commutes
    snap = tx.snapshot(p, state.version)
    files, _ = tx.prune_files(p, [("k", "<", 50)], state.version)
    df = tx._read_files(spark, p, files, snap.dvs, schema_json=state.schema)
    rewritten = df.withColumn(
        "status",
        F.when(F.coalesce(F.col("k") < 50, F.lit(False)), F.lit("z")).otherwise(
            F.col("status")
        ),
    )
    staged = tx._stage_files(rewritten, p, state.schema)
    v = tx.commit(
        p, "update", staged, files, state.schema, state.version,
        stats=tx._footer_stats(p, staged),
        conflict={"kind": "where", "clauses": [("k", "<", 50)]},
    )
    assert v == 3
    got = _content(spark, p)
    assert (1000, 9, 1.0, "n") in got and all(
        r[3] == "z" for r in got if r[0] < 50
    )


def test_update_overlapping_concurrent_append_aborts(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_df(spark, [(i, 0, float(i), "a") for i in range(10)]).coalesce(1), p)
    state = tx._fold_state(p)
    tx.tx_append(_df(spark, [(5, 0, 5.0, "dup")]).coalesce(1), p)
    files, _ = tx.prune_files(p, [("k", "=", 5)], state.version)
    staged = tx._stage_files(
        tx._read_files(spark, p, files, None, schema_json=state.schema),
        p, state.schema,
    )
    with pytest.raises(tx.ConcurrentWriteError):
        tx.commit(
            p, "update", staged, files, state.schema, state.version,
            conflict={"kind": "where", "clauses": [("k", "=", 5)]},
        )


def test_update_change_feed_emits_row_level_updates(spark, tmp_path):
    p = _stage(spark, tmp_path, n=12, parts=2)
    v = tx.tx_update(spark, p, set={"amt": "amt + 0.5"}, where=[("grp", "=", 2)])
    rows = tx.commit_change_rows(p, v, ["k"], ["amt"])
    assert {r[-2] for r in rows} == {"update"}
    assert sorted(r[0] for r in rows) == [i for i in range(12) if i % 4 == 2]
    assert all(r[1] == float(r[0]) + 0.5 for r in rows)
