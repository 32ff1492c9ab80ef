"""The ``txtable`` STREAMING source (``sources/txsource.py``,
VERDICT r9 item 7): ``spark.readStream.format("txtable")`` — offset =
log version, one executor task per added file, option-borne clause
pushdown (stats/bloom pruning + exact in-read re-filter), Delta-style
change-commit semantics, and checkpoint-restart exactly-once."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx
from event_streaming_toy_example_spark.sources import txsource

_SCHEMA = "k int, grp int, amt double"


def _stage(spark, tmp_path, commits=3, per=10):
    p = str(tmp_path / "t")
    for c in range(commits):
        rows = [(i, i % 3, float(i)) for i in range(c * per, (c + 1) * per)]
        tx.tx_append(
            spark.createDataFrame(rows, _SCHEMA).coalesce(1), p
        )
    return p


def _drain(spark, tmp_path, p, ck_name="ck", **opts):
    txsource.register(spark)
    r = spark.readStream.format("txtable").option("path", p)
    for key, v in opts.items():
        r = r.option(key, str(v))
    seen: list[tuple] = []

    def sink(batch_df, _bid):
        seen.extend(tuple(row) for row in batch_df.collect())

    q = (
        r.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / ck_name))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(60)
    return seen


def test_stream_delivers_every_appended_row(spark, tmp_path):
    p = _stage(spark, tmp_path)
    got = _drain(spark, tmp_path, p)
    want = [tuple(r) for r in tx.read_table(spark, p).collect()]
    assert sorted(got) == sorted(want) and len(got) == 30


def test_where_option_prunes_and_filters_exactly(spark, tmp_path):
    p = _stage(spark, tmp_path, commits=3, per=10)
    got = _drain(
        spark, tmp_path, p,
        where=json.dumps([["k", ">=", 10], ["k", "<", 20]]),
    )
    assert sorted(r[0] for r in got) == list(range(10, 20))
    # pruning actually happened: the reader plans only the files whose
    # stats may match
    reader = txsource.TxTableStreamReader(
        {"path": p, "where": json.dumps([["k", "<", 10]])}
    )
    parts = reader.partitions({"version": 0}, {"version": 3})
    names = [pt.name for pt in parts if pt.name]
    assert len(names) == 1  # only commit 1's file survives the stats


def test_change_commit_raises_by_name(spark, tmp_path):
    p = _stage(spark, tmp_path, commits=2)
    tx.tx_delete(spark, p, [("k", "=", 3)])
    with pytest.raises(Exception, match="skipChangeCommits"):
        _drain(spark, tmp_path, p)


def test_skip_change_commits_and_ignore_changes(spark, tmp_path):
    p = _stage(spark, tmp_path, commits=2, per=5)
    tx.tx_delete(spark, p, [("k", "=", 3)])  # rewrites commit 1's file
    skipped = _drain(
        spark, tmp_path, p, ck_name="ck_skip", skipChangeCommits=True
    )
    # the delete commit contributes nothing; appends deliver verbatim
    assert sorted(r[0] for r in skipped) == list(range(10))
    redelivered = _drain(
        spark, tmp_path, p, ck_name="ck_ign", ignoreChanges=True
    )
    # the rewrite's added file re-delivers its surviving rows
    assert sorted(r[0] for r in redelivered) == sorted(
        list(range(10)) + [i for i in range(5) if i != 3]
    )


def test_compaction_commits_always_skip(spark, tmp_path):
    p = _stage(spark, tmp_path, commits=4, per=5)
    assert tx.tx_compact(spark, p, small_file_bytes=1 << 40) is not None
    got = _drain(spark, tmp_path, p)
    assert sorted(r[0] for r in got) == list(range(20))  # no doubling


def test_restart_resumes_exactly_once(spark, tmp_path):
    p = _stage(spark, tmp_path, commits=2, per=5)
    first = _drain(spark, tmp_path, p, ck_name="ck_r")
    assert len(first) == 10
    # source advances; the SAME checkpoint delivers only the delta
    tx.tx_append(
        spark.createDataFrame([(100, 0, 1.0), (101, 1, 2.0)], _SCHEMA), p
    )
    second = _drain(spark, tmp_path, p, ck_name="ck_r")
    assert sorted(r[0] for r in second) == [100, 101]
    # and a third drain with nothing new delivers nothing
    assert _drain(spark, tmp_path, p, ck_name="ck_r") == []


def test_from_version_and_batch_cap(spark, tmp_path):
    p = _stage(spark, tmp_path, commits=4, per=5)
    got = _drain(
        spark, tmp_path, p, fromVersion=2, maxVersionsPerBatch=1
    )
    assert sorted(r[0] for r in got) == list(range(10, 20))


def test_schema_evolution_null_fills_old_commits(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(spark.createDataFrame([(1, 0, 1.0)], _SCHEMA), p)
    tx.tx_append(
        spark.createDataFrame(
            [(2, 1, 2.0, "x")], "k int, grp int, amt double, note string"
        ),
        p,
    )
    got = _drain(spark, tmp_path, p)
    assert sorted(got) == [(1, 0, 1.0, None), (2, 1, 2.0, "x")]


def test_where_option_validation():
    with pytest.raises(ValueError, match="cannot parse where clause"):
        txsource._parse_where_option('[["k", "like", "x"]]')
    assert txsource._parse_where_option(None) == []
    assert txsource._parse_where_option('[["k", "in", [1, 2]]]') == [
        ("k", "in", (1, 2))
    ]


def test_mor_delete_is_a_change_commit_too(spark, tmp_path):
    # round-10 review: a merge-on-read delete commits remove=[] with a
    # deletion vector — the stream must treat it as a CHANGE, not an
    # empty append (silently keeping deleted rows downstream)
    p = _stage(spark, tmp_path, commits=2, per=5)
    tx.tx_delete(spark, p, [("k", "=", 3)], merge_on_read=True)
    with pytest.raises(Exception, match="deletion vector"):
        _drain(spark, tmp_path, p, ck_name="ck_mor")
    skipped = _drain(
        spark, tmp_path, p, ck_name="ck_mor_skip", skipChangeCommits=True
    )
    assert sorted(r[0] for r in skipped) == list(range(10))


def test_clone_create_with_inherited_dvs_is_a_change_commit(spark, tmp_path):
    src = _stage(spark, tmp_path, commits=2, per=5)
    tx.tx_delete(spark, src, [("k", "=", 2)], merge_on_read=True)
    dst = str(tmp_path / "clone")
    tx.tx_clone(spark, src, dst)
    # the clone's creation commit carries translated DVs: streaming it
    # as a plain append would resurrect the deleted row
    with pytest.raises(Exception, match="deletion vector"):
        _drain(spark, tmp_path, dst, ck_name="ck_cl")


# --------------------- round 11: SQL surface over the streaming source


def _drain_view(spark, tmp_path, view_sql, ck_name="ckv"):
    seen: list[tuple] = []

    def sink(batch_df, _bid):
        seen.extend(tuple(row) for row in batch_df.collect())

    q = (
        spark.sql(view_sql)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / ck_name))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(60)
    return seen


def test_stream_view_sql_text_with_where_pushdown(spark, tmp_path):
    """tx_stream_view: the streaming source reached from SQL text — a
    REAL WHERE string compiled by the DML router's clause compiler
    onto the source's clause option; the SQL over the view sees
    exactly the predicate's rows."""
    from event_streaming_toy_example_spark.operators import txsql

    p = _stage(spark, tmp_path)
    txsql.tx_register(spark, p, "tsv_events")
    txsql.tx_stream_view(
        spark, "tsv_events", view="tsv_stream", where="amt >= 15.0"
    )
    seen = _drain_view(
        spark, tmp_path, "SELECT k, grp, amt FROM tsv_stream"
    )
    want = [
        (i, i % 3, float(i)) for i in range(30) if float(i) >= 15.0
    ]
    assert sorted(seen) == sorted(want)


def test_stream_view_rich_predicate_refused_by_name(spark, tmp_path):
    from event_streaming_toy_example_spark.operators import txsql

    p = _stage(spark, tmp_path)
    txsql.tx_register(spark, p, "tsv_rich")
    with pytest.raises(ValueError, match="cannot push"):
        txsql.tx_stream_view(
            spark, "tsv_rich", where="amt >= 15.0 OR grp = 1"
        )
    # a typed-mismatch literal (string vs double column) also refuses:
    # a silently mis-typed pushdown could prune live rows
    with pytest.raises(ValueError, match="cannot push"):
        txsql.tx_stream_view(spark, "tsv_rich", where="amt >= 'x'")


def test_stream_view_restart_resumes_exactly_once(spark, tmp_path):
    """The checkpoint-restart contract holds through the SQL view:
    rows committed between runs arrive exactly once."""
    from event_streaming_toy_example_spark.operators import txsql

    p = _stage(spark, tmp_path, commits=2)
    txsql.tx_register(spark, p, "tsv_rst")
    txsql.tx_stream_view(spark, "tsv_rst", view="tsv_rst_stream")
    first = _drain_view(
        spark, tmp_path, "SELECT k FROM tsv_rst_stream", ck_name="ck_r"
    )
    assert sorted(r[0] for r in first) == list(range(20))
    tx.tx_append(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(20, 30)], _SCHEMA
        ).coalesce(1),
        p,
    )
    # re-register the view (fresh plan) against the SAME checkpoint
    txsql.tx_stream_view(spark, "tsv_rst", view="tsv_rst_stream")
    second = _drain_view(
        spark, tmp_path, "SELECT k FROM tsv_rst_stream", ck_name="ck_r"
    )
    assert sorted(r[0] for r in second) == list(range(20, 30))
