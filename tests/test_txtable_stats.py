"""Data-skipping stats + predicate DELETE on the transactional table
(`operators/txtable.py`): footer min/max/null-count stats recorded per
commit, file pruning on conjunctive predicates, and DELETE's three file
classes (skip by reference / whole-drop unread / straddle rewrite).

Pruning is an optimization layered UNDER an always-applied row filter,
so every test here checks two things: the answer equals a plain
filtered read (correctness), and the file accounting matches the stats
(the optimization actually fired)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx


@pytest.fixture()
def table(spark, tmp_path):
    """1000 rows range-partitioned into 4 files on k (0..999), with a
    string and a timestamp column so every stat type is exercised."""
    p = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("k"),
        F.format_string("s%04d", F.col("id")).alias("s"),
        # 2024-01-01T00:00:00 UTC + id minutes, via epoch-seconds cast
        (F.lit(1704067200) + F.col("id") * 60).cast("timestamp").alias("ts"),
    ).repartitionByRange(4, "k")
    tx.tx_append(df, p)
    return p


def test_stats_recorded_per_file(table):
    c = tx.read_log(table)[-1]
    assert c.stats and len(c.stats) == 4
    ks = sorted(
        (s["k"]["min"], s["k"]["max"]) for s in c.stats.values()
    )
    assert ks[0][0] == 0 and ks[-1][1] == 999
    # ranges are disjoint (range partitioning) — what makes pruning bite
    for (_, hi), (lo, _) in zip(ks, ks[1:]):
        assert hi < lo
    for s in c.stats.values():
        assert s["k"]["nulls"] == 0 and s["k"]["rows"] > 0
        assert set(s) >= {"k", "s", "ts"}


@pytest.mark.parametrize(
    "where,n_expected",
    [
        ([("k", "<", 100)], 100),
        ([("k", ">=", 900)], 100),
        ([("k", "=", 500)], 1),
        ([("k", "in", [3, 700])], 2),
        ([("s", "<", "s0100")], 100),
        ([("ts", "<", datetime.datetime(2024, 1, 1, 0, 50))], 50),
        ([("k", ">=", 200), ("k", "<", 300)], 100),
    ],
)
def test_pruned_read_equals_filtered_full_read(spark, table, where, n_expected):
    scan, skip = tx.prune_files(table, where)
    assert skip, f"no files skipped for {where}"
    pruned = tx.read_table(spark, table, where=where)
    full = tx.read_table(spark, table).where(tx._where_expr(where))
    assert pruned.count() == full.count() == n_expected
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_unstatted_commit_is_never_skipped(spark, table):
    # simulate a pre-stats log entry: a commit whose stats were never
    # recorded must make its files unprunable, not invisible
    df = tx.read_table(spark, table, 1).limit(0)
    extra = df.sparkSession.createDataFrame(
        [(5000, "zzz", datetime.datetime(2030, 1, 1))], df.schema
    )
    files = tx._stage_files(extra, table)
    tx.commit(
        table, "append", files, [], tx.read_log(table)[-1].schema, 1
    )
    scan, _ = tx.prune_files(table, [("k", "<", 10)])
    assert set(files) <= set(scan)
    assert (
        tx.read_table(spark, table, where=[("k", ">=", 5000)]).count() == 1
    )


def test_delete_whole_file_drop_without_read(spark, table):
    # k < 250 exactly covers the first range file: it must be dropped
    # from the snapshot WITHOUT a rewrite (no added files)
    v = tx.tx_delete(spark, table, [("k", "<", 250)])
    c = tx.read_log(table)[-1]
    assert c.action == "delete" and c.version == v
    assert c.add == () and len(c.remove) == 1
    assert tx.read_table(spark, table).count() == 750
    # time travel still sees the full version
    assert tx.read_table(spark, table, 1).count() == 1000


def test_delete_straddling_file_rewrites_only_it(spark, table):
    tx.tx_delete(spark, table, [("k", "<", 100)])
    c = tx.read_log(table)[-1]
    # one straddler rewritten, three untouched files carried by ref
    assert len(c.remove) == 1 and len(c.add) == 1
    assert tx.read_table(spark, table).count() == 900
    assert len(snapfiles(table)) == 4


def test_delete_everything_stages_no_files(spark, table):
    tx.tx_delete(spark, table, [("k", ">=", 0)])
    c = tx.read_log(table)[-1]
    assert c.add == () and len(c.remove) == 4
    cur = tx.read_table(spark, table)
    assert cur.count() == 0 and cur.schema.fieldNames() == ["k", "s", "ts"]


def test_delete_keeps_null_predicate_rows(spark, table):
    nulls = spark.createDataFrame(
        [(None, None, None)], tx.read_table(spark, table).schema
    )
    tx.tx_append(nulls, table)
    tx.tx_delete(spark, table, [("k", ">=", 0)])
    left = tx.read_table(spark, table)
    assert left.count() == 1
    assert left.where(F.col("k").isNull()).count() == 1


def test_delete_aborts_on_concurrent_data_change():
    c = tx.Commit(2, "append", ("data/x.parquet",), (), "{}", 1, "t")
    with pytest.raises(tx.ConcurrentWriteError):
        tx._validate_against("delete", [], [c])


def snapfiles(path):
    return tx.snapshot(path).files


def test_prune_isnull_notnull(spark, tmp_path):
    """isnull/notnull pruning off the logged null counts: a zero-null
    file is skipped for isnull; a notnull DELETE drops it whole."""
    p = str(tmp_path / "t")
    clean = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).coalesce(1)
    mixed = spark.createDataFrame(
        [(None, "c"), (4, "d")], "k int, v string"
    ).coalesce(1)
    tx.tx_append(clean, p)
    tx.tx_append(mixed, p)
    scan, skip = tx.prune_files(p, [("k", "isnull", None)])
    assert len(scan) == 1 and len(skip) == 1  # zero-null file skipped
    # the real read equals a plain filtered read
    got = tx.read_table(spark, p, where=[("k", "isnull", None)]).collect()
    assert [r["v"] for r in got] == ["c"]
    # notnull DELETE: the clean file drops WHOLE (all_match), the mixed
    # file straddles and rewrites
    before_files = set(tx.snapshot(p).files)
    tx.tx_delete(spark, p, [("k", "notnull", None)])
    rows = tx.read_table(spark, p).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(None, "c")]
    c = tx.read_log(p)[-1]
    assert set(c.remove) == before_files and len(c.add) == 1
