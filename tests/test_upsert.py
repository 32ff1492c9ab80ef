"""MERGE-semantics checks for operators/upsert.py beyond the oracle-
checked catalog entry: tie-breaking (changes beat base) and CDC
tombstone deletes."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.upsert import upsert_snapshot


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, ts bigint, v string, deleted boolean"
    )


def test_changes_win_ties_and_newest_wins(spark):
    base = _df(spark, [(1, 10, "base-old", False), (2, 10, "base", False)])
    changes = _df(
        spark,
        [
            (1, 10, "change-tie", False),   # same ts as base -> change wins
            (2, 5, "change-stale", False),  # older than base -> base stays
            (3, 1, "insert", False),
        ],
    )
    out = {
        r["k"]: r["v"]
        for r in upsert_snapshot(
            base, changes, ["k"], ["ts"], tombstone_col="deleted"
        ).collect()
    }
    assert out == {1: "change-tie", 2: "base", 3: "insert"}


def test_tombstone_deletes_key(spark):
    base = _df(spark, [(1, 10, "a", False), (2, 10, "b", False)])
    changes = _df(spark, [(1, 20, "x", True)])  # delete key 1
    snap = upsert_snapshot(base, changes, ["k"], ["ts"], tombstone_col="deleted")
    assert [tuple(r) for r in snap.select("k", "v").collect()] == [(2, "b")]
    assert "deleted" not in snap.columns


def test_null_tombstone_treated_as_upsert(spark):
    base = _df(spark, [(1, 10, "a", False)])
    changes = spark.createDataFrame(
        [(1, 20, "new", None)], "k bigint, ts bigint, v string, deleted boolean"
    )
    snap = upsert_snapshot(base, changes, ["k"], ["ts"], tombstone_col="deleted")
    assert [r["v"] for r in snap.collect()] == ["new"]


def test_upsert_plan_single_shuffle(spark):
    base = _df(spark, [(1, 10, "a", False)])
    changes = _df(spark, [(1, 20, "b", False)])
    plan = (
        upsert_snapshot(base, changes, ["k"], ["ts"], tombstone_col="deleted")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan
