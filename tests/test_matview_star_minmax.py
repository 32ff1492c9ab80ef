"""min/max aggregates in STAR matviews (round 12): the generalization
of the two-sided recompute-affected-groups mode to N sides — monotone
extrema merges for append-only windows (spy-asserted source-free),
bounded per-cell source rescans under removals, affected view groups
recomputed from the post-delta states through the star join."""

from __future__ import annotations

import os
import unittest.mock as mock

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import matview_star as ms
from event_streaming_toy_example_spark.operators import txtable as tx

_FACT_ROWS = [(i % 4, i % 3, float(i)) for i in range(60)]
_D1_ROWS = [(k, f"g{k % 2}", 10.0 * k) for k in range(4)]
_D2_ROWS = [(k, f"h{k}") for k in range(3)]


def _mk(spark, tmp_path, filters=None):
    fact = str(tmp_path / "fact")
    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    dst = str(tmp_path / "mv")
    tx.tx_append(
        spark.createDataFrame(
            _FACT_ROWS, "k1 int, k2 int, qty double"
        ).repartition(3),
        fact,
    )
    tx.tx_append(
        spark.createDataFrame(_D1_ROWS, "k1 int, g1 string, w double"),
        d1,
    )
    tx.tx_append(
        spark.createDataFrame(_D2_ROWS, "key2 int, g2 string"), d2
    )
    v = ms.tx_create_matview_star(
        spark, dst, fact,
        dims=[
            {"name": "d1", "src": d1, "on": ["k1"], "group_by": ["g1"]},
            {"name": "d2", "src": d2, "on": [("k2", "key2")],
             "group_by": ["g2"]},
        ],
        aggs={
            "n": ("count", "*"),
            "min_qty": ("min", "fact.qty"),
            "max_qty": ("max", "fact.qty"),
            "max_w": ("max", "d1.w"),
            "total_qty": ("sum", "fact.qty"),
        },
        filters=filters,
    )
    assert v == 1
    return fact, d1, d2, dst


def _expected(spark, fact, d1, d2):
    f = tx.read_table(spark, fact)
    a = tx.read_table(spark, d1)
    b = tx.read_table(spark, d2).withColumnRenamed("key2", "k2")
    return {
        (r["g1"], r["g2"]): (
            r["n"], r["min_qty"], r["max_qty"], r["max_w"],
            round(r["total_qty"], 6),
        )
        for r in f.join(a, "k1").join(b, "k2")
        .groupBy("g1", "g2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("qty").alias("min_qty"),
            F.max("qty").alias("max_qty"),
            F.max("w").alias("max_w"),
            F.sum("qty").alias("total_qty"),
        )
        .collect()
    }


def _got(spark, dst):
    return {
        (r["g1"], r["g2"]): (
            r["n"], r["min_qty"], r["max_qty"], r["max_w"],
            round(r["total_qty"], 6),
        )
        for r in tx.read_table(spark, dst)
        .select("g1", "g2", "n", "min_qty", "max_qty", "max_w",
                "total_qty")
        .collect()
    }


def _refresh_spied(spark, dst, forbidden):
    calls = []
    orig = tx.read_table

    def spy(sp, path, *args, **kwargs):
        calls.append(os.path.abspath(path))
        return orig(sp, path, *args, **kwargs)

    with mock.patch.object(ms.tx, "read_table", side_effect=spy):
        v = ms.tx_refresh_matview_star(spark, dst)
    bad = set(calls) & {os.path.abspath(p) for p in forbidden}
    assert not bad, f"append-only refresh re-read source table(s): {bad}"
    return v


def test_create_matches_full_recompute(spark, tmp_path):
    fact, d1, d2, dst = _mk(spark, tmp_path)
    assert _got(spark, dst) == _expected(spark, fact, d1, d2)


def test_append_only_refresh_all_sides_source_free(spark, tmp_path):
    fact, d1, d2, dst = _mk(spark, tmp_path)
    tx.tx_append(
        spark.createDataFrame(
            [(0, 0, -5.0), (1, 2, 999.0)], "k1 int, k2 int, qty double"
        ),
        fact,
    )
    tx.tx_append(
        spark.createDataFrame(
            [(0, "g0", 777.0)], "k1 int, g1 string, w double"
        ),
        d1,
    )
    tx.tx_append(
        spark.createDataFrame([(2, "h2b")], "key2 int, g2 string"), d2
    )
    assert _refresh_spied(spark, dst, [fact, d1, d2]) is not None
    assert _got(spark, dst) == _expected(spark, fact, d1, d2)


def test_removed_extrema_repaired_on_fact_and_dim(spark, tmp_path):
    fact, d1, d2, dst = _mk(spark, tmp_path)
    # fact: delete the global max qty rows; dim: delete d1's max-w row
    tx.tx_delete(spark, fact, [("qty", ">", 50.0)])
    tx.tx_delete(spark, d1, [("w", "=", 30.0)])
    assert ms.tx_refresh_matview_star(spark, dst) is not None
    assert _got(spark, dst) == _expected(spark, fact, d1, d2)


def test_mixed_window_and_group_kill(spark, tmp_path):
    fact, d1, d2, dst = _mk(spark, tmp_path)
    tx.tx_delete(spark, d2, [("key2", "=", 2)])  # kills every h2 group
    tx.tx_append(
        spark.createDataFrame(
            [(2, 0, 123.0)], "k1 int, k2 int, qty double"
        ),
        fact,
    )
    assert ms.tx_refresh_matview_star(spark, dst) is not None
    got = _got(spark, dst)
    assert not any(g2 == "h2" for _g1, g2 in got)
    assert got == _expected(spark, fact, d1, d2)


def test_refresh_idempotent_and_crash_heals(spark, tmp_path):
    fact, _d1, _d2, dst = _mk(spark, tmp_path)
    tx.tx_append(
        spark.createDataFrame(
            [(1, 1, -10.0)], "k1 int, k2 int, qty double"
        ),
        fact,
    )
    real = ms._advance_states
    calls = {"n": 0}

    def crashing(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # post-view-merge advance of refresh 1
            raise RuntimeError("boom")
        return real(*a, **kw)

    import pytest as _pytest

    with mock.patch.object(ms, "_advance_states", crashing):
        with _pytest.raises(RuntimeError, match="boom"):
            ms.tx_refresh_matview_star(spark, dst)
    tx.tx_delete(spark, fact, [("qty", "=", -10.0)])
    assert ms.tx_refresh_matview_star(spark, dst) is not None
    assert ms.tx_refresh_matview_star(spark, dst) is None
    assert _got(spark, dst) == _expected(spark, fact, _d1, _d2)


def test_prejoin_filter_applies_to_minmax(spark, tmp_path):
    """A side filter keeps filtered-out rows OUT of the extrema, at
    create, on append, and through the removal rescan."""
    fact, d1, d2, dst = _mk(
        spark, tmp_path, filters={"fact": "qty >= 10.0"}
    )
    got = _got(spark, dst)
    assert all(v[1] >= 10.0 for v in got.values())
    # an append below the filter must not move any minimum
    tx.tx_append(
        spark.createDataFrame(
            [(0, 0, 1.0)], "k1 int, k2 int, qty double"
        ),
        fact,
    )
    assert ms.tx_refresh_matview_star(spark, dst) is not None
    assert _got(spark, dst) == got
    # a delete forcing the rescan must re-apply the filter too
    tx.tx_delete(spark, fact, [("qty", ">", 55.0)])
    assert ms.tx_refresh_matview_star(spark, dst) is not None
    f = tx.read_table(spark, fact).where("qty >= 10.0")
    a = tx.read_table(spark, d1)
    b = tx.read_table(spark, d2).withColumnRenamed("key2", "k2")
    want = {
        (r["g1"], r["g2"]): r["max_qty"]
        for r in f.join(a, "k1").join(b, "k2")
        .groupBy("g1", "g2").agg(F.max("qty").alias("max_qty"))
        .collect()
    }
    got2 = {k: v[2] for k, v in _got(spark, dst).items()}
    assert got2 == want
