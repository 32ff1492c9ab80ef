"""N-way STAR matviews (VERDICT r10 item 2): factorized IVM over
fact ⋈ dim1 ⋈ ... with per-side pre-join filters, telescoping N-term
delta refresh from every source's change feed, exactly-once under one
packed N-version token, crash self-healing."""

from __future__ import annotations

import os
import unittest.mock as mock

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import matview_star as ms
from event_streaming_toy_example_spark.operators import txtable as tx


def _mk_star(spark, tmp_path, filters=None):
    """fact(k1, k2, qty) ⋈ d1(k1, g1, w) ⋈ d2(key2→k2, g2)."""
    fact = str(tmp_path / "fact")
    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    dst = str(tmp_path / "mv")
    tx.tx_append(
        spark.createDataFrame(
            [(i % 4, i % 3, float(i)) for i in range(60)],
            "k1 int, k2 int, qty double",
        ).repartition(3),
        fact,
    )
    tx.tx_append(
        spark.createDataFrame(
            [(k, f"g{k % 2}", 10.0 * k) for k in range(4)],
            "k1 int, g1 string, w double",
        ),
        d1,
    )
    tx.tx_append(
        spark.createDataFrame(
            [(k, f"h{k}") for k in range(3)],
            "key2 int, g2 string",
        ),
        d2,
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
            "total_qty": ("sum", "fact.qty"),
            "avg_w": ("avg", "d1.w"),
        },
        filters=filters,
    )
    assert v == 1
    return fact, d1, d2, dst


def _expected(spark, fact, d1, d2, filters=None):
    """Full recompute through plain DataFrame ops — the refresh must
    match it exactly."""
    f = tx.read_table(spark, fact)
    a = tx.read_table(spark, d1)
    b = tx.read_table(spark, d2).withColumnRenamed("key2", "k2")
    filters = filters or {}
    if "fact" in filters:
        f = f.where(F.expr(filters["fact"]))
    if "d1" in filters:
        a = a.where(F.expr(filters["d1"]))
    if "d2" in filters:
        b = b.where(F.expr(filters["d2"]))
    return {
        (r["g1"], r["g2"]): (r["n"], r["total_qty"], r["avg_w"])
        for r in f.join(a, "k1").join(b, "k2")
        .groupBy("g1", "g2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qty").alias("total_qty"),
            F.avg("w").alias("avg_w"),
        )
        .collect()
    }


def _view_rows(spark, dst):
    return {
        (r["g1"], r["g2"]): (r["n"], r["total_qty"], r["avg_w"])
        for r in tx.read_table(spark, dst)
        .select("g1", "g2", "n", "total_qty", "avg_w")
        .collect()
    }


def _close(got, want):
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in want:
        gn, gs, ga = got[k]
        wn, ws, wa = want[k]
        assert gn == wn, (k, got[k], want[k])
        assert abs(gs - ws) < 1e-6 and abs(ga - wa) < 1e-6, (
            k, got[k], want[k],
        )


def test_create_matches_full_recompute(spark, tmp_path):
    fact, d1, d2, dst = _mk_star(spark, tmp_path)
    _close(_view_rows(spark, dst), _expected(spark, fact, d1, d2))


def test_refresh_applies_deltas_on_all_three_sides(spark, tmp_path):
    fact, d1, d2, dst = _mk_star(spark, tmp_path)
    # one delta on EACH side, applied in ONE refresh
    tx.tx_delete(spark, fact, [("k1", "=", 2)])
    tx.tx_update(spark, d1, set={"w": "w + 5.0"}, where="k1 = 1")
    tx.tx_append(
        spark.createDataFrame([(1, "hx")], "key2 int, g2 string"), d2
    )
    v = ms.tx_refresh_matview_star(spark, dst)
    assert v is not None
    _close(_view_rows(spark, dst), _expected(spark, fact, d1, d2))
    applied, current = ms.matview_star_lag(dst)
    assert applied == current == {"fact": 2, "d1": 2, "d2": 2}
    # idempotent: nothing new → None
    assert ms.tx_refresh_matview_star(spark, dst) is None


def test_refresh_never_reads_sources(spark, tmp_path):
    fact, d1, d2, dst = _mk_star(spark, tmp_path)
    tx.tx_delete(spark, fact, [("k2", "=", 0)])
    tx.tx_update(spark, d1, set={"w": "w * 2.0"}, where="k1 = 3")
    calls = []
    orig = tx.read_table

    def spy(sp, path, *a, **kw):
        calls.append(os.path.abspath(path))
        return orig(sp, path, *a, **kw)

    with mock.patch.object(ms.tx, "read_table", side_effect=spy):
        ms.tx_refresh_matview_star(spark, dst)
    bad = set(calls) & {
        os.path.abspath(fact), os.path.abspath(d1), os.path.abspath(d2)
    }
    assert not bad, f"star refresh re-read source table(s): {bad}"
    _close(_view_rows(spark, dst), _expected(spark, fact, d1, d2))


def test_prejoin_filters_apply_at_create_and_refresh(spark, tmp_path):
    filters = {"fact": "qty < 50.0", "d1": "k1 <> 0"}
    fact, d1, d2, dst = _mk_star(spark, tmp_path, filters=filters)
    _close(
        _view_rows(spark, dst), _expected(spark, fact, d1, d2, filters)
    )
    # deltas straddling the filter boundary: rows entering/leaving the
    # filtered relation must count; rows outside it must not
    tx.tx_append(
        spark.createDataFrame(
            [(1, 1, 20.0), (1, 1, 99.0)], "k1 int, k2 int, qty double"
        ),
        fact,
    )
    tx.tx_delete(spark, d1, [("k1", "=", 3)])
    ms.tx_refresh_matview_star(spark, dst)
    _close(
        _view_rows(spark, dst), _expected(spark, fact, d1, d2, filters)
    )


def test_crash_between_view_and_state_merges_self_heals(spark, tmp_path):
    """Crash window: the view merge landed, the state merges did not.
    The NEXT refresh repairs the states from their own floors before
    computing, and converges to the full recompute."""
    fact, d1, d2, dst = _mk_star(spark, tmp_path)
    tx.tx_delete(spark, fact, [("k1", "=", 0)])

    real_advance = ms._advance_states
    calls = {"n": 0}

    def crash_after_view(*a, **kw):
        # first call is the repair pass (no-op), second is the
        # post-view-merge advance — crash there
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash before state merges")
        return real_advance(*a, **kw)

    with mock.patch.object(ms, "_advance_states", crash_after_view):
        with pytest.raises(RuntimeError, match="simulated crash"):
            ms.tx_refresh_matview_star(spark, dst)
    # the view advanced, the states lag — repair happens inside the
    # next refresh and the result still matches the recompute
    tx.tx_update(spark, d1, set={"w": "w + 1.0"}, where="k1 = 2")
    ms.tx_refresh_matview_star(spark, dst)
    _close(_view_rows(spark, dst), _expected(spark, fact, d1, d2))


def test_minmax_and_bad_side_refused_by_name(spark, tmp_path):
    fact = str(tmp_path / "f")
    d1 = str(tmp_path / "d")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], "k1 int, qty double"), fact
    )
    tx.tx_append(
        spark.createDataFrame([(1, "g")], "k1 int, g1 string"), d1
    )
    dims = [{"name": "d1", "src": d1, "on": ["k1"], "group_by": ["g1"]}]
    # round 12: min/max is ACCEPTED (recompute-affected-groups mode,
    # tests/test_matview_star_minmax.py); unknown fns still refuse
    with pytest.raises(ValueError, match="unsupported aggregate"):
        ms.tx_create_matview_star(
            spark, str(tmp_path / "m1"), fact, dims,
            aggs={"m": ("median", "fact.qty")},
        )
    with pytest.raises(ValueError, match="qualify the aggregate"):
        ms.tx_create_matview_star(
            spark, str(tmp_path / "m2"), fact, dims,
            aggs={"s": ("sum", "ghost.qty")},
        )
    with pytest.raises(ValueError, match="filters for unknown sides"):
        ms.tx_create_matview_star(
            spark, str(tmp_path / "m3"), fact, dims,
            aggs={"n": ("count", "*")}, filters={"nope": "1=1"},
        )


def test_filter_on_undeclared_column_fails_loudly_at_create(
    spark, tmp_path
):
    """A filter may reference only the side's declared (key / group /
    aggregate) columns — the refresh reads exactly those from the
    feed, so an undeclared reference must fail at CREATE, not
    silently later."""
    fact = str(tmp_path / "f")
    d1 = str(tmp_path / "d")
    tx.tx_append(
        spark.createDataFrame(
            [(1, 1.0, "x")], "k1 int, qty double, extra string"
        ),
        fact,
    )
    tx.tx_append(
        spark.createDataFrame([(1, "g")], "k1 int, g1 string"), d1
    )
    # 'extra' exists on the SOURCE but not among declared columns —
    # the create probes the filter against a LINEAGE-FREE declared
    # schema (Spark's hidden-column resolution would otherwise let it
    # silently reach pruned source columns the feed can never supply)
    # and refuses BY NAME
    with pytest.raises(ValueError, match="must reference only"):
        ms.tx_create_matview_star(
            spark, str(tmp_path / "mv"), fact,
            [{"name": "d1", "src": d1, "on": ["k1"], "group_by": ["g1"]}],
            aggs={"n": ("count", "*")}, filters={"fact": "extra <> 'y'"},
        )


def test_version_cap_raises_by_name(spark, tmp_path):
    with pytest.raises(ValueError, match="cap of the packed watermark"):
        ms._pack([1 << 20, 0, 0], 20)
