"""Incrementally-maintained materialized views (``operators/
matview.py``): delta mode (count/sum/avg — O(changed rows) per
refresh, no source data read beyond the commit delta) and recompute
mode (min/max — affected groups recomputed from source), both applied
as one exactly-once MERGE into the view's own transactional table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import matview as mv
from event_streaming_toy_example_spark.operators import txtable as tx

_SCHEMA = "k int, grp string, amt double"


def _stage_src(spark, tmp_path, n=24):
    src = str(tmp_path / "src")
    rows = [(i, f"g{i % 3}", float(i)) for i in range(n)]
    tx.tx_append(
        spark.createDataFrame(rows, _SCHEMA).repartition(2), src
    )
    return src


def _expected(spark, src, group_by, agg_cols):
    return sorted(
        tuple(r)
        for r in tx.read_table(spark, src)
        .groupBy(*group_by)
        .agg(*agg_cols)
        .collect()
    )


def _view_rows(spark, dst, out_cols):
    return sorted(
        tuple(r)
        for r in tx.read_table(spark, dst).select(*out_cols).collect()
    )


_AGGS = {"n": ("count", "*"), "total": ("sum", "amt"), "mean": ("avg", "amt")}
_OUT = ["grp", "n", "total", "mean"]


def _agg_exprs():
    return [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("amt").alias("total"),
        F.avg("amt").alias("mean"),
    ]


def _assert_current(spark, src, dst):
    assert _view_rows(spark, dst, _OUT) == _expected(
        spark, src, ["grp"], _agg_exprs()
    )


def test_create_computes_base(spark, tmp_path):
    src = _stage_src(spark, tmp_path)
    dst = str(tmp_path / "mvd")
    mv.tx_create_matview(spark, src, dst, ["grp"], _AGGS)
    _assert_current(spark, src, dst)
    assert mv.matview_lag(dst) == (1, 1)


def test_delta_refresh_tracks_all_dml(spark, tmp_path):
    src = _stage_src(spark, tmp_path)
    dst = str(tmp_path / "mvd")
    mv.tx_create_matview(spark, src, dst, ["grp"], _AGGS)
    # append, CoW delete, MOR delete, update, upsert-like merge
    tx.tx_append(
        spark.createDataFrame(
            [(100, "g0", 7.5), (101, "g9", 1.0)], _SCHEMA
        ),
        src,
    )
    tx.tx_delete(spark, src, [("k", "<", 6)])
    tx.tx_delete(spark, src, [("k", "=", 10)], merge_on_read=True)
    tx.tx_update(spark, src, set={"amt": "amt * 3"}, where=[("grp", "=", "g1")])
    v = mv.tx_refresh_matview(spark, dst)
    assert v is not None
    _assert_current(spark, src, dst)
    applied, cur = mv.matview_lag(dst)
    assert applied == cur == tx.table_version(src)
    # idempotent: nothing more to do
    assert mv.tx_refresh_matview(spark, dst) is None


def test_delta_refresh_deletes_emptied_groups_and_inserts_new(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=9)
    dst = str(tmp_path / "mvd")
    mv.tx_create_matview(spark, src, dst, ["grp"], _AGGS)
    # empty g2 entirely; create g7
    tx.tx_delete(spark, src, [("grp", "=", "g2")])
    tx.tx_append(spark.createDataFrame([(200, "g7", 2.0)], _SCHEMA), src)
    mv.tx_refresh_matview(spark, dst)
    got = _view_rows(spark, dst, _OUT)
    groups = {r[0] for r in got}
    assert "g2" not in groups and "g7" in groups
    _assert_current(spark, src, dst)


def test_delta_refresh_reads_no_source_data_beyond_delta(spark, tmp_path):
    # the refresh must not re-aggregate the source: monkey-proof by
    # checking it works even when every ORIGINAL source file is gone
    # from disk reach... simpler: assert only commit files of the
    # delta range are consulted by watching read_table is never called
    # on the source inside a delta refresh
    src = _stage_src(spark, tmp_path)
    dst = str(tmp_path / "mvd")
    mv.tx_create_matview(spark, src, dst, ["grp"], _AGGS)
    tx.tx_append(spark.createDataFrame([(300, "g1", 4.0)], _SCHEMA), src)
    calls = []
    orig = tx.read_table

    def spy(spark_, path, *a, **k):
        calls.append(path)
        return orig(spark_, path, *a, **k)

    import unittest.mock as m

    with m.patch.object(mv.tx, "read_table", side_effect=spy):
        mv.tx_refresh_matview(spark, dst)
    assert src not in calls, "delta refresh re-read the source table"
    _assert_current(spark, src, dst)


def test_recompute_mode_for_min_max(spark, tmp_path):
    src = _stage_src(spark, tmp_path)
    dst = str(tmp_path / "mvr")
    aggs = {"hi": ("max", "amt"), "lo": ("min", "amt"), "n": ("count", "*")}
    mv.tx_create_matview(spark, src, dst, ["grp"], aggs)
    # delete the current max of g0 (k=21 -> amt 21.0): a delta could
    # never retract it; the recompute must
    tx.tx_delete(spark, src, [("k", "=", 21)])
    tx.tx_append(spark.createDataFrame([(400, "g8", -5.0)], _SCHEMA), src)
    mv.tx_refresh_matview(spark, dst)
    exp = _expected(
        spark, src, ["grp"],
        [F.max("amt").alias("hi"), F.min("amt").alias("lo"),
         F.count(F.lit(1)).cast("long").alias("n")],
    )
    assert _view_rows(spark, dst, ["grp", "hi", "lo", "n"]) == exp


def test_recompute_mode_drops_emptied_group(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=9)
    dst = str(tmp_path / "mvr")
    mv.tx_create_matview(
        spark, src, dst, ["grp"], {"hi": ("max", "amt")}
    )
    tx.tx_delete(spark, src, [("grp", "=", "g1")])
    mv.tx_refresh_matview(spark, dst)
    assert all(
        r[0] != "g1" for r in _view_rows(spark, dst, ["grp", "hi"])
    )


def test_matview_is_itself_transactional(spark, tmp_path):
    src = _stage_src(spark, tmp_path)
    dst = str(tmp_path / "mvd")
    mv.tx_create_matview(spark, src, dst, ["grp"], _AGGS)
    v1 = tx.table_version(dst)
    tx.tx_delete(spark, src, [("grp", "=", "g0")])
    mv.tx_refresh_matview(spark, dst)
    # time travel to the pre-refresh view
    old = tx.read_table(spark, dst, version=v1)
    assert any(r["grp"] == "g0" for r in old.collect())


def test_spec_validation(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=3)
    dst = str(tmp_path / "mvx")
    with pytest.raises(ValueError, match="unsupported aggregate"):
        mv.tx_create_matview(spark, src, dst, ["grp"], {"x": ("median", "amt")})
    with pytest.raises(ValueError, match="not a thing"):
        mv.tx_create_matview(spark, src, dst, ["grp"], {"x": ("sum", "*")})
    with pytest.raises(ValueError, match="group_by"):
        mv.tx_create_matview(spark, src, dst, [], _AGGS)
    with pytest.raises(ValueError, match="not a materialized view"):
        mv.tx_refresh_matview(spark, src)


def test_null_group_key_in_delta_raises(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=3)
    dst = str(tmp_path / "mvn")
    mv.tx_create_matview(spark, src, dst, ["grp"], _AGGS)
    tx.tx_append(spark.createDataFrame([(999, None, 1.0)], _SCHEMA), src)
    with pytest.raises(ValueError, match="NULL group-by key"):
        mv.tx_refresh_matview(spark, dst)


def test_metadata_only_commits_advance_the_watermark(spark, tmp_path):
    # property commits / compactions produce an empty change delta;
    # the refresh must still advance the applied-version watermark
    # (as an exactly-once empty merge) and later real changes apply
    src = _stage_src(spark, tmp_path, n=8)
    dst = str(tmp_path / "mvw")
    mv.tx_create_matview(spark, src, dst, ["grp"], {"n": ("count", "*")})
    tx.tx_set_properties(src, {"owner": "x"})
    v = mv.tx_refresh_matview(spark, dst)
    assert v is not None
    applied, cur = mv.matview_lag(dst)
    assert applied == cur == tx.table_version(src)
    tx.tx_delete(spark, src, [("grp", "=", "g0")])
    mv.tx_refresh_matview(spark, dst)
    assert all(
        r["grp"] != "g0" for r in tx.read_table(spark, dst).collect()
    )


# ------------------------------------- round 10: count(col) + sketches


def test_count_col_is_delta_maintained(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, f"g{i % 2}", float(i) if i % 3 else None) for i in range(12)]
    tx.tx_append(spark.createDataFrame(rows, _SCHEMA), src)
    dst = str(tmp_path / "mvc")
    mv.tx_create_matview(
        spark, src, dst, ["grp"],
        {"n_all": ("count", "*"), "n_amt": ("count", "amt")},
    )

    def check():
        got = _view_rows(spark, dst, ["grp", "n_all", "n_amt"])
        want = _expected(
            spark, src, ["grp"],
            [
                F.count(F.lit(1)).cast("long").alias("n_all"),
                F.count("amt").cast("long").alias("n_amt"),
            ],
        )
        assert got == want

    check()
    # nulls added and non-nulls deleted move the two counts apart
    tx.tx_append(
        spark.createDataFrame(
            [(100, "g0", None), (101, "g0", 5.0)], _SCHEMA
        ),
        src,
    )
    tx.tx_delete(spark, src, [("k", "=", 3)])
    assert mv.tx_refresh_matview(spark, dst) is not None
    check()


def _kmv_expected(spark, src, grp_col, key_col):
    """Reference per-group KMV estimate computed directly."""
    import hashlib

    rows = tx.read_table(spark, src).select(grp_col, key_col).collect()
    groups: dict = {}
    for r in rows:
        key = r[key_col]
        s = "<NULL>" if key is None else str(key)
        h = int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
        groups.setdefault(r[grp_col], set()).add(h)
    out = {}
    for g, hs in groups.items():
        top = sorted(hs)[: mv._KMV_K]
        if len(top) < mv._KMV_K:
            out[g] = len(top)
        else:
            out[g] = (mv._KMV_K - 1) * mv._KMV_SPACE // top[-1]
    return out


def test_approx_distinct_append_only_delta(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, f"g{i % 2}", float(i % 40)) for i in range(300)]
    tx.tx_append(spark.createDataFrame(rows, _SCHEMA), src)
    dst = str(tmp_path / "mvs")
    mv.tx_create_matview(
        spark, src, dst, ["grp"],
        {"nd": ("approx_distinct", "k"), "n": ("count", "*")},
    )
    got = {
        r["grp"]: r["nd"] for r in tx.read_table(spark, dst).collect()
    }
    assert got == _kmv_expected(spark, src, "grp", "k")
    # exactness below k distinct: g0 has 150 distinct ks > 64, so the
    # estimator path ran; accuracy sanity (KMV k=64 ~ 12% rse)
    assert abs(got["g0"] - 150) / 150 < 0.4
    # APPEND-only refresh stays delta (no source re-read)
    import unittest.mock as mock

    tx.tx_append(
        spark.createDataFrame(
            [(1000 + i, "g0", 1.0) for i in range(80)], _SCHEMA
        ),
        src,
    )
    calls = []
    orig = tx.read_table

    def spy(sp, path, *a, **kw):
        calls.append(path)
        return orig(sp, path, *a, **kw)

    with mock.patch.object(mv.tx, "read_table", side_effect=spy):
        assert mv.tx_refresh_matview(spark, dst) is not None
    assert src not in calls, "append-only sketch refresh re-read source"
    got2 = {
        r["grp"]: r["nd"] for r in tx.read_table(spark, dst).collect()
    }
    assert got2 == _kmv_expected(spark, src, "grp", "k")


def test_approx_distinct_delete_falls_back_to_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, f"g{i % 2}", 1.0) for i in range(200)]
    tx.tx_append(spark.createDataFrame(rows, _SCHEMA), src)
    dst = str(tmp_path / "mvs2")
    mv.tx_create_matview(
        spark, src, dst, ["grp"], {"nd": ("approx_distinct", "k")}
    )
    # a delete cannot retract hashes from the sketch: the refresh must
    # recompute the affected groups and land on the exact KMV of the
    # remaining rows
    tx.tx_delete(spark, src, [("k", ">=", 100)])
    assert mv.tx_refresh_matview(spark, dst) is not None
    got = {
        r["grp"]: r["nd"] for r in tx.read_table(spark, dst).collect()
    }
    assert got == _kmv_expected(spark, src, "grp", "k")
    # both groups now have exactly 50 distinct ks < 64: exact counts
    assert got == {"g0": 50, "g1": 50}


def test_approx_distinct_spec_validation(spark, tmp_path):
    src = _stage_src(spark, tmp_path, n=4)
    with pytest.raises(ValueError, match="not a thing"):
        mv.tx_create_matview(
            spark, src, str(tmp_path / "x"), ["grp"],
            {"nd": ("approx_distinct", "*")},
        )
