"""SQL DML routing (``operators/txsql.py``): DELETE/UPDATE/INSERT/
MERGE statements over registered transactional tables, with the
statement skeleton parsed here and every expression handed to Spark's
own parser.  Simple WHERE conjunctions compile to clause tuples (the
stats fast path); richer predicates take the raw-SQL path."""

from __future__ import annotations

import pytest

from event_streaming_toy_example_spark.operators import txsql
from event_streaming_toy_example_spark.operators import txtable as tx

_SCHEMA = "k int, grp int, amt double, status string"


def _stage(spark, tmp_path, name, n=20):
    p = str(tmp_path / name)
    rows = [(i, i % 4, float(i), "open") for i in range(n)]
    tx.tx_append(
        spark.createDataFrame(rows, _SCHEMA).repartition(2), p
    )
    txsql.tx_register(spark, p, name)
    return p


def _content(spark, p):
    return sorted(tuple(r) for r in tx.read_table(spark, p).collect())


def test_compile_clauses_fast_path():
    assert txsql._compile_clauses("k = 5") == [("k", "=", 5)]
    assert txsql._compile_clauses("k >= 2 AND grp < 3 AND s = 'x''y'") == [
        ("k", ">=", 2), ("grp", "<", 3), ("s", "=", "x'y"),
    ]
    assert txsql._compile_clauses("k IN (1, 2, 3)") == [("k", "in", (1, 2, 3))]
    # richer shapes fall back to the raw path — including FUNCTION
    # calls: SQL day(ts) is day-of-month, NOT the engine's day()
    # partition transform, so it must reach Spark's parser verbatim
    assert txsql._compile_clauses("day(ts) = '2024-01-01'") is None
    assert txsql._compile_clauses("k = 5 OR grp = 1") is None
    assert txsql._compile_clauses("k % 2 = 0") is None
    assert txsql._compile_clauses("upper(status) = 'OPEN'") is None
    assert txsql._compile_clauses("k = grp") is None


def test_sql_delete_with_clause_where(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_del")
    v = txsql.tx_sql(spark, "DELETE FROM t_del WHERE k < 5")
    assert v == 2
    assert all(r[0] >= 5 for r in _content(spark, p))
    # the registered view followed the write
    assert spark.sql("SELECT count(*) n FROM t_del").first()["n"] == 15


def test_sql_delete_with_raw_predicate(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_del2")
    txsql.tx_sql(spark, "DELETE FROM t_del2 WHERE k % 2 = 0 OR grp = 3")
    got = _content(spark, p)
    assert got and all(r[0] % 2 == 1 and r[1] != 3 for r in got)


def test_sql_delete_all(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_del3", n=6)
    txsql.tx_sql(spark, "DELETE FROM t_del3")
    assert _content(spark, p) == []


def test_sql_update(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_upd")
    txsql.tx_sql(
        spark,
        "UPDATE t_upd SET amt = amt * 2, status = 'hot' WHERE grp = 1",
    )
    for r in _content(spark, p):
        if r[1] == 1:
            assert r[2] == r[0] * 2.0 and r[3] == "hot"
        else:
            assert r[2] == float(r[0]) and r[3] == "open"


def test_sql_update_raw_predicate_and_funcs(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_upd2", n=8)
    txsql.tx_sql(
        spark,
        "UPDATE t_upd2 SET status = concat(status, '_', cast(grp as string)) "
        "WHERE k % 2 = 1",
    )
    for r in _content(spark, p):
        assert r[3] == (f"open_{r[1]}" if r[0] % 2 == 1 else "open")


def test_sql_insert_select_and_values(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_ins", n=4)
    txsql.tx_sql(
        spark,
        "INSERT INTO t_ins SELECT k + 100, grp, amt, 'copied' FROM t_ins",
    )
    assert len(_content(spark, p)) == 8
    txsql.tx_sql(
        spark, "INSERT INTO t_ins VALUES (500, 0, 5.5, 'v'), (501, 1, 6.5, 'v')"
    )
    got = _content(spark, p)
    assert (500, 0, 5.5, "v") in got and len(got) == 10


def test_sql_insert_named_columns_null_fill(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_ins2", n=2)
    txsql.tx_sql(spark, "INSERT INTO t_ins2 (k, status) VALUES (900, 'thin')")
    got = [r for r in _content(spark, p) if r[0] == 900]
    assert got == [(900, None, None, "thin")]


def test_sql_insert_wrong_arity_raises(spark, tmp_path):
    _stage(spark, tmp_path, "t_ins3", n=2)
    with pytest.raises(ValueError, match="columns"):
        txsql.tx_sql(spark, "INSERT INTO t_ins3 VALUES (1, 2)")


def test_sql_merge_full_clause_surface(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_mrg", n=10)
    src = spark.createDataFrame(
        [(2, 9, 25.0, "s"), (4, 9, 0.0, "cancel"), (50, 9, 500.0, "new")],
        _SCHEMA,
    )
    src.createOrReplaceTempView("mrg_src")
    v = txsql.tx_sql(spark, """
        MERGE INTO t_mrg t USING mrg_src s ON t.k = s.k
        WHEN MATCHED AND s.status = 'cancel' THEN DELETE
        WHEN MATCHED THEN UPDATE SET amt = s.amt, status = s.status
        WHEN NOT MATCHED THEN INSERT *
    """)
    got = _content(spark, p)
    assert (4, 0, 4.0, "open") not in got          # deleted
    assert (2, 2, 25.0, "s") in got                # updated
    assert (50, 9, 500.0, "new") in got            # inserted
    assert len(got) == 10
    assert v == 2


def test_sql_merge_subquery_source_and_by_source(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_mrg2", n=6)
    v = txsql.tx_sql(spark, """
        MERGE INTO t_mrg2 AS t
        USING (SELECT 1 AS k, 0 AS grp, CAST(111.0 AS DOUBLE) AS amt,
               'u' AS status) AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED BY SOURCE AND t.k >= 4 THEN DELETE
    """)
    got = _content(spark, p)
    assert (1, 0, 111.0, "u") in got
    assert all(r[0] < 4 for r in got)
    assert len(got) == 4


def test_sql_select_reads_registered_view(spark, tmp_path):
    _stage(spark, tmp_path, "t_sel", n=7)
    df = txsql.tx_sql(spark, "SELECT grp, count(*) AS n FROM t_sel GROUP BY grp")
    assert sum(r["n"] for r in df.collect()) == 7


def test_sql_unknown_table_and_kind_raise(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown table"):
        txsql.tx_sql(spark, "DELETE FROM nope WHERE k = 1")
    with pytest.raises(ValueError, match="unsupported statement"):
        txsql.tx_sql(spark, "DROP TABLE t")


def test_sql_merge_on_must_be_key_equality(spark, tmp_path):
    _stage(spark, tmp_path, "t_mrg3", n=3)
    spark.createDataFrame([(1, 0, 1.0, "x")], _SCHEMA).createOrReplaceTempView(
        "mrg_src3"
    )
    with pytest.raises(ValueError, match="same-named key"):
        txsql.tx_sql(spark, """
            MERGE INTO t_mrg3 t USING mrg_src3 s ON t.k > s.k
            WHEN MATCHED THEN DELETE
        """)


def test_typed_literals_gate_the_clause_fast_path(spark, tmp_path):
    # a quoted literal against a TIMESTAMP column must NOT compile to
    # a clause tuple: stats are ISO-normalized ('T' separator) and a
    # space-form literal would compare below min and PRUNE files that
    # hold matching rows — silent row loss.  The raw path costs only
    # the pruning.
    import datetime

    p = str(tmp_path / "t_ts")
    rows = [
        (i, datetime.datetime(2024, 3, 5, 9 + i))
        for i in range(4)
    ]
    tx.tx_append(
        spark.createDataFrame(rows, "k int, ts timestamp").coalesce(1), p
    )
    txsql.tx_register(spark, p, "t_ts")
    v = txsql.tx_sql(
        spark, "DELETE FROM t_ts WHERE ts = '2024-03-05 10:00:00'"
    )
    assert v == 2
    left = sorted(r["k"] for r in tx.read_table(spark, p).collect())
    assert left == [0, 2, 3]  # k=1 (10:00) deleted
    # and the gate itself: string vs non-string column -> not ok
    assert not txsql._clauses_typed_ok([("ts", "=", "2024-03-05")], p)
    assert not txsql._clauses_typed_ok([("k", "=", "5")], p)
    assert txsql._clauses_typed_ok([("k", "=", 5)], p)


def test_scope_alias_named_target_or_source(spark, tmp_path):
    # single-pass rewrite: an alias literally named 'target' must not
    # be double-rewritten to 'source.'
    assert txsql._scope("a.v < target.v", "a", "target") == (
        "target.v < source.v"
    )
    assert txsql._scope("source.v = t.v", "source", "t") == (
        "target.v = source.v"
    )
