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
    # DROP TABLE is a verb now (round 11); an unknown name still raises
    with pytest.raises(ValueError, match="unknown table"):
        txsql.tx_sql(spark, "DROP TABLE never_bound_name")
    with pytest.raises(ValueError, match="unsupported statement"):
        txsql.tx_sql(spark, "GRANT ALL ON t TO alice")


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


def test_scope_skips_string_literals():
    # VERDICT r9 item 6: an alias-shaped substring inside a quoted
    # literal is data, not a reference
    assert txsql._scope("t.note = 's.kept' AND s.v > 1", "t", "s") == (
        "target.note = 's.kept' AND source.v > 1"
    )
    assert txsql._scope("concat(t.a, 'x''s t.y', s.b)", "t", "s") == (
        "concat(target.a, 'x''s t.y', source.b)"
    )


def test_merge_same_alias_rejected(spark, tmp_path):
    # ADVICE r10: one alias for both sides would silently scope every
    # reference to source. — reject the ambiguous text instead
    _stage(spark, tmp_path, "t_dup", n=3)
    with pytest.raises(ValueError, match="distinct aliases"):
        txsql.tx_sql(spark, """
            MERGE INTO t_dup USING t_dup ON t_dup.k = t_dup.k
            WHEN MATCHED THEN DELETE
        """)


def test_merge_case_when_in_assignment(spark, tmp_path):
    # ADVICE r10: a CASE WHEN inside an un-parenthesized assignment
    # used to split the WHEN-clause list mid-expression
    p = _stage(spark, tmp_path, "t_case", n=6)
    spark.createDataFrame(
        [(1, 9, 10.0, "s"), (3, 9, 30.0, "s")], _SCHEMA
    ).createOrReplaceTempView("case_src")
    txsql.tx_sql(spark, """
        MERGE INTO t_case t USING case_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET
            amt = CASE WHEN s.amt > 20 THEN s.amt ELSE t.amt END,
            status = CASE WHEN s.k = 1 THEN 'one' WHEN s.k = 3 THEN 'three'
                     ELSE t.status END
    """)
    got = {r[0]: r for r in _content(spark, p)}
    assert got[1] == (1, 1, 1.0, "one")       # amt kept, status cased
    assert got[3] == (3, 3, 30.0, "three")    # amt taken
    assert got[2] == (2, 2, 2.0, "open")


def test_split_top_case_tracking():
    assert txsql._split_top(
        "a = CASE WHEN x THEN 1 ELSE 2 END, b = 3", r","
    ) == ["a = CASE WHEN x THEN 1 ELSE 2 END", " b = 3"]
    # nested CASE
    assert len(txsql._split_top(
        "a = CASE WHEN CASE WHEN y THEN 1 END = 1 THEN 2 END, b = 1", r","
    )) == 2
    # AND inside a CASE arm is not a conjunction boundary
    assert txsql._split_top(
        "k = CASE WHEN a AND b THEN 1 END AND grp = 2", r"\s+AND\s+"
    ) == ["k = CASE WHEN a AND b THEN 1 END", "grp = 2"]


def test_create_table_empty_then_insert(spark, tmp_path):
    loc = str(tmp_path / "created")
    v = txsql.tx_sql(spark, f"""
        CREATE TABLE t_created (k INT, amt DECIMAL(10,2), note STRING)
        LOCATION '{loc}' TBLPROPERTIES ('owner' = 'ddl')
    """)
    assert v == 1
    assert tx.table_version(loc) == 1
    # empty but SQL-readable immediately
    assert spark.sql("SELECT count(*) n FROM t_created").first()["n"] == 0
    txsql.tx_sql(
        spark,
        "INSERT INTO t_created VALUES (1, CAST(1.50 AS DECIMAL(10,2)), 'a')",
    )
    assert _content(spark, loc) == [(1, __import__("decimal").Decimal("1.50"), "a")]
    st = tx._fold_state(loc)
    assert st.properties.get("owner") == "ddl"


def test_create_table_as_select(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_ctas_src", n=6)
    loc = str(tmp_path / "ctas")
    v = txsql.tx_sql(spark, f"""
        CREATE TABLE t_ctas LOCATION '{loc}'
        AS SELECT k, amt * 2 AS amt2 FROM t_ctas_src WHERE k < 3
    """)
    assert v == 1
    got = sorted(tuple(r) for r in tx.read_table(spark, loc).collect())
    assert got == [(0, 0.0), (1, 2.0), (2, 4.0)]
    # self-registered: SQL DML works without any Python call
    txsql.tx_sql(spark, "DELETE FROM t_ctas WHERE k = 0")
    assert spark.sql("SELECT count(*) n FROM t_ctas").first()["n"] == 2
    del p


def test_create_table_if_not_exists_adopts(spark, tmp_path):
    loc = str(tmp_path / "adopt")
    tx.tx_append(spark.createDataFrame([(1, 0, 1.0, "x")], _SCHEMA), loc)
    with pytest.raises(ValueError, match="already exists"):
        txsql.tx_sql(spark, f"CREATE TABLE t_adopt (k INT) LOCATION '{loc}'")
    v = txsql.tx_sql(
        spark, f"CREATE TABLE IF NOT EXISTS t_adopt (k INT) LOCATION '{loc}'"
    )
    assert v == 1
    assert spark.sql("SELECT count(*) n FROM t_adopt").first()["n"] == 1


def test_create_table_default_location_is_warehouse(spark, tmp_path):
    import os
    import uuid

    name = f"t_wh_{uuid.uuid4().hex[:8]}"
    txsql.tx_sql(spark, f"CREATE TABLE {name} (k INT)")
    path = os.path.join(txsql._warehouse_dir(spark), name)
    assert tx.table_version(path) == 1
    txsql.tx_sql(spark, f"DROP TABLE {name} PURGE")
    assert not os.path.exists(path)


def test_alter_table_add_rename_drop(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_alter", n=3)
    v = txsql.tx_sql(
        spark, "ALTER TABLE t_alter ADD COLUMNS (score DOUBLE, tag STRING)"
    )
    assert v == 2  # ONE atomic metadata-only commit for the whole list
    assert spark.sql(
        "SELECT count(*) n FROM t_alter WHERE score IS NULL"
    ).first()["n"] == 3
    txsql.tx_sql(spark, "ALTER TABLE t_alter RENAME COLUMN tag TO label")
    cols = spark.sql("SELECT * FROM t_alter").columns
    assert "label" in cols and "tag" not in cols
    txsql.tx_sql(spark, "ALTER TABLE t_alter DROP COLUMN score")
    assert "score" not in spark.sql("SELECT * FROM t_alter").columns
    # data survived the metadata-only churn
    assert len(_content(spark, p)) == 3


def test_add_column_never_resurrects_dropped_bytes(spark, tmp_path):
    _stage(spark, tmp_path, "t_readd", n=2)
    txsql.tx_sql(spark, "ALTER TABLE t_readd DROP COLUMN status")
    txsql.tx_sql(spark, "ALTER TABLE t_readd ADD COLUMN status STRING")
    got = spark.sql("SELECT status FROM t_readd").collect()
    assert [r["status"] for r in got] == [None, None]


def test_describe_history(spark, tmp_path):
    _stage(spark, tmp_path, "t_hist", n=4)
    txsql.tx_sql(spark, "DELETE FROM t_hist WHERE k = 0")
    df = txsql.tx_sql(spark, "DESCRIBE HISTORY t_hist")
    rows = df.collect()
    assert [r["version"] for r in rows] == [2, 1]
    assert rows[0]["action"] == "delete" or rows[0]["n_removed"] >= 1
    assert rows[1]["action"] == "append"


def test_optimize_and_zorder(spark, tmp_path):
    p = str(tmp_path / "t_opt")
    for i in range(4):
        tx.tx_append(
            spark.createDataFrame(
                [(j, j % 4, float(j), "o") for j in range(i * 5, i * 5 + 5)],
                _SCHEMA,
            ).coalesce(1),
            p,
        )
    txsql.tx_register(spark, p, "t_opt")
    v = txsql.tx_sql(spark, "OPTIMIZE t_opt")
    assert v == 5
    assert len(tx.snapshot(p).files) < 4
    assert len(_content(spark, p)) == 20
    v2 = txsql.tx_sql(spark, "OPTIMIZE t_opt ZORDER BY (k, grp)")
    assert v2 == 6
    assert len(_content(spark, p)) == 20


def test_vacuum_statement(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_vac", n=6)
    txsql.tx_sql(spark, "UPDATE t_vac SET amt = amt * 2")
    dry = txsql.tx_sql(
        spark, "VACUUM t_vac RETAIN 1 VERSIONS RETAIN 0 HOURS DRY RUN"
    )
    would = {r["path"] for r in dry.collect()}
    assert would  # the rewritten originals are reclaimable
    # dry run deleted nothing
    import os

    assert all(os.path.exists(os.path.join(p, f)) for f in would)


def test_select_version_as_of_inline(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_tt", n=5)
    txsql.tx_sql(spark, "DELETE FROM t_tt WHERE k < 3")
    n_now = spark.sql("SELECT count(*) n FROM t_tt").first()["n"]
    df = txsql.tx_sql(
        spark,
        "SELECT count(*) AS n FROM t_tt VERSION AS OF 1",
    )
    assert df.first()["n"] == 5 and n_now == 2
    # both versions in ONE statement, Spark's FOR form included
    df2 = txsql.tx_sql(spark, """
        SELECT (SELECT count(*) FROM t_tt FOR VERSION AS OF 1) AS before,
               (SELECT count(*) FROM t_tt) AS after
    """)
    r = df2.first()
    assert (r["before"], r["after"]) == (5, 2)
    del p


def test_select_timestamp_as_of_inline(spark, tmp_path):
    import time

    p = _stage(spark, tmp_path, "t_tts", n=4)
    time.sleep(0.05)
    cut = time.time()
    time.sleep(0.05)
    txsql.tx_sql(spark, "DELETE FROM t_tts WHERE k = 0")
    df = txsql.tx_sql(
        spark, f"SELECT count(*) AS n FROM t_tts TIMESTAMP AS OF {cut}"
    )
    assert df.first()["n"] == 4
    del p


def test_merge_using_version_as_of(spark, tmp_path):
    # restore deleted rows by merging the table's own v1 back in
    p = _stage(spark, tmp_path, "t_mtt", n=4)
    txsql.tx_sql(spark, "DELETE FROM t_mtt WHERE k >= 2")
    txsql.tx_sql(spark, """
        MERGE INTO t_mtt t USING t_mtt VERSION AS OF 1 s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert len(_content(spark, p)) == 4


def test_registry_is_session_scoped(spark, tmp_path):
    # VERDICT r9 item 6: two sessions in one process must not share
    # name->path bindings (temp views are session-scoped)
    p = _stage(spark, tmp_path, "t_scoped", n=3)
    other = spark.newSession()
    with pytest.raises(ValueError, match="unknown table"):
        txsql.tx_sql(other, "DELETE FROM t_scoped WHERE k = 0")
    # registering the same name to a DIFFERENT path in the other
    # session must not redirect the first session's binding
    p2 = str(tmp_path / "other")
    tx.tx_append(
        spark.createDataFrame([(100, 0, 1.0, "x")], _SCHEMA), p2
    )
    txsql.tx_register(other, p2, "t_scoped")
    txsql.tx_sql(other, "DELETE FROM t_scoped WHERE k = 100")
    assert len(_content(spark, p)) == 3   # first session's table intact
    assert _content(spark, p2) == []
    txsql.tx_sql(spark, "DELETE FROM t_scoped WHERE k = 0")
    assert len(_content(spark, p)) == 2


def test_sql_clone_and_restore(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_cl", n=6)
    loc = str(tmp_path / "cl")
    v = txsql.tx_sql(
        spark, f"CREATE TABLE t_cl2 LOCATION '{loc}' CLONE t_cl"
    )
    assert v == 1
    # zero-copy + divergence: delete on the clone, source untouched
    txsql.tx_sql(spark, "DELETE FROM t_cl2 WHERE k < 3")
    assert spark.sql("SELECT count(*) n FROM t_cl2").first()["n"] == 3
    assert len(_content(spark, p)) == 6
    # RESTORE the clone back to its creation version
    v2 = txsql.tx_sql(spark, "RESTORE TABLE t_cl2 TO VERSION AS OF 1")
    assert v2 == 3
    assert spark.sql("SELECT count(*) n FROM t_cl2").first()["n"] == 6


def test_sql_clone_version_as_of(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_clv", n=4)
    txsql.tx_sql(spark, "DELETE FROM t_clv WHERE k = 0")
    loc = str(tmp_path / "clv")
    txsql.tx_sql(
        spark,
        f"CREATE TABLE t_clv2 LOCATION '{loc}' CLONE t_clv VERSION AS OF 1",
    )
    assert spark.sql("SELECT count(*) n FROM t_clv2").first()["n"] == 4
    del p


def test_sql_deep_clone_copies_data(spark, tmp_path):
    import os

    _stage(spark, tmp_path, "t_cld", n=3)
    loc = str(tmp_path / "cld")
    txsql.tx_sql(
        spark, f"CREATE TABLE t_cld2 LOCATION '{loc}' DEEP CLONE t_cld"
    )
    snap = tx.snapshot(loc)
    assert all(not os.path.isabs(f) for f in snap.files)
    assert spark.sql("SELECT count(*) n FROM t_cld2").first()["n"] == 3


def test_quoted_timestamp_as_of_inline(spark, tmp_path):
    # round-10 review: the quoted ISO form used to be unreachable (the
    # rewrite excised quoted segments before matching)
    import datetime
    import time

    p = _stage(spark, tmp_path, "t_qtt", n=4)
    time.sleep(0.05)
    cut = datetime.datetime.now().isoformat()
    time.sleep(0.05)
    txsql.tx_sql(spark, "DELETE FROM t_qtt WHERE k = 0")
    df = txsql.tx_sql(
        spark, f"SELECT count(*) AS n FROM t_qtt TIMESTAMP AS OF '{cut}'"
    )
    assert df.first()["n"] == 4
    # but a table name INSIDE a string literal stays data
    df2 = txsql.tx_sql(
        spark, "SELECT 't_qtt VERSION AS OF 1' AS s FROM t_qtt LIMIT 1"
    )
    assert df2.first()["s"] == "t_qtt VERSION AS OF 1"
    del p


def test_add_columns_is_atomic(spark, tmp_path):
    # one bad entry fails the whole statement BEFORE anything commits
    p = _stage(spark, tmp_path, "t_atomic", n=2)
    v_before = tx.table_version(p)
    with pytest.raises(ValueError, match="already exists"):
        txsql.tx_sql(
            spark, "ALTER TABLE t_atomic ADD COLUMNS (fresh INT, k INT)"
        )
    assert tx.table_version(p) == v_before
    assert "fresh" not in tx.read_table(spark, p).columns


def test_ctas_column_list_must_be_plain_names(spark, tmp_path):
    _stage(spark, tmp_path, "t_ctsrc", n=2)
    loc = str(tmp_path / "bad")
    with pytest.raises(ValueError, match="plain names"):
        txsql.tx_sql(spark, f"""
            CREATE TABLE t_bad (a INT, b STRING) LOCATION '{loc}'
            AS SELECT k, status FROM t_ctsrc
        """)


def test_insert_overwrite_where_is_idempotent(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_ow", n=8)
    stmt = """
        INSERT OVERWRITE t_ow WHERE grp = 1
        SELECT k + 1000, 1, 99.0, 'replaced' FROM t_ow WHERE grp = 1
    """
    txsql.tx_sql(spark, stmt)
    got = _content(spark, p)
    assert all(r[3] == "replaced" for r in got if r[1] == 1)
    assert sum(1 for r in got if r[1] == 1) == 2
    assert len(got) == 8
    # same statement again: replaces the same region with the shifted
    # keys of the REPLACED rows — row count stays put (idempotent unit)
    n_before = len(got)
    txsql.tx_sql(spark, """
        INSERT OVERWRITE t_ow WHERE grp = 1
        VALUES (5000, 1, 1.0, 'x'), (5001, 1, 2.0, 'x')
    """)
    got2 = _content(spark, p)
    assert len(got2) == n_before
    assert {r[0] for r in got2 if r[1] == 1} == {5000, 5001}


def test_insert_overwrite_full_table(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_ow2", n=5)
    txsql.tx_sql(
        spark,
        "INSERT OVERWRITE t_ow2 VALUES (1, 0, 1.0, 'only')",
    )
    assert _content(spark, p) == [(1, 0, 1.0, "only")]


def test_insert_overwrite_rich_predicate_refused(spark, tmp_path):
    _stage(spark, tmp_path, "t_ow3", n=4)
    with pytest.raises(ValueError, match="validatable"):
        txsql.tx_sql(spark, """
            INSERT OVERWRITE t_ow3 WHERE k % 2 = 0
            VALUES (2, 0, 1.0, 'x')
        """)


def test_show_tables_and_describe_table(spark, tmp_path):
    p = _stage(spark, tmp_path, "t_meta", n=3)
    shown = {
        r["name"]: (r["path"], r["version"])
        for r in txsql.tx_sql(spark, "SHOW TABLES").collect()
    }
    assert shown["t_meta"] == (p, 1)
    desc = txsql.tx_sql(spark, "DESCRIBE TABLE t_meta").collect()
    assert [(r["col_name"], r["data_type"]) for r in desc] == [
        ("k", "int"), ("grp", "int"), ("amt", "double"),
        ("status", "string"),
    ]
    # bare DESCRIBE t works too
    assert len(txsql.tx_sql(spark, "DESCRIBE t_meta").collect()) == 4
