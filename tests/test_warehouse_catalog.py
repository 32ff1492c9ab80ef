"""Persistent warehouse catalog + table-lifecycle SQL verbs (VERDICT
r10 items 1 and 4): name→path registry under the warehouse dir
committed through the LogStore conditional-PUT protocol; DROP TABLE /
TRUNCATE TABLE / SHOW CREATE TABLE; ADD/DROP CONSTRAINT and generated
columns routed from SQL text."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txsql, txtable as tx
from event_streaming_toy_example_spark.operators import warehouse as whcat
from event_streaming_toy_example_spark.operators.logstore import (
    InMemoryLogStore,
    register_log_store,
    unregister_log_store,
)


def _fresh_session(spark, wh: str):
    """A NEW SparkSession (own temp views, own txsql session map, own
    runtime conf) sharing the context — the 'second session' of the
    VERDICT's done-criterion, pointed at the same warehouse."""
    s = spark.newSession()
    s.conf.set("spark_graft.warehouse.dir", str(wh))
    return s


# ------------------------------------------------- catalog unit tests


def test_catalog_bind_versions_and_idempotence(tmp_path):
    wh = str(tmp_path)
    assert whcat.catalog_state(wh) == (0, {})
    v1 = whcat.catalog_bind(wh, "a", str(tmp_path / "pa"))
    assert v1 == 1
    # same name, same path: idempotent (crash-retry of our own bind)
    assert whcat.catalog_bind(wh, "a", str(tmp_path / "pa")) == 1
    v2 = whcat.catalog_bind(wh, "b", str(tmp_path / "pb"))
    assert v2 == 2
    assert whcat.catalog_tables(wh) == {
        "a": str(tmp_path / "pa"),
        "b": str(tmp_path / "pb"),
    }
    # same name, different path: refused by name
    with pytest.raises(whcat.TableExistsError, match="'a'"):
        whcat.catalog_bind(wh, "a", str(tmp_path / "other"))
    # replace wins explicitly
    assert whcat.catalog_bind(
        wh, "a", str(tmp_path / "other"), replace=True
    ) == 3
    assert whcat.catalog_tables(wh)["a"] == str(tmp_path / "other")


def test_catalog_unbind(tmp_path):
    wh = str(tmp_path)
    whcat.catalog_bind(wh, "a", str(tmp_path / "pa"))
    assert whcat.catalog_unbind(wh, "a") == 2
    assert whcat.catalog_tables(wh) == {}
    with pytest.raises(KeyError):
        whcat.catalog_unbind(wh, "a")
    assert whcat.catalog_unbind(wh, "a", if_exists=True) is None


def test_catalog_bind_race_loser_revalidates(tmp_path):
    """Two writers race the conditional PUT: the loser re-reads and —
    name now taken by the winner — fails BY NAME, never silently
    overwrites.  Driven deterministically through the in-memory
    store's before_put hook (the same harness the table-log interleave
    tests use)."""
    wh = str(tmp_path / "wh")
    fired = []

    def interleave(path: str) -> None:
        # the OTHER session's whole bind lands first
        fired.append(path)
        whcat.catalog_bind(wh, "t", str(tmp_path / "winner"))

    store = InMemoryLogStore(before_put=interleave)
    register_log_store(wh, store)
    try:
        with pytest.raises(whcat.TableExistsError):
            whcat.catalog_bind(wh, "t", str(tmp_path / "loser"))
        assert fired, "the interleave hook must have run"
        assert whcat.catalog_tables(wh)["t"] == str(tmp_path / "winner")
        # DIFFERENT names racing: both land (the loser's retry commits
        # version 2 on top of the winner's snapshot)
        store.before_put = lambda p: whcat.catalog_bind(
            wh, "other", str(tmp_path / "o")
        )
        v = whcat.catalog_bind(wh, "mine", str(tmp_path / "m"))
        assert v == 3
        assert set(whcat.catalog_tables(wh)) == {"t", "other", "mine"}
    finally:
        unregister_log_store(wh)


# ------------------------------------- cross-session name resolution


def _seed(spark, path: str, n: int = 4) -> None:
    df = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 10.0).alias("amt"),
    )
    tx.tx_append(df, path)


def test_fresh_session_resolves_created_table(spark, tmp_path):
    """The done-criterion: CREATE TABLE in one session, SELECT it from
    a FRESH session that never calls tx_register."""
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    s1.range(3).select(
        F.col("id").cast("int").alias("k")
    ).createOrReplaceTempView("src_rows")
    txsql.tx_sql(s1, "CREATE TABLE t_xsess AS SELECT k FROM src_rows")
    s2 = _fresh_session(spark, wh)
    got = txsql.tx_sql(
        s2, "SELECT k FROM t_xsess ORDER BY k"
    ).collect()
    assert [r["k"] for r in got] == [0, 1, 2]
    # and DML routes too, no registration anywhere
    txsql.tx_sql(s2, "DELETE FROM t_xsess WHERE k = 1")
    assert txsql.tx_sql(s2, "SELECT count(*) n FROM t_xsess").first()["n"] == 2


def test_create_same_name_second_session_rejected_by_name(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    txsql.tx_sql(s1, "CREATE TABLE t_dup (k INT)")
    s2 = _fresh_session(spark, wh)
    with pytest.raises(whcat.TableExistsError, match="t_dup"):
        txsql.tx_sql(
            s2, f"CREATE TABLE t_dup (k INT) LOCATION '{tmp_path}/el'"
        )
    # IF NOT EXISTS adopts instead
    v = txsql.tx_sql(s2, "CREATE TABLE IF NOT EXISTS t_dup (k INT)")
    assert v == 1


def test_create_race_loser_cleans_up_fresh_data(spark, tmp_path):
    """A CREATE that loses the catalog bind (another session bound the
    name to a different path mid-flight) fails the statement AND
    removes the data it just wrote — no orphan directory."""
    wh = str(tmp_path / "wh")
    s1 = _fresh_session(spark, wh)
    loser_loc = str(tmp_path / "loser_loc")
    winner_loc = str(tmp_path / "winner_loc")
    store = InMemoryLogStore(
        before_put=lambda p: whcat.catalog_bind(wh, "t_race", winner_loc)
    )
    register_log_store(os.path.join(wh, whcat._CAT_DIR), store)
    try:
        with pytest.raises(whcat.TableExistsError):
            txsql.tx_sql(
                s1, f"CREATE TABLE t_race (k INT) LOCATION '{loser_loc}'"
            )
    finally:
        unregister_log_store(os.path.join(wh, whcat._CAT_DIR))
    assert tx.table_version(loser_loc) == 0
    assert not os.path.exists(os.path.join(loser_loc, "_txlog"))


def test_crash_between_data_commit_and_bind_recovers(spark, tmp_path):
    """Crash-during-CREATE: the table committed but the catalog bind
    never landed.  Plain CREATE at the same location says 'use IF NOT
    EXISTS'; the IF NOT EXISTS retry adopts the orphan and binds it."""
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    loc = str(tmp_path / "orphan")
    # the 'crashed' first attempt: data landed, bind didn't
    _seed(s1, loc)
    with pytest.raises(ValueError, match="IF NOT EXISTS"):
        txsql.tx_sql(s1, f"CREATE TABLE t_crash (k INT) LOCATION '{loc}'")
    v = txsql.tx_sql(
        s1, f"CREATE TABLE IF NOT EXISTS t_crash (k INT) LOCATION '{loc}'"
    )
    assert v == 1
    s2 = _fresh_session(spark, wh)
    assert txsql.tx_sql(s2, "SELECT count(*) n FROM t_crash").first()["n"] == 4


# --------------------------------------------------------- DROP TABLE


def test_drop_table_unbinds_but_keeps_data(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    loc = str(tmp_path / "t")
    _seed(s1, loc)
    txsql.tx_sql(s1, f"CREATE TABLE IF NOT EXISTS t_drop (k INT) LOCATION '{loc}'")
    txsql.tx_sql(s1, "DROP TABLE t_drop")
    # name gone in THIS session (map + temp view) and in fresh ones
    with pytest.raises(ValueError, match="unknown table"):
        txsql.tx_sql(s1, "DELETE FROM t_drop")
    s2 = _fresh_session(spark, wh)
    # the SELECT path surfaces Spark's own missing-relation error (the
    # lazy catalog retry finds nothing to bind)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="t_drop"):
        txsql.tx_sql(s2, "SELECT * FROM t_drop WHERE 1=1 ORDER BY k").collect()
    # external-table semantics: the data survives, re-CREATE reattaches
    assert tx.table_version(loc) == 1
    v = txsql.tx_sql(
        s2, f"CREATE TABLE IF NOT EXISTS t_drop (k INT) LOCATION '{loc}'"
    )
    assert v == 1


def test_drop_table_purge_deletes_both_planes(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    txsql.tx_sql(s1, "CREATE TABLE t_purge (k INT)")
    txsql.tx_sql(s1, "INSERT INTO t_purge VALUES (1), (2)")
    loc = os.path.join(txsql._warehouse_dir(s1), "t_purge")
    assert tx.table_version(loc) == 2
    txsql.tx_sql(s1, "DROP TABLE t_purge PURGE")
    assert not os.path.exists(loc)
    assert tx.table_version(loc) == 0


def test_drop_table_if_exists(spark, tmp_path):
    s1 = _fresh_session(spark, tmp_path / "wh")
    assert txsql.tx_sql(s1, "DROP TABLE IF EXISTS never_created") is None
    with pytest.raises(ValueError, match="unknown table"):
        txsql.tx_sql(s1, "DROP TABLE never_created")


# ------------------------------------------------------ TRUNCATE TABLE


def test_truncate_is_metadata_only(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    loc = str(tmp_path / "t")
    _seed(s1, loc, n=10)
    txsql.tx_sql(
        s1, f"CREATE TABLE IF NOT EXISTS t_trunc (k INT) LOCATION '{loc}'"
    )
    v = txsql.tx_sql(s1, "TRUNCATE TABLE t_trunc")
    assert v == 2
    assert txsql.tx_sql(s1, "SELECT count(*) n FROM t_trunc").first()["n"] == 0
    h = tx.history(loc)[0]  # newest first
    assert h["action"] == "truncate"
    assert h["n_added"] == 0 and h["n_removed"] >= 1
    # time travel + restore still reach the pre-truncate snapshot
    assert tx.read_table(s1, loc, version=1).count() == 10
    tx.tx_restore(loc, 1)
    txsql._refresh(s1, "t_trunc")
    assert txsql.tx_sql(s1, "SELECT count(*) n FROM t_trunc").first()["n"] == 10


def test_truncate_change_feed_emits_deletes(spark, tmp_path):
    loc = str(tmp_path / "t")
    _seed(spark, loc, n=5)
    v = tx.tx_truncate(loc)
    rows = tx.commit_change_rows(loc, v, ["k"], ["amt"])
    assert sorted(r[0] for r in rows) == [0, 1, 2, 3, 4]
    assert {r[2] for r in rows} == {"delete"}
    # truncating an already-empty table is a no-op
    assert tx.tx_truncate(loc) == v


# ------------------------------------------------- SHOW TABLES / DDL


def test_show_tables_merges_catalog_and_session(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    txsql.tx_sql(s1, "CREATE TABLE t_shown (k INT)")
    adhoc = str(tmp_path / "adhoc")
    _seed(s1, adhoc)
    txsql.tx_register(s1, adhoc, "t_adhoc")
    rows = {
        r["name"]: (r["persistent"], r["version"])
        for r in txsql.tx_sql(s1, "SHOW TABLES").collect()
    }
    assert rows["t_shown"] == (True, 1)
    assert rows["t_adhoc"] == (False, 1)
    # a FRESH session sees only the persistent one
    s2 = _fresh_session(spark, wh)
    names = {
        r["name"] for r in txsql.tx_sql(s2, "SHOW TABLES").collect()
    }
    assert "t_shown" in names and "t_adhoc" not in names


def test_show_create_table_roundtrip(spark, tmp_path):
    """The emitted DDL re-creates an equivalent table in a different
    warehouse: same columns, same types, same generated column."""
    wh = tmp_path / "wh"
    s1 = _fresh_session(spark, wh)
    txsql.tx_sql(s1, """
        CREATE TABLE t_ddl (
          k INT, amt DOUBLE,
          amt2 DOUBLE GENERATED ALWAYS AS (amt * 2))
        TBLPROPERTIES ('owner' = 'suite')
    """)
    stmt = txsql.tx_sql(s1, "SHOW CREATE TABLE t_ddl").first()[
        "createtab_stmt"
    ]
    assert "GENERATED ALWAYS AS (amt * 2)" in stmt
    assert "'owner' = 'suite'" in stmt
    assert f"LOCATION '{os.path.join(txsql._warehouse_dir(s1), 't_ddl')}'" in stmt
    # strip LOCATION so the replay lands in the second warehouse
    replay = "\n".join(
        line for line in stmt.splitlines() if not line.startswith("LOCATION")
    )
    s2 = _fresh_session(spark, tmp_path / "wh2")
    txsql.tx_sql(s2, replay)
    d1 = txsql.tx_sql(s1, "DESCRIBE t_ddl").collect()
    d2 = txsql.tx_sql(s2, "DESCRIBE t_ddl").collect()
    assert [tuple(r) for r in d1] == [tuple(r) for r in d2]


# ------------------------------------- constraints + generated columns


def test_add_constraint_rejects_bad_insert_by_name(spark, tmp_path):
    s1 = _fresh_session(spark, tmp_path / "wh")
    txsql.tx_sql(s1, "CREATE TABLE t_con (k INT, amt DOUBLE)")
    txsql.tx_sql(s1, "INSERT INTO t_con VALUES (1, 5.0)")
    txsql.tx_sql(
        s1, "ALTER TABLE t_con ADD CONSTRAINT amt_pos CHECK (amt > 0)"
    )
    with pytest.raises(ValueError, match="amt_pos"):
        txsql.tx_sql(s1, "INSERT INTO t_con VALUES (2, -1.0)")
    # adding a constraint the EXISTING data violates is refused up front
    with pytest.raises(ValueError, match="k_big"):
        txsql.tx_sql(
            s1, "ALTER TABLE t_con ADD CONSTRAINT k_big CHECK (k > 100)"
        )
    txsql.tx_sql(s1, "ALTER TABLE t_con DROP CONSTRAINT amt_pos")
    txsql.tx_sql(s1, "INSERT INTO t_con VALUES (2, -1.0)")  # now fine
    assert txsql.tx_sql(s1, "SELECT count(*) n FROM t_con").first()["n"] == 2
    # IF EXISTS tolerates a missing name; bare DROP does not
    txsql.tx_sql(s1, "ALTER TABLE t_con DROP CONSTRAINT IF EXISTS nope")
    with pytest.raises(ValueError, match="nope"):
        txsql.tx_sql(s1, "ALTER TABLE t_con DROP CONSTRAINT nope")


def test_set_unset_tblproperties(spark, tmp_path):
    s1 = _fresh_session(spark, tmp_path / "wh")
    txsql.tx_sql(s1, "CREATE TABLE t_props (k INT)")
    loc = os.path.join(txsql._warehouse_dir(s1), "t_props")
    txsql.tx_sql(
        s1, "ALTER TABLE t_props SET TBLPROPERTIES ('a' = 1, 'b' = 'x')"
    )
    assert tx.table_properties(loc) == {"a": 1, "b": "x"}
    txsql.tx_sql(s1, "ALTER TABLE t_props UNSET TBLPROPERTIES ('a')")
    assert tx.table_properties(loc) == {"b": "x"}


def test_generated_column_materializes_and_validates(spark, tmp_path):
    s1 = _fresh_session(spark, tmp_path / "wh")
    txsql.tx_sql(s1, """
        CREATE TABLE t_gen (
          k INT, amt DOUBLE,
          bucket INT GENERATED ALWAYS AS (CAST(k % 3 AS INT)))
    """)
    # omitted generated column MATERIALIZES from the expression
    txsql.tx_sql(s1, "INSERT INTO t_gen (k, amt) VALUES (4, 1.0), (7, 2.0)")
    got = {
        r["k"]: r["bucket"]
        for r in txsql.tx_sql(s1, "SELECT k, bucket FROM t_gen").collect()
    }
    assert got == {4: 1, 7: 1}
    # provided-and-consistent passes; provided-and-wrong is rejected BY
    # NAME through the paired __gen_ CHECK constraint
    txsql.tx_sql(s1, "INSERT INTO t_gen VALUES (9, 3.0, 0)")
    with pytest.raises(ValueError, match="__gen_bucket"):
        txsql.tx_sql(s1, "INSERT INTO t_gen VALUES (10, 4.0, 2)")
    # the Python write path is guarded by the same constraint
    bad = s1.createDataFrame(
        [(11, 5.0, 0)], "k int, amt double, bucket int"
    )
    loc = os.path.join(txsql._warehouse_dir(s1), "t_gen")
    with pytest.raises(ValueError, match="__gen_bucket"):
        tx.tx_append(bad, loc)


def test_generated_column_rejected_in_ctas(spark, tmp_path):
    """CTAS column lists are plain names (types come from the SELECT);
    a GENERATED clause there is refused, and the failed statement
    leaves no catalog binding behind."""
    s1 = _fresh_session(spark, tmp_path / "wh")
    s1.range(2).createOrReplaceTempView("gbad_src")
    with pytest.raises(ValueError, match="plain names"):
        txsql.tx_sql(s1, """
            CREATE TABLE t_gbad (k, v GENERATED ALWAYS AS (k + 1))
            AS SELECT id, id FROM gbad_src
        """)
    assert "t_gbad" not in whcat.catalog_tables(str(tmp_path / "wh"))
