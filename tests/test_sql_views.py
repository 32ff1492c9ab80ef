"""SQL VIEWS (round 12): CREATE [OR REPLACE] VIEW persists the SELECT
text in the warehouse catalog (same conditional-PUT protocol as table
binds), every session resolves the name lazily, and the definition
re-materializes per query so views stay CURRENT over their base
tables.  DROP VIEW / SHOW VIEWS / SHOW CREATE TABLE complete the
lifecycle; tables and views share one name space with typed
cross-kind refusals."""

from __future__ import annotations

import pytest

from event_streaming_toy_example_spark.operators import (
    txsql,
    txtable as tx,
    warehouse as whcat,
)


def _fresh_session(spark, wh):
    s = spark.newSession()
    s.conf.set("spark_graft.warehouse.dir", str(wh))
    return s


def _seeded(spark, wh):
    s = _fresh_session(spark, wh)
    txsql.tx_sql(s, "CREATE TABLE base (k INT, amt DOUBLE)")
    txsql.tx_sql(
        s, "INSERT INTO base VALUES (1, 5.0), (2, 6.0), (2, 7.0)"
    )
    return s


def test_view_selects_and_stays_current(spark, tmp_path):
    s = _seeded(spark, tmp_path / "wh")
    txsql.tx_sql(
        s,
        "CREATE VIEW totals AS "
        "SELECT k, SUM(amt) AS total FROM base GROUP BY k",
    )
    got = {
        r["k"]: r["total"]
        for r in txsql.tx_sql(s, "SELECT * FROM totals").collect()
    }
    assert got == {1: 5.0, 2: 13.0}
    # freshness: the view is re-materialized per query, so a write to
    # the base table is visible without any refresh call
    txsql.tx_sql(s, "INSERT INTO base VALUES (1, 100.0)")
    got = {
        r["k"]: r["total"]
        for r in txsql.tx_sql(s, "SELECT * FROM totals").collect()
    }
    assert got == {1: 105.0, 2: 13.0}


def test_fresh_session_resolves_view_lazily(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _seeded(spark, wh)
    txsql.tx_sql(
        s1, "CREATE VIEW v AS SELECT COUNT(*) AS n FROM base"
    )
    s2 = _fresh_session(spark, wh)  # never calls tx_register
    assert txsql.tx_sql(s2, "SELECT * FROM v").first()["n"] == 3


def test_nested_views_resolve_recursively(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _seeded(spark, wh)
    txsql.tx_sql(
        s1,
        "CREATE VIEW lvl1 AS "
        "SELECT k, SUM(amt) AS total FROM base GROUP BY k",
    )
    txsql.tx_sql(
        s1, "CREATE VIEW lvl2 AS SELECT SUM(total) AS grand FROM lvl1"
    )
    s2 = _fresh_session(spark, wh)
    assert txsql.tx_sql(s2, "SELECT * FROM lvl2").first()["grand"] == 18.0


def test_or_replace_and_idempotent_recreate(spark, tmp_path):
    s = _seeded(spark, tmp_path / "wh")
    txsql.tx_sql(s, "CREATE VIEW v AS SELECT COUNT(*) AS n FROM base")
    # same definition: idempotent (crash-retry of our own bind)
    txsql.tx_sql(s, "CREATE VIEW v AS SELECT COUNT(*) AS n FROM base")
    with pytest.raises(txsql.TableExistsError, match="OR REPLACE"):
        txsql.tx_sql(s, "CREATE VIEW v AS SELECT 1 AS n")
    txsql.tx_sql(
        s, "CREATE OR REPLACE VIEW v AS SELECT MAX(amt) AS n FROM base"
    )
    assert txsql.tx_sql(s, "SELECT * FROM v").first()["n"] == 7.0


def test_name_space_is_shared_with_typed_refusals(spark, tmp_path):
    wh = tmp_path / "wh"
    s = _seeded(spark, wh)
    # a view cannot shadow a table...
    with pytest.raises(txsql.TableExistsError, match="table"):
        txsql.tx_sql(s, "CREATE VIEW base AS SELECT 1 AS x")
    # ...and a table cannot shadow a view
    txsql.tx_sql(s, "CREATE VIEW v AS SELECT COUNT(*) AS n FROM base")
    with pytest.raises(txsql.TableExistsError, match="VIEW"):
        whcat.catalog_bind(str(wh), "v", str(tmp_path / "elsewhere"))


def test_drop_view_lifecycle(spark, tmp_path):
    wh = tmp_path / "wh"
    s = _seeded(spark, wh)
    txsql.tx_sql(s, "CREATE VIEW v AS SELECT COUNT(*) AS n FROM base")
    with pytest.raises(ValueError, match="is a VIEW"):
        txsql.tx_sql(s, "DROP TABLE v")
    txsql.tx_sql(s, "DROP VIEW v")
    assert "v" not in whcat.catalog_views(str(wh))
    s2 = _fresh_session(spark, wh)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        txsql.tx_sql(s2, "SELECT * FROM v").collect()
    assert txsql.tx_sql(s, "DROP VIEW IF EXISTS v") is None
    with pytest.raises(ValueError, match="unknown view"):
        txsql.tx_sql(s, "DROP VIEW v")


def test_show_views_and_show_create_roundtrip(spark, tmp_path):
    wh = tmp_path / "wh"
    s = _seeded(spark, wh)
    txsql.tx_sql(
        s,
        "CREATE VIEW v AS SELECT k, SUM(amt) AS total FROM base "
        "GROUP BY k",
    )
    rows = txsql.tx_sql(s, "SHOW VIEWS").collect()
    assert [(r["name"]) for r in rows] == ["v"]
    assert "SUM(amt)" in rows[0]["definition"]
    # SHOW TABLES stays tables-only
    names = {r["name"] for r in txsql.tx_sql(s, "SHOW TABLES").collect()}
    assert names == {"base"}
    stmt = txsql.tx_sql(s, "SHOW CREATE TABLE v").first()["createtab_stmt"]
    assert stmt.startswith("CREATE VIEW v AS")
    # the emitted DDL replays in a second warehouse (with its own base)
    s2 = _seeded(spark, tmp_path / "wh2")
    txsql.tx_sql(s2, stmt)
    got = {
        r["k"]: r["total"]
        for r in txsql.tx_sql(s2, "SELECT * FROM v").collect()
    }
    assert got == {1: 5.0, 2: 13.0}


def test_cross_session_replace_and_drop_propagate(spark, tmp_path):
    """Session B has materialized v; session A then REPLACEs it (B's
    next read picks up the new definition from the catalog) and DROPs
    it (B's next read fails resolve instead of serving a ghost)."""
    wh = tmp_path / "wh"
    s1 = _seeded(spark, wh)
    txsql.tx_sql(s1, "CREATE VIEW v AS SELECT COUNT(*) AS n FROM base")
    s2 = _fresh_session(spark, wh)
    assert txsql.tx_sql(s2, "SELECT * FROM v").first()["n"] == 3
    txsql.tx_sql(
        s1, "CREATE OR REPLACE VIEW v AS SELECT MAX(amt) AS n FROM base"
    )
    assert txsql.tx_sql(s2, "SELECT * FROM v").first()["n"] == 7.0
    txsql.tx_sql(s1, "DROP VIEW v")
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        txsql.tx_sql(s2, "SELECT * FROM v").collect()


def test_cyclic_views_refused_by_name(spark, tmp_path):
    wh = tmp_path / "wh"
    s1 = _seeded(spark, wh)
    txsql.tx_sql(s1, "CREATE VIEW a AS SELECT k FROM base")
    txsql.tx_sql(s1, "CREATE VIEW b AS SELECT k FROM a")
    # close the cycle behind a's back
    txsql.tx_sql(s1, "CREATE OR REPLACE VIEW a AS SELECT k FROM b")
    s2 = _fresh_session(spark, wh)
    with pytest.raises(ValueError, match="terms of itself"):
        txsql.tx_sql(s2, "SELECT * FROM a").collect()


def test_bad_view_body_fails_at_create(spark, tmp_path):
    s = _seeded(spark, tmp_path / "wh")
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        txsql.tx_sql(s, "CREATE VIEW v AS SELECT ghost FROM base")
    assert "v" not in whcat.catalog_views(
        str(tmp_path / "wh")
    ), "failed CREATE must not bind"
    with pytest.raises(ValueError, match="SELECT/WITH"):
        txsql.tx_sql(s, "CREATE VIEW v AS DELETE FROM base")


def test_view_over_time_travel_and_tx_features(spark, tmp_path):
    """A view body is full tx_sql text: inline time travel works."""
    s = _seeded(spark, tmp_path / "wh")
    txsql.tx_sql(s, "INSERT INTO base VALUES (9, 9.0)")
    txsql.tx_sql(
        s,
        "CREATE VIEW old_counts AS SELECT COUNT(*) AS n "
        "FROM base VERSION AS OF 2",
    )
    assert txsql.tx_sql(s, "SELECT * FROM old_counts").first()["n"] == 3
