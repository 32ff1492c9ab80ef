"""Local replica of the driver's correctness gate: run every catalog
query on Spark AND its DuckDB oracle at sf0.01, compare row count,
column names, and order-insensitive values.

Comparison: columns sorted by name, rows sorted by their full value
tuple, floats compared EXACTLY (bit-for-bit after float() coercion).
The driver hashes values exactly, so a tolerance here would let local
green hide a driver hash-mismatch (round 1: orders_above_cust_avg
passed locally at rel_tol=1e-9 and failed the driver hash on ulp-level
round(double,2) divergence). Queries whose outputs cannot be made
bit-identical across engines must emit exact integer/decimal columns
instead of doubles.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from event_streaming_toy_example_spark.plans.catalog import (
    ALL_ORACLES,
    ALL_QUERIES,
    PRIMARY_QUERIES,
)
from tests.conftest import SF_DIR_ORACLE

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    """Rows -> sorted list of tuples in sorted-column order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        return tuple(
            (v is None, str(type(v)), str(v)) for v in (row[i] for i in order)
        )

    return sorted((tuple(row[i] for i in order) for row in rows), key=key), [
        cols[i] for i in order
    ]


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


# Local replay covers the FULL catalog (PRIMARY ∪ EXTENDED), not just
# the ≤50 driver-facing PRIMARY entries — see plans/catalog.py.
ORACLE_NAMES = sorted(ALL_ORACLES)
ALL_NAMES = sorted(ALL_QUERIES)


def test_driver_contract_is_primary_catalog():
    """__spark_entry__ must expose exactly the PRIMARY catalog (≤50
    entries so every one gets a driver CORRECTNESS row)."""
    qs = entry_mod.queries()
    assert qs.keys() == PRIMARY_QUERIES.keys()
    assert len(qs) <= 50
    assert set(entry_mod.oracle_sql()) <= set(qs)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    sql = ALL_ORACLES[name]

    sdf = q(spark, SF_DIR_ORACLE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    # a 0-row "pass" verifies nothing (round 2 shipped four such vacuous
    # greens) — every oracle-checked query must have a non-empty answer
    # on the oracle SF so the comparison actually exercises values
    assert len(s_rows) > 0, f"{name}: vacuous zero-row result"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )

    s_norm, cols = _normalize(s_rows, s_cols)
    d_norm, _ = _normalize(d_rows, d_cols)
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for c, sv, dv in zip(cols, sr, dr):
            if not _values_equal(sv, dv):
                mismatches.append((i, c, sv, dv))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches {mismatches}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_no_hugeint_oracle_columns(duck, name):
    """No oracle may emit HUGEINT: DuckDB widens sum(BIGINT) (and any
    arithmetic derived from it) to HUGEINT, which a pandas-path fetch
    (fetchdf) silently coerces to float64 while Spark emits LongType —
    so the driver's value hash fails even though fetchall() (what the
    local replay uses) returns exact ints.  That exact mechanism cost
    three rounds on orders_above_cust_avg (queries_ext2.py); this pins
    the repo-wide rule: CAST every sum()-derived column back to BIGINT.
    DECIMAL is banned for the same reason (fetchdf -> float64/object
    depending on scale, unlike Spark's exact Decimal)."""
    types = duck.execute(f"DESCRIBE {ALL_ORACLES[name]}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in types
        if "HUGEINT" in typ.upper()
    ]
    assert not bad, f"{name}: oracle columns widen to HUGEINT: {bad}"


@pytest.mark.parametrize("name", sorted(set(ALL_NAMES) - set(ORACLE_NAMES)))
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle still must run and return rows."""
    df = ALL_QUERIES[name](spark, SF_DIR_ORACLE)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["hour", "event_type", "n_events"]
