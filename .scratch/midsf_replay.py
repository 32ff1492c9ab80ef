"""Round-5 evidence run: mid-SF bit-exact replay of the four entries
whose deliberately-naive DuckDB oracles exceed the 120 s watchdog at
sf0.1 (VERDICT r4 item 2).

Builds a deterministic ~30% downsample of sf0.1 (keys `% 10 < 3`,
FK-consistent for lineitem->orders), then runs Spark query vs DuckDB
oracle with the test suite's own normalize/compare."""

import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

MIDSF = "/tmp/spark_graft_midsf03"
SRC = "/root/testdata/sf0.1"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
FILTERS = {
    "documents": "doc_id % 10 < 3",
    "customer": "c_custkey % 10 < 3",
    "orders": "o_orderkey % 10 < 3",
    "lineitem": "l_orderkey % 10 < 3",
}

os.makedirs(MIDSF, exist_ok=True)
con = duckdb.connect()
for t in TABLES:
    dst = f"{MIDSF}/{t}.parquet"
    if os.path.exists(dst):
        continue
    where = FILTERS.get(t, "TRUE")
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
        f"WHERE {where}) TO '{dst}' (FORMAT PARQUET)"
    )
for t in TABLES:
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{MIDSF}/{t}.parquet')"
    ).fetchone()[0]
    print(f"{t}: {n}")
con.close()

# ---- replay ----
from event_streaming_toy_example_spark.session import get_spark
from event_streaming_toy_example_spark.plans.catalog import ALL_ORACLES, ALL_QUERIES
from tests.test_oracle_parity import _normalize, _values_equal

NAMES = [
    "dedup_jaccard_prefix",
    "match_fuzzy_names",
    "entity_resolution",
    "graph_triangles",
]

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
duck = duckdb.connect()
for t in TABLES:
    duck.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{MIDSF}/{t}.parquet')"
    )

for name in NAMES:
    t0 = time.time()
    sdf = ALL_QUERIES[name](spark, MIDSF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    t0 = time.time()
    res = duck.execute(ALL_ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    t_duck = time.time() - t0
    status = "OK"
    if sorted(s_cols) != sorted(d_cols):
        status = f"COLS DIFFER {s_cols} vs {d_cols}"
    elif len(s_rows) == 0:
        status = "VACUOUS (0 rows)"
    elif len(s_rows) != len(d_rows):
        status = f"ROWCOUNT {len(s_rows)} vs {len(d_rows)}"
    else:
        s_norm, cols = _normalize(s_rows, s_cols)
        d_norm, _ = _normalize(d_rows, d_cols)
        for sr, dr in zip(s_norm, d_norm):
            for c, sv, dv in zip(cols, sr, dr):
                if not _values_equal(sv, dv):
                    status = f"VALUE MISMATCH col={c} {sv!r} vs {dv!r}"
                    break
            if status != "OK":
                break
    print(
        f"{name}: {status} rows={len(s_rows)} "
        f"spark={t_spark:.1f}s duckdb={t_duck:.1f}s"
    )

spark.stop()
print("MIDSF-REPLAY DONE")
