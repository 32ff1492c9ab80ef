"""Round-5 evidence run (VERDICT r4 item 4): 10x scale probe for the
multimodal codec path.  Replicates the sf0.1 documents table 10x with
distinct doc_ids, runs the three codec entries at 1x and 10x (median
of 3 after an untimed warm run), and records wall-clock ratios + plan
shape (Exchange count) at both scales."""

import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_mm10x"
NAMES = ["mm_jpeg_decode", "mm_boxdown2", "mm_dhash_dedup"]

os.makedirs(DST, exist_ok=True)
if not os.path.exists(f"{DST}/documents.parquet"):
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT doc_id + r.i * 10000000 AS doc_id,
                 * EXCLUDE (doc_id)
          FROM read_parquet('{SRC}/documents.parquet'),
               (SELECT UNNEST(RANGE(10)) AS i) r
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()

from event_streaming_toy_example_spark.session import get_spark
from event_streaming_toy_example_spark.plans.catalog import ALL_QUERIES

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

import duckdb as dd

n1 = dd.sql(f"SELECT COUNT(*) FROM read_parquet('{SRC}/documents.parquet')").fetchone()[0]
n10 = dd.sql(f"SELECT COUNT(*) FROM read_parquet('{DST}/documents.parquet')").fetchone()[0]
print(f"documents rows: 1x={n1} 10x={n10}")

for name in NAMES:
    fn = ALL_QUERIES[name]
    for label, sf_dir in (("1x", SRC), ("10x", DST)):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange")
        fn(spark, sf_dir).count()  # untimed warm run
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        med = sorted(runs)[1]
        print(f"{name} {label}: median={med:.2f}s runs={[round(r,2) for r in runs]} exchanges={n_exchange}")

spark.stop()
print("MM-PROBE DONE")
