#!/usr/bin/env python
"""Scale probe: is the join-matview refresh O(delta), not O(table)?

Builds the SAME view (orders ⋈ customer, grouped by status × segment)
at two corpus sizes (sf0.01 and sf0.1 — 10× the rows), applies an
IDENTICAL 200-row delta to each side, and times ONE refresh.  An
O(delta) refresh should stay ~flat across the 10× table-size gap
(state reads grow with group/key cardinality, not row count); an
O(table) refresh would scale ~10×.

Run:  python tools/matview_join_probe.py
Prints one JSON line {"sf0.01_sec": ..., "sf0.1_sec": ..., "ratio": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_streaming_toy_example_spark.operators import (  # noqa: E402
    matview_join as mj,
)
from event_streaming_toy_example_spark.operators import txtable as tx  # noqa: E402
from event_streaming_toy_example_spark.schemas import load_table  # noqa: E402
from event_streaming_toy_example_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir: str) -> float:
    root = tempfile.mkdtemp(prefix="mvj_probe_")
    try:
        a, b, dst = (os.path.join(root, d) for d in ("a", "b", "mv"))
        tx.tx_append(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_custkey").alias("custkey"),
                "o_orderstatus", "o_totalprice",
            ).repartitionByRange(8, "custkey"),
            a,
        )
        tx.tx_append(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("custkey"),
                "c_mktsegment", "c_acctbal",
            ).repartitionByRange(8, "custkey"),
            b,
        )
        mj.tx_create_matview_join(
            spark, a, b, dst, on=["custkey"],
            group_by_a=["o_orderstatus"], group_by_b=["c_mktsegment"],
            aggs={
                "n": ("count", "*"),
                "revenue": ("sum", "a.o_totalprice"),
                "avg_bal": ("avg", "b.c_acctbal"),
            },
        )
        # identical absolute-size delta at both SFs: 200 rows per side
        da = spark.createDataFrame(
            [(10_000_000 + i, "Z", 100.0 + i) for i in range(200)],
            "custkey bigint, o_orderstatus string, o_totalprice double",
        )
        db = spark.createDataFrame(
            [(10_000_000 + i, "PROBE", 50.0 + i) for i in range(200)],
            "custkey bigint, c_mktsegment string, c_acctbal double",
        )
        tx.tx_append(da, a)
        tx.tx_append(db, b)
        t0 = time.monotonic()
        assert mj.tx_refresh_matview_join(spark, dst) is not None
        return time.monotonic() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark()
    # warm both code paths once at the small SF so JIT/codegen noise
    # doesn't land in the timed runs
    probe(spark, "/root/testdata/sf0.001")
    small = probe(spark, "/root/testdata/sf0.01")
    big = probe(spark, "/root/testdata/sf0.1")
    print(json.dumps({
        "sf0.01_sec": round(small, 3),
        "sf0.1_sec": round(big, 3),
        "ratio": round(big / small, 2),
    }))


if __name__ == "__main__":
    main()
