#!/usr/bin/env python
"""Scale probe: is the N-way STAR matview refresh O(delta), and how
does it scale with VIEW ARITY?  (VERDICT r10 item 8's named
candidate.)

Two measurements over the lineitem ⋈ orders ⋈ part star:

1. SIZE flatness — the same fixed 200-row fact delta refreshed at
   sf0.01 and sf0.1 (10× the source rows): an O(delta + affected
   groups) refresh stays ~flat; an O(table) one scales ~10×.
2. ARITY cost — the same delta refreshed through the 1-dim star vs
   the 2-dim star at sf0.01: each extra dimension adds one
   metadata-scale state join to each telescoping term, so the step
   should be a modest constant factor, not a blow-up.

Run:  python tools/matview_star_probe.py
Prints one JSON line.
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
    matview_star as ms,
)
from event_streaming_toy_example_spark.operators import txtable as tx  # noqa: E402
from event_streaming_toy_example_spark.schemas import load_table  # noqa: E402
from event_streaming_toy_example_spark.session import get_spark  # noqa: E402


def _build(spark, sf_dir: str, root: str, n_dims: int) -> str:
    fact = os.path.join(root, "fact")
    d_ord = os.path.join(root, "ord")
    d_part = os.path.join(root, "part")
    dst = os.path.join(root, "mv")
    tx.tx_append(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_returnflag", "l_quantity"
        ).repartitionByRange(8, "l_orderkey"),
        fact,
    )
    tx.tx_append(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).repartitionByRange(8, "o_orderkey"),
        d_ord,
    )
    dims = [
        {"name": "ord", "src": d_ord,
         "on": [("l_orderkey", "o_orderkey")],
         "group_by": ["o_orderstatus"]},
    ]
    if n_dims >= 2:
        tx.tx_append(
            load_table(spark, sf_dir, "part").select(
                "p_partkey", "p_type"
            ).repartitionByRange(8, "p_partkey"),
            d_part,
        )
        dims.append(
            {"name": "prt", "src": d_part,
             "on": [("l_partkey", "p_partkey")], "group_by": ["p_type"]}
        )
    ms.tx_create_matview_star(
        spark, dst, fact, dims,
        aggs={
            "n": ("count", "*"),
            "qty": ("sum", "fact.l_quantity"),
            "avg_price": ("avg", "ord.o_totalprice"),
        },
        group_by_fact=["l_returnflag"],
    )
    return dst, fact


def _timed_refresh(spark, sf_dir: str, n_dims: int) -> float:
    root = tempfile.mkdtemp(prefix=f"mvs_probe_{n_dims}_")
    try:
        dst, fact = _build(spark, sf_dir, root, n_dims)
        # the fixed delta: 200 fact rows, same at every SF/arity
        delta = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_returnflag", "l_quantity"
        ).limit(200).coalesce(1)
        tx.tx_append(delta, fact)
        t0 = time.monotonic()
        assert ms.tx_refresh_matview_star(spark, dst) is not None
        return time.monotonic() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="matview-star-probe")
    small = _timed_refresh(spark, "/root/testdata/sf0.01", 2)
    big = _timed_refresh(spark, "/root/testdata/sf0.1", 2)
    one_dim = _timed_refresh(spark, "/root/testdata/sf0.01", 1)
    print(json.dumps({
        "star3_sf0.01_sec": round(small, 2),
        "star3_sf0.1_sec": round(big, 2),
        "size_ratio_10x_data": round(big / small, 2),
        "star2_sf0.01_sec": round(one_dim, 2),
        "arity_ratio_3_over_2": round(small / one_dim, 2),
        "delta_rows": 200,
    }))


if __name__ == "__main__":
    main()
