"""Round-4 additions (seventeenth wave): the cogrouped-map API
surface — ``groupBy().cogroup().applyInPandas``.

``cogroup_asof_counts`` merges two keyed relations per key in one
Arrow-batched Python function: for every order, how many of the same
user's events happened at or before the order date (the classic
as-of/merge-asof shape, computed with one ``np.searchsorted`` per
key over the sorted event timestamps).  This is the ONLY grouped API
that hands BOTH sides of a key to user code at once — the pandas twin
of the join-based ``asof_last_event_before_order`` rep, covering the
API the way ``zscore_grouped_map`` covers grouped-map.

Timestamps compare as exact epoch microseconds on both engines, so
the boundary (``ts <= orderdate``) cannot wobble.

Scale notes (100 TB): cogroup shuffles both sides by the key once
(same movement as a shuffle join) and streams each key's two Arrow
batches through Python — the right tool when per-key logic genuinely
needs both relations materialized (complex reconciliation, per-entity
merges); when a join can express it, the join is the fast path (the
rep entry demonstrates exactly that).  Per-key work here is
O(E log E + O log E), vectorized numpy.

Reference parity: no analogue — engine-surface extension (SURVEY
§2.8), like the grouped-map and grouped-agg twins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import load_table


#: cogroup key count.  Cogrouping on the ENTITY key (custkey) costs
#: one Python call per entity (~10 ms each -> 15 s for 1 500 users at
#: sf0.1, measured); cogrouping on a hash BUCKET amortizes that call
#: overhead across ~|entities|/B users per call while the per-user
#: logic stays vectorized — the many-tiny-groups strategy the
#: grouped-map z-score entry established (2.2 s, ~7x).  At cluster
#: scale B is the parallelism lever, sized to executor count.
_ASOF_BUCKETS = 64


def _asof_counts(odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
    # per bucket: index this bucket's events once per user, then one
    # vectorized searchsorted per user's orders
    ev_by_user = {
        u: np.sort(g["ts_us"].to_numpy(dtype=np.int64))
        for u, g in edf.groupby("user_id")
    }
    empty = np.empty(0, dtype=np.int64)
    keys = []
    counts = []
    for u, g in odf.groupby("o_custkey"):
        ts = ev_by_user.get(u, empty)
        keys.append(g["o_orderkey"].to_numpy(dtype=np.int64))
        counts.append(
            np.searchsorted(
                ts, g["od_us"].to_numpy(dtype=np.int64), side="right"
            ).astype(np.int64)
        )
    if not keys:
        return pd.DataFrame(
            {"o_orderkey": empty, "n_events_before": empty}
        )
    return pd.DataFrame(
        {
            "o_orderkey": np.concatenate(keys),
            "n_events_before": np.concatenate(counts),
        }
    )


def q_cogroup_asof_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per order: count of the user's events at or before the order
    date, via a cogrouped pandas merge (see module docstring).  Users
    with no events cogroup against an empty frame -> count 0."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros("o_orderdate").alias("od_us"),
        (F.col("o_custkey") % _ASOF_BUCKETS).alias("bkt"),
    )
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("user_id") % _ASOF_BUCKETS).alias("bkt"),
    )
    return (
        orders.groupBy("bkt")
        .cogroup(events.groupBy("bkt"))
        .applyInPandas(
            _asof_counts, "o_orderkey long, n_events_before long"
        )
    )


SQL_COGROUP_ASOF_COUNTS = """
SELECT o.o_orderkey,
       CAST((SELECT count(*) FROM events e
             WHERE e.user_id = o.o_custkey
               AND e.ts <= o.o_orderdate) AS BIGINT) AS n_events_before
FROM orders o
"""

# ------------------------------------------------ real resize kernel


def q_mm_boxdown2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize over REAL decoded pixels: 2x2 integer box
    downsample of the id-derived BMP images
    (``functions/multimodal.py::extract_boxdown2``) — the upgrade of
    the digest-based ``mm_resize`` plumbing twin to actual pixel
    arithmetic the oracle reproduces exactly."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_bmp_payload,
        extract_boxdown2,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_boxdown2(attach_bmp_payload(docs))


# oracle: BMP pixel (y, x, c) = (2x + y + id + c) % 256 with
# w = 12 + id % 40, h = 6 + id % 20 (attach_bmp_payload); the 2x2
# floor-mean and the full output sum recompute arithmetically.
SQL_MM_BOXDOWN2 = """
WITH dims AS (
  SELECT doc_id,
         (12 + doc_id % 40) // 2 AS ow,
         (6 + doc_id % 20) // 2 AS oh
  FROM documents
),
px AS (
  SELECT d.doc_id, d.ow, d.oh,
         ((2 * (2 * xx) + (2 * yy) + d.doc_id + c) % 256
          + (2 * (2 * xx + 1) + (2 * yy) + d.doc_id + c) % 256
          + (2 * (2 * xx) + (2 * yy + 1) + d.doc_id + c) % 256
          + (2 * (2 * xx + 1) + (2 * yy + 1) + d.doc_id + c) % 256
         ) // 4 AS q
  FROM dims d,
       unnest(generate_series(0, d.oh - 1)) AS ty(yy),
       unnest(generate_series(0, d.ow - 1)) AS tx(xx),
       unnest(generate_series(0, 2)) AS tc(c)
)
SELECT doc_id,
       CAST(ow AS BIGINT) AS out_w,
       CAST(oh AS BIGINT) AS out_h,
       CAST(sum(q) AS BIGINT) AS px_sum
FROM px
GROUP BY doc_id, ow, oh
"""

# ------------------------------------------------------------ exports

EXT24_QUERIES = {
    "cogroup_asof_counts": q_cogroup_asof_counts,
    "mm_boxdown2": q_mm_boxdown2,
}

EXT24_ORACLES = {
    "cogroup_asof_counts": SQL_COGROUP_ASOF_COUNTS,
    "mm_boxdown2": SQL_MM_BOXDOWN2,
}
