"""Round-3 additions (fifth wave): snapshot diff (CDC derivation),
table profiling, and winsorized robust aggregation.

The reference's only table maintenance is an overwrite-in-place glue
write (``toy_glue.py:58-65``) with no diffing, profiling, or robust
aggregation anywhere in its 432 lines; these are the warehouse-
maintenance surfaces a lakehouse engine owes its users, each
value-hash-checked against a DuckDB twin:

- ``snapshot_diff`` — derive a change feed (insert/update/delete
  rows) by diffing two table snapshots on their key + content
  fingerprint: the operation behind Delta/Iceberg Change Data Feed
  when the source system can only hand over full snapshots.  The
  inverse of ``upsert_events_cdc`` (which APPLIES a change feed).
- ``table_stats`` — column-level profiling (null count, exact
  distinct count, min/max) in one pass: the ANALYZE TABLE /
  data-quality surface.  Emitted long-format, one row per column.
- ``winsorize_revenue`` — robust aggregation: per-group exact
  percentile fences, values clamped into [p05, p95], capped counts
  and the capped sum in integer cents.  The standard outlier-robust
  revenue metric, built from the already-proven percentile parity
  pattern (Spark ``percentile`` == DuckDB ``quantile_cont``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import load_table

# ------------------------------------------------------ snapshot diff

#: Deterministic "next snapshot" derivation (both engines construct
#: the identical relation from the same parquet): every 17th doc is
#: deleted, every 13th surviving doc gets new content, every 11th doc
#: spawns an insert under a shifted key.
_DEL_MOD, _UPD_MOD, _INS_MOD, _INS_SHIFT = 17, 13, 11, 1_000_000


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed derivation between snapshots: full outer join on
    the key, rows classified insert/update/delete by null side and
    content fingerprint; unchanged rows (the bulk) are dropped.

    Scale: ONE co-partitioned join on the key — with both snapshots
    bucketed by key on disk (``operators/bucketing.py``) it is
    shuffle-free; fingerprints compare as fixed-width md5 so wide rows
    never ship twice."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = (
        base.where(F.col("doc_id") % _DEL_MOD != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % _UPD_MOD == 0,
                F.concat(F.col("text"), F.lit(" v2")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            base.where(F.col("doc_id") % _INS_MOD == 0).select(
                (F.col("doc_id") + _INS_SHIFT).alias("doc_id"), "text"
            )
        )
    )
    from event_streaming_toy_example_spark.operators.diff import (
        diff_snapshots,
    )

    return diff_snapshots(base, nxt, "doc_id", ["text"])


SQL_SNAPSHOT_DIFF = f"""
WITH base AS (
  SELECT doc_id, text FROM documents
), nxt AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_UPD_MOD} = 0 THEN text || ' v2'
              ELSE text END AS text
  FROM base WHERE doc_id % {_DEL_MOD} != 0
  UNION ALL
  SELECT doc_id + {_INS_SHIFT} AS doc_id, text
  FROM base WHERE doc_id % {_INS_MOD} = 0
), j AS (
  SELECT b.doc_id AS b_id, md5(b.text) AS b_fp,
         n.doc_id AS n_id, md5(n.text) AS n_fp
  FROM base b FULL OUTER JOIN nxt n ON b.doc_id = n.doc_id
)
SELECT coalesce(b_id, n_id) AS doc_id,
       CASE WHEN b_id IS NULL THEN 'insert'
            WHEN n_id IS NULL THEN 'delete'
            WHEN b_fp <> n_fp THEN 'update' END AS change_type
FROM j
WHERE CASE WHEN b_id IS NULL THEN 'insert'
           WHEN n_id IS NULL THEN 'delete'
           WHEN b_fp <> n_fp THEN 'update' END IS NOT NULL
"""

# ----------------------------------------------------- table profiling

#: (column, kind): numeric columns report min/max in exact integer
#: cents/ids so the stringified stats are engine-identical; doubles
#: stringified directly would diverge on formatting, not value.
_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_totalprice", "cents"),
]


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of ``orders`` — all columns' multi-distinct
    stats in ONE aggregation pass (Catalyst's expand), reshaped
    wide→long with ``stack``.  A union of per-column aggregates would
    scan the table once per column (the first draft did: 5 scans, 10
    exchanges); profiling at 100 TB must not rescan per column.

    String min/max live in a SEPARATE keyless aggregate cross-joined
    back (1 row × 1 row): a string-typed min/max buffer disqualifies
    HashAggregate, and inside the multi-distinct aggregate that demoted
    the whole expanded (6× rows) pipeline to SortAggregate — two full
    sorts of |rows|·6 on a 6-column key (round-12 plan capture,
    ``plans/r12/table_stats_before.txt``).  Split, both halves
    hash-aggregate with map-side partials and the string fold reduces
    to one row per partition before its single-partition exchange:
    measured 4.0 s → 1.0 s at sf0.1, plan SortAggregate×3 →
    HashAggregate×3 + one O(1)-row string fold, identical output.

    Exact distinct is the honest profiling cost — swap in
    ``approx_count_distinct`` at scale for the same plan with a
    bounded sketch."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    str_aggs = []
    for col, kind in _PROFILE_COLS:
        v = (
            F.round(F.col(col) * 100).cast("long")
            if kind == "cents"
            else F.col(col)
        )
        aggs += [
            F.sum(F.col(col).isNull().cast("long")).alias(f"nn_{col}"),
            F.countDistinct(v).alias(f"nd_{col}"),
        ]
        minmax = [
            F.min(v).cast("string").alias(f"mn_{col}"),
            F.max(v).cast("string").alias(f"mx_{col}"),
        ]
        if kind == "str":
            str_aggs += minmax
        else:
            aggs += minmax
    wide = orders.agg(*aggs).crossJoin(orders.agg(*str_aggs))
    stack_args = ", ".join(
        f"'{col}', nn_{col}, nd_{col}, mn_{col}, mx_{col}"
        for col, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_v, max_v)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")


def _sql_table_stats() -> str:
    selects = []
    for col, kind in _PROFILE_COLS:
        v = (
            f"CAST(round({col} * 100) AS BIGINT)" if kind == "cents" else col
        )
        selects.append(
            f"SELECT '{col}' AS col_name, count(*) AS n_rows, "
            f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_nulls, "
            f"count(DISTINCT {v}) AS n_distinct, "
            f"CAST(min({v}) AS VARCHAR) AS min_v, "
            f"CAST(max({v}) AS VARCHAR) AS max_v FROM orders"
        )
    return "\nUNION ALL\n".join(selects)


# ------------------------------------------------ winsorized aggregate


def q_winsorize_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized revenue per return flag: exact [p05, p95] fences,
    prices clamped into the fence, capped counts + capped sum in
    integer cents.  One group aggregate for the fences (broadcast
    back) + one pass to clamp and sum — the fences relation is
    O(groups), so the fact table never shuffles twice."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    fences = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("p05"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    j = li.join(F.broadcast(fences), "l_returnflag")
    capped = F.greatest(
        F.col("p05"), F.least(F.col("p95"), F.col("l_extendedprice"))
    )
    return j.groupBy("l_returnflag").agg(
        F.sum((F.col("l_extendedprice") < F.col("p05")).cast("long")).alias(
            "n_low"
        ),
        F.sum((F.col("l_extendedprice") > F.col("p95")).cast("long")).alias(
            "n_high"
        ),
        F.sum(F.round(capped * 100).cast("long")).alias("capped_sum_cc"),
        F.round(F.first("p05") * 100).cast("long").alias("p05_cc"),
        F.round(F.first("p95") * 100).cast("long").alias("p95_cc"),
    )


SQL_WINSORIZE_REVENUE = """
WITH fences AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS p05,
         quantile_cont(l_extendedprice, 0.95) AS p95
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN l.l_extendedprice < f.p05 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN l.l_extendedprice > f.p95 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high,
       CAST(sum(CAST(round(greatest(f.p05,
                least(f.p95, l.l_extendedprice)) * 100) AS BIGINT))
            AS BIGINT) AS capped_sum_cc,
       CAST(round(min(f.p05) * 100) AS BIGINT) AS p05_cc,
       CAST(round(min(f.p95) * 100) AS BIGINT) AS p95_cc
FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
GROUP BY 1
"""


EXT12_QUERIES = {
    "snapshot_diff": q_snapshot_diff,
    "table_stats": q_table_stats,
    "winsorize_revenue": q_winsorize_revenue,
}

EXT12_ORACLES = {
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "table_stats": _sql_table_stats(),
    "winsorize_revenue": SQL_WINSORIZE_REVENUE,
}
