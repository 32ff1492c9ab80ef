"""Round-4 additions (twelfth wave): engine surfaces the catalog did
not yet express.

- ``stream_static_enrich`` — the stream-static join: a streaming event
  feed enriched against a BATCH dimension inside the streaming query
  (the dimension is re-read per micro-batch; no state, no watermark —
  the third join topology next to stream-stream and batch joins).
- ``window_range_frame`` — a RANGE window frame (trailing 7-day sum
  over a daily series): frame membership by ORDER-BY VALUE distance,
  not row count — rows-frame twins cannot express gaps.
- ``sql_grouping_sets`` — explicit GROUPING SETS with ``grouping()``
  indicator columns: the general form rollup/cube are shorthands for.
- ``join_null_safe`` — null-safe equality join (``<=>``): NULL keys
  match each other instead of dropping — still a hash-joinable
  equi-predicate in Catalyst (plan-asserted, never a cartesian).
- ``setop_union_by_name`` — union by COLUMN NAME with missing columns
  null-filled: the schema-drift-tolerant union (positional union
  silently mis-aligns after a reorder).

The reference implements none of these (``SURVEY.md §2.8``).
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from event_streaming_toy_example_spark.schemas import (
    load_table,
    register_testdata_views,
)

# ------------------------------------------------ stream-static join


def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins a per-user
    profile DIMENSION (itself derived from history and staged) inside
    the streaming query.  Spark re-plans the static side each
    micro-batch — the mechanism that picks up dimension updates
    between batches without any streaming state.

    Output: per (user tier, event_type) counts — the oracle recomputes
    the dimension and the join in one batch query."""
    from event_streaming_toy_example_spark.plans.queries_ext import (
        await_or_raise,
        stage_stream_input,
        stage_once,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # static dim: per-user lifetime value tier (exact integer cents)
    dim_path = stage_once(
        lambda: ev.groupBy("user_id").agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("ltv_cc")
        ).select(
            "user_id",
            F.when(F.col("ltv_cc") >= 20_000, F.lit("high"))
            .when(F.col("ltv_cc") >= 5_000, F.lit("mid"))
            .otherwise(F.lit("low"))
            .alias("tier"),
        ),
        "user_tier_dim",
        sf_dir,
    )
    dim = spark.read.parquet(dim_path)
    in_path = stage_stream_input(ev, "sse", sf_dir)
    stream = spark.readStream.schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).parquet(in_path)

    enriched = stream.join(dim, "user_id").groupBy("tier", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    name = f"stream_sse_{_uuid.uuid4().hex[:8]}"
    from event_streaming_toy_example_spark.streaming.tuning import (
        stream_tuning,
    )

    with stream_tuning(spark):
        q = (
            enriched.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "stream_static_enrich")
    return spark.table(name)


SQL_STREAM_STATIC_ENRICH = """
WITH dim AS (
  SELECT user_id,
         CASE WHEN sum(CAST(round(value * 100) AS BIGINT)) >= 20000
              THEN 'high'
              WHEN sum(CAST(round(value * 100) AS BIGINT)) >= 5000
              THEN 'mid' ELSE 'low' END AS tier
  FROM events GROUP BY user_id
)
SELECT d.tier, e.event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY d.tier, e.event_type
"""


# ------------------------------------------------ RANGE window frame


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per (type, day) via a RANGE frame over
    the integer day index: days missing from the series still age out
    of the window — a ROWS frame would wrongly treat the previous
    *row* as the previous *day* across gaps."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_idx"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("day_cc")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day_idx",
        "day_cc",
        F.sum("day_cc").over(w).alias("trailing7_cc"),
    )


SQL_WINDOW_RANGE_FRAME = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS INT) AS day_idx,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cc
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_idx, day_cc,
       CAST(sum(day_cc) OVER (
         PARTITION BY event_type ORDER BY day_idx
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing7_cc
FROM daily
"""


# ------------------------------------------------ GROUPING SETS


_SQL_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cc
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus), ())
"""


def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general aggregation-lattice form
    that ROLLUP and CUBE abbreviate — with ``grouping()`` indicator
    columns disambiguating "NULL because aggregated" from "NULL in the
    data".  Same ANSI text runs verbatim on both engines."""
    register_testdata_views(spark, sf_dir, ("orders",))
    return spark.sql(_SQL_GROUPING_SETS)


# ------------------------------------------------ null-safe join


def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): two
    derived relations whose join key is NULL for 'view' events — the
    null-safe form matches NULL keys to each other where plain ``=``
    silently drops every such row.  Catalyst plans EqualNullSafe as an
    ordinary hash-join key (no cartesian; the null bucket is just one
    more key)."""
    ev = load_table(spark, sf_dir, "events")
    key = F.when(F.col("event_type") != "view", F.col("event_type"))
    a = ev.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("n_a"))
    b = ev.groupBy(key.alias("k")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cc_b")
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(a["k"].alias("k"), "n_a", "sum_cc_b")
    )


SQL_JOIN_NULL_SAFE = """
WITH a AS (
  SELECT CASE WHEN event_type <> 'view' THEN event_type END AS k,
         CAST(count(*) AS BIGINT) AS n_a
  FROM events GROUP BY 1
), b AS (
  SELECT CASE WHEN event_type <> 'view' THEN event_type END AS k,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cc_b
  FROM events GROUP BY 1
)
SELECT a.k, a.n_a, b.sum_cc_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


# ------------------------------------------------ union by name


def q_setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union: two projections with different
    column sets (and different column ORDER) merged by NAME, missing
    columns null-filled — positional UNION would mis-align or reject.
    The oracle is DuckDB's ``UNION ALL BY NAME``."""
    ev = load_table(spark, sf_dir, "events")
    old_feed = ev.where(F.col("event_id") % 2 == 0).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cc"),
    )
    # the "new" feed reorders columns and adds one the old feed lacks
    new_feed = ev.where(F.col("event_id") % 2 == 1).select(
        F.col("user_id"),
        F.col("event_type"),
        F.col("event_id"),
    )
    return old_feed.unionByName(new_feed, allowMissingColumns=True)


SQL_SETOP_UNION_BY_NAME = """
SELECT event_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cc,
       CAST(NULL AS BIGINT) AS user_id
FROM events WHERE event_id % 2 = 0
UNION ALL BY NAME
SELECT user_id, event_type, event_id,
       CAST(NULL AS BIGINT) AS value_cc
FROM events WHERE event_id % 2 = 1
"""


EXT19_QUERIES = {
    "stream_static_enrich": q_stream_static_enrich,
    "window_range_frame": q_window_range_frame,
    "sql_grouping_sets": q_sql_grouping_sets,
    "join_null_safe": q_join_null_safe,
    "setop_union_by_name": q_setop_union_by_name,
}

EXT19_ORACLES = {
    "stream_static_enrich": SQL_STREAM_STATIC_ENRICH,
    "window_range_frame": SQL_WINDOW_RANGE_FRAME,
    "sql_grouping_sets": _SQL_GROUPING_SETS,
    "join_null_safe": SQL_JOIN_NULL_SAFE,
    "setop_union_by_name": SQL_SETOP_UNION_BY_NAME,
}
