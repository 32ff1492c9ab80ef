"""Round-4 additions (nineteenth wave): the third sessionization
surface and parameterized SQL.

- ``stream_session_window`` — Spark's BUILT-IN ``session_window`` in
  STREAMING mode: the state store merges/extends open session windows
  per key across micro-batches and append mode emits a session only
  once the watermark proves no more events can join it.  The catalog
  already checks the batch ``session_window`` (``session_window_users``)
  and the hand-rolled stateful sessionizer
  (``stream_session_stateful``); this entry exercises the third,
  engine-managed streaming path against the same gaps-and-islands
  oracle.  Input staging reuses the two-sentinel watermark-advance
  trick of ``stream_watermark_flush`` (data batch -> sentinel batch
  advances the watermark past every real session -> second sentinel
  batch flushes them); the sentinel user's own never-closing session
  is filtered on the OUTPUT (filtering it before the watermark
  operator would push into the scan and stall the watermark — the
  documented pushdown-eats-sentinel trap).

- ``sql_parameterized`` — named-parameter SQL
  (``spark.sql(query, args={...})``): the injection-safe way to bind
  runtime values into SQL text.  Same ANSI text as the oracle with
  the parameters spliced, so the binding path itself is what the
  hash checks.

Scale notes: streaming session_window state is bounded by the
watermark exactly like the tumbling-window entries; parameter binding
is plan-time only (literals in the optimized plan — filters still
push down).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import load_table

_GAP_MIN = 30
_SS_USER_CAP = 40  # bounded user subset keeps the session relation small


def _stage_session_input(spark: SparkSession, sf_dir: str) -> str:
    """Data file + two watermark-advancing sentinel files, mtime-ordered
    so ``maxFilesPerTrigger=1`` delivers them as three batches (the
    shared ``stage_mtime_waves`` construction)."""
    from event_streaming_toy_example_spark.plans.queries_ext import (
        stage_mtime_waves,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < _SS_USER_CAP)
        .select("user_id", "ts")
    )
    far = spark.createDataFrame([(-1,)], "user_id long").select(
        "user_id",
        F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    return stage_mtime_waves(
        [ev, far, far], f"ssession_u{_SS_USER_CAP}", sf_dir
    )


def q_stream_session_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Built-in streaming session windows (30 min gap) per user; see
    module docstring."""
    in_path = _stage_session_input(spark, sf_dir)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_path)
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    from event_streaming_toy_example_spark.streaming.tuning import (
        stream_tuning,
    )

    with stream_tuning(spark):
        q = (
            stream.withWatermark("ts", "1 minute")
            .groupBy(
                F.col("user_id"),
                F.session_window("ts", f"{_GAP_MIN} minutes").alias("w"),
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.max(F.unix_micros("ts")).alias("last_event_us"),
            )
            .select(
                "user_id",
                F.unix_micros(F.col("w.start")).alias("session_start_us"),
                "last_event_us",
                "n_events",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_session_window did not finish in 300s"
            )
    # sentinel filter on the OUTPUT (never before the watermark op)
    return spark.table(name).where(F.col("user_id") >= 0)


SQL_STREAM_SESSION_WINDOW = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE user_id < {_SS_USER_CAP}
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                OR ts - prev_ts >= INTERVAL {_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM ordered
), sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS last_event_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sess_id
"""

# ------------------------------------------------ parameterized SQL

_PAR_MIN_PRICE = 150_000
_PAR_STATUS = "O"


def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: thresholds bind via ``args`` instead of
    string splicing; the bound literals still push down to the scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_param_v"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS LONG) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS LONG)) AS LONG)
                   AS sum_price_cc
        FROM orders_param_v
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": _PAR_MIN_PRICE, "status": _PAR_STATUS},
    )


SQL_SQL_PARAMETERIZED = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cc
FROM orders
WHERE o_totalprice > {_PAR_MIN_PRICE} AND o_orderstatus = '{_PAR_STATUS}'
GROUP BY o_orderpriority
"""

# ------------------------------------------------------------ exports

EXT26_QUERIES = {
    "stream_session_window": q_stream_session_window,
    "sql_parameterized": q_sql_parameterized,
}

EXT26_ORACLES = {
    "stream_session_window": SQL_STREAM_SESSION_WINDOW,
    "sql_parameterized": SQL_SQL_PARAMETERIZED,
}
