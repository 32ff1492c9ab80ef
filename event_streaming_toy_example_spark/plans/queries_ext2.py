"""Oracle-checked query catalog — analytics depth: session windows
(built-in batch + custom stateful streaming), sliding windows, cube,
EXCEPT, range join, exact percentiles, analytic filters, rolling-hash
fingerprints.

Same conventions as ``queries.py``: identical aliases on both sides,
rounded floats, timestamps as ``unix_micros`` bigints, deterministic
outputs.  Session semantics are pinned to Spark's half-open
``[start, last + gap)`` definition; the DuckDB twin uses the matching
``gap >= 30min -> new session`` gaps-and-islands flag.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from event_streaming_toy_example_spark.functions.text import (
    bpeish_token_count,
    fingerprint_rolling,
)
from event_streaming_toy_example_spark.schemas import load_table
from event_streaming_toy_example_spark.streaming.stateful import (
    sessionize_stateful,
)

_GAP_MIN = 30

# --------------------------------------------------------------------------
# Sessionization — built-in session_window (batch) ...
# --------------------------------------------------------------------------


def q_session_window_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in event-time session windows (30 min gap) per user."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
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
    )


SQL_SESSION_GAPS_AND_ISLANDS = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
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


# --------------------------------------------------------------------------
# ... and the custom stateful streaming twin (applyInPandasWithState)
# --------------------------------------------------------------------------


def q_stream_session_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization run as a real stream: file source
    -> applyInPandasWithState (one fixed-width state row per user) ->
    memory sink.

    The operator emits *closed* sessions; a per-user sentinel event far
    past the gap horizon flushes each user's tail session (the standard
    end-of-stream marker pattern), making the emitted set exactly the
    batch gaps-and-islands result — hash-checked against the same
    oracle as the built-in session_window query.
    """
    from event_streaming_toy_example_spark.plans.queries_ext import (
        await_or_raise,
        stage_stream_input,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    sentinels = ev.groupBy("user_id").agg(
        (F.max(F.unix_micros("ts")) + 10 * _GAP_MIN * 60 * 1_000_000).alias(
            "ts_us"
        )
    ).select(
        "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    in_path = stage_stream_input(ev.unionAll(sentinels), "sess", sf_dir)

    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, event_id bigint"
    ).parquet(in_path)
    q = (
        sessionize_stateful(stream, gap_minutes=_GAP_MIN)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, "stream_session_stateful")
    return spark.table(name)


# --------------------------------------------------------------------------
# Sliding windows
# --------------------------------------------------------------------------


def q_window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 2h windows sliding by 1h (each event lands in 2)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SQL_WINDOW_SLIDING_COUNTS = """
WITH contrib AS (
  SELECT date_trunc('hour', ts) AS w_start, event_type, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events
)
SELECT epoch_us(w_start) AS window_start_us, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM contrib GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Grouping sets / CUBE
# --------------------------------------------------------------------------


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all 4 grouping sets in one pass."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SQL_CUBE_EVENTS = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY CUBE(event_type, strftime(ts, '%Y-%m-%d'))
"""


# --------------------------------------------------------------------------
# Set ops: EXCEPT
# --------------------------------------------------------------------------


def q_setop_purchasers_no_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # scoped to the final days of the event window: over the full span
    # every user hits every event type (~67 events/user), which makes an
    # unrestricted EXCEPT vacuously empty — the window keeps real
    # survivors (4 at sf0.001, 37 at sf0.01) so set semantics are checked
    recent = ev.where(F.col("ts") >= F.lit("2024-01-28").cast("timestamp"))
    a = recent.where(F.col("event_type") == "purchase").select("user_id")
    b = recent.where(F.col("event_type") == "error").select("user_id")
    return a.subtract(b)


SQL_SETOP_PURCHASERS_NO_ERRORS = """
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-28'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-28'
"""


# --------------------------------------------------------------------------
# Range join
# --------------------------------------------------------------------------


def q_range_join_order_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: that user's event count/value in the 7 days up to the
    order's event-time — equi-join on user + time-range predicate (the
    range arm stays a post-join filter; the shuffle key is the user).
    ``_ORDER_EVENT_TS_SPARK`` bridges the disjoint testdata time domains
    (order dates 1995-2001 vs event clock 2024-01) with the same
    expression on both engines, so the range logic is checked against a
    non-empty answer."""
    from event_streaming_toy_example_spark.plans.queries import (
        _ORDER_EVENT_TS_SPARK,
    )

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 300)
    orders = orders.withColumn("o_event_ts", F.expr(_ORDER_EVENT_TS_SPARK))
    ev = load_table(spark, sf_dir, "events")
    j = orders.join(
        ev,
        (orders.o_custkey == ev.user_id)
        & (ev.ts >= F.col("o_event_ts") - F.expr("INTERVAL 7 DAYS"))
        & (ev.ts <= F.col("o_event_ts")),
    )
    # integer cents before the cross-row sum: double summation order is
    # engine-specific, so quantize first (the repo's exact-hash idiom)
    return j.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_events_7d"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_7d_cc"),
    )


def _sql_range_join_order_activity() -> str:
    from event_streaming_toy_example_spark.plans.queries import (
        _ORDER_EVENT_TS_SQL,
    )

    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, {_ORDER_EVENT_TS_SQL} AS o_event_ts
  FROM orders WHERE o_custkey < 300
)
SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_events_7d,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_7d_cc
FROM o JOIN events
  ON user_id = o_custkey
 AND ts >= o_event_ts - INTERVAL 7 DAY
 AND ts <= o_event_ts
GROUP BY 1
"""


SQL_RANGE_JOIN_ORDER_ACTIVITY = _sql_range_join_order_activity()


# --------------------------------------------------------------------------
# Exact percentiles
# --------------------------------------------------------------------------


def q_percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (at 100 TB swap in
    approx_percentile — same plan shape, bounded-memory sketch)."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))")
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.alias("p"), F.count(F.lit(1)).cast("long").alias("n_orders"))
        .select(
            "o_orderpriority",
            F.round(F.col("p")[0], 2).alias("p25"),
            F.round(F.col("p")[1], 2).alias("p50"),
            F.round(F.col("p")[2], 2).alias("p75"),
            F.round(F.col("p")[3], 2).alias("p90"),
            "n_orders",
        )
    )


SQL_PERCENTILES_BY_PRIORITY = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Analytic aggregate as filter (correlated-subquery shape)
# --------------------------------------------------------------------------


def _orders_above_cust_avg_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average price — the correlated
    scalar-subquery shape, decorrelated into one window aggregate.

    Money is compared in exact integer cents (``price*n > sum``), not
    floating-point averages: double summation order differs between
    engines (and between *runs* of a distributed engine), so the
    float-avg formulation is not reproducible at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.withColumn("cents", cents)
        .withColumn("sum_cents", F.sum("cents").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.col("cents") * F.col("n") > F.col("sum_cents"))
        .select(
            "o_orderkey",
            "o_custkey",
            # exact integer cents, never back to double: round(double, 2)
            # is bit-different between Spark (BigDecimal HALF_UP) and
            # DuckDB (binary rounding) on some values
            F.col("cents").alias("price_cc"),
            # integer division — half-cent averages round differently
            # between engines as doubles, so stay in exact integer units
            F.expr("sum_cents * 100 DIV n").alias("cust_avg_cc"),
        )
    )


# The round-3 driver bisect resolved: probes emitting only raw BIGINT
# columns passed, the probe adding the derived cust_avg_cc failed, and
# the mechanism turned out to be the ORACLE's type (DuckDB HUGEINT →
# float64 in a pandas-path fetch; see the CAST note below).  The fix is
# in the SQL, so the full 4-column operator holds the PRIMARY slot
# again and the probe entries are retired.


def q_orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average price (all four columns)."""
    return _orders_above_cust_avg_base(spark, sf_dir)


_SQL_ABOVE_AVG_CTE = """
WITH c AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey) AS sum_cents,
         count(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
)
"""

# NOTE the outer CAST on cust_avg_cc: DuckDB's windowed sum(BIGINT) is
# HUGEINT, and HUGEINT survives `* 100` and `//` — so without the CAST
# the derived average comes back HUGEINT, which a pandas-path fetch
# (fetchdf) coerces to float64 while Spark emits LongType: the driver's
# value hash then sees 2377788856.0 vs 2377788856 and fails even though
# fetchall() (what the local replay uses) returns exact ints.
# Root-caused in round 3 — every derived expression over a sum() must be
# CAST back to BIGINT (enforced repo-wide by
# tests/test_oracle_parity.py::test_no_hugeint_oracle_columns).
SQL_ORDERS_ABOVE_CUST_AVG = (
    _SQL_ABOVE_AVG_CTE
    + "SELECT o_orderkey, o_custkey, cents AS price_cc, "
    "CAST((sum_cents * 100) // n AS BIGINT) AS cust_avg_cc "
    "FROM c WHERE cents * n > sum_cents"
)


# --------------------------------------------------------------------------
# Text: rolling-hash fingerprint + BPE-ish token counts
# --------------------------------------------------------------------------


def q_text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_rolling(F.col("text")).alias("rolling_fp"),
        bpeish_token_count(F.col("text")).cast("long").alias("bpeish_tokens"),
    )


_SQL_NORM = (
    r"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),"
    r" '\s+', ' ', 'g'))"
)

SQL_TEXT_FINGERPRINT_ROLLING = rf"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(str_split({_SQL_NORM}, ''), c -> ascii(c)::BIGINT)),
         (a, b) -> (a * 31 + b) % 2147483647) AS rolling_fp,
       CAST(
         len(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> ''))
       + len(list_filter(regexp_split_to_array(text, '[^0-9]+'), x -> x <> ''))
       + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
       AS BIGINT) AS bpeish_tokens
FROM documents
"""


# --------------------------------------------------------------------------
# Outer joins
# --------------------------------------------------------------------------


def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (null
    handling via coalesce on the aggregated side)."""
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("o_totalprice").alias("total"),
        )
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_orders"),
            F.round(F.coalesce(F.col("total"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


SQL_LEFT_JOIN_ORDER_COUNTS = """
SELECT c_custkey, c_mktsegment,
       CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders,
       round(coalesce(total, 0.0), 2) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS total
  FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


def q_full_outer_type_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two daily profiles (purchase days vs error
    days) — both null sides must survive."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    a = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("purchases"))
    )
    b = (
        ev.where(F.col("event_type") == "error")
        .groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("errors"))
    )
    return (
        a.join(b, "day", "full_outer")
        .select(
            "day",
            F.coalesce("purchases", F.lit(0)).cast("long").alias("purchases"),
            F.coalesce("errors", F.lit(0)).cast("long").alias("errors"),
        )
    )


SQL_FULL_OUTER_TYPE_DAYS = """
SELECT coalesce(a.day, b.day) AS day,
       CAST(coalesce(purchases, 0) AS BIGINT) AS purchases,
       CAST(coalesce(errors, 0) AS BIGINT) AS errors
FROM (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
) a
FULL OUTER JOIN (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS errors
  FROM events WHERE event_type = 'error' GROUP BY 1
) b ON a.day = b.day
"""


# --------------------------------------------------------------------------
# Pivot
# --------------------------------------------------------------------------

_PIVOT_TYPES = ["click", "view", "purchase", "error"]


def q_pivot_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type (explicit value list, so the
    plan is a single aggregation — no distinct-scan of pivot values)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[
                F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
                for t in _PIVOT_TYPES
            ],
        )
    )


SQL_PIVOT_TYPE_BY_DAY = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# SQL-string API (spark.sql over registered views)
# --------------------------------------------------------------------------

_SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       {orderdate_us} AS o_orderdate_us
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2024-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via the ``spark.sql`` string API: the same text
    (modulo the epoch-µs function name) runs on both engines, proving
    the SQL surface — views registered per-sf_dir, plan identical to
    the equivalent DataFrame program (same Catalyst)."""
    from event_streaming_toy_example_spark.schemas import (
        register_testdata_views,
    )

    register_testdata_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    # parquet timestamps surface as TIMESTAMP_NTZ; the session runs in
    # UTC so the cast is an identity relabel, not a shift.
    return spark.sql(
        _SQL_SHIPPING_PRIORITY.format(
            orderdate_us="unix_micros(CAST(o_orderdate AS TIMESTAMP))"
        )
    )


SQL_SQL_SHIPPING_PRIORITY = _SQL_SHIPPING_PRIORITY.format(
    orderdate_us="epoch_us(o_orderdate)"
)


EXT2_QUERIES = {
    "sql_shipping_priority": q_sql_shipping_priority,
    "left_join_order_counts": q_left_join_order_counts,
    "full_outer_type_days": q_full_outer_type_days,
    "pivot_type_by_day": q_pivot_type_by_day,
    "session_window_users": q_session_window_users,
    "stream_session_stateful": q_stream_session_stateful,
    "window_sliding_counts": q_window_sliding_counts,
    "cube_events": q_cube_events,
    "setop_purchasers_no_errors": q_setop_purchasers_no_errors,
    "range_join_order_activity": q_range_join_order_activity,
    "percentiles_by_priority": q_percentiles_by_priority,
    "orders_above_cust_avg": q_orders_above_cust_avg,
    "text_fingerprint_rolling": q_text_fingerprint_rolling,
}

EXT2_ORACLES = {
    "sql_shipping_priority": SQL_SQL_SHIPPING_PRIORITY,
    "left_join_order_counts": SQL_LEFT_JOIN_ORDER_COUNTS,
    "full_outer_type_days": SQL_FULL_OUTER_TYPE_DAYS,
    "pivot_type_by_day": SQL_PIVOT_TYPE_BY_DAY,
    "session_window_users": SQL_SESSION_GAPS_AND_ISLANDS,
    "stream_session_stateful": SQL_SESSION_GAPS_AND_ISLANDS,
    "window_sliding_counts": SQL_WINDOW_SLIDING_COUNTS,
    "cube_events": SQL_CUBE_EVENTS,
    "setop_purchasers_no_errors": SQL_SETOP_PURCHASERS_NO_ERRORS,
    "range_join_order_activity": SQL_RANGE_JOIN_ORDER_ACTIVITY,
    "percentiles_by_priority": SQL_PERCENTILES_BY_PRIORITY,
    "orders_above_cust_avg": SQL_ORDERS_ABOVE_CUST_AVG,
    "text_fingerprint_rolling": SQL_TEXT_FINGERPRINT_ROLLING,
}
