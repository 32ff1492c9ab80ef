"""Round-3 additions (seventh wave): the event-analytics classics —
funnel conversion, cohort retention, time-series gap-fill with
interpolation.

The reference is an app-event pipeline (``producer.py:1-173`` emits
exactly these view/click/purchase/signup/error events) whose analytics
stop at duplicate counts (``toy_glue.py:47-50``); these are the three
queries such a pipeline's events table exists to answer, and none of
them needs anything beyond declarative DataFrame ops.  All three are
value-hash-checked against DuckDB twins, with every emitted number in
exact integer arithmetic.

- ``funnel_conversion`` — ordered view → click → purchase progression
  per user, each stage within 24 h of the previous: the canonical
  sequential-event query, decorrelated into three per-user min
  aggregates instead of a per-row subquery chain.
- ``cohort_retention`` — users bucketed by first-seen week, activity
  counted per week offset: the retention triangle.  Week indices are
  pure integer day arithmetic (``datediff div 7``) so no calendar
  convention can diverge between engines.
- ``timeseries_gapfill`` — dense hourly revenue series over the
  fixed 720-hour span: generate the spine, left-join actuals, fill
  counts with zero and VALUES by integer linear interpolation
  between the neighboring observed hours (nearest value at the
  edges).  The hypertable "gap fill + interpolate" surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from event_streaming_toy_example_spark.schemas import load_table

# ------------------------------------------------------------- funnel

_FUNNEL_STEP_HOURS = 24


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel: first view, first click within 24 h of it,
    first purchase within 24 h of that; stage = how deep the user got.

    Three per-user min-aggregates chained by broadcast-joined bounds —
    each stage's aggregate only scans its event type (predicate pushed
    to the scan), and the per-user frames are single-shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    step = F.expr(f"INTERVAL {_FUNNEL_STEP_HOURS} HOURS")

    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(views), "user_id")
        .where((F.col("ts") >= F.col("v_ts")) & (F.col("ts") <= F.col("v_ts") + step))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    buys = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(clicks), "user_id")
        .where((F.col("ts") >= F.col("c_ts")) & (F.col("ts") <= F.col("c_ts") + step))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    out = (
        views.join(clicks, "user_id", "left").join(buys, "user_id", "left")
    )
    return out.select(
        "user_id",
        F.unix_micros("v_ts").alias("view_us"),
        F.unix_micros("c_ts").alias("click_us"),
        F.unix_micros("p_ts").alias("purchase_us"),
        (
            F.lit(1)
            + F.col("c_ts").isNotNull().cast("int")
            + F.col("p_ts").isNotNull().cast("int")
        ).alias("stage"),
    )


SQL_FUNNEL_CONVERSION = f"""
WITH views AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
), clicks AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND e.ts >= v.v_ts AND e.ts <= v.v_ts + INTERVAL {_FUNNEL_STEP_HOURS} HOURS
  GROUP BY 1
), buys AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts >= c.c_ts AND e.ts <= c.c_ts + INTERVAL {_FUNNEL_STEP_HOURS} HOURS
  GROUP BY 1
)
SELECT v.user_id,
       epoch_us(v.v_ts) AS view_us,
       epoch_us(c.c_ts) AS click_us,
       epoch_us(b.p_ts) AS purchase_us,
       1 + CAST(c.c_ts IS NOT NULL AS INT)
         + CAST(b.p_ts IS NOT NULL AS INT) AS stage
FROM views v
LEFT JOIN clicks c ON v.user_id = c.user_id
LEFT JOIN buys b ON v.user_id = b.user_id
"""

# ------------------------------------------------------------ cohorts

_EPOCH_DAY = "2024-01-01"


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: cohort = integer week index of the user's
    first event (days since the fixed epoch, div 7 — no calendar
    convention involved); one row per (cohort, week offset) with the
    distinct active users.  Two per-user-key shuffles total: the
    first-seen aggregate and the final distinct-count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    epoch = F.lit(_EPOCH_DAY).cast("date")
    day = F.datediff(F.to_date("ts"), epoch)
    first = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    joined = ev.join(F.broadcast(first), "user_id").select(
        "user_id",
        F.expr("first_day div 7").alias("cohort_week"),
        F.expr(
            f"(datediff(to_date(ts), DATE '{_EPOCH_DAY}') - first_day) div 7"
        ).alias("week_offset"),
    )
    return joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )


SQL_COHORT_RETENTION = f"""
WITH first AS (
  SELECT user_id,
         min(datediff('day', DATE '{_EPOCH_DAY}', CAST(ts AS DATE)))
             AS first_day
  FROM events GROUP BY 1
)
SELECT f.first_day // 7 AS cohort_week,
       (datediff('day', DATE '{_EPOCH_DAY}', CAST(e.ts AS DATE))
        - f.first_day) // 7 AS week_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2
"""

# ----------------------------------------------------------- gap fill

_SPAN_HOURS = 720  # the fixed 30-day synthetic window
_TS0 = "2024-01-01 00:00:00"


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly purchase-revenue series with interpolated gaps.

    Spine: ``sequence(0, 719)`` exploded (no table scan).  Actuals:
    one hour-bucket aggregate in integer cents.  Fill: window
    last/first-non-null on either side, integer linear interpolation
    ``prev + (next-prev)*(h-ph) div (nh-ph)`` (nearest value at the
    edges) — every output exact.

    Scale note: the two unbounded windows run over the SPINE (one row
    per hour), not the fact table — a year is 8 760 rows per series;
    at many series the windows partition by series id and stay tiny.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = F.expr(
        f"CAST(floor((unix_micros(ts) - unix_micros(TIMESTAMP '{_TS0}'))"
        f" / 3600000000.0) AS LONG)"
    )
    actual = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            hour.alias("hi"),
            F.round(F.col("value") * 100).cast("long").alias("cc"),
        )
        .groupBy("hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cc").alias("rev_cc"),
        )
    )
    spine = spark.range(_SPAN_HOURS).select(F.col("id").alias("hi"))
    j = spine.join(actual, "hi", "left")
    w_back = Window.orderBy("hi").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy("hi").rowsBetween(0, Window.unboundedFollowing)
    prev_cc = F.last("rev_cc", ignorenulls=True).over(w_back)
    prev_hi = F.last(
        F.when(F.col("rev_cc").isNotNull(), F.col("hi")), ignorenulls=True
    ).over(w_back)
    next_cc = F.first("rev_cc", ignorenulls=True).over(w_fwd)
    next_hi = F.first(
        F.when(F.col("rev_cc").isNotNull(), F.col("hi")), ignorenulls=True
    ).over(w_fwd)
    staged = j.select(
        "hi",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "rev_cc",
        prev_cc.alias("_prev_cc"),
        prev_hi.alias("_prev_hi"),
        next_cc.alias("_next_cc"),
        next_hi.alias("_next_hi"),
    )
    return staged.select(
        "hi",
        "n_events",
        F.when(F.col("rev_cc").isNotNull(), F.col("rev_cc"))
        .otherwise(
            F.when(
                F.col("_prev_cc").isNotNull() & F.col("_next_cc").isNotNull(),
                F.col("_prev_cc")
                + F.expr(
                    "(_next_cc - _prev_cc) * (hi - _prev_hi) "
                    "div (_next_hi - _prev_hi)"
                ),
            ).otherwise(F.coalesce("_prev_cc", "_next_cc"))
        )
        .alias("filled_cc"),
        F.col("rev_cc").isNull().cast("int").alias("is_gap"),
    )


SQL_TIMESERIES_GAPFILL = f"""
WITH spine AS (
  SELECT unnest(generate_series(0, {_SPAN_HOURS - 1})) AS hi
), actual AS (
  SELECT CAST(floor((epoch_us(ts) - epoch_us(TIMESTAMP '{_TS0}'))
              / 3600000000.0) AS BIGINT) AS hi,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cc
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), j AS (
  SELECT s.hi, coalesce(a.n_events, 0) AS n_events, a.rev_cc
  FROM spine s LEFT JOIN actual a ON s.hi = a.hi
), f AS (
  SELECT hi, n_events, rev_cc,
         last_value(rev_cc IGNORE NULLS) OVER
           (ORDER BY hi ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_cc,
         last_value(CASE WHEN rev_cc IS NOT NULL THEN hi END IGNORE NULLS)
           OVER (ORDER BY hi ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
           ROW) AS prev_hi,
         first_value(rev_cc IGNORE NULLS) OVER
           (ORDER BY hi ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_cc,
         first_value(CASE WHEN rev_cc IS NOT NULL THEN hi END IGNORE NULLS)
           OVER (ORDER BY hi ROWS BETWEEN CURRENT ROW AND UNBOUNDED
           FOLLOWING) AS next_hi
  FROM j
)
SELECT hi, n_events,
       CASE WHEN rev_cc IS NOT NULL THEN rev_cc
            WHEN prev_cc IS NOT NULL AND next_cc IS NOT NULL
              THEN prev_cc + (next_cc - prev_cc) * (hi - prev_hi)
                   // (next_hi - prev_hi)
            ELSE coalesce(prev_cc, next_cc) END AS filled_cc,
       CAST(rev_cc IS NULL AS INT) AS is_gap
FROM f
"""


EXT14_QUERIES = {
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "timeseries_gapfill": q_timeseries_gapfill,
}

EXT14_ORACLES = {
    "funnel_conversion": SQL_FUNNEL_CONVERSION,
    "cohort_retention": SQL_COHORT_RETENTION,
    "timeseries_gapfill": SQL_TIMESERIES_GAPFILL,
}
