"""Round-3 additions (eighth wave): incremental aggregate maintenance,
data-quality expectations, and the analytic-ranking window surface.

Reference parity anchors: the reference recomputes its per-batch
metrics from scratch every cycle (``toy_glue.py:47-50``) and its only
"validation" is a TODO (``toy_lambda_function.py:37``) — IVM and DQ
expectations are the engine-grade forms of those two gaps.

- ``agg_incremental_merge`` — incremental view maintenance: a prior
  daily rollup (partial aggregates) merged with a new partition's
  delta by re-aggregating the PARTIALS, never the history.  The
  oracle is the full re-aggregation over all raw rows — so the
  driver hash literally checks the IVM equivalence property
  (merge(partials) == recompute(raw)).
- ``dq_expectations`` — declarative data-quality rules (null, range,
  domain, referential integrity, key uniqueness) evaluated in one
  pass per table + one anti-join; the dbt-test / Delta-expectations
  surface.  One row per rule with checked/violation counts.
- ``window_analytics`` — ``ntile`` / ``percent_rank`` / ``cume_dist``
  over customer revenue: the ranking-analytics trio.  percent_rank
  and cume_dist are exact rank ratios (identical double division in
  both engines), ntile an integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from event_streaming_toy_example_spark.schemas import load_table

# ------------------------------------------- incremental agg merge

_IVM_CUTOVER_DAY = 25  # prior rollup covers days < 25, delta the rest


def q_agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-(day, event_type) rollup incrementally: the
    historical rollup contributes its PARTIAL (n, sum) rows, the new
    partition contributes freshly aggregated rows, and one re-
    aggregation of the union merges them — count and integer-cents
    sums are associative, so the merge touches O(groups), not
    O(history).  At 100 TB the history never rescans; only the new
    partition and the (tiny) rollup move."""
    ev = load_table(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    cc = F.round(F.col("value") * 100).cast("long")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            day.alias("day"), F.col("event_type")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cc).alias("sum_cc"),
        )

    prior = rollup(ev.where(day < _IVM_CUTOVER_DAY))
    delta = rollup(ev.where(day >= _IVM_CUTOVER_DAY))
    return (
        prior.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_cc").alias("sum_cc"))
    )


SQL_AGG_INCREMENTAL_MERGE = """
SELECT day(ts) AS day, event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cc
FROM events
GROUP BY 1, 2
"""

# ------------------------------------------------ DQ expectations


def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five declarative expectations over orders: non-null key,
    positive total price, order date in the valid domain, referential
    integrity to customer, and key uniqueness.  The four row-level
    rules share ONE scan (conditional sums); the RI check is a
    broadcast anti-join count; uniqueness is a key aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    row_rules = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("v_nullkey"),
        F.sum((~(F.col("o_totalprice") > 0)).cast("long")).alias("v_price"),
        F.sum(
            (
                ~(
                    (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp"))
                )
            ).cast("long")
        ).alias("v_date"),
    )
    ri = (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == cust["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v_ri"))
    )
    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("v_dup"))
    )
    # one row holding every rule's count, reshaped long with stack —
    # a union of per-rule projections would replicate the join subtree
    # once per rule (the first draft did: 15 broadcast exchanges)
    joined = row_rules.crossJoin(ri).crossJoin(dup)
    stack_args = ", ".join(
        f"'{name}', CAST({col} AS LONG)"
        for name, col in [
            ("orderkey_not_null", "v_nullkey"),
            ("totalprice_positive", "v_price"),
            ("orderdate_in_domain", "v_date"),
            ("custkey_references_customer", "v_ri"),
            ("orderkey_unique", "v_dup"),
        ]
    )
    return joined.select(
        F.expr(f"stack(5, {stack_args}) AS (rule, n_violations)"),
        F.col("n").cast("long").alias("n_checked"),
    ).select("rule", "n_checked", "n_violations")


SQL_DQ_EXPECTATIONS = """
WITH row_rules AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS v_nullkey,
         CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END)
             AS BIGINT) AS v_price,
         CAST(sum(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1995-01-01'
                            AND o_orderdate < TIMESTAMP '2002-01-01')
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_date
  FROM orders
), ri AS (
  SELECT CAST(count(*) AS BIGINT) AS v_ri FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)
), dup AS (
  SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT)
             AS v_dup
  FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
)
SELECT r.rule, rr.n AS n_checked,
       CASE r.rule
         WHEN 'orderkey_not_null' THEN rr.v_nullkey
         WHEN 'totalprice_positive' THEN rr.v_price
         WHEN 'orderdate_in_domain' THEN rr.v_date
         WHEN 'custkey_references_customer' THEN ri.v_ri
         WHEN 'orderkey_unique' THEN dup.v_dup
       END AS n_violations
FROM (VALUES ('orderkey_not_null'), ('totalprice_positive'),
             ('orderdate_in_domain'), ('custkey_references_customer'),
             ('orderkey_unique')) AS r(rule), row_rules rr, ri, dup
"""

# ------------------------------------------------ analytic rankings


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue deciles: ``ntile(10)``, ``percent_rank`` and
    ``cume_dist`` over per-customer order totals (exact rank ratios,
    6-decimal rounded).  One per-customer aggregate, one global
    ranking window over the aggregated (small) relation — the
    windows never see the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_cc"
        )
    )
    w = Window.orderBy(F.col("rev_cc").asc(), F.col("o_custkey").asc())
    return per_cust.select(
        "o_custkey",
        "rev_cc",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


SQL_WINDOW_ANALYTICS = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cc
  FROM orders GROUP BY 1
)
SELECT o_custkey, rev_cc,
       ntile(10) OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM per_cust
WINDOW w AS (ORDER BY rev_cc ASC, o_custkey ASC)
"""


EXT15_QUERIES = {
    "agg_incremental_merge": q_agg_incremental_merge,
    "dq_expectations": q_dq_expectations,
    "window_analytics": q_window_analytics,
}

EXT15_ORACLES = {
    "agg_incremental_merge": SQL_AGG_INCREMENTAL_MERGE,
    "dq_expectations": SQL_DQ_EXPECTATIONS,
    "window_analytics": SQL_WINDOW_ANALYTICS,
}
