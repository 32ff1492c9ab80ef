"""Oracle-checked query catalog — remaining SQL-surface families:
higher-order array functions (`transform`/`filter`/`aggregate` — the
JVM-side way to process `array<float>` embedding columns without a
UDF), relational unpivot/melt, and a rolling window frame.

Same conventions as ``queries.py``: identical aliases both sides,
rounded floats, deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from event_streaming_toy_example_spark.schemas import load_table

# --------------------------------------------------------------------------
# Higher-order array functions over the embedding column
# --------------------------------------------------------------------------


def q_array_surface_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector statistics computed entirely with higher-order array
    expressions (`size`/`filter`/`array_max`/`aggregate`) — no Python
    boundary, no explode: each row folds its own array inside codegen,
    so the op is embarrassingly parallel and shuffle-free at any scale.
    Elements are promoted to double before the fold so the left-to-right
    accumulation is bit-identical to the oracle's ``list_transform`` +
    ``list_sum``.
    """
    x = F.col("embedding")
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size(x).alias("dim"),
        F.size(F.filter(x, lambda v: v > 0)).alias("n_pos"),
        F.array_max(x).alias("max_val"),
        F.round(
            F.aggregate(x, F.lit(0.0), lambda acc, v: acc + F.abs(v.cast("double"))),
            4,
        ).alias("l1_norm"),
    )


SQL_ARRAY_SURFACE_EMBEDDINGS = """
SELECT vec_id,
       len(embedding) AS dim,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       list_max(embedding) AS max_val,
       round(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4)
           AS l1_norm
FROM embeddings
"""


# --------------------------------------------------------------------------
# Unpivot / melt
# --------------------------------------------------------------------------


def q_unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long relational unpivot: aggregate two metrics per order
    priority, then melt them into (metric, value) rows with
    `DataFrame.unpivot`. The unpivot itself is a narrow per-row
    expansion (no shuffle beyond the aggregation's own exchange)."""
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
        )
    )
    return agg.unpivot(
        ["o_orderpriority"], ["sum_price", "n_orders"], "metric", "value"
    )


SQL_UNPIVOT_ORDER_METRICS = """
SELECT o_orderpriority, 'sum_price' AS metric,
       round(sum(o_totalprice), 2) AS value
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, 'n_orders' AS metric,
       CAST(count(*) AS DOUBLE) AS value
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Rolling window frame (7-day moving average)
# --------------------------------------------------------------------------


def q_rolling_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling average of daily revenue via a ROWS window frame.
    The global `orderBy` window runs on the *post-aggregation* relation
    — one row per day — so its single-partition sort is bounded by the
    calendar, not the fact table (~2.4k rows regardless of SF); the
    heavy reduction happens in the shuffled hash aggregate before it.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "day_revenue",
        F.round(F.avg("day_revenue").over(w), 2).alias("avg_7d"),
    )


SQL_ROLLING_AVG_DAILY_REVENUE = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         round(sum(o_totalprice), 2) AS day_revenue
  FROM orders GROUP BY 1
)
SELECT day, day_revenue,
       round(avg(day_revenue) OVER (
           ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS avg_7d
FROM daily
"""


# --------------------------------------------------------------------------
# Dead-letter routing for undecodable records
# --------------------------------------------------------------------------


def q_pipe_deadletter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record routing: corrupt a deterministic 2% of the
    Kinesis feed (event_id % 50 == 0), decode with the dead-letter
    split, and report both branch counts. The valid branch must decode
    everything uncorrupted; the dead branch must catch exactly the
    corrupted records — PERMISSIVE `from_json` never throws, so one
    bad producer cannot fail a 100 TB ingest job."""
    from event_streaming_toy_example_spark.sources.kinesis import (
        decode_with_dead_letter,
        wrap_kinesis_envelope,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("double").alias("created_at"),
        F.col("event_type").alias("event_name"),
        F.struct(F.col("props").alias("language_id")).alias("event_specifics"),
        F.col("event_id").cast("string").alias("event_uuid"),
    )
    feed = wrap_kinesis_envelope(ev, keep=["event_uuid"]).select(
        F.when(
            F.col("event_uuid").cast("long") % 50 == 0,
            F.concat(F.lit("CORRUPT"), F.col("record")),
        )
        .otherwise(F.col("record"))
        .alias("record")
    )
    valid, dead = decode_with_dead_letter(feed)
    return valid.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("valid").alias("branch"), "n"
    ).unionAll(
        dead.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit("dead").alias("branch"), "n"
        )
    )


SQL_PIPE_DEADLETTER_SPLIT = """
SELECT 'valid' AS branch, CAST(count(*) AS BIGINT) AS n
FROM events WHERE event_id % 50 <> 0
UNION ALL
SELECT 'dead' AS branch, CAST(count(*) AS BIGINT) AS n
FROM events WHERE event_id % 50 = 0
"""


# --------------------------------------------------------------------------
# Skew tooling as catalog queries (result must equal the plain forms)
# --------------------------------------------------------------------------


def q_skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through `salted_join` (probe =
    lineitem salted, build = orders exploded 8x): the skew-resistant
    join must produce exactly the plain equi-join's answer — the salt
    only routes rows. The oracle is the unsalted SQL join."""
    from event_streaming_toy_example_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


SQL_SKEW_SALTED_JOIN_REVENUE = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_skew_salted_agg_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the hot-keyed event_type
    column (a handful of values owning all rows — the worst-case key
    distribution). Result must equal the plain groupBy exactly; the
    oracle is the unsalted SQL aggregate."""
    from event_streaming_toy_example_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "sum_value": ("sum", "value"),
            "max_value": ("max", "value"),
        },
        buckets=8,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 2).alias("sum_value"),
        F.round("max_value", 6).alias("max_value"),
    )


SQL_SKEW_SALTED_AGG_TYPE_STATS = """
SELECT event_type,
       CAST(count(event_id) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(max(value), 6) AS max_value
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Duplicate-cluster formation: near-dup pairs -> connected components
# --------------------------------------------------------------------------


def _cluster_corpus_and_labels(
    spark: SparkSession, sf_dir: str, algorithm: str = "propagation"
):
    """Shared construction: documents plus near-exact copies under
    shifted ids (doc_id%10 -> +1M, doc_id%20 -> additionally +2M,
    forming 3-cliques), n-gram-Jaccard pairs, connected-component
    labels. Returns (corpus, labels[id, label])."""
    from event_streaming_toy_example_spark.functions.minhash import (
        ngram_jaccard_pairs,
    )
    from event_streaming_toy_example_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    cc = connected_components_star if algorithm == "star" else connected_components
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    corpus = docs.unionAll(
        docs.where(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    ).unionAll(
        docs.where(F.col("doc_id") % 20 == 0).withColumn(
            "doc_id", F.col("doc_id") + 2000000
        )
    )
    pairs = ngram_jaccard_pairs(
        corpus, block_cols=["lang", "source"], k=3, threshold=0.2
    ).select("id_a", "id_b")
    labels = cc(pairs, corpus.select(F.col("doc_id").alias("id")))
    return corpus, labels


def q_dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs are not clusters: dedup needs transitively-connected docs
    grouped so one canonical survivor per cluster can be kept. Inject
    near-exact copies under shifted ids, emit n-gram-Jaccard pairs,
    then run iterative min-label connected components
    (`operators/components.py`). cluster_id = min doc_id of the
    component; the oracle is a recursive CTE over identical pairs."""
    _, labels = _cluster_corpus_and_labels(spark, sf_dir)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").cast("long").alias("cluster_id")
    )


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final dedup step: one canonical survivor per duplicate
    cluster — keep-the-longest (a standard informativeness heuristic),
    doc_id as the deterministic tie-break. One ranking window per
    cluster on the already-labeled relation; the cluster-size count
    rides the same partition (no extra shuffle)."""
    corpus, labels = _cluster_corpus_and_labels(spark, sf_dir)
    lens = corpus.select(
        F.col("doc_id").alias("id"), F.length("text").cast("long").alias("n_chars")
    )
    j = labels.join(lens, "id")
    wp = Window.partitionBy("label")
    w = wp.orderBy(F.desc("n_chars"), F.asc("id"))
    return (
        j.select(
            F.col("label").cast("long").alias("cluster_id"),
            F.col("id").alias("survivor_doc_id"),
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wp).cast("long").alias("cluster_size"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def _sql_dedup_cluster_components() -> str:
    from event_streaming_toy_example_spark.plans.queries_ext import (
        _sql_shingles,
        _sql_tokens,
    )

    return rf"""
WITH RECURSIVE
corpus AS (
  SELECT doc_id, lang, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, lang, source, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, lang, source, text FROM documents WHERE doc_id % 20 = 0
), t AS (
  SELECT doc_id AS id, lang, source, {_sql_tokens('text')} AS toks FROM corpus
), s AS (
  SELECT id, lang, source, {_sql_shingles('toks', 3)} AS sh FROM t
), pairs AS (
  SELECT l.id AS id_a, r.id AS id_b
  FROM s l JOIN s r
    ON l.lang = r.lang AND l.source = r.source AND l.id < r.id
  WHERE round(len(list_intersect(l.sh, r.sh)) /
        (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))), 6) >= 0.2
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM corpus
  UNION
  SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


def _sql_dedup_survivors() -> str:
    base = _sql_dedup_cluster_components()
    return rf"""
WITH labeled AS (
{base}
), ranked AS (
  SELECT l.cluster_id, l.doc_id AS survivor_doc_id,
         CAST(length(c.text) AS BIGINT) AS n_chars,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY length(c.text) DESC, l.doc_id ASC) AS rn,
         CAST(count(*) OVER (PARTITION BY l.cluster_id) AS BIGINT) AS cluster_size
  FROM labeled l
  JOIN (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 20 = 0
  ) c ON c.doc_id = l.doc_id
)
SELECT cluster_id, survivor_doc_id, n_chars, cluster_size
FROM ranked WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Quantile sketch (approximate percentiles — the HLL twin for quantiles)
# --------------------------------------------------------------------------


def q_sketch_quantiles_price_estimates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate p50/p90/p99 order price per priority via
    `approx_percentile` (KLL-style mergeable sketch: map-side partials,
    one shuffle of fixed-size sketches — the scale path where exact
    percentiles would sort the fact table). Raw estimates are
    engine-specific -> rows-only; the driver-checked error contract
    lives in ``sketch_quantiles_price`` (round 5)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("p90"),
            F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("p99"),
        )
    )


#: Quantile-sketch error budget: |approx - exact| as ppm of the
#: per-group price SPAN (max - min).  Measured worst case at accuracy
#: 10000 (deterministic sketch): 320 ppm of span across
#: sf0.001/0.01/0.1 — 5000 ppm (0.5% of span) gives >15x headroom.
_QUANTILE_ERR_BUDGET_PPM = 5_000


def q_sketch_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch error contract (round 5) — value-hash-checked.

    ``approx_percentile``'s estimates are engine-specific, but the
    error relation to the exact percentiles is oracle-predictable: per
    priority, emit the group's row count (DuckDB computes it
    independently) and integer flags that each approximate percentile
    landed within the span-relative budget of the exact percentile
    computed in the same aggregate."""
    span = F.max("o_totalprice") - F.min("o_totalprice")

    def ok(p: float, name: str):
        approx = F.approx_percentile("o_totalprice", F.lit(p), F.lit(10000))
        exact = F.expr(f"percentile(o_totalprice, {p})")
        return (
            F.abs(approx - exact) * F.lit(1_000_000)
            <= F.lit(_QUANTILE_ERR_BUDGET_PPM) * span
        ).cast("int").alias(name)

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.lit(_QUANTILE_ERR_BUDGET_PPM).cast("int").alias("err_budget_ppm"),
            ok(0.5, "ok_p50"),
            ok(0.9, "ok_p90"),
            ok(0.99, "ok_p99"),
        )
    )


SQL_SKETCH_QUANTILES_CONTRACT = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST({_QUANTILE_ERR_BUDGET_PPM} AS INT) AS err_budget_ppm,
       CAST(1 AS INT) AS ok_p50, CAST(1 AS INT) AS ok_p90,
       CAST(1 AS INT) AS ok_p99
FROM orders GROUP BY o_orderpriority
"""


EXT6_QUERIES = {
    "array_surface_embeddings": q_array_surface_embeddings,
    "unpivot_order_metrics": q_unpivot_order_metrics,
    "rolling_avg_daily_revenue": q_rolling_avg_daily_revenue,
    "pipe_deadletter_split": q_pipe_deadletter_split,
    "skew_salted_join_revenue": q_skew_salted_join_revenue,
    "skew_salted_agg_type_stats": q_skew_salted_agg_type_stats,
    "dedup_cluster_components": q_dedup_cluster_components,
    "dedup_survivors": q_dedup_survivors,
    "sketch_quantiles_price": q_sketch_quantiles_price,
    "sketch_quantiles_price_estimates": q_sketch_quantiles_price_estimates,
}

EXT6_ORACLES = {
    # sketch_quantiles_price (round 5): the ERROR CONTRACT is
    # hash-checked — per-group counts computed independently by DuckDB
    # + err-within-budget flags; only the raw `_estimates` twin stays
    # rows-only.
    "sketch_quantiles_price": SQL_SKETCH_QUANTILES_CONTRACT,
    "array_surface_embeddings": SQL_ARRAY_SURFACE_EMBEDDINGS,
    "unpivot_order_metrics": SQL_UNPIVOT_ORDER_METRICS,
    "rolling_avg_daily_revenue": SQL_ROLLING_AVG_DAILY_REVENUE,
    "pipe_deadletter_split": SQL_PIPE_DEADLETTER_SPLIT,
    "skew_salted_join_revenue": SQL_SKEW_SALTED_JOIN_REVENUE,
    "skew_salted_agg_type_stats": SQL_SKEW_SALTED_AGG_TYPE_STATS,
    "dedup_cluster_components": _sql_dedup_cluster_components(),
    "dedup_survivors": _sql_dedup_survivors(),
}
