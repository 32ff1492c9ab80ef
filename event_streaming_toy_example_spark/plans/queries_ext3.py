"""Oracle-checked query catalog — round-out: snapshot dedup (latest
row per key), corpus term statistics, an end-to-end document-curation
pipeline, a watermarked stream-stream join, and HLL sketch
aggregation for the 100 TB scale path.

Same conventions as ``queries.py``: identical aliases on both sides,
rounded floats, timestamps as ``unix_micros`` bigints, deterministic
outputs (every top-k carries a total tie-break).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from event_streaming_toy_example_spark.functions.text import (
    normalize_text,
    quality_features,
    tokens,
)
from event_streaming_toy_example_spark.schemas import load_table

# --------------------------------------------------------------------------
# Snapshot dedup — latest record per key
# --------------------------------------------------------------------------


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only the most recent event per user (CDC-style snapshot
    compaction — the standard "current state" operator for an event
    store). One window shuffle on user_id; at scale this is the same
    partitioning the per-user store already has, so with a bucketed
    layout (operators/bucketing.py) the Exchange disappears.

    Total tie-break (ts DESC, event_id DESC) keeps the survivor
    deterministic even for same-timestamp events.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 4).alias("last_value"),
        )
    )


SQL_LATEST_EVENT_PER_USER = """
SELECT user_id,
       epoch_us(ts) AS last_ts_us,
       event_type AS last_event_type,
       round(value, 4) AS last_value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Corpus term statistics — explode + aggregate (training-data vocab scan)
# --------------------------------------------------------------------------

_TOPK_TERMS = 50


def q_text_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 terms by document frequency over the normalized
    corpus. explode() stays in whole-stage codegen; the aggregate is a
    partial+final hash agg, so the shuffle carries one row per distinct
    term per task, not one per token occurrence.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(tokens(normalize_text(F.col("text")))).alias("term")
    )
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("term"))
        .limit(_TOPK_TERMS)
    )


# DuckDB twin tokenizes with the same normalize (lower, strip
# non-[a-z0-9\s], collapse whitespace) as functions/text.py.
SQL_TEXT_TERM_TOPK = rf"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(
           trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
         x -> x <> '')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
FROM toks GROUP BY term
ORDER BY n_occurrences DESC, term
LIMIT {_TOPK_TERMS}
"""


# --------------------------------------------------------------------------
# End-to-end curation pipeline (dedup + quality gate) — the composed
# "what a training-data pipeline actually runs" query
# --------------------------------------------------------------------------

_CURATE_MIN_SCORE = 0.5
_CURATE_MIN_TOKENS = 3


def q_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate a dup-injected corpus: exact content dedup (min doc_id
    survives) composed with the quality gate (score >= 0.5 and >= 3
    tokens). This is the composition users run end to end; each stage
    is individually oracle-checked (dedup_exact_docs, text_quality) and
    this entry checks the composition.

    Plan shape: one hash-agg shuffle for survivors (content-hash keyed)
    + one join back on doc_id. The quality features are computed only
    on the original table (quality is duplication-invariant), then
    semi-filtered by the survivor set — at 100 TB the survivor side is
    the small post-agg projection of (hash, doc_id), not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.unionAll(docs.where(F.col("doc_id") % 10 == 0))
    survivors = dup.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("doc_id")
    )
    quality = quality_features(docs).where(
        (F.col("q_score") >= _CURATE_MIN_SCORE)
        & (F.col("q_n_tokens") >= _CURATE_MIN_TOKENS)
    )
    return quality.join(survivors.select("doc_id"), "doc_id").select(
        "doc_id", "lang", "q_n_tokens", "q_score"
    )


def _sql_curate_documents() -> str:
    from event_streaming_toy_example_spark.plans.queries_ext import (
        SQL_TEXT_QUALITY,
    )

    return f"""
WITH dup AS (
  SELECT * FROM documents
  UNION ALL SELECT * FROM documents WHERE doc_id % 10 = 0
), survivors AS (
  SELECT md5(text) AS content_hash, min(doc_id) AS doc_id
  FROM dup GROUP BY 1
), quality AS ({SQL_TEXT_QUALITY})
SELECT q.doc_id, d.lang, q.q_n_tokens, q.q_score
FROM quality q
JOIN survivors s ON q.doc_id = s.doc_id
JOIN documents d ON q.doc_id = d.doc_id
WHERE q.q_score >= {_CURATE_MIN_SCORE} AND q.q_n_tokens >= {_CURATE_MIN_TOKENS}
"""


# --------------------------------------------------------------------------
# Watermarked stream-stream join
# --------------------------------------------------------------------------

_SSJ_WATERMARK = "90 days"


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real stream-stream inner join: purchases joined to the same
    user's errors within the following hour, both sides file-source
    streams with event-time watermarks and an explicit time-range join
    condition (the two things Spark needs to bound join state).

    The watermark delay (90 days) exceeds the dataset's 30-day span so
    no state is evicted mid-replay and the result equals the batch
    join — which is exactly what the oracle checks. In production the
    delay is the out-of-orderness bound, e.g. minutes, and state stays
    O(rows within the bound).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    from event_streaming_toy_example_spark.plans.queries_ext import (
        await_or_raise,
        stage_stream_input,
    )

    in_path = stage_stream_input(ev, "ssj", sf_dir)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"

    def side(event_type: str, alias: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(in_path)
            .where(F.col("event_type") == event_type)
            .withWatermark("ts", _SSJ_WATERMARK)
            .alias(alias)
        )

    joined = (
        side("purchase", "p")
        .join(
            side("error", "e"),
            F.expr(
                "p.user_id = e.user_id AND "
                "e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR"
            ),
        )
        .select(
            F.col("p.user_id").alias("user_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("e.event_id").alias("error_id"),
            F.unix_micros("p.ts").alias("purchase_us"),
            F.unix_micros("e.ts").alias("error_us"),
        )
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    from event_streaming_toy_example_spark.streaming.tuning import (
        stream_tuning,
    )

    with stream_tuning(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "stream_stream_join")
    return spark.table(name)


SQL_STREAM_STREAM_JOIN = """
SELECT p.user_id AS user_id,
       p.event_id AS purchase_id,
       e.event_id AS error_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(e.ts) AS error_us
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
"""


# --------------------------------------------------------------------------
# HLL sketches — mergeable distinct-count state for the scale path
# --------------------------------------------------------------------------


def q_sketch_hll_users_estimates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct users per event type via Datasketches HLL, plus the
    union sketch across all types ('__all__' row) — demonstrating the
    property that matters at 100 TB: sketches merge, so per-partition /
    per-day sketches roll up without re-scanning raw data.

    Raw estimates are engine-specific → rows-only; the driver-checked
    error contract lives in ``sketch_hll_users`` (round 5)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    overall = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__all__").alias("event_type"), "sk"
    )
    return (
        per_type.unionByName(overall)
        .select(
            "event_type",
            F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
        )
        .orderBy("event_type")
    )


#: HLL(lg_k=12) error budget vs the exact distinct count, in ppm.
#: Measured worst case (deterministic sketch): 0 at sf0.001/sf0.01,
#: 4000 ppm at sf0.1 — 20000 gives 5x headroom while still far
#: tighter than the library's published 1.6% rse at lg_k=12.
_HLL_ERR_BUDGET_PPM = 20_000


def q_sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL error contract (round 5) — value-hash-checked by the driver.

    The sketch estimate is engine-specific, but its ERROR RELATION to
    the exact distinct count is oracle-predictable: per event type
    (plus the '__all__' union-sketch row), emit the exact count — which
    DuckDB computes independently — and an integer flag that the HLL
    estimate landed within the ppm budget.  An estimator regression
    (or a broken union-merge path) flips the driver hash red instead
    of hiding behind a rows-only check; same construction as the ANN
    recall contracts (``functions/similarity.py::topk_recall_contract``)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    overall = (
        per_type.agg(
            F.hll_union_agg("sk").alias("sk"),
        )
        .crossJoin(  # single-row x single-row: the union sketch needs
            # the GLOBAL exact count, not the sum of per-type counts
            ev.agg(F.count_distinct("user_id").alias("exact_users"))
        )
        .select(F.lit("__all__").alias("event_type"), "sk", "exact_users")
    )
    est = F.hll_sketch_estimate("sk").cast("long")
    err_ppm = F.abs(est - F.col("exact_users")) * F.lit(1_000_000)
    return (
        per_type.select("event_type", "sk", "exact_users")
        .unionByName(overall)
        .select(
            "event_type",
            "exact_users",
            F.lit(_HLL_ERR_BUDGET_PPM).cast("int").alias("err_budget_ppm"),
            (err_ppm <= F.lit(_HLL_ERR_BUDGET_PPM) * F.col("exact_users"))
            .cast("int")
            .alias("err_ok"),
        )
        .orderBy("event_type")
    )


SQL_SKETCH_HLL_CONTRACT = f"""
WITH per_type AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY event_type
  UNION ALL
  SELECT '__all__', COUNT(DISTINCT user_id) FROM events
)
SELECT event_type, CAST(exact_users AS BIGINT) AS exact_users,
       CAST({_HLL_ERR_BUDGET_PPM} AS INT) AS err_budget_ppm,
       CAST(1 AS INT) AS err_ok
FROM per_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# CDC upsert — apply a changes batch onto a snapshot (MERGE semantics)
# --------------------------------------------------------------------------

_CDC_CUTOFF = "2024-01-20"


def q_upsert_events_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental table maintenance: the pre-cutoff per-user snapshot
    merged with the post-cutoff CDC batch via operators/upsert.py —
    newest row per user wins, changes beat base on ties. One key-
    partitioned shuffle; WindowGroupLimit pre-limits map-side."""
    from event_streaming_toy_example_spark.operators.upsert import (
        upsert_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cutoff = F.lit(_CDC_CUTOFF).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        ev.where(F.col("ts") < cutoff)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    changes = ev.where(F.col("ts") >= cutoff)
    snap = upsert_snapshot(base, changes, ["user_id"], ["ts", "event_id"])
    return snap.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        F.round("value", 4).alias("value"),
    )


SQL_UPSERT_EVENTS_CDC = f"""
WITH base AS (
  SELECT event_id, ts, user_id, event_type, value, 0 AS src
  FROM (SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_CDC_CUTOFF}')
  WHERE rn = 1
), changes AS (
  SELECT event_id, ts, user_id, event_type, value, 1 AS src
  FROM events WHERE ts >= TIMESTAMP '{_CDC_CUTOFF}'
), merged AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC, src DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
)
SELECT user_id, epoch_us(ts) AS ts_us, event_type,
       round(value, 4) AS value
FROM merged WHERE rn = 1
"""


EXT3_QUERIES = {
    "upsert_events_cdc": q_upsert_events_cdc,
    "latest_event_per_user": q_latest_event_per_user,
    "text_term_topk": q_text_term_topk,
    "curate_documents": q_curate_documents,
    "stream_stream_join": q_stream_stream_join,
    "sketch_hll_users": q_sketch_hll_users,
    "sketch_hll_users_estimates": q_sketch_hll_users_estimates,
}

EXT3_ORACLES = {
    "upsert_events_cdc": SQL_UPSERT_EVENTS_CDC,
    "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
    "text_term_topk": SQL_TEXT_TERM_TOPK,
    "curate_documents": _sql_curate_documents(),
    "stream_stream_join": SQL_STREAM_STREAM_JOIN,
    # sketch_hll_users (round 5): the ERROR CONTRACT is hash-checked —
    # exact counts computed independently by DuckDB + an err-within-
    # budget flag; only the raw `_estimates` twin stays rows-only.
    "sketch_hll_users": SQL_SKETCH_HLL_CONTRACT,
}
