"""Oracle-checked query catalog — round-2 families.

Driver-checked (PRIMARY): the curation operators
(:mod:`..functions.curation`) — ``curate_sample_scrub`` (hash-gated
sampling ∘ PII scrub), ``curate_decontaminate`` (broadcast-benchmark
shingle overlap), ``curate_mixture_weights`` (temperature-scaled
weights quantized to exact integers so the cross-engine value hash is
bit-stable — the float-rounding lesson of
``queries_ext2.q_orders_above_cust_avg``) — and ``dedup_incremental``
(snapshot-over-snapshot fingerprint dedup).

EXTENDED surface twins (locally oracle-replayed; see
``plans/catalog.py``): ``curate_stratified_sample``,
``text_repetition``, ``mm_wav_decode`` (real in-repo WAV decode),
``scd2_event_type`` (validity-interval dimension history),
``sql_udf_text_stats`` / ``udtf_word_stats`` (function-registration
surfaces), ``curate_strip_boilerplate`` (URL/HTML stripping).

Same conventions as ``queries.py``: identical aliases both sides,
deterministic output, no floats that re-enter IEEE rounding after an
engine-specific summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.functions.curation import (
    decontaminate,
    hash_gate,
    scrub_pii,
    sql_hash_gate,
    sql_scrub_pii,
)
from event_streaming_toy_example_spark.plans.queries_ext import (
    _sql_shingles,
    _sql_tokens,
)
from event_streaming_toy_example_spark.schemas import load_table

# --------------------------------------------------------------------------
# Deterministic sample + PII scrub
# --------------------------------------------------------------------------

def q_curate_sample_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated 40% sample of documents, then PII-scrubbed.

    The sample gate is ``md5(salt:key)``-prefix comparison — a pure
    filter that pushes to the scan, drawing the SAME rows on any
    engine, any partitioning, any rerun (unlike ``df.sample``, whose
    per-partition RNG is not stable under repartitioning/retries).
    Scrubbing is codegen'd ``regexp_replace``; the injected suffix
    guarantees each kept doc carries one email + one SSN + one phone,
    so ``n_redactions`` actually exercises every pattern.
    """
    docs = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ssn 123-45-6789 tel +1 555-123-4567"),
    )
    sampled = docs.where(hash_gate(F.col("doc_id"), 0.4)).withColumn(
        "pii_text", pii_text
    )
    clean, n_red = scrub_pii(F.col("pii_text"))
    return sampled.select(
        "doc_id",
        clean.alias("clean_text"),
        n_red.alias("n_redactions"),
    )


def _sql_curate_sample_scrub() -> str:
    pii_expr = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com ssn 123-45-6789 tel +1 555-123-4567'"
    )
    clean, n_red = sql_scrub_pii(pii_expr)
    return f"""
SELECT doc_id,
       {clean} AS clean_text,
       {n_red} AS n_redactions
FROM documents
WHERE {sql_hash_gate('doc_id', 0.4)}
"""


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

_BENCH_RATE = 0.05
_BENCH_SALT = "bench"
_DECON_K = 3


def q_curate_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination report: corpus docs sharing >=1 k-token shingle
    with a (hash-gated 5%) benchmark split, with the shared count.

    Plan shape for 100 TB: the benchmark shingle set is tiny and
    broadcast; corpus rows never shuffle — the only exchange is the
    per-doc count aggregate. The benchmark/corpus split is the same
    deterministic hash gate as ``curate_sample_scrub``, so the query is
    self-contained on the shared documents table.
    """
    docs = load_table(spark, sf_dir, "documents")
    gate = hash_gate(F.col("doc_id"), _BENCH_RATE, _BENCH_SALT)
    benchmark = docs.where(gate)
    corpus = docs.where(~gate)
    return (
        decontaminate(corpus, benchmark, "doc_id", "text", _DECON_K)
        
    )


def _sql_curate_decontaminate() -> str:
    gate = sql_hash_gate("doc_id", _BENCH_RATE, _BENCH_SALT)
    toks = _sql_tokens("text")
    shingles = _sql_shingles("toks", _DECON_K)
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks, {gate} AS is_bench FROM documents
),
sh AS (
  SELECT doc_id, is_bench, unnest({shingles}) AS shingle
  FROM (SELECT doc_id, is_bench, toks FROM t)
),
bench_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE is_bench
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shared_shingles
FROM sh s JOIN bench_sh b USING (shingle)
WHERE NOT s.is_bench
GROUP BY s.doc_id
"""


# --------------------------------------------------------------------------
# Mixture weights (exact-integer quantization)
# --------------------------------------------------------------------------


def q_curate_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) language mixture weights in exact
    parts-per-billion.

    Exactness across engines: ``sqrt`` is IEEE-correctly-rounded in
    both Spark and DuckDB, and quantizing each group's powered count to
    an integer BEFORE the global sum makes the normalizer an exact
    integer sum (order-independent), so ``weight_ppb`` is integer
    arithmetic end to end — no summation-order ulp drift can flip the
    driver's value hash (the failure mode of round-1's
    ``orders_above_cust_avg``).
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    powered = counts.withColumn(
        "n_pow_u", F.floor(F.sqrt(F.col("n_docs")) * F.lit(1000000.0)).cast("long")
    )
    total = powered.agg(F.sum("n_pow_u").alias("z"))
    return (
        powered.crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr("n_pow_u * 1000000000L div z").alias("weight_ppb"),
        )
    )


SQL_CURATE_MIXTURE_WEIGHTS = """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
p AS (
  SELECT lang, n_docs,
         CAST(floor(sqrt(n_docs) * 1000000.0) AS BIGINT) AS n_pow_u
  FROM c
)
SELECT lang, n_docs,
       CAST((n_pow_u * 1000000000) // (SELECT sum(n_pow_u) FROM p) AS BIGINT)
           AS weight_ppb
FROM p
"""


# --------------------------------------------------------------------------
# Incremental (snapshot-over-snapshot) dedup
# --------------------------------------------------------------------------


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-snapshot docs that survive (a) intra-snapshot exact dedup
    (min doc_id per content fingerprint — subsuming the
    ``dedup_exact_docs`` grouping) and (b) subtraction of every
    fingerprint already in the prior corpus (here: the even-doc_id
    half), via a left_anti join keyed on the fingerprint. The prior
    corpus is never rescanned beyond its fingerprint column — the
    incremental-crawl dedup shape."""
    from event_streaming_toy_example_spark.functions.text import fingerprint_md5
    from event_streaming_toy_example_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    snapshot = docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fingerprint"))
    prior = snapshot.where(F.col("doc_id") % 2 == 0).select("fingerprint")
    return incremental_dedup(snapshot, prior)


SQL_DEDUP_INCREMENTAL = r"""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                 '\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
survivors AS (
  SELECT fingerprint, min(doc_id) AS doc_id FROM fp GROUP BY fingerprint
),
prior AS (
  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0
)
SELECT s.doc_id, s.fingerprint
FROM survivors s ANTI JOIN prior p USING (fingerprint)
"""


# --------------------------------------------------------------------------
# Real audio decode (in-repo WAV codec)
# --------------------------------------------------------------------------


def q_mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end to end: per-doc PCM16 WAV payloads (in-repo
    RIFF codec, samples a pure integer function of the id) -> Arrow
    `mapInPandas` decode -> header fields + exact integer mean absolute
    amplitude. The oracle reproduces every feature arithmetically from
    the id — so a wrong byte anywhere in encode OR decode flips the
    driver's value hash (the audio twin of ``mm_png_decode``)."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_wav_payload,
        extract_audio_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_audio_features(attach_wav_payload(docs))


SQL_MM_WAV_DECODE = """
WITH base AS (
  SELECT doc_id, 256 + doc_id % 1024 AS n FROM documents
),
s AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM base
),
m AS (
  SELECT doc_id,
         CAST(sum(abs((i * (doc_id + 3)) % 65536 - 32768)) // count(*)
              AS BIGINT) AS mean_abs
  FROM s GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(44 + 2 * b.n AS BIGINT) AS n_bytes,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(b.n AS BIGINT) AS n_samples,
       CAST(b.n * 1000 // 8000 AS BIGINT) AS duration_ms,
       m.mean_abs
FROM base b JOIN m USING (doc_id)
"""


# --------------------------------------------------------------------------
# Repetition-ratio quality signal
# --------------------------------------------------------------------------


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: the fraction of k-token shingle
    positions whose shingle already occurred earlier in the document —
    the classic duplicate-n-gram quality filter for training corpora.
    Emitted in exact parts-per-thousand (integer arithmetic) from two
    row-local counts: total shingle positions vs distinct shingles
    (``shingle_array``). Zero exchanges, zero Python."""
    from event_streaming_toy_example_spark.functions.minhash import shingle_array
    from event_streaming_toy_example_spark.functions.text import (
        normalize_text,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(normalize_text(F.col("text"))))
    total = F.greatest(n_toks - 2, F.lit(1))
    distinct = F.size(shingle_array(F.col("text"), 3))
    return docs.select(
        "doc_id",
        total.cast("long").alias("n_shingles"),
        distinct.cast("long").alias("n_distinct"),
    ).select(
        "doc_id",
        "n_shingles",
        "n_distinct",
        # integer floor division on both sides (Spark `div`, DuckDB
        # `//`): a double division + cast would round differently
        # across engines
        F.expr("(1000 * (n_shingles - n_distinct)) div n_shingles").alias(
            "rep_milli"
        ),
    )


SQL_TEXT_REPETITION = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                 '\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
         greatest(len(toks) - 2, 1) AS n_shingles,
         len(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 2, 1)),
             i -> array_to_string(toks[i:i+2], ' ')))) AS n_distinct
  FROM t
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST((1000 * (n_shingles - n_distinct)) // n_shingles AS BIGINT)
           AS rep_milli
FROM c
"""


# --------------------------------------------------------------------------
# SCD2 dimension history
# --------------------------------------------------------------------------


def q_scd2_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history of each user's
    event_type: change detection (consecutive duplicates open no new
    version) + validity intervals, via ``operators/upsert.scd2_history``
    — one key-partitioned shuffle for both window passes."""
    from event_streaming_toy_example_spark.operators.upsert import scd2_history

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_history(
        ev, keys=["user_id"], ts_col="ts", attr_cols=["event_type"],
        tie_col="event_id",
    )
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


SQL_SCD2_EVENT_TYPE = """
WITH v AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_et
  FROM events
),
keep AS (
  SELECT user_id, event_type, ts, event_id FROM v
  WHERE prev_et IS NULL OR event_type IS DISTINCT FROM prev_et
)
SELECT user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(epoch_us(lead(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
           AS valid_to_us,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
           AS is_current
FROM keep
"""


# --------------------------------------------------------------------------
# Function-registration surface (SQL UDFs + Python UDTF)
# --------------------------------------------------------------------------


def q_sql_udf_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text stats through REGISTERED SQL UDFs (``functions/registry``):
    the UDF bodies inline into the plan at analysis time, so this runs
    as pure codegen'd expressions — registration surface with zero
    Python and zero plan cost."""
    import uuid as _uuid

    from event_streaming_toy_example_spark.functions.registry import (
        register_sql_udfs,
    )

    register_sql_udfs(spark)
    view = f"docs_{_uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT doc_id,
               eng_token_count(text) AS ws_tokens,
               CAST(length(eng_norm(text)) AS BIGINT) AS norm_chars
        FROM {view}
    """)


def _sql_sql_udf_text_stats() -> str:
    from event_streaming_toy_example_spark.plans.queries_ext import SQL_NORM

    norm = SQL_NORM.format(c="text")
    return f"""
SELECT doc_id,
       CAST(len(list_filter(string_split({norm}, ' '), x -> x <> ''))
            AS BIGINT) AS ws_tokens,
       CAST(length({norm}) AS BIGINT) AS norm_chars
FROM documents
"""


def q_udtf_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc word stats through a REGISTERED Python UDTF consumed via
    LATERAL — the table-function registration surface. Row-at-a-time
    Python: deliberately kept off the bench headline (the codegen'd
    equivalent is an ``explode``; see ``registry`` module docstring),
    exactly like the ``zscore_grouped_map`` precedent."""
    import uuid as _uuid

    from event_streaming_toy_example_spark.functions.registry import (
        register_sql_udfs,
        register_word_udtf,
    )

    register_sql_udfs(spark)
    fn = register_word_udtf(spark)
    view = f"docs_{_uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    # a SQL UDF cannot appear inside a Generate (LATERAL) argument —
    # project it first, then explode the projected column
    return spark.sql(f"""
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(w.word_len) AS BIGINT) AS sum_word_len
        FROM (SELECT doc_id, eng_norm(text) AS norm FROM {view}) d,
             LATERAL {fn}(d.norm) w
        GROUP BY d.doc_id
    """)


def _sql_udtf_word_stats() -> str:
    from event_streaming_toy_example_spark.plans.queries_ext import SQL_NORM

    norm = SQL_NORM.format(c="text")
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split({norm}, ' '), x -> x <> '')) AS word
  FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(word)) AS BIGINT) AS sum_word_len
FROM w
GROUP BY doc_id
"""


def q_curate_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sampling (flattened mixture: common
    languages downsampled, rare kept) — still a pure filter, stable
    under repartitioning and corpus growth."""
    from event_streaming_toy_example_spark.functions.curation import (
        stratified_hash_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(
        docs, "doc_id", "lang", _STRATA_RATES, default_rate=0.1
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )


_STRATA_RATES = {"en": 0.25, "de": 0.75, "es": 0.5}


def _sql_curate_stratified_sample() -> str:
    from event_streaming_toy_example_spark.functions.curation import (
        sql_stratified_gate,
    )

    gate = sql_stratified_gate("doc_id", "lang", _STRATA_RATES, default_rate=0.1)
    return f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
FROM documents
WHERE {gate}
GROUP BY lang
"""


def q_curate_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/HTML boilerplate stripping over a deterministically
    "webified" corpus (a URL and a tag injected per doc, keyed on the
    id, so both engines strip real spans) — the structural twin of
    ``curate_sample_scrub``; zero exchanges."""
    from event_streaming_toy_example_spark.functions.curation import (
        strip_boilerplate,
    )

    docs = load_table(spark, sf_dir, "documents")
    webified = docs.withColumn(
        "web_text",
        F.concat(
            F.lit("<p class=x>"),
            F.col("text"),
            F.lit("</p> see https://example.org/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    stripped, n = strip_boilerplate(F.col("web_text"))
    return webified.select(
        "doc_id",
        stripped.alias("clean_text"),
        n.alias("n_removed"),
    )


def _sql_curate_strip_boilerplate() -> str:
    from event_streaming_toy_example_spark.functions.curation import (
        sql_strip_boilerplate,
    )

    web = ("'<p class=x>' || text || '</p> see https://example.org/doc/' || "
           "CAST(doc_id AS VARCHAR)")
    stripped, n = sql_strip_boilerplate(web)
    return f"""
SELECT doc_id,
       {stripped} AS clean_text,
       {n} AS n_removed
FROM documents
"""


EXT7_QUERIES = {
    "curate_sample_scrub": q_curate_sample_scrub,
    "curate_decontaminate": q_curate_decontaminate,
    "curate_mixture_weights": q_curate_mixture_weights,
    "dedup_incremental": q_dedup_incremental,
    "mm_wav_decode": q_mm_wav_decode,
    "text_repetition": q_text_repetition,
    "scd2_event_type": q_scd2_event_type,
    "sql_udf_text_stats": q_sql_udf_text_stats,
    "udtf_word_stats": q_udtf_word_stats,
    "curate_stratified_sample": q_curate_stratified_sample,
    "curate_strip_boilerplate": q_curate_strip_boilerplate,
}

EXT7_ORACLES = {
    "curate_sample_scrub": _sql_curate_sample_scrub(),
    "curate_decontaminate": _sql_curate_decontaminate(),
    "curate_mixture_weights": SQL_CURATE_MIXTURE_WEIGHTS,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "mm_wav_decode": SQL_MM_WAV_DECODE,
    "text_repetition": SQL_TEXT_REPETITION,
    "scd2_event_type": SQL_SCD2_EVENT_TYPE,
    "sql_udf_text_stats": _sql_sql_udf_text_stats(),
    "udtf_word_stats": _sql_udtf_word_stats(),
    "curate_stratified_sample": _sql_curate_stratified_sample(),
    "curate_strip_boilerplate": _sql_curate_strip_boilerplate(),
}
