"""Round-3 additions: frequency sketch, perceptual image dedup,
sequence packing.

Three operator families a 100 TB training-data pipeline needs that the
reference (a record-at-a-time event pipeline, ``producer.py:1-173``,
``toy_lambda_function.py:1-81``) has no analogue for:

- ``sketch_cms_heavy_hitters`` — count-min frequency sketch: bounded-
  size mergeable counter grid; the shuffle carries O(sketch) rows, not
  O(data).
- ``mm_dhash_dedup`` — perceptual difference-hash dedup over REAL
  decoded pixels (in-repo BMP codec): groups resized copies of the same
  image that byte-level dedup can never see.
- ``curate_pack_sequences`` — token-budget sequence packing: the step
  that turns a curated document set into fixed-budget training
  sequences, expressed as a per-stratum cumulative-sum window so packs
  build in parallel per language instead of on one global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from event_streaming_toy_example_spark.schemas import load_table

# ------------------------------------------------- count-min sketch

_CMS_DEPTH = 4
_CMS_WIDTH = 1024


def q_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates vs exact counts, per user.

    Two passes over ``events``, each collapsing map-side: (1) build the
    ``depth x width`` sketch (shuffle bounded at ``depth * width`` rows
    regardless of input size — the sketch property); (2) exact per-key
    counts (the verification twin a real pipeline wouldn't pay for).
    Estimates join the BROADCAST sketch against the key set and take the
    per-key min across hash rows.  ``cms_est >= exact_cnt`` always
    (count-min never undercounts); equality whenever none of the key's
    ``depth`` buckets collides.  md5-derived buckets make the estimates
    engine-identical, so this row is value-hash-checked, not rows-only.
    """
    from event_streaming_toy_example_spark.functions.sketches import (
        cms_build,
        cms_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(exact, sketch, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    # null-safe join so a NULL key's estimate row survives, matching
    # the oracle's IS NOT DISTINCT FROM (no NULL user_ids in the
    # testdata, but the helper pair must agree on the semantics);
    # aliased because est derives from exact (self-join lineage)
    return (
        exact.alias("ex")
        .join(est.alias("es"), F.expr("ex.user_id <=> es.user_id"))
        .select(
            F.col("ex.user_id").alias("key"), "exact_cnt", "cms_est"
        )
    )


def _sql_sketch_cms_heavy_hitters() -> str:
    from event_streaming_toy_example_spark.functions.sketches import (
        sql_cms_estimates,
    )

    return sql_cms_estimates("events", "user_id", _CMS_DEPTH, _CMS_WIDTH)


_KMV_K = 64


def q_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketches + inclusion-exclusion set-operation
    estimate, all in exact integer arithmetic (value-hash-checked —
    the HLL twin can only ever be rows-only).

    Sets are per-type active user-days (``user_id:day``): purchases,
    errors, and their union; the fourth row estimates the overlap by
    inclusion-exclusion of the three sketch estimates next to the
    exact intersection.  At sf0.01: |P|=1604, |E|=1612, overlap 586 —
    real set structure, not a saturated domain."""
    from event_streaming_toy_example_spark.functions.sketches import (
        kmv_distinct,
    )

    from event_streaming_toy_example_spark.caching import track
    from event_streaming_toy_example_spark.functions.hashkeys import (
        null_safe_key,
    )

    ev = load_table(spark, sf_dir, "events")
    # null-safe user key: concat_ws would SKIP a NULL user_id while the
    # oracle's || nulls the expression — coalesce on both sides instead
    key = F.concat_ws(
        ":", null_safe_key(F.col("user_id")), F.dayofmonth("ts").cast("string")
    ).alias("k")

    def keys(pred):
        return ev.where(pred).select(key)

    p = keys(F.col("event_type") == "purchase")
    e = keys(F.col("event_type") == "error")
    u = keys(F.col("event_type").isin("purchase", "error"))
    # each single-row sketch feeds BOTH the per-set rows and the
    # inclusion-exclusion cross-join; persist so the distinct +
    # top-k + count lineage executes once per set, not twice
    kp = track(kmv_distinct(p, "k", _KMV_K).persist())
    ke = track(kmv_distinct(e, "k", _KMV_K).persist())
    ku = track(kmv_distinct(u, "k", _KMV_K).persist())
    rows = (
        kp.select(F.lit("purchase").alias("set_label"), "exact_distinct", "kmv_est")
        .unionByName(
            ke.select(F.lit("error").alias("set_label"), "exact_distinct", "kmv_est")
        )
        .unionByName(
            ku.select(F.lit("union").alias("set_label"), "exact_distinct", "kmv_est")
        )
    )
    exact_overlap = (
        p.distinct()
        .join(e.distinct(), "k")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    overlap = (
        exact_overlap.crossJoin(kp.select(F.col("kmv_est").alias("ep")))
        .crossJoin(ke.select(F.col("kmv_est").alias("ee")))
        .crossJoin(ku.select(F.col("kmv_est").alias("eu")))
        .select(
            F.lit("overlap").alias("set_label"),
            "exact_distinct",
            (F.col("ep") + F.col("ee") - F.col("eu")).alias("kmv_est"),
        )
    )
    return rows.unionByName(overlap)


def _sql_sketch_kmv_setops() -> str:
    from event_streaming_toy_example_spark.functions.sketches import (
        sql_kmv_distinct,
    )

    from event_streaming_toy_example_spark.functions.hashkeys import (
        sql_null_safe_key,
    )

    key = f"{sql_null_safe_key('user_id')} || ':' || day(ts)"
    p_rel = "(SELECT * FROM events WHERE event_type = 'purchase')"
    e_rel = "(SELECT * FROM events WHERE event_type = 'error')"
    u_rel = "(SELECT * FROM events WHERE event_type IN ('purchase', 'error'))"
    kp = sql_kmv_distinct(p_rel, key, _KMV_K)
    ke = sql_kmv_distinct(e_rel, key, _KMV_K)
    ku = sql_kmv_distinct(u_rel, key, _KMV_K)
    return f"""
WITH kp AS {kp}, ke AS {ke}, ku AS {ku},
ov AS (
  SELECT count(*) AS exact_distinct FROM
    (SELECT DISTINCT {key} AS k FROM events WHERE event_type = 'purchase') a
    JOIN
    (SELECT DISTINCT {key} AS k FROM events WHERE event_type = 'error') b
    USING (k)
)
SELECT 'purchase' AS set_label, exact_distinct, kmv_est FROM kp
UNION ALL
SELECT 'error' AS set_label, exact_distinct, kmv_est FROM ke
UNION ALL
SELECT 'union' AS set_label, exact_distinct, kmv_est FROM ku
UNION ALL
SELECT 'overlap' AS set_label, ov.exact_distinct,
       kp.kmv_est + ke.kmv_est - ku.kmv_est AS kmv_est
FROM ov, kp, ke, ku
"""


# --------------------------------------------- perceptual image dedup


def q_mm_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup image groups via dHash over REAL decode.

    Pipeline: attach a real BMP per doc (an upscaled copy of one of 7
    seed tiles — see ``attach_scaled_tile_bmp``), decode + dHash in one
    Arrow-batched ``mapInPandas`` pass, then ONE hash aggregate on the
    64-bit hash.  Docs of the same class carry different pixel
    dimensions (12 scale variants) yet identical dHash, so the groups
    the engine finds are exactly the arithmetic classes the SQL oracle
    computes from ``doc_id % 7`` — the real pixel path is value-checked
    without the oracle decoding anything.

    Scale: the only exchange is the tiny per-hash aggregate
    (O(distinct images)); decode work is embarrassingly parallel.
    Hamming-tolerant grouping would reuse the block-permutation
    equi-join of ``simhash_near_dup_pairs`` on the hash bits."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_scaled_tile_bmp,
        image_dhash,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = image_dhash(attach_scaled_tile_bmp(docs))
    return (
        feats.groupBy("dhash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("width", "height").alias("n_scales"),
        )
        .select("rep_doc_id", "n_docs", "n_scales")
    )


SQL_MM_DHASH_DEDUP = """
SELECT min(doc_id) AS rep_doc_id,
       count(*) AS n_docs,
       count(DISTINCT (doc_id % 4) * 3 + (doc_id % 3)) AS n_scales
FROM documents
GROUP BY doc_id % 7
"""


def q_mm_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third REAL image decode format (GIF87a, in-repo codec with a
    full LZW decoder): same arithmetic-dims oracle construction as the
    PNG and BMP entries, a third moduli pair so a codec mix-up fails
    the hash check."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_gif_payload,
        extract_media_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_gif_payload(docs), fake=False)
    return feats.select("doc_id", "width", "height")


SQL_MM_GIF_DECODE = """
SELECT doc_id,
       CAST(10 + doc_id % 30 AS INT) AS width,
       CAST(5 + doc_id % 15 AS INT) AS height
FROM documents
"""


def q_mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth REAL image decode format (baseline JFIF JPEG, in-repo
    codec: marker parse, Huffman entropy decode, dequantize + IDCT,
    YCbCr->RGB): same arithmetic-dims oracle construction as the
    PNG/BMP/GIF entries, a fourth moduli pair so a codec mix-up fails
    the hash check.  JPEG is lossy, so the oracle binds the decoded
    dimensions (exact by construction); pixel-error bounds live in
    ``tests/test_jpeg_codec.py``."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_jpeg_payload,
        extract_media_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_jpeg_payload(docs), fake=False)
    return feats.select("doc_id", "width", "height")


SQL_MM_JPEG_DECODE = """
SELECT doc_id,
       CAST(14 + doc_id % 34 AS INT) AS width,
       CAST(7 + doc_id % 17 AS INT) AS height
FROM documents
"""


def q_mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame sampling: per-doc animated GIF (1 + id % 4
    frames, each its own dims) -> full per-frame LZW decode -> one row
    per frame with dims + exact integer mean pixel.  Upgrades the
    byte-slice frame-sampling plumbing (``mm_frame_sample``) to a real
    video-like codec path; the oracle reconstructs every frame's
    features arithmetically from (id, frame)."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_gif_anim_payload,
        extract_gif_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_gif_frames(attach_gif_anim_payload(docs))


SQL_MM_GIF_FRAMES = """
WITH fr AS (
  SELECT doc_id, f,
         CAST(1 + doc_id % 4 AS INT) AS n_frames,
         CAST(5 + (doc_id + 2 * f) % 6 AS INT) AS width,
         CAST(4 + (doc_id + f) % 5 AS INT) AS height
  FROM documents, unnest(generate_series(0, doc_id % 4)) AS t(f)
), px AS (
  SELECT doc_id, f, n_frames, width, height,
         CAST(sum((doc_id + 17 * f + i) % 241) // (width * height)
              AS BIGINT) AS mean_px
  FROM fr, unnest(generate_series(0, width * height - 1)) AS u(i)
  GROUP BY 1, 2, 3, 4, 5
)
SELECT doc_id, CAST(f AS INT) AS frame_idx, n_frames, width, height,
       mean_px
FROM px
"""


# --------------------------------------------- bloom-filter join prune

_BLOOM_M = 65536  # sized for ~14k dim keys at sf0.1 (~10% FP); a few
_BLOOM_K = 3      # hundred KB broadcast even fully saturated


def q_join_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact-dim join: the explicit runtime-filter pattern.

    A selective order set (urgent + late-window) is condensed to a
    broadcast bloom bit-set; lineitem rows that miss any of the k
    probe positions are dropped IN THE SCAN STAGE, before any exchange;
    the exact broadcast join then runs over survivors only.  The output
    exposes the bloom's own survivor count next to the exact join
    count, so the driver hash checks the filter itself (a false
    negative OR a false-positive-rate drift both flip the row), not
    just the bloom-transparent final answer.  Revenue is summed in
    integer cents (row-level double math is engine-identical; summation
    order is not)."""
    from event_streaming_toy_example_spark.operators.bloomjoin import (
        bloom_build,
        bloom_prune,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = orders.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1998-06-01").cast("timestamp"))
    ).select("o_orderkey")
    bloom = bloom_build(dim, "o_orderkey", _BLOOM_M, _BLOOM_K)
    pruned = bloom_prune(
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        bloom,
        "l_orderkey",
        _BLOOM_M,
        _BLOOM_K,
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    flagged = pruned.join(
        F.broadcast(dim), pruned["l_orderkey"] == dim["o_orderkey"], "left"
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_bloom_passed"),
        F.count("o_orderkey").alias("n_joined"),
        F.sum(
            F.when(F.col("o_orderkey").isNotNull(), cents)
        ).alias("revenue_cc"),
    )


def _sql_join_bloom_pruned_revenue() -> str:
    from event_streaming_toy_example_spark.operators.bloomjoin import (
        sql_bloom_positions,
    )

    dim_pos = sql_bloom_positions("o_orderkey", _BLOOM_M, _BLOOM_K)
    fact_pos = sql_bloom_positions("l_orderkey", _BLOOM_M, _BLOOM_K)
    union = "\n  UNION ALL ".join(
        f"SELECT {p} AS p FROM dim" for p in dim_pos
    )
    membership = " AND ".join(
        f"{p} IN (SELECT p FROM bits)" for p in fact_pos
    )
    return f"""
WITH dim AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1998-06-01'
), bits AS (
  SELECT DISTINCT p FROM ({union})
), pruned AS (
  SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
  WHERE {membership}
)
SELECT CAST(count(*) AS BIGINT) AS n_bloom_passed,
       CAST(count(d.o_orderkey) AS BIGINT) AS n_joined,
       CAST(sum(CASE WHEN d.o_orderkey IS NOT NULL THEN
             CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           END) AS BIGINT) AS revenue_cc
FROM pruned LEFT JOIN dim d ON pruned.l_orderkey = d.o_orderkey
"""


# --------------------------------------------------- sequence packing

#: token budget per training sequence (toy-sized so sf0.01 yields
#: multiple packs per language)
_PACK_BUDGET = 2048


def q_curate_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign documents to fixed-budget
    training packs, contiguously in ``doc_id`` order within each
    language stratum.

    A doc joins the pack its cumulative start offset falls in
    (``pack_id = floor((cumsum - n_tokens) / budget)``) — the
    deterministic streaming form of greedy packing.  Token counts use
    the ~4-chars-per-token heuristic on ``n_chars`` (integer, portable);
    a production pipeline swaps in its tokenizer's counts and the
    packing plan is unchanged.

    Scale: the window partitions by ``lang``, so each stratum's
    cumulative sum runs independently — no global sort, no single-
    partition bottleneck.  A skewed stratum subdivides the same way
    (window over ``(lang, shard)``), trading pack-boundary slack for
    parallelism."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.ceil(F.col("n_chars") / 4).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    packed = toks.withColumn(
        "pack_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET
        ).cast("long"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


SQL_CURATE_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id, lang, CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                     - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
  FROM toks
)
SELECT lang, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc
FROM packed GROUP BY lang, pack_id
"""


EXT8_QUERIES = {
    "sketch_cms_heavy_hitters": q_sketch_cms_heavy_hitters,
    "mm_dhash_dedup": q_mm_dhash_dedup,
    "mm_gif_decode": q_mm_gif_decode,
    "mm_jpeg_decode": q_mm_jpeg_decode,
    "mm_gif_frames": q_mm_gif_frames,
    "join_bloom_pruned_revenue": q_join_bloom_pruned_revenue,
    "sketch_kmv_setops": q_sketch_kmv_setops,
    "curate_pack_sequences": q_curate_pack_sequences,
}

EXT8_ORACLES = {
    "sketch_cms_heavy_hitters": _sql_sketch_cms_heavy_hitters(),
    "mm_dhash_dedup": SQL_MM_DHASH_DEDUP,
    "mm_gif_decode": SQL_MM_GIF_DECODE,
    "mm_jpeg_decode": SQL_MM_JPEG_DECODE,
    "mm_gif_frames": SQL_MM_GIF_FRAMES,
    "join_bloom_pruned_revenue": _sql_join_bloom_pruned_revenue(),
    "sketch_kmv_setops": _sql_sketch_kmv_setops(),
    "curate_pack_sequences": SQL_CURATE_PACK_SEQUENCES,
}
