r"""Oracle-checked query catalog — extensions: text analysis, dedup
family, similarity search, multimodal, streaming.

The SQL twins for shingling / MinHash / LSH are *generated* from the
same parameters as the Spark implementation, so the two sides cannot
drift: the oracle computes bit-identical MinHash signatures (the
md5-hex-min construction is engine-neutral) and the full LSH pipeline
is value-hash-checked, not just row-counted.

Streaming entries run a real Structured Streaming query (availableNow
over a file source into a memory sink) and return the sink table — the
oracle checks the *result*, proving streaming semantics == batch SQL.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.caching import track
from event_streaming_toy_example_spark.functions.minhash import (
    jaccard_similarity,
    minhash_lsh_candidates,
    simhash_near_dup_pairs,
    token_shingles,
)
from event_streaming_toy_example_spark.functions.multimodal import (
    attach_binary_payload,
    extract_media_features,
    sample_frames_stub,
)
from event_streaming_toy_example_spark.functions.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
    topk_recall_contract,
)
from event_streaming_toy_example_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint_md5,
    predict_language,
    quality_features,
    token_count,
    tokens,
)
from event_streaming_toy_example_spark.streaming.tuning import (
    stream_tuning,
)
from event_streaming_toy_example_spark.schemas import (
    EVENTS_TABLE_SCHEMA,
    load_table,
)

# --------------------------------------------------------------------------
# Shared SQL fragments (kept in lockstep with functions/text.py + minhash.py)
# --------------------------------------------------------------------------

SQL_NORM = (
    r"trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9\s]', '', 'g'),"
    r" '\s+', ' ', 'g'))"
)
SQL_TOKS = "list_filter(string_split({norm}, ' '), x -> x <> '')"


def _sql_tokens(col: str) -> str:
    return SQL_TOKS.format(norm=SQL_NORM.format(c=col))


def _sql_shingles(toks_expr: str, k: int = 3) -> str:
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks_expr}) - {k - 1}, 1)), "
        f"i -> array_to_string(({toks_expr})[i:i+{k - 1}], ' ')))"
    )


def _sql_minhash_sig_elems(num_hashes: int) -> list[str]:
    return [
        f"list_min(list_transform(sh, s -> md5('{i}:' || s)))"
        for i in range(num_hashes)
    ]


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


SQL_TEXT_TOKEN_STATS = r"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id",
        "q_n_chars",
        "q_n_tokens",
        "q_avg_token_len",
        "q_punct_ratio",
        "q_alpha_ratio",
        "q_stopword_hits",
        "q_score",
    )


_STOP_ARRAY = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

SQL_TEXT_QUALITY = rf"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS punct,
         length(text) - length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha
  FROM documents
), feat AS (
  SELECT doc_id, n_chars, len(toks) AS n_tokens, punct, alpha,
         len(list_intersect(toks, {_STOP_ARRAY})) AS stop_hits,
         CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END AS alpha_ratio,
         CASE WHEN len(toks) > 0
              THEN (n_chars - (len(toks) - 1)) / len(toks) ELSE 0.0 END AS avg_token_len
  FROM base
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS q_n_chars,
       CAST(n_tokens AS BIGINT) AS q_n_tokens,
       round(avg_token_len, 4) AS q_avg_token_len,
       round(punct_ratio, 4) AS q_punct_ratio,
       round(alpha_ratio, 4) AS q_alpha_ratio,
       CAST(stop_hits AS BIGINT) AS q_stopword_hits,
       round(0.25 * (CASE WHEN n_chars BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END)
           + 0.25 * (CASE WHEN avg_token_len BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)
           + 0.25 * (1.0 - punct_ratio)
           + 0.25 * (CASE WHEN stop_hits > 0 THEN 1.0 ELSE 0.0 END), 4) AS q_score
FROM feat
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return predict_language(docs).select("doc_id", "lang", "predicted_lang")


def _sql_text_langid() -> str:
    score_cols = ",\n         ".join(
        "len(list_intersect(toks, ["
        + ", ".join(f"'{m}'" for m in marks)
        + f"])) AS score_{lang}"
        for lang, marks in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    cascade = "CASE\n"
    for lang in langs:
        cascade += f"  WHEN score_{lang} = g AND g > 0 THEN '{lang}'\n"
    cascade += "  ELSE 'und' END"
    toks = f"list_distinct({_sql_tokens('text')})"
    # NB: Spark tokenizes lower(text) but normalize strips punctuation; the
    # Spark langid uses plain lower+split (no punctuation strip). Keep the
    # SQL in lockstep with predict_language: lower + whitespace split.
    return rf"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '')) AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang,
         {score_cols}
  FROM t
), g AS (
  SELECT *, {greatest} AS g FROM s
)
SELECT doc_id, lang, {cascade} AS predicted_lang FROM g
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fingerprint_md5(F.col("text")).alias("fingerprint")
    )


SQL_TEXT_FINGERPRINT = (
    "SELECT doc_id, md5(" + SQL_NORM.format(c="text") + ") AS fingerprint FROM documents"
)


# --------------------------------------------------------------------------
# Dedup family (documents)
# --------------------------------------------------------------------------


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.unionAll(docs.where(F.col("doc_id") % 10 == 0))


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup over a dup-injected corpus: group by content,
    keep the smallest doc_id as survivor."""
    dup = _docs_with_dups(spark, sf_dir)
    return (
        dup.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


SQL_DEDUP_EXACT_DOCS = """
WITH dup AS (
  SELECT * FROM documents
  UNION ALL SELECT * FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS content_hash,
       min(doc_id) AS survivor_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM dup GROUP BY 1
"""

_MH_K = 3
_MH_HASHES = 8
_MH_BANDS = 4
_MH_THRESHOLD = 0.4


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pipeline, fully hash-checked: candidates
    from banded signatures, verified with exact shingle Jaccard."""
    from event_streaming_toy_example_spark.functions.minhash import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    # one shingle explode feeds BOTH the signature pipeline and the
    # exact-Jaccard verification (distinct is idempotent on the already-
    # distinct rows, so sharing the distinct table is safe for both).
    sh = track(shingle_rows(docs, "doc_id", "text", _MH_K, distinct=True).persist())
    cand = minhash_lsh_candidates(
        docs, k=_MH_K, num_hashes=_MH_HASHES, num_bands=_MH_BANDS, shingles=sh
    )
    # exact-Jaccard verification of candidates via the inverted-index
    # form: candidates are few, so broadcast them into the shingle scan
    # (zero-overlap candidates cannot pass the threshold, so counting
    # only co-occurring shingles is exact). The candidate x left-shingle
    # product and the per-doc size table are both tiny relative to the
    # corpus shingle table — broadcast them so the only large-side scan
    # (b) never shuffles.
    sizes = track(sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz")).persist())
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        F.broadcast(F.broadcast(cand).join(a, "id_a"))
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = F.broadcast(
        sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    )
    sz_b = F.broadcast(
        sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    )
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= _MH_THRESHOLD)
    )


def _sql_dedup_minhash_lsh() -> str:
    rows_per_band = _MH_HASHES // _MH_BANDS
    sig_elems = _sql_minhash_sig_elems(_MH_HASHES)
    sig_cols = ",\n         ".join(
        f"{e} AS sig_{i}" for i, e in enumerate(sig_elems)
    )
    band_selects = []
    for b in range(_MH_BANDS):
        parts = [f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = " || '|' || ".join(parts)
        band_selects.append(
            f"SELECT id, {b} AS band_idx, {key} AS band_key FROM sig"
        )
    bands = "\n  UNION ALL ".join(band_selects)
    toks = _sql_tokens("text")
    shingles = _sql_shingles("toks", _MH_K)
    return rf"""
WITH t AS (
  SELECT doc_id AS id, {toks} AS toks FROM documents
), s AS (
  SELECT id, {shingles} AS sh FROM t
), sig AS (
  SELECT id, sh,
         {sig_cols}
  FROM s
), bands AS (
  {bands}
), cand AS (
  SELECT l.id AS id_a, r.id AS id_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.id < r.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(len(list_intersect(a.sh, b.sh)) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
FROM cand
JOIN s a ON a.id = cand.id_a
JOIN s b ON b.id = cand.id_b
WHERE round(len(list_intersect(a.sh, b.sh)) /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= {_MH_THRESHOLD}
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs, blocked by (lang, source)."""
    docs = load_table(spark, sf_dir, "documents")
    from event_streaming_toy_example_spark.functions.minhash import (
        ngram_jaccard_pairs,
    )

    return ngram_jaccard_pairs(
        docs, block_cols=["lang", "source"], k=3, threshold=0.2
    )


SQL_DEDUP_NGRAM_JACCARD = rf"""
WITH t AS (
  SELECT doc_id AS id, lang, source, {_sql_tokens('text')} AS toks FROM documents
), s AS (
  SELECT id, lang, source, {_sql_shingles('toks', 3)} AS sh FROM t
)
SELECT l.id AS id_a, r.id AS id_b, l.lang, l.source,
       round(len(list_intersect(l.sh, r.sh)) /
             (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))), 6) AS jaccard
FROM s l JOIN s r
  ON l.lang = r.lang AND l.source = r.source AND l.id < r.id
WHERE round(len(list_intersect(l.sh, r.sh)) /
      (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))), 6) >= 0.2
"""


_SH_BITS = 48
_SH_BLOCKS = 4
_SH_MAXHAM = 12


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (portable md5-bit construction — the
    oracle computes bit-identical signatures, blocks, and Hamming
    distances)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(
        docs, max_hamming=_SH_MAXHAM, num_blocks=_SH_BLOCKS, bits=_SH_BITS
    )


def _sql_dedup_simhash() -> str:
    bits, nblocks, width = _SH_BITS, _SH_BLOCKS, _SH_BITS // _SH_BLOCKS
    toks = _sql_tokens("text")
    shingles = _sql_shingles("toks", _MH_K)
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    sig_sum = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(bits)
    )
    mask = (1 << width) - 1
    block_selects = "\n  UNION ALL ".join(
        f"SELECT id, sig, {i} AS block_idx, (sig >> {i * width}) & {mask} AS block_val FROM sig"
        for i in range(nblocks)
    )
    return rf"""
WITH t AS (
  SELECT doc_id AS id, {toks} AS toks FROM documents
), sh AS (
  SELECT id, unnest({shingles}) AS shingle FROM t
), h AS (
  SELECT id, ('0x' || substr(md5(shingle), 1, {bits // 4}))::BIGINT AS h FROM sh
), v AS (
  SELECT id,
         {votes}
  FROM h GROUP BY id
), sig AS (
  SELECT id, {sig_sum} AS sig FROM v
), blocks AS (
  {block_selects}
), pairs AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.sig AS sig_a, r.sig AS sig_b
  FROM blocks l JOIN blocks r
    ON l.block_idx = r.block_idx AND l.block_val = r.block_val AND l.id < r.id
)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= {_SH_MAXHAM}
"""


# --------------------------------------------------------------------------
# Similarity search (embeddings)
# --------------------------------------------------------------------------

_SIM_COSINE_SQL = (
    "round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6)"
)


def q_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5)
    return brute_force_topk(embs, queries, k=5)


SQL_SIM_TOPK_BRUTEFORCE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_SIM_COSINE_SQL} AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 5
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= 5
"""


def q_sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold 0.35: the synthetic embeddings top out near cosine 0.47
    within a label block, so higher thresholds make the answer vacuously
    empty (0.35 keeps ~14 pairs at sf0.001 / ~26 at sf0.01 — the
    thresholding logic is actually exercised)."""
    embs = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(embs, block_col="label", threshold=0.35)


SQL_SIM_EMBEDDING_NEAR_DUP = f"""
SELECT q.vec_id AS id_a, c.vec_id AS id_b, q.label,
       {_SIM_COSINE_SQL} AS cosine
FROM embeddings q JOIN embeddings c
  ON q.label = c.label AND q.vec_id < c.vec_id
WHERE {_SIM_COSINE_SQL} >= 0.35
"""


def q_sim_embedding_near_dup_lsh_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Default (scale-path) form of embedding near-dup: LSH-bucket
    blocking with a Hamming-1 probe join — never all-pairs
    (approximation — rows-only check; ``sim_embedding_near_dup_lsh``
    carries the hash-checked recall/precision contract, round 5)."""
    embs = load_table(spark, sf_dir, "embeddings")
    dim = len(embs.select("embedding").first()["embedding"])
    return embedding_near_dup_pairs(embs, threshold=0.35, dim=dim, bits=6, n_tables=8)


#: Near-dup LSH recall floor vs the label-blocked exact pairs.
#: Measured (deterministic — SHA-seeded planes): 857142 ppm at
#: sf0.001 (12/14), 846153 at sf0.01 (22/26), 920716 at sf0.1
#: (360/391).  Recall vs the UNBLOCKED exhaustive answer is 917-923k
#: ppm at all three SFs (measured against a DuckDB all-pairs
#: cross-check, round 5) — the blocked subset is the scale-safe side
#: both engines can compute, so it anchors the driver contract.
_NEAR_DUP_RECALL_FLOOR_PPM = 800_000


def q_sim_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup LSH recall/precision contract (round 5) — value-hash-
    checked by the driver.

    The raw LSH pair list is engine-specific (depends on the plane
    seeds), but two relations about it are oracle-predictable:

    - ``n_exact_pairs``: the label-blocked exact near-dup pair count —
      both sides compute it scale-safely (blocked equi-join, never
      all-pairs), and DuckDB computes it independently.
    - ``recall_ok``: the LSH path found at least ``floor`` of those
      true pairs (the product semantics: a near-dup detector must find
      the real duplicates).
    - ``precision_ok``: every emitted LSH pair genuinely clears the
      cosine threshold (the candidate-verification step is exact, so
      a false positive means the verify stage broke).
    """
    embs = load_table(spark, sf_dir, "embeddings")
    blocked = embedding_near_dup_pairs(
        embs, block_col="label", threshold=0.35
    ).select("id_a", "id_b")
    lsh = q_sim_embedding_near_dup_lsh_pairs(spark, sf_dir)
    found = blocked.join(lsh.select("id_a", "id_b"), ["id_a", "id_b"])
    n_blocked = blocked.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_exact_pairs")
    )
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    precision = lsh.agg(
        F.min((F.col("cosine") >= 0.35).cast("int")).alias("precision_ok")
    )
    return (
        n_blocked.crossJoin(n_found)  # three single-row aggregates
        .crossJoin(precision)
        .select(
            "n_exact_pairs",
            F.lit(_NEAR_DUP_RECALL_FLOOR_PPM).cast("int").alias(
                "recall_floor_ppm"
            ),
            (
                F.col("n_found") * F.lit(1_000_000)
                >= F.lit(_NEAR_DUP_RECALL_FLOOR_PPM) * F.col("n_exact_pairs")
            )
            .cast("int")
            .alias("recall_ok"),
            F.coalesce(F.col("precision_ok"), F.lit(1)).alias("precision_ok"),
        )
    )


SQL_SIM_NEAR_DUP_LSH_CONTRACT = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       CAST({_NEAR_DUP_RECALL_FLOOR_PPM} AS INT) AS recall_floor_ppm,
       CAST(1 AS INT) AS recall_ok,
       CAST(1 AS INT) AS precision_ok
FROM embeddings q JOIN embeddings c
  ON q.label = c.label AND q.vec_id < c.vec_id
WHERE {_SIM_COSINE_SQL} >= 0.35
"""


# Approximate top-k has no exact oracle (the neighbor set depends on
# the engine's hash tables / centroids), but the RECALL RELATION does:
# the driver-facing entries join the ANN answer against the in-query
# exact brute-force top-k and emit per-query `recall@5 >= 0.6` as an
# integer the oracle predicts exactly — so a recall regression flips
# the driver hash red instead of hiding behind a rows-only row-count.
# Floors are deliberately the measured minimum (both ANN variants
# bottom out at exactly 3/5 on one sf0.01 query; everything is
# deterministic — SHA-seeded planes, xxhash64-sampled KMeans — so the
# driver reproduces the same recall bit-for-bit).  The raw neighbor
# surfaces stay available as the `_neighbors` EXTENDED twins.
_ANN_RECALL_FLOOR_PPM = 600_000


def q_sim_lsh_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw approximate LSH-bucketed top-k neighbor list (approximation —
    rows-only check; `sim_lsh_topk` carries the hash-checked recall
    contract and `sim_topk_bruteforce` the exact baseline)."""
    embs = load_table(spark, sf_dir, "embeddings")
    dim = len(embs.select("embedding").first()["embedding"])
    return lsh_bucketed_topk(
        embs, embs.where(F.col("vec_id") < 5), dim=dim, k=5, bits=6, n_tables=8
    )


def q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k recall contract: per-query `recall@5 >= floor` vs the
    in-query exact top-k — value-hash-checked by the driver."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5)
    return topk_recall_contract(
        q_sim_lsh_topk_neighbors(spark, sf_dir),
        brute_force_topk(embs, queries, k=5),
        k=5,
        floor_ppm=_ANN_RECALL_FLOOR_PPM,
    )


def q_sim_ivf_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw approximate IVF top-k neighbor list (approximation —
    rows-only check; `sim_ivf_topk` carries the hash-checked recall
    contract).

    The KMeans index build is staged once per corpus version
    (``stage_once``, fingerprint-keyed) — the production IVF shape,
    where queries pay only assign + probe + search against the
    prebuilt centroid table, and a corpus change retrains."""
    from event_streaming_toy_example_spark.functions.similarity import (
        train_ivf_centroids,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    cent_path = stage_once(
        lambda: train_ivf_centroids(embs, n_cells=16), "ivf_cent16", sf_dir
    )
    # n_probe=8 (was 6): at sf0.1 one query's true neighbors spread
    # over more cells and probe-6 recall fell to 2/5, below the 0.6
    # contract floor — measured probe-8 minimum is 3/5 at BOTH sf0.01
    # and sf0.1, so the contract holds across the driver's and the
    # bench's scale factors (docs/PLANS.md round-4 notes)
    return ivf_topk(
        embs,
        embs.where(F.col("vec_id") < 5),
        k=5,
        n_cells=16,
        n_probe=8,
        centroids=spark.read.parquet(cent_path),
    )


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k recall contract: per-query `recall@5 >= floor` vs the
    in-query exact top-k — value-hash-checked by the driver."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5)
    return topk_recall_contract(
        q_sim_ivf_topk_neighbors(spark, sf_dir),
        brute_force_topk(embs, queries, k=5),
        k=5,
        floor_ppm=_ANN_RECALL_FLOOR_PPM,
    )


SQL_ANN_RECALL_CONTRACT = f"""
SELECT vec_id AS query_id, CAST(5 AS INT) AS k,
       CAST({_ANN_RECALL_FLOOR_PPM} AS INT) AS recall_floor_ppm,
       CAST(1 AS INT) AS recall_ok
FROM embeddings WHERE vec_id < 5
"""


# --------------------------------------------------------------------------
# Multimodal
# --------------------------------------------------------------------------


def q_mm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing end to end: text -> binary payload +
    metadata -> Arrow-batched (mapInPandas) stub decode -> features.
    The deterministic fake decode makes it oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_binary_payload(docs), fake=True)


SQL_MM_MEDIA_FEATURES = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST(('0x' || substring(md5(text), 1, 4))::INT % 1920 AS INT) AS width,
       CAST(('0x' || substring(md5(text), 5, 4))::INT % 1080 AS INT) AS height
FROM documents
"""


def q_mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end to end: generate a true PNG payload per
    document (RGB gradient, dims an arithmetic function of doc_id),
    then decode it with the in-repo PNG codec (zlib inflate + scanline
    unfilter) inside Arrow batches. The oracle recomputes the expected
    dimensions arithmetically — so a decoder that misreads IHDR or
    mis-unfilters fails the hash check."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_png_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_png_payload(docs), fake=False)
    return feats.select("doc_id", "width", "height")


SQL_MM_PNG_DECODE = """
SELECT doc_id,
       CAST(16 + doc_id % 48 AS INT) AS width,
       CAST(8 + doc_id % 24 AS INT) AS height
FROM documents
"""


def q_mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second REAL image decode format (BMP, in-repo 24-bit BI_RGB
    codec — header parse + padded-row deinterleave, no compression
    library): same arithmetic-dims oracle construction as
    ``mm_png_decode``, different moduli so a codec mix-up fails the
    hash check."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        attach_bmp_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_bmp_payload(docs), fake=False)
    return feats.select("doc_id", "width", "height")


SQL_MM_BMP_DECODE = """
SELECT doc_id,
       CAST(12 + doc_id % 40 AS INT) AS width,
       CAST(6 + doc_id % 20 AS INT) AS height
FROM documents
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: byte-chunk explode, one row per sampled
    frame (deterministic fake decode, so fully oracle-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames_stub(attach_binary_payload(docs))


SQL_MM_FRAME_SAMPLE = """
WITH f AS (
  SELECT doc_id, text,
         least(CAST(ceil(octet_length(encode(text)) / 64.0) AS INT), 8) AS n
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       substring(text, CAST(i AS INT) * 64 + 1, 64) AS frame_bytes
FROM f, unnest(generate_series(0, greatest(n - 1, 0))) AS t(i)
"""


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample plumbing: Arrow-batched stride resize (keep
    every ceil(n/128)-th byte — 1-D nearest-neighbor stand-in for a
    codec resize). The SQL-expressible columns (sizes, stride) are
    oracle-checked; the resized bytes themselves are unit-tested."""
    from event_streaming_toy_example_spark.functions.multimodal import (
        resize_media_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    return resize_media_stub(attach_binary_payload(docs), fake=True).select(
        "doc_id", "n_bytes", "stride", "resized_n_bytes"
    )


SQL_MM_RESIZE = """
WITH t AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         greatest(1, (octet_length(encode(text)) + 127) // 128) AS s
  FROM documents
)
SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, CAST(s AS INT) AS stride,
       CAST((n + s - 1) // s AS BIGINT) AS resized_n_bytes
FROM t
"""


# --------------------------------------------------------------------------
# Streaming (real Structured Streaming runs, oracle checks the result)
# --------------------------------------------------------------------------


def _source_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the testdata dir (names+sizes+mtimes), so
    a staged copy is invalidated when the data at the same path changes."""
    parts = []
    for root, dirs, files in os.walk(sf_dir):
        dirs.sort()
        for fn in sorted(files):
            full = os.path.join(root, fn)
            st = os.stat(full)
            rel = os.path.relpath(full, sf_dir)
            parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def stage_dir_once(build_dir, key: str, sf_dir: str) -> str:
    """Materialize a derived-artifact DIRECTORY once per
    (key, sf_dir, source-content) per machine and return its path.

    ``build_dir(tmp_path)`` populates a private temp dir however it
    likes (multiple writes, mtime adjustments, side files); it only
    runs on a cache miss. Content must be deterministic in
    (key, sf_dir), so a completed staging dir means reuse; the temp
    dir is published with an atomic rename, so concurrent stagers
    cannot interleave partial output (the rename loser discards its
    identical copy). The fingerprint covers source file
    names/sizes/mtimes, so staged artifacts invalidate when the
    testdata at the same path changes.  Parameters that change the
    staged CONTENT must be part of ``key``."""
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fp = _source_fingerprint(sf_dir)
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_stage", f"{key}_{h}_{fp}"
    )
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        build_dir(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # lost the publish race — the winner's content is identical
            shutil.rmtree(tmp, ignore_errors=True)
    return path


@contextmanager
def private_warehouse(spark, path: str):
    """Route CREATE TABLE's default location AND the persistent
    warehouse catalog (``operators/warehouse.py``) into a private dir
    for the duration.  Staged builds need this: two stagers racing
    :func:`stage_dir_once` BOTH run the build, and without isolation
    the second build's ``CREATE TABLE <fixed name>`` would collide
    with the first's catalog entry in the shared warehouse."""
    prev = spark.conf.get("spark_graft.warehouse.dir", None)
    spark.conf.set("spark_graft.warehouse.dir", path)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset("spark_graft.warehouse.dir")
        else:
            spark.conf.set("spark_graft.warehouse.dir", prev)


def stage_once(build, key: str, sf_dir: str) -> str:
    """Materialize a derived-artifact dir once per
    (key, sf_dir, source-content) per machine and return its path.

    ``build`` is a zero-arg callable returning the DataFrame to
    materialize; it only runs on a cache miss.  The single-DataFrame
    convenience form of :func:`stage_dir_once`, which owns the
    fingerprint/key/atomic-publish machinery."""
    return stage_dir_once(
        lambda tmp: build().write.mode("overwrite").parquet(tmp),
        key,
        sf_dir,
    )


def await_or_raise(q, label: str, timeout: int = 300) -> None:
    """Block until the streaming query finishes; a timed-out stream
    would leave its memory sink partially filled, so raise instead of
    letting the caller read incomplete rows (uniform contract for
    every available-now memory-sink query in the catalog)."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"{label} did not finish in {timeout} s")


def stage_stream_input(df: DataFrame, key: str, sf_dir: str) -> str:
    """Materialize a streaming-source input dir once per
    (key, sf_dir, source-content) per machine: streaming demos need a
    file source, but re-writing the same input on every invocation
    would bill the benchmark for sink IO that is not part of the
    measured query."""
    return stage_once(lambda: df, key, sf_dir)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 as a stream: dup-injected events parquet -> file-source stream
    -> stateful dropDuplicates -> memory sink. Result must equal the
    clean batch table (the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    in_path = stage_stream_input(
        ev.unionAll(ev.where(F.col("event_id") % 20 == 0)), "dedup", sf_dir
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with stream_tuning(spark):
        q = (
            spark.readStream.schema(EVENTS_TABLE_SCHEMA)
            .parquet(in_path)
            .dropDuplicates(["event_id"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "stream_dedup")
    return spark.table(name).select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "props",
    )


SQL_STREAM_DEDUP = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       round(value, 2) AS value, props
FROM events
"""


def q_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation with watermark, run as a
    real stream (complete mode -> memory sink); oracle = batch GROUP BY
    date_trunc. The ns-timestamp source table is staged once to a µs
    parquet dir (Spark 4 streaming readers reject ns timestamps)."""
    in_path = stage_stream_input(
        load_table(spark, sf_dir, "events"), "hourly", sf_dir
    )
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENTS_TABLE_SCHEMA)
        .parquet(in_path)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    with stream_tuning(spark):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "stream_hourly_counts")
    return spark.table(name).select(
        F.unix_micros(F.col("w.start")).alias("hour_start_us"),
        "event_type",
        "n_events",
        "total_value",
    )


SQL_STREAM_HOURLY_COUNTS = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Generator (engine-specific randomness — rows-only)
# --------------------------------------------------------------------------


def q_gen_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded synthetic generator profile (S1/S2): per-type row counts,
    subtype cardinalities, and field-presence counts of four
    representative tag-dispatched fields.

    The generator is a pure counter-hash function of (n, seed) —
    partitioning-independent — so this profile is a fixed table for
    (20000, 42). The oracle pins it as a VALUES literal: individual
    event values stay engine-specific (the PRNG construction is ours),
    but the aggregate invariants are deterministic and hash-checkable,
    which upgrades the S1/S2 driver verdict from rows-only to a value
    hash. Field-presence counts cover the taxonomy dispatch: e.g.
    ``currency`` only on payment events, ``duration`` only on
    exercise/game/lesson subtypes that declare it."""
    from event_streaming_toy_example_spark.operators.enrich import enrich_events
    from event_streaming_toy_example_spark.sources.generator import generate_events

    ev = enrich_events(generate_events(spark, 20000, seed=42))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("event_subtype").cast("long").alias("n_subtypes"),
            F.count("event_specifics.score").cast("long").alias("n_score"),
            F.count("event_specifics.currency").cast("long").alias("n_currency"),
            F.count("event_specifics.duration").cast("long").alias("n_duration"),
            F.count("event_specifics.session_id").cast("long").alias("n_session"),
        )
    )


#: Expected profile of generate_events(20000, seed=42) — computed once
#: from the (partitioning-independent) generator and pinned, so any
#: drift in the taxonomy, tag dispatch, or hash construction flips the
#: driver hash. Columns: (event_type, n, n_subtypes, n_score,
#: n_currency, n_duration, n_session).
_GEN_PROFILE_EXPECTED = [
    ("account", 1742, 8, 0, 0, 0, 1742),
    ("exercise", 1757, 5, 1419, 0, 1757, 1419),
    ("feedback", 1858, 1, 0, 0, 0, 1858),
    ("game", 1845, 3, 1845, 0, 633, 1845),
    ("language", 1845, 2, 0, 0, 0, 1845),
    ("lesson", 1850, 5, 0, 0, 1850, 1850),
    ("payment", 1902, 1, 0, 1902, 0, 1902),
    ("rating", 1779, 1, 0, 0, 0, 1779),
    ("referral", 1857, 3, 0, 0, 0, 1857),
    ("session", 1751, 3, 0, 0, 0, 1751),
    ("subscription", 1814, 3, 0, 0, 0, 1814),
]

SQL_GEN_EVENTS_PROFILE = (
    "SELECT event_type, CAST(n AS BIGINT) AS n,"
    " CAST(n_subtypes AS BIGINT) AS n_subtypes,"
    " CAST(n_score AS BIGINT) AS n_score,"
    " CAST(n_currency AS BIGINT) AS n_currency,"
    " CAST(n_duration AS BIGINT) AS n_duration,"
    " CAST(n_session AS BIGINT) AS n_session FROM (VALUES "
    + ", ".join(
        f"('{t}', {n}, {s}, {sc}, {cu}, {du}, {se})"
        for t, n, s, sc, cu, du, se in _GEN_PROFILE_EXPECTED
    )
    + ") AS t(event_type, n, n_subtypes, n_score, n_currency,"
    " n_duration, n_session)"
)


EXT_QUERIES = {
    "text_token_stats": q_text_token_stats,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "dedup_exact_docs": q_dedup_exact_docs,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "sim_topk_bruteforce": q_sim_topk_bruteforce,
    "sim_embedding_near_dup": q_sim_embedding_near_dup,
    "sim_embedding_near_dup_lsh": q_sim_embedding_near_dup_lsh,
    "sim_embedding_near_dup_lsh_pairs": q_sim_embedding_near_dup_lsh_pairs,
    "sim_lsh_topk": q_sim_lsh_topk,
    "sim_ivf_topk": q_sim_ivf_topk,
    "sim_lsh_topk_neighbors": q_sim_lsh_topk_neighbors,
    "sim_ivf_topk_neighbors": q_sim_ivf_topk_neighbors,
    "mm_media_features": q_mm_media_features,
    "mm_png_decode": q_mm_png_decode,
    "mm_bmp_decode": q_mm_bmp_decode,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_resize": q_mm_resize,
    "stream_dedup": q_stream_dedup,
    "stream_hourly_counts": q_stream_hourly_counts,
    "gen_events_profile": q_gen_events_profile,
}

EXT_ORACLES = {
    "text_token_stats": SQL_TEXT_TOKEN_STATS,
    "text_quality": SQL_TEXT_QUALITY,
    "text_langid": _sql_text_langid(),
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "dedup_exact_docs": SQL_DEDUP_EXACT_DOCS,
    "dedup_minhash_lsh": _sql_dedup_minhash_lsh(),
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_simhash": _sql_dedup_simhash(),
    "sim_topk_bruteforce": SQL_SIM_TOPK_BRUTEFORCE,
    "sim_embedding_near_dup": SQL_SIM_EMBEDDING_NEAR_DUP,
    "mm_media_features": SQL_MM_MEDIA_FEATURES,
    "mm_png_decode": SQL_MM_PNG_DECODE,
    "mm_bmp_decode": SQL_MM_BMP_DECODE,
    "mm_frame_sample": SQL_MM_FRAME_SAMPLE,
    "mm_resize": SQL_MM_RESIZE,
    "stream_dedup": SQL_STREAM_DEDUP,
    "stream_hourly_counts": SQL_STREAM_HOURLY_COUNTS,
    # structural profile oracle: aggregate invariants of the seeded
    # generator pinned as a VALUES literal (individual values stay
    # engine-specific, the profile is deterministic)
    "gen_events_profile": SQL_GEN_EVENTS_PROFILE,
    # sim_lsh_topk / sim_ivf_topk (round 4): the RECALL CONTRACT is
    # hash-checked — the oracle asserts every query clears the floor,
    # which the Spark side computes against the in-query exact top-k.
    # Only the raw `_neighbors` twins remain rows-only (the neighbor
    # set itself is engine-specific by design; recall/accuracy unit
    # tests carry the rest).
    "sim_lsh_topk": SQL_ANN_RECALL_CONTRACT,
    "sim_ivf_topk": SQL_ANN_RECALL_CONTRACT,
    # sim_embedding_near_dup_lsh (round 5): recall/precision contract
    # vs the label-blocked exact pairs — n_exact_pairs is computed
    # independently by DuckDB, so the hash covers a data-dependent
    # value; only the raw `_pairs` twin stays rows-only.
    "sim_embedding_near_dup_lsh": SQL_SIM_NEAR_DUP_LSH_CONTRACT,
}


def stage_mtime_waves(waves, key: str, sf_dir: str) -> str:
    """Stage a sequence of DataFrames as single-file parquet "waves"
    with staggered modification times, so a file-source stream with
    ``maxFilesPerTrigger=1`` (oldest-first by mtime) delivers them as
    that many ordered micro-batches — the data-then-sentinel watermark
    construction the streaming flush entries share.  Same
    once-per-content contract as :func:`stage_dir_once`; the fragile
    parts (mtime staggering, per-wave file bookkeeping) live HERE and
    nowhere else."""
    import glob as _glob

    def build_dir(tmp: str) -> None:
        seen: set[str] = set()
        mode = "overwrite"
        for i, wave in enumerate(waves):
            wave.coalesce(1).write.mode(mode).parquet(tmp)
            mode = "append"
            new = set(_glob.glob(f"{tmp}/part-*")) - seen
            base = os.path.getmtime(tmp)
            for f in new:
                os.utime(f, (base + 60 * i, base + 60 * i))
            seen |= new

    return stage_dir_once(build_dir, key, sf_dir)
