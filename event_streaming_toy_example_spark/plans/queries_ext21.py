"""Round-4 additions (fourteenth wave): training-chunk generation and
segment-level dedup with document REASSEMBLY — the two curation-stage
shapes between "score documents" and "pack sequences" that the catalog
did not yet cover.

- ``text_chunk_windows`` — sliding-window chunking: every document
  becomes overlapping W-token windows on an S-token stride (the
  standard way long documents are cut into training-context-sized
  pieces with overlap so no boundary context is lost).  Pure
  built-ins: one ``transform`` over a precomputed start ``sequence``,
  one ``posexplode``.  Distinct from ``curate_pack_sequences`` (which
  bin-packs WHOLE docs into fixed-length sequences) — chunking cuts
  WITHIN docs, packing concatenates ACROSS them.

- ``dedup_segments_rebuild`` — the Falcon/RefinedWeb "line dedup"
  shape restated over token segments (this corpus has no newlines):
  split each doc into consecutive L-token segments, drop every
  segment whose exact text occurs in >= K DISTINCT documents
  corpus-wide, and REASSEMBLE the surviving segments in order into a
  cleaned document.  Distinct from ``dedup_substring`` (which only
  scores duplicated-span fractions): this one emits the rebuilt
  corpus, i.e. the actual output a training pipeline feeds downstream.

Scale notes (100 TB): segment grouping is keyed on md5(segment) —
fixed-width keys cross the wire, never segment text for the
aggregate; the frequency relation is aggregated BEFORE the join back
(hot boilerplate segments are absorbed map-side), and reassembly is
one per-doc aggregate over sorted (seg_idx, text) structs.  Chunking
moves nothing at all: it is scan -> project -> explode, and the token
array is materialized as its own projection before the lambda
references it (the ext9 lesson: inlining the tokenizer into
``transform`` re-evaluates it per window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.functions.text import (
    normalize_text,
    tokens,
)
from event_streaming_toy_example_spark.schemas import load_table

#: DuckDB twin of tokens(normalize_text(...)) — same as ext9.
_SQL_TOKS = r"""
SELECT doc_id,
       list_filter(string_split(trim(regexp_replace(regexp_replace(
           lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
           x -> x <> '') AS w
FROM documents
"""

# ------------------------------------------------ chunk windows

_CHUNK_W = 32  # window (chunk) size, tokens
_CHUNK_S = 24  # stride; overlap = W - S = 8 tokens


def chunk_windows(
    docs: DataFrame, w: int = _CHUNK_W, s: int = _CHUNK_S
) -> DataFrame:
    """Overlapping w-token chunks on an s-token stride over any
    (doc_id, text) frame; the final chunk of a doc may be short
    (kept — training pipelines pad it).  Chunk starts are 1, 1+s,
    1+2s, ... while <= n_tokens, so a doc shorter than w still yields
    its one (short) chunk."""
    tok = docs.select(
        "doc_id", tokens(normalize_text(F.col("text"))).alias("w")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("w"), F.lit(1)), F.lit(s)
    )
    chunked = tok.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda i: F.slice(F.col("w"), i, w))
        ).alias("chunk_idx", "toks"),
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join("toks", " ").alias("chunk_text"),
        F.size("toks").cast("long").alias("n_tokens"),
    )


def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: :func:`chunk_windows` over the documents table."""
    return chunk_windows(load_table(spark, sf_dir, "documents"))


SQL_TEXT_CHUNK_WINDOWS = f"""
WITH toks AS ({_SQL_TOKS})
SELECT doc_id,
       CAST((i - 1) // {_CHUNK_S} AS BIGINT) AS chunk_idx,
       array_to_string(w[i:i + {_CHUNK_W - 1}], ' ') AS chunk_text,
       CAST(len(w[i:i + {_CHUNK_W - 1}]) AS BIGINT) AS n_tokens
FROM toks,
     unnest(generate_series(1, greatest(len(w), 1), {_CHUNK_S})) AS t(i)
"""

# ------------------------------------------------ segment dedup+rebuild

_SEG_L = 4  # segment length, tokens
_SEG_K = 2  # drop segments present in >= K distinct docs


def segments_rebuild(
    docs: DataFrame, seg_len: int = _SEG_L, k: int = _SEG_K
) -> DataFrame:
    """Corpus-frequency segment dedup with reassembly over any
    (doc_id, text) frame: consecutive seg_len-token segments; any
    segment text appearing in >= k distinct documents is dropped
    everywhere; survivors rejoin in order.  Docs that lose every
    segment still appear (empty ``kept_text``) so the output is a
    full corpus snapshot, not a filtered view."""
    tok = docs.select(
        "doc_id", tokens(normalize_text(F.col("text"))).alias("w")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("w"), F.lit(1)), F.lit(seg_len)
    )
    seg = tok.select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.array_join(
                    F.slice(F.col("w"), i, seg_len), " "
                ),
            )
        ).alias("seg_idx", "seg_text"),
    )
    # fixed-width keys for the corpus-wide frequency aggregate; the
    # distinct-doc count is aggregated before the join back
    hot = (
        seg.groupBy(F.md5("seg_text").alias("h"))
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= k)
        .select("h")
    )
    kept = seg.join(
        hot, F.md5(seg["seg_text"]) == hot["h"], "left_anti"
    )
    totals = seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seg_idx", "seg_text"))
                ),
                lambda s: s["seg_text"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_segments",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
            .alias("n_kept"),
            F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
        )
    )


def q_dedup_segments_rebuild(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Catalog entry: :func:`segments_rebuild` over the documents
    table."""
    return segments_rebuild(load_table(spark, sf_dir, "documents"))


SQL_DEDUP_SEGMENTS_REBUILD = f"""
WITH toks AS ({_SQL_TOKS}),
seg AS (
  SELECT doc_id,
         (i - 1) // {_SEG_L} AS seg_idx,
         array_to_string(w[i:i + {_SEG_L - 1}], ' ') AS s
  FROM toks,
       unnest(generate_series(1, greatest(len(w), 1), {_SEG_L})) AS t(i)
),
g AS (
  SELECT s, count(DISTINCT doc_id) AS nd FROM seg GROUP BY s
),
kept AS (
  SELECT seg.doc_id, seg.seg_idx, seg.s
  FROM seg JOIN g USING (s)
  WHERE g.nd < {_SEG_K}
)
SELECT t.doc_id,
       t.n_segments,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.kept_text, '') AS kept_text
FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments
      FROM seg GROUP BY 1) t
LEFT JOIN (SELECT doc_id,
                  CAST(count(*) AS BIGINT) AS n_kept,
                  string_agg(s, ' ' ORDER BY seg_idx) AS kept_text
           FROM kept GROUP BY 1) k USING (doc_id)
"""

# ------------------------------------------------------------ exports

EXT21_QUERIES = {
    "text_chunk_windows": q_text_chunk_windows,
    "dedup_segments_rebuild": q_dedup_segments_rebuild,
}

EXT21_ORACLES = {
    "text_chunk_windows": SQL_TEXT_CHUNK_WINDOWS,
    "dedup_segments_rebuild": SQL_DEDUP_SEGMENTS_REBUILD,
}
