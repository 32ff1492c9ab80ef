"""BPE tokenizer training over a distributed corpus.

The reference has no tokenizer surface at all; a training-data engine
needs one (token budgets, packing, dedup thresholds are all stated in
tokens).  This is the classic Sennrich byte-pair-encoding TRAINING
loop, factored the way it actually scales:

- **The corpus-sized work is ONE distributed word histogram** — the
  only pass that touches 100 TB, a map-side-combinable count.
- **The merge loop runs driver-side on the BOUNDED weighted vocab**
  (top ``vocab_cap`` words by frequency; `TakeOrderedAndProject`, no
  full sort).  This mirrors how production BPE trainers work: the
  corpus doesn't fit anywhere, the weighted vocabulary does.  Same
  bounded-collect pattern as ``train_ivf_centroids``.
- **Encoding ships the merge ranks back as a broadcast** and applies
  them in an Arrow-batched pass with per-batch word memoization
  (words repeat; each distinct word is encoded once per batch).

Determinism: merge selection orders by (count desc, pair lexicographic
asc), so the merge table is a pure function of the histogram — the
pure-Python reference in ``tests/test_bpe.py`` must reproduce it
exactly, and the per-doc token counts are reproducible across runs
and partitionings.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from event_streaming_toy_example_spark.functions.text import (
    normalize_text,
    tokens,
)

#: end-of-word sentinel (keeps merges from crossing word boundaries
#: and lets suffixes tokenize differently from infixes, per Sennrich)
EOW = "</w>"


def word_histogram(
    df: DataFrame, text_col: str = "text", vocab_cap: int = 50_000
) -> list[tuple[str, int]]:
    """Distributed weighted vocabulary: normalize -> tokenize ->
    count, keep the ``vocab_cap`` most frequent words (ties broken by
    word so the cut is deterministic).  THE corpus-sized pass."""
    counts = (
        df.select(
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(vocab_cap)
    )
    return [(r["w"], r["cnt"]) for r in counts.collect()]


def train_bpe_merges(
    word_counts: list[tuple[str, int]], n_merges: int = 32
) -> list[tuple[str, str, int]]:
    """Deterministic merge table from a weighted vocab: repeatedly
    merge the (count desc, pair asc) best adjacent symbol pair.
    Stops early when no pair occurs at least twice (weighted)."""
    vocab: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in word_counts
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (left, right), best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:
            break
        merges.append((left, right, best))
        merged = left + right
        for i, (syms, cnt) in enumerate(vocab):
            out, j = [], 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == left
                    and syms[j + 1] == right
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            vocab[i] = (out, cnt)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank pair first (the standard
    BPE encode order, equivalent to replaying training)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


BPE_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_words", T.LongType(), True),
        T.StructField("bpe_tokens", T.LongType(), True),
    ]
)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc BPE token counts under a trained merge table.

    The merge ranks ride into each Arrow batch via the plan (closure
    broadcast); each batch memoizes distinct-word encodings, so the
    per-row cost is a dict lookup for every repeated word.  The token
    relation is repartitioned to the session parallelism first — a
    few-file corpus scan would otherwise run the whole Python encode
    loop in one task (each task rebuilds its own word memo, a fine
    trade: the memo is per-word work, the encode loop per-token)."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    tok_df = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("ws"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def tok_len(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = len(encode_word(w, ranks))
                memo[w] = n
            return n

        for pdf in batches:
            rows = [
                (int(doc_id), len(ws), sum(tok_len(w) for w in ws))
                for doc_id, ws in zip(pdf["doc_id"], pdf["ws"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in BPE_COUNT_SCHEMA.fields]
            )

    return tok_df.mapInPandas(op, BPE_COUNT_SCHEMA)


BPE_CONTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_words", T.LongType(), True),
        T.StructField("pre_merge_symbols", T.LongType(), True),
        T.StructField("lossless_ok", T.IntegerType(), True),
        T.StructField("bounds_ok", T.IntegerType(), True),
    ]
)


def bpe_token_contract(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Driver-verifiable contract for the trained tokenizer (round 5;
    the construction that moved the ANN/sketch entries off rows-only).

    The merge table and per-doc token counts are engine-specific, but
    three relations are oracle-predictable:

    - ``n_words`` / ``pre_merge_symbols``: word count and the
      pre-merge symbol count ``sum(len(w) + 1)`` (each word starts as
      its characters + the end-of-word sentinel) — both recomputable
      by DuckDB from the same normalize/tokenize pipeline the
      token-stats oracle already verifies.
    - ``lossless_ok``: BPE merges only CONCATENATE — for every word,
      the characters of its tokens must reassemble exactly
      ``word + EOW``.  A broken merge application (dropped symbol,
      wrong span) fails this.
    - ``bounds_ok``: ``n_words <= bpe_tokens <= pre_merge_symbols`` —
      every word yields at least one token and merging never
      increases the count.
    """
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    tok_df = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("ws"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[int, bool]] = {}

        def enc(w: str) -> tuple[int, bool]:
            got = memo.get(w)
            if got is None:
                syms = encode_word(w, ranks)
                got = (len(syms), "".join(syms) == w + EOW)
                memo[w] = got
            return got

        for pdf in batches:
            rows = []
            for doc_id, ws in zip(pdf["doc_id"], pdf["ws"]):
                encs = [enc(w) for w in ws]
                n_tok = sum(n for n, _ in encs)
                pre = sum(len(w) + 1 for w in ws)
                rows.append(
                    (
                        int(doc_id),
                        len(ws),
                        pre,
                        int(all(ok for _, ok in encs)),
                        int(len(ws) <= n_tok <= pre),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in BPE_CONTRACT_SCHEMA.fields]
            )

    return tok_df.mapInPandas(op, BPE_CONTRACT_SCHEMA)
