"""BPE training + encoding: verified against an INDEPENDENT pure-
Python reference that re-derives the whole pipeline (histogram, merge
loop, and a replay-order encoder that differs algorithmically from the
engine's rank-order encoder) straight from the parquet via DuckDB."""

from __future__ import annotations

import re

import duckdb

from event_streaming_toy_example_spark.functions.bpe import (
    EOW,
    bpe_token_counts,
    encode_word,
    train_bpe_merges,
    word_histogram,
)
from event_streaming_toy_example_spark.plans.queries_ext13 import (
    q_text_bpe_tokens_counts,
)
from event_streaming_toy_example_spark.schemas import load_table
from tests.conftest import SF_DIR_ORACLE


def _norm_words(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9\s]", "", text.lower())
    return [w for w in re.split(r"\s+", t) if w]


def _ref_corpus():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR_ORACLE}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _ref_merges(rows, n_merges):
    hist: dict[str, int] = {}
    for _, text in rows:
        for w in _norm_words(text):
            hist[w] = hist.get(w, 0) + 1
    vocab = {w: (list(w) + [EOW], c) for w, c in hist.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.values():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (l, r), best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < 2:
            break
        merges.append((l, r, best))
        for w, (syms, c) in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            vocab[w] = (out, c)
    return merges


def _replay_encode(word: str, merges) -> int:
    """Encoder variant: replay merges in TRAINING order (vs the
    engine's lowest-rank-first search) — equivalent output, different
    algorithm, so a shared bug can't hide."""
    syms = list(word) + [EOW]
    for l, r, _ in merges:
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                out.append(l + r)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return len(syms)


def test_trained_merges_match_reference(spark):
    rows = _ref_corpus()
    ref = _ref_merges(rows, 48)
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = train_bpe_merges(word_histogram(docs), n_merges=48)
    assert got == ref


def test_rank_encoder_equals_replay_encoder(spark):
    rows = _ref_corpus()
    merges = _ref_merges(rows, 48)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    words = {w for _, t in rows for w in _norm_words(t)}
    for w in sorted(words):
        assert len(encode_word(w, ranks)) == _replay_encode(w, merges), w


def test_catalog_entry_matches_full_reference(spark):
    rows = _ref_corpus()
    merges = _ref_merges(rows, 48)
    want = {
        doc_id: (
            len(_norm_words(text)),
            sum(_replay_encode(w, merges) for w in _norm_words(text)),
        )
        for doc_id, text in rows
    }
    got = {
        r.doc_id: (r.n_words, r.bpe_tokens)
        for r in q_text_bpe_tokens_counts(spark, SF_DIR_ORACLE).collect()
    }
    assert got == want
    # merges must actually compress: fewer tokens than characters+EOW
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    no_merge = {
        r.doc_id: r.bpe_tokens
        for r in bpe_token_counts(docs, []).collect()
    }
    assert sum(v[1] for v in got.values()) < sum(no_merge.values())


def test_cluster_embeddings_covers_corpus(spark):
    from event_streaming_toy_example_spark.plans.queries_ext13 import (
        q_cluster_embeddings_assignments,
    )

    out = q_cluster_embeddings_assignments(spark, SF_DIR_ORACLE).collect()
    assert sum(r.n_vecs for r in out) == 500
    assert 1 <= len(out) <= 8
    # deterministic across invocations (staged centroids + argmin)
    again = q_cluster_embeddings_assignments(spark, SF_DIR_ORACLE).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
