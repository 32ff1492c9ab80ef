"""Round-3 additions (sixth wave): BPE tokenizer training and corpus
clustering.

The reference has no tokenizer or ML surface (its whole text handling
is one ``event_name.split(":")``, ``toy_lambda_function.py:58-59``); both
operators here are greenfield training-data-pipeline capability.

- ``text_bpe_tokens`` — train a byte-pair-encoding merge table on the
  corpus (distributed word histogram -> bounded-vocab driver loop,
  ``functions/bpe.py``) and report per-document token counts under
  it.  Token counts are THE unit every other curation stage prices in
  (budgets, packing, dedup thresholds); the engine-specific merge
  replay makes this rows-only for the driver, with a full-strength
  independent-reference test in ``tests/test_bpe.py``.
- ``cluster_embeddings`` — user-facing corpus clustering: KMeans
  centroids (staged per corpus version) + one broadcast
  nearest-centroid assignment pass; per-cluster sizes with a
  deterministic min-member label anchor.  Rows-only (centroids are
  engine-specific); determinism and total-coverage are unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import stage_once
from event_streaming_toy_example_spark.schemas import load_table

_BPE_MERGES = 48


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-count: the merge table is a pure function of the
    corpus histogram (deterministic tie-breaks), trained once per
    corpus version via the staged-artifact path, then applied in one
    Arrow pass with per-batch word memoization."""
    from event_streaming_toy_example_spark.functions.bpe import (
        bpe_token_counts,
        train_bpe_merges,
        word_histogram,
    )

    docs = load_table(spark, sf_dir, "documents")

    def build_merges() -> DataFrame:
        merges = train_bpe_merges(
            word_histogram(docs), n_merges=_BPE_MERGES
        )
        return spark.createDataFrame(
            [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
            "rank int, left string, right string, pair_count long",
        )

    path = stage_once(build_merges, f"bpe_{_BPE_MERGES}", sf_dir)
    rows = sorted(spark.read.parquet(path).collect(), key=lambda r: r.rank)
    merges = [(r.left, r.right, r.pair_count) for r in rows]
    return bpe_token_counts(docs, merges)


def q_cluster_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering surface: staged KMeans centroids over the
    L2-normalized embeddings, broadcast nearest-centroid assignment
    (the same ``ivf_assign`` pass the ANN index uses), per-cluster
    size + deterministic min-member anchor."""
    from event_streaming_toy_example_spark.functions.similarity import (
        ivf_assign,
        l2_normalize,
        train_ivf_centroids,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    unit = l2_normalize(embs)
    cent_path = stage_once(
        lambda: train_ivf_centroids(unit, n_cells=8), "cluster_cent8u", sf_dir
    )
    centroids = F.broadcast(
        spark.read.parquet(cent_path).select(
            "cell", F.col("cent").cast("array<double>").alias("cent")
        )
    )
    assigned = ivf_assign(unit, centroids, "vec_id", "embedding", n_probe=1)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vid").alias("anchor_vec_id"),
        )
        .select("anchor_vec_id", "n_vecs")
    )


EXT13_QUERIES = {
    "text_bpe_tokens": q_text_bpe_tokens,
    "cluster_embeddings": q_cluster_embeddings,
}

#: both rows-only by design: BPE merge replay and KMeans centroids are
#: engine-specific; tests/test_bpe.py reproduces the full pipeline with
#: an independent pure-Python reference, and cluster determinism +
#: coverage are unit-tested.
EXT13_ORACLES: dict[str, str] = {}
