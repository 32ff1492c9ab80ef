"""Round-3 additions (fourth wave): watermarked OUTER stream-stream
join and IVF-PQ compressed ANN.

- ``stream_join_outer`` — left-outer purchase→error attribution as a
  real two-stream join.  The inner variant (``stream_stream_join``)
  never has to emit a row it cannot match; the OUTER variant is the
  genuinely stateful form: an unmatched purchase is emitted with null
  error columns only once the watermark proves no matching error can
  still arrive.  State eviction (not replay convenience) therefore
  drives the watermark choice — see the docstring.
- ``sim_ivfpq_topk`` — IVF-PQ: inverted-file cells bound WHICH
  vectors a query scans, product-quantization codes bound WHAT each
  candidate costs (m table lookups vs a full-dim distance; byte
  codes vs float32 storage), exact-cosine rerank of the top ADC
  candidates recovers recall.  The memory-compression half of the
  ANN scale story the flat IVF entry doesn't cover.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    SQL_ANN_RECALL_CONTRACT,
    await_or_raise,
    stage_once,
    stage_stream_input,
)
from event_streaming_toy_example_spark.schemas import load_table

# ------------------------------------------- outer stream-stream join

#: Join window (errors within the hour after a purchase), watermark
#: delay (out-of-orderness bound), and the purchase-side cutoff.  The
#: cutoff keeps the result REPLAY-COMPLETE: an unmatched purchase at
#: time t is emitted only once the watermark passes t + window, and a
#: terminating replay's final watermark is max(event ts) - delay, so
#: purchases in the last (window + delay) of the stream would stay
#: buffered forever.  Cutting two days before the data's last event
#: (2024-01-30) guarantees every retained purchase resolves — the
#: same predicate on both engines, so the oracle sees the identical
#: domain.
_SJO_WINDOW = "1 HOUR"
_SJO_WATERMARK = "1 hour"
_SJO_CUTOFF = "2024-01-28 00:00:00"


def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer watermarked stream-stream join: every purchase before
    the cutoff, attributed to same-user errors in the following hour,
    or emitted with nulls once the watermark proves none arrived."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    in_path = stage_stream_input(ev, "sjo", sf_dir)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"

    def side(pred, alias: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(in_path)
            .where(pred)
            .withWatermark("ts", _SJO_WATERMARK)
            .alias(alias)
        )

    purchases = side(F.col("event_type") == "purchase", "p")
    errors = side(F.col("event_type") == "error", "e")
    # The cutoff is applied AFTER the join, not inside the purchase
    # stream: a pre-watermark `ts < cutoff` filter caps the purchase
    # side's observed max event time at the cutoff, the global
    # watermark (the MIN across inputs) stalls one delay behind it,
    # and unmatched purchases in the last window+delay before the
    # cutoff can never prove no-match — measured: exactly those 8
    # rows missing at sf0.01.  Post-join the predicate references the
    # watermark column, which Catalyst does not push below the
    # EventTimeWatermark operator, so the watermark advances over the
    # full stream and every retained purchase resolves.
    joined = purchases.join(
        errors,
        F.expr(
            "p.user_id = e.user_id AND "
            f"e.ts >= p.ts AND e.ts <= p.ts + INTERVAL {_SJO_WINDOW}"
        ),
        "leftOuter",
    ).where(
        F.col("p.ts") < F.lit(_SJO_CUTOFF).cast("timestamp")
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("e.event_id").alias("error_id"),
        F.unix_micros("p.ts").alias("purchase_us"),
        F.unix_micros("e.ts").alias("error_us"),
    )
    name = f"sjo_{uuid.uuid4().hex[:8]}"
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
        await_or_raise(q, "stream_join_outer")
    return spark.table(name)


SQL_STREAM_JOIN_OUTER = f"""
SELECT p.user_id AS user_id,
       p.event_id AS purchase_id,
       e.event_id AS error_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(e.ts) AS error_us
FROM (SELECT * FROM events
      WHERE event_type = 'purchase'
        AND ts < TIMESTAMP '{_SJO_CUTOFF}') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL {_SJO_WINDOW}
"""

# --------------------------------------------------------- IVF-PQ ANN

_PQ_M = 8
_PQ_KSUB = 16
_PQ_DIM = 64


def q_sim_ivfpq_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw IVF-PQ approximate top-k neighbor list (approximation —
    rows-only check; ``sim_ivfpq_topk`` carries the hash-checked
    recall contract, round 5).  Both index artifacts — IVF centroids
    and the per-subspace PQ codebooks — are staged once per corpus
    version, the production serving shape.

    Probe/rerank calibration (round 5): ``n_probe=10, rerank=40``
    is the measured minimum where per-query recall@5 clears the ANN
    family's 0.6 contract floor at sf0.001/0.01/0.1 (mins 3/5, 3/5,
    4/5) — ADC on near-random synthetic vectors needs a deeper exact
    rerank pool than IVF-flat (whose floor holds at probe 8) because
    the code-space ordering is noisier; the rerank cost stays bounded
    (``rerank*k`` = 200 exact re-scores per query regardless of corpus
    size)."""
    from event_streaming_toy_example_spark.functions.similarity import (
        ivfpq_topk,
        l2_normalize,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    # both artifacts are trained on the NORMALIZED corpus — the serving
    # path normalizes before assignment/ADC, so the index must live on
    # the same unit sphere (see ivfpq_topk's recall note)
    unit = l2_normalize(embs)
    cent_path = stage_once(
        lambda: train_ivf_centroids(unit, n_cells=16), "ivfpq_cent16u", sf_dir
    )

    def build_books() -> DataFrame:
        books = train_pq_codebooks(
            unit, m=_PQ_M, k_sub=_PQ_KSUB, dim=_PQ_DIM
        )
        return spark.createDataFrame(
            [
                (s, c, books[s][c])
                for s in range(_PQ_M)
                for c in range(_PQ_KSUB)
            ],
            "sub int, code int, cent array<double>",
        )

    book_path = stage_once(build_books, f"pq_{_PQ_M}x{_PQ_KSUB}u", sf_dir)
    rows = spark.read.parquet(book_path).collect()
    books = [[None] * _PQ_KSUB for _ in range(_PQ_M)]
    for r in rows:
        books[r.sub][r.code] = list(r.cent)
    centroids = spark.read.parquet(cent_path)
    # third staged artifact: the ENCODED corpus (cell + PQ codes per
    # vector) — the index a serving deployment materializes once per
    # corpus version; queries then pay only probe + ADC + rerank
    # (measured 5.8 s -> ~1.3 s per invocation at sf0.1)
    from event_streaming_toy_example_spark.functions.similarity import (
        ivfpq_encode,
    )

    index_path = stage_once(
        lambda: ivfpq_encode(
            unit, centroids, books, m=_PQ_M, dim=_PQ_DIM, normalized=True
        ),
        f"ivfpq_idx{_PQ_M}x{_PQ_KSUB}u",
        sf_dir,
    )
    return ivfpq_topk(
        embs,
        embs.where(F.col("vec_id") < 5),
        k=5,
        n_cells=16,
        n_probe=10,
        m=_PQ_M,
        k_sub=_PQ_KSUB,
        dim=_PQ_DIM,
        rerank=40,
        centroids=centroids,
        codebooks=books,
        index=spark.read.parquet(index_path),
    )


def q_sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k recall contract: per-query ``recall@5 >= floor``
    vs the in-query exact brute-force top-k — value-hash-checked by
    the driver (round 5; same construction as ``sim_lsh_topk`` /
    ``sim_ivf_topk``, ``functions/similarity.py::topk_recall_contract``)."""
    from event_streaming_toy_example_spark.functions.similarity import (
        brute_force_topk,
        topk_recall_contract,
    )
    from event_streaming_toy_example_spark.plans.queries_ext import (
        _ANN_RECALL_FLOOR_PPM,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5)
    return topk_recall_contract(
        q_sim_ivfpq_topk_neighbors(spark, sf_dir),
        brute_force_topk(embs, queries, k=5),
        k=5,
        floor_ppm=_ANN_RECALL_FLOOR_PPM,
    )


EXT11_QUERIES = {
    "stream_join_outer": q_stream_join_outer,
    "sim_ivfpq_topk": q_sim_ivfpq_topk,
    "sim_ivfpq_topk_neighbors": q_sim_ivfpq_topk_neighbors,
}


EXT11_ORACLES = {
    "stream_join_outer": SQL_STREAM_JOIN_OUTER,
    # sim_ivfpq_topk (round 5): the RECALL CONTRACT is oracle-
    # predictable even though the raw neighbor list is engine-specific;
    # the `_neighbors` twin stays rows-only by design.
    "sim_ivfpq_topk": SQL_ANN_RECALL_CONTRACT,
}
