"""Round-12 wave: the streaming txtable SINK and follow-on engine
surfaces.

- ``tx_stream_sink`` — ``df.writeStream.format("txtable")``
  (``sources/txsink.py``): executor-parallel parquet staging, ONE
  atomic log commit per micro-batch under an ``(app, batchId)``
  stream-transaction token (exactly-once replay, pinned in
  tests/test_txsink.py), footer stats harvested for streamed files.
  The entry streams the events corpus into a fresh table and
  hash-checks the read-back aggregate against DuckDB over the same
  parquet.

The reference's only sink rewrites an NDJSON directory wholesale
(``toy_glue.py:58-65``); the sink protocol here follows Delta's
streaming txn-action idempotence, re-expressed on this engine's
commit log through the public Spark 4.1
``DataSourceStreamArrowWriter`` API.
"""

from __future__ import annotations

import os as _os
import tempfile as _tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    await_or_raise,
    stage_stream_input,
)
from event_streaming_toy_example_spark.schemas import load_table

_SINK_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


def q_tx_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events corpus INTO a transactional table through the
    native sink, then read the table back (snapshot read through the
    log) and aggregate.  Asserted on the way: every commit carries the
    stream-transaction token (the exactly-once contract), the commits
    are appends, and the streamed files carry footer stats (data
    skipping applies to sink-written files like any other)."""
    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.sources import txsource

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # 8 input files -> 8 executor write tasks per micro-batch (a
    # single-file stage would serialize the sink into one task)
    src = stage_stream_input(ev.repartition(8), "txsink_in_v2", sf_dir)
    txsource.register(spark)
    base = _tempfile.mkdtemp(prefix="txsink_q_")
    tgt = _os.path.join(base, "t")
    q = (
        spark.readStream.schema(_SINK_SCHEMA)
        .parquet(src)
        .writeStream.format("txtable")
        .option("path", tgt)
        .option("checkpointLocation", _os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, "tx_stream_sink")
    log = tx.read_log(tgt)
    assert log and all(
        c.action == "append" and c.stream_txn is not None for c in log
    ), "sink commits must be stream-txn appends"
    snap = tx.snapshot(tgt)
    assert all(
        snap.stats.get(f, {}).get("event_id") for f in snap.files
    ), "streamed files must carry footer stats"
    return (
        tx.read_table(spark, tgt)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cc"
            ),
        )
    )


SQL_TX_STREAM_SINK = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cc
FROM events
GROUP BY event_type
"""


EXT38_QUERIES = {
    "tx_stream_sink": q_tx_stream_sink,
}

EXT38_ORACLES = {
    "tx_stream_sink": SQL_TX_STREAM_SINK,
}
