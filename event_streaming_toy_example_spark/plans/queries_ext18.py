"""Round-4 additions (eleventh wave).

- ``layout_compact_invariance`` — small-file compaction
  (``operators/compaction.py``) driven end-to-end inside a query: a
  deliberately fragmented copy of the events table is bin-packed and
  the operator's CONTRACT — row content invariant under compaction,
  file count strictly reduced — is emitted as a relation the DuckDB
  oracle predicts exactly from the base table.  The reference's own
  README targets 100 MB-1 GB parquet files (``README.md:296-297``);
  compaction is how a real pipeline gets there from streaming-sized
  output files.
- ``stream_running_stats`` — per-user running profile totals via
  ``transformWithStateInPandas`` (the Spark 4 state-v2 API), unlocked
  in round 4 by the pure-Python protobuf fallback runtime
  (``streaming/stateful.ensure_state_v2_runtime``) and the RocksDB
  state-store provider (state-v2 needs column families the HDFS
  provider lacks).  A single available-now batch makes the running
  totals equal the plain batch aggregate, so the oracle is the batch
  GROUP BY — the same shared-oracle construction as the other
  stateful-streaming twins.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from event_streaming_toy_example_spark.operators.compaction import (
    compact_files,
    compaction_invariance,
)
from event_streaming_toy_example_spark.schemas import load_table

_COMPACT_FRAGMENTS = 24

_COMPACT_INVARIANCE_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_rows", LongType()),
        StructField("value_sum", LongType()),
        StructField("invariant_ok", IntegerType()),
        StructField("files_reduced", IntegerType()),
    ]
)


def q_layout_compact_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment -> compact -> verify, in one query.

    The compaction mutates a throwaway directory, so the tiny per-type
    invariance relation (|event_type| rows) is materialized before
    cleanup — a bounded-artifact collect, same class as the PQ
    codebooks and BPE vocab."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cc"),
    )
    base = tempfile.mkdtemp(prefix="compact_q_")
    try:
        path = f"{base}/tbl"
        events.repartition(_COMPACT_FRAGMENTS).write.mode("overwrite").parquet(
            path
        )
        res = compact_files(spark, path, target_bytes=1 << 30)
        inv = compaction_invariance(
            events,
            spark.read.parquet(path),
            key_col="event_type",
            value_col="value_cc",
        ).withColumn(
            "files_reduced",
            F.lit(res.files_after < res.files_before).cast("int"),
        )
        rows = [
            (r["event_type"], r["n_rows"], r["value_sum"], r["invariant_ok"],
             r["files_reduced"])
            for r in inv.collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, _COMPACT_INVARIANCE_SCHEMA)


SQL_LAYOUT_COMPACT_INVARIANCE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_sum,
       CAST(1 AS INT) AS invariant_ok,
       CAST(1 AS INT) AS files_reduced
FROM events GROUP BY event_type
"""


# ------------------------------------------------- state-v2 streaming

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def q_stream_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` run
    as a real stream (file source -> state-v2 operator -> memory sink).

    One available-now batch means each user's single update row IS the
    final total, so the result equals the plain batch aggregate — the
    oracle.  The RocksDB state-store provider is required (state-v2
    uses column families); the session conf is restored afterwards."""
    import uuid as _uuid

    from event_streaming_toy_example_spark.plans.queries_ext import (
        await_or_raise,
        stage_stream_input,
    )
    from event_streaming_toy_example_spark.streaming.stateful import (
        ensure_state_v2_runtime,
        running_user_stats,
    )

    if not ensure_state_v2_runtime():
        raise RuntimeError(
            "stream_running_stats needs a google.protobuf runtime "
            "(see streaming/stateful.ensure_state_v2_runtime)"
        )
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    in_path = stage_stream_input(ev, "runstats", sf_dir)
    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).parquet(in_path)

    name = f"stream_runstats_{_uuid.uuid4().hex[:8]}"
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
    try:
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "stream_running_stats")
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
    return spark.table(name)


SQL_STREAM_RUNNING_STATS = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cc,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us
FROM events GROUP BY user_id
"""


EXT18_QUERIES = {
    "layout_compact_invariance": q_layout_compact_invariance,
    "stream_running_stats": q_stream_running_stats,
}

EXT18_ORACLES = {
    "layout_compact_invariance": SQL_LAYOUT_COMPACT_INVARIANCE,
    "stream_running_stats": SQL_STREAM_RUNNING_STATS,
}
