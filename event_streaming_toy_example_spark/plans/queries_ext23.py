"""Round-4 additions (sixteenth wave): incremental JOIN maintenance
and the STREAMING side of the Python DataSource API.

- ``ivm_join_delta`` — incremental view maintenance for a JOIN view
  (the join sibling of ``agg_incremental_merge``): with inserts on
  BOTH sides (new orders ΔA, late-arriving customers ΔB), the
  maintained view is the classic four-term decomposition

      J' = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

  where the A⋈B term is a STAGED materialization (pay-once partial
  aggregates — the history never rescans) and only the three delta
  terms compute fresh.  The oracle is the full re-join over all rows,
  so the driver hash literally checks the decomposition's
  exactly-once coverage (any term missed or double-counted fails).

- ``pysource_stream_agg`` — the streaming half of the Spark 4 Python
  DataSource API (``SimpleDataSourceStreamReader``): the same
  deterministic sensor generator as the batch ``pysource_sensor_agg``
  entry, but delivered as offset-tracked micro-batches through a
  streaming aggregation into a complete-mode memory sink.  Offsets
  advance per batch and ``readBetweenOffsets`` replays exactly, so
  the result equals the batch table and the oracle recomputes it with
  ``generate_series``.

Scale notes (100 TB): join-IVM is THE pattern for maintained join
views at warehouse scale — the staged prior is O(groups) parquet, the
delta terms touch only new data, and every join here remains keyed
(broadcast at toy SF, shuffle-hash on the key at cluster SF).  The
Python streaming source is the slow path per row (Arrow boundary)
but its offset log is exactly the contract a custom protocol reader
must implement for exactly-once.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_once,
)
from event_streaming_toy_example_spark.schemas import load_table

# ------------------------------------------------ join-IVM delta

_IVM_CUTOVER = "2000-01-01"  # orders ΔA: orderdate >= cutover
_IVM_LATE_MOD = 7  # customers ΔB: c_custkey % 7 == 0 arrive "late"


def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain per-nation order revenue over orders ⋈ customer with
    inserts on both sides; see module docstring.  The A⋈B history
    term is staged partials; the three delta terms and the final
    O(groups) merge are the only fresh work."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    late = F.col("c_custkey") % _IVM_LATE_MOD == 0
    delta_o = F.col("o_orderdate") >= F.lit(_IVM_CUTOVER).cast("timestamp")

    a_old, a_new = orders.where(~delta_o), orders.where(delta_o)
    b_old, b_new = cust.where(~late), cust.where(late)

    def jagg(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.join(F.broadcast(b), a["o_custkey"] == b["c_custkey"])
            .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("sum_cc"),
            )
        )

    prior_path = stage_once(
        lambda: jagg(a_old, b_old), "ivm_join_prior", sf_dir
    )
    prior = spark.read.parquet(prior_path)
    merged = (
        prior.unionByName(jagg(a_new, b_old))
        .unionByName(jagg(a_old, b_new))
        .unionByName(jagg(a_new, b_new))
        .groupBy("nationkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cc").alias("sum_cc"),
        )
    )
    return merged


SQL_IVM_JOIN_DELTA = """
SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cc
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""

# ------------------------------------------- streaming Python source

_STREAM_TOTAL = 8000  # rows the stream emits before going idle
_STREAM_STEP = 1500  # rows per micro-batch offset advance


def q_pysource_stream_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream the deterministic sensor source through a streaming
    aggregation (complete mode, memory sink) until all offsets are
    consumed; the per-sensor result equals what one batch read of the
    same generator produces, which the oracle recomputes."""
    import uuid

    from event_streaming_toy_example_spark.sources.pysource import (
        register_sensor_stream_source,
    )

    from event_streaming_toy_example_spark.streaming.tuning import (
        stream_tuning,
    )

    register_sensor_stream_source(spark)
    name = f"pysrc_stream_{uuid.uuid4().hex[:8]}"
    with stream_tuning(spark):
        q = (
            spark.readStream.format("synthetic_sensor_stream")
            .option("total", str(_STREAM_TOTAL))
            .option("step", str(_STREAM_STEP))
            .load()
            .groupBy("sensor_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("reading_c").alias("sum_c"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            got = prev = 0
            stalls = 0
            deadline = time.monotonic() + 300
            while time.monotonic() < deadline:
                q.processAllAvailable()
                got = (
                    spark.table(name).agg(F.sum("n")).collect()[0][0] or 0
                )
                if got >= _STREAM_TOTAL:
                    break
                # a source gone idle early would otherwise busy-spin
                # the driver for the whole deadline: back off, and give
                # up once the count stops advancing across several
                # polls.  The poll interval is dead DRIVER time between
                # micro-batches (processAllAvailable already blocks on
                # in-flight work), so it is short — 0.5 s polls were
                # adding ~3 s of pure sleep per invocation (round-12
                # measurement) without changing a single emitted row.
                stalls = stalls + 1 if got == prev else 0
                if stalls >= 50:
                    raise TimeoutError(
                        f"pysource stream stalled at {got}/"
                        f"{_STREAM_TOTAL} rows"
                    )
                prev = got
                time.sleep(0.05)
            else:
                raise TimeoutError(
                    f"pysource stream ingested {got}/{_STREAM_TOTAL} rows"
                )
        finally:
            q.stop()
    return spark.table(name).select(
        "sensor_id", "n", F.col("sum_c").cast("long").alias("sum_c")
    )


SQL_PYSOURCE_STREAM_AGG = f"""
SELECT rid % 97 AS sensor_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum((rid * 37) % 200 - 50) AS BIGINT) AS sum_c
FROM unnest(generate_series(0, {_STREAM_TOTAL - 1})) AS t(rid)
GROUP BY 1
"""

# ------------------------------------------------------------ exports

EXT23_QUERIES = {
    "ivm_join_delta": q_ivm_join_delta,
    "pysource_stream_agg": q_pysource_stream_agg,
}

EXT23_ORACLES = {
    "ivm_join_delta": SQL_IVM_JOIN_DELTA,
    "pysource_stream_agg": SQL_PYSOURCE_STREAM_AGG,
}
