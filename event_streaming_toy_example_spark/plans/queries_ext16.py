"""Round-3 additions (ninth wave): spatial proximity join and the
streaming MERGE sink.

The reference has no spatial surface (its records carry no
coordinates at all, ``producer.py:1-173``); proximity joins are a
standard curation operation (geo dedup, store-customer matching).
``geo_grid_join`` derives deterministic integer coordinates from
customer keys — the SAME arithmetic on both engines, so the oracle is
the naive all-pairs distance join while the engine runs the scalable
grid-blocked plan (``functions/spatial.py``): a single missed
candidate (broken neighborhood) or spurious survivor flips the value
hash, exactly like the deletion-neighborhood fuzzy join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import load_table

#: deterministic point derivation (both engines): two co-prime
#: multipliers scatter customer keys over a 100k x 100k grid
_PX, _PY, _GRID = 7919, 104_729, 100_000
_RADIUS = 2_000


def q_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of customers within ``_RADIUS`` grid units, via
    3x3-neighborhood grid blocking + exact integer distance verify."""
    from event_streaming_toy_example_spark.functions.spatial import (
        proximity_join_pairs,
    )

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("pid"),
        (F.col("c_custkey") * _PX % _GRID).alias("x"),
        (F.col("c_custkey") * _PY % _GRID).alias("y"),
    )
    return proximity_join_pairs(
        pts, id_col="pid", x_col="x", y_col="y", radius=_RADIUS
    ).select(
        F.col("a_id").alias("a_custkey"),
        F.col("b_id").alias("b_custkey"),
        "dist_sq",
    )


SQL_GEO_GRID_JOIN = f"""
WITH pts AS (
  SELECT c_custkey AS pid,
         c_custkey * {_PX} % {_GRID} AS x,
         c_custkey * {_PY} % {_GRID} AS y
  FROM customer
)
SELECT a.pid AS a_custkey, b.pid AS b_custkey,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
FROM pts a JOIN pts b ON a.pid < b.pid
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_RADIUS * _RADIUS}
"""


def q_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: the event stream MERGEs into a keyed
    latest-row-per-user snapshot via ``foreachBatch`` +
    ``upsert_snapshot`` (``streaming/upsert_sink.py``), multiple
    micro-batches forced with ``maxFilesPerTrigger`` so the
    merge-into-state loop actually iterates.  The final snapshot must
    equal the batch latest-per-key — which is exactly what the oracle
    computes."""
    import tempfile
    import uuid

    from event_streaming_toy_example_spark.plans.queries_ext import (
        stage_stream_input,
    )
    from event_streaming_toy_example_spark.streaming.upsert_sink import (
        read_state,
        start_upsert_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    in_path = stage_stream_input(ev, "upsink", sf_dir)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_path)
    )
    import shutil

    base = tempfile.mkdtemp(prefix=f"upsink_{uuid.uuid4().hex[:8]}_")
    try:
        q = start_upsert_stream(
            changes,
            state_dir=f"{base}/state",
            checkpoint_dir=f"{base}/ckpt",
            keys=["user_id"],
            order_by=["ts", "event_id"],
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("upsert stream did not finish within 300 s")
        state = read_state(spark, f"{base}/state")
        if state is None:
            raise RuntimeError("upsert stream committed no state")
        # materialize the (per-key, tiny) snapshot so the state/
        # checkpoint tempdir can be removed before returning — a lazy
        # DataFrame over the tempdir would leak it per bench iteration
        out = state.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros("ts").alias("last_us"),
            F.col("event_type").alias("last_type"),
        )
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


SQL_STREAM_UPSERT_SINK = """
SELECT user_id,
       event_id AS last_event_id,
       epoch_us(ts) AS last_us,
       event_type AS last_type
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM events
) WHERE rn = 1
"""


EXT16_QUERIES = {
    "geo_grid_join": q_geo_grid_join,
    "stream_upsert_sink": q_stream_upsert_sink,
}

EXT16_ORACLES = {
    "geo_grid_join": SQL_GEO_GRID_JOIN,
    "stream_upsert_sink": SQL_STREAM_UPSERT_SINK,
}
