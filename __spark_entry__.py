"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship end-to-end pipeline slice on sf0.001;
``queries``/``oracle_sql`` expose the SURVEY.md §2 + extension operator
catalog (implemented in ``event_streaming_toy_example_spark.plans``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference pipeline end to end on the sf0.001
    events table — Kinesis-envelope encode -> base64 decode -> exact
    dedup of an injected-duplicate stream -> event-time enrichment ->
    hourly counts (scan/codec/dedup/shuffle/agg in one plan)."""
    from event_streaming_toy_example_spark.operators.dedup import dedup_exact
    from event_streaming_toy_example_spark.sources.kinesis import (
        decode_kinesis_records,
        wrap_kinesis_envelope,
    )

    from event_streaming_toy_example_spark.schemas import load_table

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("double").alias("created_at"),
        F.col("event_type").alias("event_name"),
        F.struct(F.col("props").alias("language_id")).alias("event_specifics"),
        F.col("event_id").cast("string").alias("event_uuid"),
    )
    with_dups = ev.unionAll(ev.where(F.col("event_uuid").cast("long") % 20 == 0))
    decoded = decode_kinesis_records(wrap_kinesis_envelope(with_dups))
    deduped = dedup_exact(decoded, ["event_uuid"])
    ts = F.timestamp_seconds(F.col("created_at"))
    return (
        deduped.groupBy(
            F.date_format(ts, "yyyy-MM-dd HH:00:00").alias("hour"),
            F.col("event_name").alias("event_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("hour", "event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """PRIMARY catalog: exactly the ≤50 driver-verified entries, one
    per distinct capability.  The trimmed EXTENDED surface variants
    stay implemented and locally oracle-replayed — see
    ``plans/catalog.py`` for the split and ``docs/CATALOG.md`` for
    the per-entry rationale."""
    from event_streaming_toy_example_spark.plans.catalog import PRIMARY_QUERIES

    return dict(PRIMARY_QUERIES)


def oracle_sql() -> dict[str, str]:
    from event_streaming_toy_example_spark.plans.catalog import PRIMARY_ORACLES

    return dict(PRIMARY_ORACLES)
