"""Incremental (dynamic-partition-overwrite) compaction: a later batch
must replace only the partitions it touches; earlier output survives."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.plans.pipeline import (
    compact_staging,
    read_processed,
)
from event_streaming_toy_example_spark.sources import generate_events
from event_streaming_toy_example_spark.operators.enrich import enrich_events
from event_streaming_toy_example_spark.sources.ndjson import write_staged_events


def test_incremental_compaction_preserves_other_partitions(spark, tmp_path):
    staging = str(tmp_path / "staging")
    processed = str(tmp_path / "processed")

    events = enrich_events(generate_events(spark, 400, seed=77)).drop(
        "language_id"
    )
    write_staged_events(events, staging)

    # full first compaction
    r1 = compact_staging(spark, staging, processed)
    base = read_processed(spark, processed)
    total1 = base.count()
    assert total1 == r1.output_rows

    # pick one staged hour and re-compact ONLY it, incrementally
    hours = [
        (r["year"], r["month"], r["day"], r["hour"])
        for r in base.select("year", "month", "day", "hour").distinct().collect()
    ]
    assert len(hours) > 1, "need multiple hour partitions for the test"
    y, m, d, h = hours[0]
    where = f"year={y} AND month={m} AND day={d} AND hour={h}"
    r2 = compact_staging(spark, staging, processed, where=where, incremental=True)
    assert 0 < r2.output_rows < total1

    after = read_processed(spark, processed)
    # nothing lost: every partition (incl. untouched ones) still there
    assert after.count() == total1
    assert (
        after.select("year", "month", "day", "hour").distinct().count()
        == len(hours)
    )
    # and the touched partition was idempotently replaced, not doubled
    touched = after.where(
        (F.col("year") == y)
        & (F.col("month") == m)
        & (F.col("day") == d)
        & (F.col("hour") == h)
    )
    assert touched.count() == r2.output_rows


def test_incremental_compaction_keeps_null_created_at_rows(spark, tmp_path):
    """Rows with NULL created_at derive NULL time partitions; the
    incremental mode must keep them via an explicit NULL-region REPLACE
    (ADVICE r6: they matched no partition-equality clause and were
    silently dropped while still being counted)."""
    staging = str(tmp_path / "staging")
    processed = str(tmp_path / "processed")
    events = enrich_events(generate_events(spark, 60, seed=5)).drop(
        "language_id"
    )
    victim = events.select(F.min("event_uuid").alias("u")).collect()[0]["u"]
    events = events.withColumn(
        "created_at",
        F.when(F.col("event_uuid") == victim, F.lit(None)).otherwise(
            F.col("created_at")
        ),
    )
    write_staged_events(events, staging)

    r = compact_staging(spark, staging, processed, incremental=True)
    after = read_processed(spark, processed)
    # nothing silently dropped: the store holds exactly what was counted
    assert after.count() == r.output_rows == 60
    assert after.where(F.col("created_at").isNull()).count() == 1
    # replaying the same batch is idempotent for the NULL region too
    compact_staging(spark, staging, processed, incremental=True)
    assert read_processed(spark, processed).count() == 60
