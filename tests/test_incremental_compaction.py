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
