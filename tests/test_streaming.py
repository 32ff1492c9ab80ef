"""Structured Streaming ingest: watermarked dedup, file staging sink."""

from __future__ import annotations

import json
import pathlib

from event_streaming_toy_example_spark.sources import (
    generate_events,
    inject_duplicates,
    wrap_kinesis_envelope,
)
from event_streaming_toy_example_spark.streaming.ingest import start_ingest_stream


def test_stream_ingest_dedups_and_stages(spark, tmp_path):
    """File-source streaming run: duplicates injected upstream are
    removed by dropDuplicatesWithinWatermark; staged layout is
    hive-partitioned NDJSON with enrichment columns."""
    src = str(tmp_path / "incoming")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    events = generate_events(spark, 300, seed=21)
    records = wrap_kinesis_envelope(inject_duplicates(events, rate=0.08, seed=21))
    records.write.mode("overwrite").text(src)

    stream = spark.readStream.schema("record string").text(src).withColumnRenamed(
        "value", "record"
    )
    q = start_ingest_stream(
        stream, staging, ckpt, watermark="365 days", available_now=True
    )
    q.awaitTermination(120)

    staged = spark.read.json(staging)
    assert staged.count() == events.count()  # all dups removed
    assert {"event_type", "event_subtype", "created_datetime"} <= set(staged.columns)

    files = list(pathlib.Path(staging).rglob("*.json"))
    assert any("year=" in str(f) for f in files)
    obj = json.loads(open(files[0]).readline())
    assert "event_uuid" in obj


def test_stream_metrics_listener(spark, tmp_path):
    from event_streaming_toy_example_spark.streaming.metrics_listener import (
        PipelineMetricsListener,
    )

    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "in")
        events = generate_events(spark, 50, seed=33)
        wrap_kinesis_envelope(events).write.mode("overwrite").text(src)
        stream = spark.readStream.schema("record string").text(src).withColumnRenamed(
            "value", "record"
        )
        q = start_ingest_stream(
            stream,
            str(tmp_path / "stage"),
            str(tmp_path / "ck"),
            available_now=True,
        )
        q.awaitTermination(120)
        # listener is async; poll briefly
        import time

        for _ in range(20):
            if listener.metrics.lambda_invocations > 0:
                break
            time.sleep(0.5)
        assert listener.metrics.lambda_invocations >= 1
    finally:
        spark.streams.removeListener(listener)
