"""End-to-end batch pipeline: envelope -> staging -> compaction -> parquet.

Ports the observable behaviors of the reference's unit tests
(FIXTURES.md §6) onto the Spark-native pipeline: dedup counters, the
all-duplicates path, NDJSON staging format, and partitioned output.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.dedup import (
    count_duplicate_keys,
    dedup_keep_first,
)
from event_streaming_toy_example_spark.operators.enrich import enrich_events
from event_streaming_toy_example_spark.operators.metrics import PipelineMetrics
from event_streaming_toy_example_spark.plans.pipeline import (
    compact_staging,
    ingest_batch,
)
from event_streaming_toy_example_spark.sources import (
    generate_events,
    inject_duplicates,
    wrap_kinesis_envelope,
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("pipe")
    staging = str(base / "staging")
    processed = str(base / "processed")
    events = generate_events(spark, 400, seed=11)
    records = wrap_kinesis_envelope(inject_duplicates(events, rate=0.05, seed=11))
    metrics = PipelineMetrics()
    ingest_batch(records, staging, metrics=metrics)
    return spark, staging, processed, events, metrics


def test_ingest_writes_partitioned_ndjson(staged):
    spark, staging, _, events, metrics = staged
    assert metrics.lambda_invocations == 1
    assert metrics.used_staging_storage_in_mbytes > 0
    # staged files are real NDJSON: one JSON object per line
    files = [str(p) for p in __import__("pathlib").Path(staging).rglob("*.json")]
    assert files, "no staged json files"
    with open(files[0]) as fh:
        line = fh.readline().strip()
    obj = json.loads(line)
    assert "event_uuid" in obj and "event_type" in obj and "created_datetime" in obj
    # hive layout by event time
    assert any("year=" in f and "hour=" in f for f in files)


def test_compaction_dedups_and_partitions(staged):
    spark, staging, processed, events, metrics = staged
    res = compact_staging(spark, staging, processed, metrics=metrics)
    n = events.count()
    assert res.output_rows == n
    assert res.batch_duplicates == res.input_rows - n > 0
    assert metrics.batch_duplicates == res.batch_duplicates
    from event_streaming_toy_example_spark.plans.pipeline import read_processed

    out = read_processed(spark, processed)
    assert out.count() == n
    assert {"language_id", "event_type", "event_subtype", "created_datetime"} <= set(
        out.columns
    )
    # enrichment columns survive the round-trip (fixes reference §8.6)
    langs = {r["language_id"] for r in out.select("language_id").distinct().collect()}
    assert "not_applicable" in langs and any(l.startswith("lang_") for l in langs)


def test_duplicate_key_count_metric(spark):
    ev = generate_events(spark, 300, seed=3)
    dup = inject_duplicates(ev, rate=0.1, seed=3)
    n_dup_keys = count_duplicate_keys(dup, "event_uuid")
    assert n_dup_keys == dup.count() - ev.count()  # injector adds each key once
    assert count_duplicate_keys(ev, "event_uuid") == 0


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 3, "x"), ("a", 1, "y"), ("b", 2, "z")], ["k", "ord", "v"]
    )
    out = {(r["k"], r["ord"], r["v"]) for r in dedup_keep_first(df, "k", "ord").collect()}
    assert out == {("a", 1, "y"), ("b", 2, "z")}


def test_enrich_semantics(spark):
    ev = generate_events(spark, 500, seed=5)
    enr = enrich_events(ev)
    pay = enr.where(F.col("event_type") == "payment").limit(1).collect()
    if pay:
        assert pay[0]["event_subtype"] == "order"
    row = enr.limit(1).collect()[0]
    # ISO-8601 UTC string with microseconds
    assert "T" in row["created_datetime"] and "." in row["created_datetime"]


def test_stage_once_fingerprint_invalidation(spark, tmp_path):
    """Staged artifacts must be keyed on source content: same key+dir
    reuses the staging dir; touching the source data (mtime change)
    yields a fresh one. The build callable must run only on a miss."""
    import os

    from event_streaming_toy_example_spark.plans.queries_ext import stage_once

    src = tmp_path / "src"
    src.mkdir()
    f = src / "t.parquet"
    spark.range(5).write.mode("overwrite").parquet(str(f))

    calls = []

    def build():
        calls.append(1)
        return spark.range(3)

    p1 = stage_once(build, "sotest", str(src))
    p2 = stage_once(build, "sotest", str(src))
    assert p1 == p2 and len(calls) == 1
    assert spark.read.parquet(p1).count() == 3

    # content change at the same path -> new fingerprint -> rebuild
    part = next(
        q for q in f.rglob("*.parquet") if q.is_file()
    )
    os.utime(part, ns=(1, 1))
    p3 = stage_once(build, "sotest", str(src))
    assert p3 != p1 and len(calls) == 2
