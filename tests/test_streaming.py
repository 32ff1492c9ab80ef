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


def test_stream_ingest_with_dlq_routes_bad_records(spark, tmp_path):
    """foreachBatch ingest: corrupt records land raw in the DLQ dir,
    valid records are deduped and staged with enrichment columns."""
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.streaming.ingest import (
        start_ingest_stream_with_dlq,
    )

    src = str(tmp_path / "incoming")
    staging = str(tmp_path / "staging")
    dlq = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")

    events = generate_events(spark, 200, seed=5)
    feed = wrap_kinesis_envelope(
        inject_duplicates(events, rate=0.1, seed=5), keep=["event_uuid"]
    ).select(
        F.when(
            F.crc32("event_uuid") % 10 == 0,
            F.concat(F.lit("BROKEN"), F.col("record")),
        )
        .otherwise(F.col("record"))
        .alias("record")
    )
    n_bad = feed.where(F.col("record").startswith("BROKEN")).count()
    n_valid_distinct = (
        wrap_kinesis_envelope(events, keep=["event_uuid"])
        .where(F.crc32("event_uuid") % 10 != 0)
        .select("event_uuid")
        .distinct()
        .count()
    )
    feed.write.mode("overwrite").text(src)

    stream = spark.readStream.schema("record string").text(src).withColumnRenamed(
        "value", "record"
    )
    q = start_ingest_stream_with_dlq(stream, staging, dlq, ckpt, available_now=True)
    q.awaitTermination(120)

    staged = spark.read.json(staging)
    assert staged.count() == n_valid_distinct
    assert staged.where(F.col("event_uuid").isNull()).count() == 0
    assert {"event_type", "event_subtype", "created_datetime"} <= set(staged.columns)

    dead = spark.read.text(dlq)
    assert dead.count() == n_bad
    assert dead.where(~F.col("value").startswith("BROKEN")).count() == 0


def test_stream_late_data_dropped_by_watermark(spark, tmp_path):
    """Late-data handling: rows older than the watermark horizon are
    dropped by the stateful operator. Batch 1 (fresh events) advances
    the watermark; batch 2 replays events 2 days older — with a 1-hour
    watermark every one of them is late and must not reach staging."""
    import time

    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.sources import (
        generate_events,
        wrap_kinesis_envelope,
    )

    src = tmp_path / "incoming"
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    events = generate_events(spark, 200, seed=55)
    on_time = events.where(F.col("created_at") >= F.lit(0))  # all
    late = events.select(
        (F.col("created_at") - 2 * 24 * 3600).alias("created_at"),
        "event_name",
        "event_specifics",
        F.concat(F.lit("late-"), F.col("event_uuid")).alias("event_uuid"),
    )

    # batch 1: on-time events establish the watermark
    wrap_kinesis_envelope(on_time).coalesce(1).write.mode("overwrite").text(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema("record string")
        .option("maxFilesPerTrigger", "1")
        .text(str(src / "b*" / "*.txt"))
        .withColumnRenamed("value", "record")
    )
    q = start_ingest_stream(stream, staging, ckpt, watermark="1 hour",
                            available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.json(staging).count()
    assert n1 == 200

    # batch 2: replay 2-days-older events into the SAME checkpoint
    wrap_kinesis_envelope(late).coalesce(1).write.mode("overwrite").text(
        str(src / "b2")
    )
    stream2 = (
        spark.readStream.schema("record string")
        .option("maxFilesPerTrigger", "1")
        .text(str(src / "b*" / "*.txt"))
        .withColumnRenamed("value", "record")
    )
    q2 = start_ingest_stream(stream2, staging, ckpt, watermark="1 hour",
                             available_now=True)
    q2.awaitTermination(120)
    time.sleep(1)
    staged = spark.read.json(staging)
    assert staged.count() == 200, "late rows must be dropped"
    assert staged.where(staged.event_uuid.startswith("late-")).count() == 0


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


def test_kafka_shaped_source_contract(spark, tmp_path):
    """The same decode -> dedup -> enrich chain must run unchanged on a
    source carrying Kafka's exact schema (key/value binary + topic/
    partition/offset/timestamp), adapted by from_kafka_records — the
    only Kafka-specific step."""
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.streaming.ingest import (
        from_kafka_records,
        start_ingest_stream,
    )

    src = str(tmp_path / "kafka_shaped")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    events = generate_events(spark, 150, seed=11)
    feed = wrap_kinesis_envelope(
        inject_duplicates(events, rate=0.1, seed=11), keep=["event_uuid"]
    )
    kafka_schema = (
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int"
    )
    kafka_shaped = feed.select(
        F.encode(F.col("event_uuid"), "UTF-8").alias("key"),
        F.encode(F.col("record"), "UTF-8").alias("value"),
        F.lit("events").alias("topic"),
        (F.crc32("event_uuid") % 8).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )
    kafka_shaped.write.mode("overwrite").parquet(src)

    stream = from_kafka_records(spark.readStream.schema(kafka_schema).parquet(src))
    q = start_ingest_stream(
        stream, staging, ckpt, watermark="365 days", available_now=True
    )
    q.awaitTermination(120)

    staged = spark.read.json(staging)
    assert staged.count() == events.count()  # dups removed
    assert {"event_type", "event_subtype", "created_datetime"} <= set(staged.columns)


def test_dlq_ingest_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (fresh checkpoint, same input) must
    REPLACE its previous output, not append a duplicate copy — both
    sinks write mode-overwrite into ingest_batch-scoped partitions."""
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.streaming.ingest import (
        start_ingest_stream_with_dlq,
    )

    src = str(tmp_path / "incoming")
    staging = str(tmp_path / "staging")
    dlq = str(tmp_path / "dlq")

    events = generate_events(spark, 120, seed=13)
    feed = wrap_kinesis_envelope(events, keep=["event_uuid"]).select(
        F.when(
            F.crc32("event_uuid") % 10 == 0,
            F.concat(F.lit("BROKEN"), F.col("record")),
        )
        .otherwise(F.col("record"))
        .alias("record")
    )
    feed.write.mode("overwrite").text(src)

    for attempt in (1, 2):  # second run = replay with a fresh checkpoint
        stream = spark.readStream.schema("record string").text(src)
        q = start_ingest_stream_with_dlq(
            stream, staging, dlq, str(tmp_path / f"ckpt{attempt}"),
            available_now=True,
        )
        q.awaitTermination(120)

    n_bad = feed.where(F.col("record").startswith("BROKEN")).count()
    assert spark.read.text(dlq).count() == n_bad
    assert (
        spark.read.json(staging).count()
        == events.count() - events.where(F.crc32("event_uuid") % 10 == 0).count()
    )


def test_running_user_stats_gate_or_run(spark):
    """transformWithStateInPandas operator: in environments without
    protobuf (this container) the plan build must fail fast with a
    clear RuntimeError; with protobuf present it must produce the
    batch-aggregate-equal per-user totals."""
    import uuid

    import pytest
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.streaming.stateful import (
        running_user_stats,
    )

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.25),
         (1, "2024-01-01 01:00:00", 2.50),
         (2, "2024-01-01 02:00:00", 3.0)],
        "user_id bigint, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")

    from event_streaming_toy_example_spark.streaming.stateful import (
        ensure_state_v2_runtime,
    )

    if not ensure_state_v2_runtime():
        with pytest.raises(RuntimeError, match="protobuf"):
            running_user_stats(ev)
        return

    import shutil
    import tempfile

    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(d)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "user_id bigint, ts timestamp, value double"
        ).parquet(d)
        name = f"tws_{uuid.uuid4().hex[:6]}"
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = {
            r.user_id: (r.n_events, r.sum_value_cc)
            for r in spark.table(name).collect()
        }
        assert got == {1: (2, 375), 2: (1, 300)}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        shutil.rmtree(d, ignore_errors=True)


def test_upsert_sink_replay_and_checkpoint_idempotence(spark, tmp_path):
    """The streaming MERGE sink must (a) equal the batch latest-per-key
    result, (b) be a no-op when re-run over the same checkpoint, and
    (c) reproduce identical state from a fresh checkpoint (replay
    determinism)."""
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.plans.queries_ext import (
        stage_stream_input,
    )
    from event_streaming_toy_example_spark.schemas import load_table
    from event_streaming_toy_example_spark.streaming.upsert_sink import (
        read_state,
        start_upsert_stream,
    )
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    in_path = stage_stream_input(ev, "upsink_test", SF_DIR)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )

    def run(state, ckpt):
        changes = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(in_path)
        )
        q = start_upsert_stream(
            changes,
            state_dir=str(state),
            checkpoint_dir=str(ckpt),
            keys=["user_id"],
            order_by=["ts", "event_id"],
        )
        q.awaitTermination(300)
        return sorted(
            tuple(r)
            for r in read_state(spark, str(state))
            .select("user_id", "event_id")
            .collect()
        )

    got = run(tmp_path / "s1", tmp_path / "c1")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = sorted(
        (r.user_id, r.event_id)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    )
    assert got == want
    # (b) same checkpoint: no new batches, state unchanged
    assert run(tmp_path / "s1", tmp_path / "c1") == got
    # (c) fresh checkpoint + fresh state: deterministic replay
    assert run(tmp_path / "s2", tmp_path / "c2") == got


def test_upsert_sink_time_travel_versions(spark, tmp_path):
    """Retained generations are readable via read_state(version=...):
    the retention window holds, version -1 equals current, earlier
    versions are prefixes of the key history (latest-per-key row
    counts never shrink as batches accumulate), and versions outside
    the window raise."""
    import pytest
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.plans.queries_ext import (
        stage_stream_input,
    )
    from event_streaming_toy_example_spark.schemas import load_table
    from event_streaming_toy_example_spark.streaming.upsert_sink import (
        list_versions,
        read_state,
        start_upsert_stream,
    )
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    in_path = stage_stream_input(ev, "upsink_tt", SF_DIR)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(in_path)
    )
    state = tmp_path / "s"
    q = start_upsert_stream(
        changes,
        state_dir=str(state),
        checkpoint_dir=str(tmp_path / "c"),
        keys=["user_id"],
        order_by=["ts", "event_id"],
        keep_generations=3,
    )
    assert q.awaitTermination(300)
    versions = list_versions(str(state))
    assert 1 <= len(versions) <= 3
    current = sorted(
        tuple(r) for r in read_state(spark, str(state)).collect()
    )
    assert (
        sorted(tuple(r) for r in read_state(spark, str(state), -1).collect())
        == current
    )
    counts = [
        read_state(spark, str(state), i).count()
        for i in range(len(versions))
    ]
    assert counts == sorted(counts)  # latest-per-key never shrinks
    with pytest.raises(IndexError, match="outside the retained window"):
        read_state(spark, str(state), -(len(versions) + 1))


def test_upsert_sink_rejects_zero_retention(spark, tmp_path):
    import pytest

    from event_streaming_toy_example_spark.streaming.upsert_sink import (
        start_upsert_stream,
    )

    # validation fires before any stream machinery, so a batch frame
    # stands in for the changes stream
    changes = spark.range(1)
    with pytest.raises(ValueError, match="keep_generations"):
        start_upsert_stream(
            changes,
            state_dir=str(tmp_path / "s"),
            checkpoint_dir=str(tmp_path / "c"),
            keys=["user_id"],
            order_by=["ts"],
            keep_generations=0,
        )


def test_running_user_stats_multibatch_state_carries(spark, tmp_path):
    """State must CARRY across micro-batches: two files processed as
    two batches accumulate into one running total per user, and the
    newest update row per user equals the all-data batch aggregate."""
    import uuid

    import pytest
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.streaming.stateful import (
        ensure_state_v2_runtime,
        running_user_stats,
    )

    if not ensure_state_v2_runtime():
        pytest.skip("no protobuf runtime available for state-v2")

    def _ev(rows):
        return spark.createDataFrame(
            rows, "user_id bigint, ts_s string, value double"
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        )

    d = str(tmp_path / "in")
    _ev([(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:30:00", 2.0)]
        ).coalesce(1).write.mode("overwrite").parquet(d)
    _ev([(1, "2024-01-01 01:00:00", 4.0)]
        ).coalesce(1).write.mode("append").parquet(d)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)  # force one batch per file
            .parquet(d)
        )
        name = f"tws_mb_{uuid.uuid4().hex[:6]}"
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        rows = spark.table(name).collect()
        # user 1 appears in two batches -> two update rows, running
        latest = {}
        for r in rows:
            cur = latest.get(r.user_id)
            if cur is None or r.n_events > cur[0]:
                latest[r.user_id] = (r.n_events, r.sum_value_cc, r.last_ts_us)
        assert latest[1] == (2, 500, 1704070800000000)
        assert latest[2] == (1, 200, 1704069000000000)
        assert sum(1 for r in rows if r.user_id == 1) == 2
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
