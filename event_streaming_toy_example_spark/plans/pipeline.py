"""End-to-end batch pipeline ("glue" compaction) — SURVEY.md §3.3 rebuilt.

Reference flow (``toy_glue.py:19-75``): glob current hour's staging ->
schema-inference scan -> imposed-schema read -> language_id hoist ->
duplicate-count action -> conditional dropDuplicates -> repartition(2)
-> partitioned Parquet write. That is 3 jobs and 2 full recomputations
of the same plan (no caching — SURVEY.md §3.3/§4).

This engine runs ONE job: the duplicate metric rides the write via
``df.observe`` (no second scan), the schema is pinned (no inference
scan), dedup is unconditional (dropDuplicates on a clean batch is the
same shuffle the metric needs anyway), and partition layout comes from
event time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from event_streaming_toy_example_spark.operators.dedup import dedup_exact
from event_streaming_toy_example_spark.operators.enrich import enrich_events
from event_streaming_toy_example_spark.operators.metrics import (
    PipelineMetrics,
    dir_size_mbytes,
)
from event_streaming_toy_example_spark.sources.kinesis import decode_kinesis_records
from event_streaming_toy_example_spark.sources.ndjson import (
    read_staged_events,
    write_staged_events,
)


@dataclass
class BatchResult:
    input_rows: int
    output_rows: int
    batch_duplicates: int


def run_reference_pipeline(
    spark: SparkSession,
    workdir: str,
    run_seconds: float = 5.0,
    rows_per_second: int = 278,
    trigger_seconds: int | None = None,
    watermark: str = "365 days",
    seed: int = 42,
) -> "PipelineMetrics":
    """C1: the reference's driver loop (reference
    ``run_toy_example.py:21-49`` — 278 ev/s for a minute, then one glue
    batch, then a CloudWatch report, forever) as ONE streaming query
    plus a compaction pass and a Markdown report.

    - ``rate`` source at ``rows_per_second`` drives the seeded
      generator + Kinesis envelope (S1-S3),
    - the ingest stream decodes, dedups within the watermark, enriches,
      and stages partitioned NDJSON (S7, D1, P1/P2/P5, K1/K2),
    - a ``StreamingQueryListener`` folds per-batch progress into the
      metrics dataclass (A2),
    - ``compact_staging`` runs the batch dedup -> Parquet job (the
      per-minute "glue" call) and the report is appended (K4).

    ``run_seconds`` bounds the demo; production would omit the stop and
    let the trigger cadence run forever exactly like the reference loop.
    """
    import time

    from event_streaming_toy_example_spark.streaming.ingest import (
        rate_event_source,
        start_ingest_stream,
    )
    from event_streaming_toy_example_spark.streaming.metrics_listener import (
        PipelineMetricsListener,
    )

    staging = f"{workdir}/staging"
    processed = f"{workdir}/processed"
    report = f"{workdir}/cloudwatch_report.md"

    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    try:
        records = rate_event_source(spark, rows_per_second, seed)
        q = start_ingest_stream(
            records,
            staging,
            f"{workdir}/ckpt",
            watermark=watermark,
            trigger_seconds=trigger_seconds,
        )
        # run at least ``run_seconds`` AND until at least one batch of
        # events has actually been ingested (query startup can eat the
        # first seconds); hard-capped so a wedged stream can't hang us.
        soft = time.monotonic() + run_seconds
        hard = time.monotonic() + max(run_seconds * 10, 60.0)
        while q.isActive and (
            time.monotonic() < soft
            or (
                listener.metrics.ingested_events == 0
                and time.monotonic() < hard
            )
        ):
            time.sleep(0.25)
        q.stop()
        q.awaitTermination(60)
    finally:
        spark.streams.removeListener(listener)

    m = listener.metrics
    staged_rows = spark.read.schema("event_uuid string").json(staging).count()
    if staged_rows:
        compact_staging(spark, staging, processed, metrics=m)
    # a forced stop can abort the last micro-batch AFTER its progress
    # event fired (listener over-counts), and compaction adds its own
    # output count — the durable staging count is the single truth for
    # "ingested"; reconcile so the report reflects committed rows only.
    m.ingested_events = staged_rows
    m.used_staging_storage_in_mbytes = dir_size_mbytes(staging)
    from event_streaming_toy_example_spark.operators.metrics import (
        append_markdown_report,
    )

    append_markdown_report(m.finalize(), report)
    return m


def ingest_batch(records: DataFrame, staging_path: str,
                 metrics: PipelineMetrics | None = None) -> None:
    """The "lambda" path as one batch write (SURVEY.md §3.2): decode
    Kinesis records -> enrich -> partitioned NDJSON staging.

    Streaming-dedup lives in ``streaming/ingest.py``; the batch variant
    stages everything and lets compaction dedup (two-tier design the
    reference README itself argues for).
    """
    events = decode_kinesis_records(records)
    enriched = enrich_events(events)
    write_staged_events(enriched.drop("language_id"), staging_path)
    if metrics is not None:
        metrics.lambda_invocations += 1
        metrics.used_staging_storage_in_mbytes = dir_size_mbytes(staging_path)


def compact_staging(
    spark: SparkSession,
    staging_path: str,
    processed_path: str,
    where: str | None = None,
    metrics: PipelineMetrics | None = None,
    incremental: bool = False,
) -> BatchResult:
    """The "glue" job: staged NDJSON -> dedup -> the processed
    TRANSACTIONAL TABLE (``operators/txtable.py``), with the duplicate
    metric observed on the same single pass.

    Round 6 migrated the processed store from a plain partitioned
    parquet directory onto the unified commit log, so the flagship
    pipeline and the table operators share ONE table stack: the full
    compaction is one atomic ``tx_replace_where(None)`` (idempotent
    overwrite, readers pinned to the previous version are undisturbed),
    and the incremental shape is one atomic REPLACE per touched
    event-time partition — Delta's ``replaceWhere`` unit, idempotent
    per batch.  Event-time partition values stay DATA columns; a reader
    filtering on them prunes via the log's per-file stats
    (:func:`txtable.prune_files`) instead of directory layout.

    ``incremental=True`` + a ``where`` partition filter is the hourly
    production shape: read ONLY the selected staging partitions
    (pruned at the scan) and replace ONLY the processed partitions this
    batch touches — the rest of the store is never read or rewritten.
    """
    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.sources.ndjson import (
        with_time_partitions,
    )

    staged = read_staged_events(spark, staging_path, where=where)
    # partition cols come back from partition discovery; drop them so the
    # write re-derives from event time (identical values, but keeps the
    # staged schema the single source of truth).
    staged = staged.drop("year", "month", "day", "hour", "minute")

    from event_streaming_toy_example_spark.operators.enrich import with_language_id

    enriched = with_language_id(staged)

    if not incremental:
        obs_in = Observation("compact_in")
        observed = enriched.observe(obs_in, F.count(F.lit(1)).alias("rows"))
        deduped = dedup_exact(observed, ["event_uuid"])
        obs_out = Observation("compact_out")
        final = with_time_partitions(
            deduped.observe(obs_out, F.count(F.lit(1)).alias("rows"))
        )
        tx.tx_replace_where(spark, processed_path, final, None)
        input_rows = int(obs_in.get["rows"])
        output_rows = int(obs_out.get["rows"])
    else:
        enriched = enriched.persist()
        input_rows = int(enriched.count())
        final = with_time_partitions(
            dedup_exact(enriched, ["event_uuid"])
        ).persist()
        output_rows = int(final.count())
        # one atomic REPLACE per touched partition (the hourly job
        # touches one; a backfill touches a bounded handful) — each
        # commit independently idempotent, exactly the partition-level
        # replay contract dynamic partition overwrite gave the old
        # directory store
        touched = (
            final.where(F.col("year").isNotNull())
            .select("year", "month", "day", "hour")
            .distinct()
            .collect()
        )
        for t in touched:
            clauses = [
                ("year", "=", t["year"]),
                ("month", "=", t["month"]),
                ("day", "=", t["day"]),
                ("hour", "=", t["hour"]),
            ]
            tx.tx_replace_where(
                spark,
                processed_path,
                final.where(
                    (F.col("year") == t["year"])
                    & (F.col("month") == t["month"])
                    & (F.col("day") == t["day"])
                    & (F.col("hour") == t["hour"])
                ),
                clauses,
            )
        # rows with NULL created_at derive NULL time partitions — they
        # match no partition-equality clause, so without an explicit
        # NULL-region REPLACE the incremental mode would silently drop
        # them while still counting them (the non-incremental path and
        # the old dynamic-partition-overwrite both kept them)
        null_part = final.where(F.col("year").isNull())
        if not null_part.isEmpty():
            tx.tx_replace_where(
                spark, processed_path, null_part, [("year", "isnull", None)]
            )
        enriched.unpersist()
        final.unpersist()

    dups = input_rows - output_rows
    if metrics is not None:
        metrics.glue_invocations += 1
        metrics.batch_duplicates += dups
        metrics.ingested_events += output_rows
        metrics.used_processed_storage_in_mbytes = dir_size_mbytes(processed_path)
    return BatchResult(input_rows, output_rows, dups)


def read_processed(
    spark: SparkSession,
    processed_path: str,
    version: int | None = None,
    where=None,
):
    """Snapshot read of the processed transactional table (time travel
    via ``version``; ``where`` = ``(col, op, value)`` clauses pruned by
    the log's per-file stats before touching parquet)."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    return tx.read_table(spark, processed_path, version, where)
