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
from event_streaming_toy_example_spark.operators.partitioning import (
    write_processed_parquet,
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
) -> BatchResult:
    """The "glue" job: staged NDJSON -> dedup -> partitioned Parquet,
    with the duplicate metric observed on the same single pass.
    """
    staged = read_staged_events(spark, staging_path, where=where)
    # partition cols come back from partition discovery; drop them so the
    # write re-derives from event time (identical values, but keeps the
    # staged schema the single source of truth).
    staged = staged.drop("year", "month", "day", "hour", "minute")

    from event_streaming_toy_example_spark.operators.enrich import with_language_id

    enriched = with_language_id(staged)

    obs_in = Observation("compact_in")
    observed = enriched.observe(obs_in, F.count(F.lit(1)).alias("rows"))
    deduped = dedup_exact(observed, ["event_uuid"])
    obs_out = Observation("compact_out")
    final = deduped.observe(obs_out, F.count(F.lit(1)).alias("rows"))

    write_processed_parquet(final, processed_path)

    input_rows = int(obs_in.get["rows"])
    output_rows = int(obs_out.get["rows"])
    dups = input_rows - output_rows
    if metrics is not None:
        metrics.glue_invocations += 1
        metrics.batch_duplicates += dups
        metrics.ingested_events += output_rows
        metrics.used_processed_storage_in_mbytes = dir_size_mbytes(processed_path)
    return BatchResult(input_rows, output_rows, dups)
