"""NDJSON staging IO (SURVEY.md §2.1 S5/S6, §2.6 K1/K2).

The reference appends one ``json.dumps`` line at a time to files under
hand-built ``year=/month=/day=/hour=/minute=`` directories (reference
``toy_lambda_function.py:9-29``) and reads them back with a glob + an
imposed sample-inferred schema (``toy_glue.py:28-38``). Here staging is
Spark's JSON source/sink with the *pinned* staged-event schema and real
Hive-style partitioning — partition pruning replaces the manual glob,
and the enrichment columns survive the round-trip (the reference
silently drops them, SURVEY.md §8.6).

Scale note: partition columns are derived from **event time**, not the
ingest wall clock (reference quirk §8.1) — a backfill lands in the right
partitions by construction. Minute-grain staging is supported for parity
but hour-grain is the default (minute-grain at 100 TB = millions of tiny
directories; the reference itself flags minute as a toy-only choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import STAGED_EVENT_SCHEMA

#: Event-time partition grains.
PARTITION_COLS_HOUR = ["year", "month", "day", "hour"]
PARTITION_COLS_MINUTE = PARTITION_COLS_HOUR + ["minute"]


def with_time_partitions(df: DataFrame, ts_col: str = "created_at",
                         minute_grain: bool = False) -> DataFrame:
    """P5: derive integer partition columns from the event timestamp
    (seconds-since-epoch double)."""
    ts = F.timestamp_seconds(F.col(ts_col))
    out = (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
        .withColumn("hour", F.hour(ts))
    )
    if minute_grain:
        out = out.withColumn("minute", F.minute(ts))
    return out


def write_staged_events(df: DataFrame, path: str, mode: str = "append",
                        minute_grain: bool = False) -> None:
    """K1/K2: partitioned NDJSON staging write. Spark's JSON sink emits
    one JSON object per line (NDJSON) and creates the ``year=.../...``
    directories via ``partitionBy`` — the reference's ``os.makedirs`` +
    per-line append collapses into one declarative write."""
    cols = PARTITION_COLS_MINUTE if minute_grain else PARTITION_COLS_HOUR
    staged = with_time_partitions(df, minute_grain=minute_grain)
    staged.write.mode(mode).partitionBy(*cols).json(path)


def write_sample_json(df: DataFrame, path: str, n: int = 500,
                      indent: int = 4) -> int:
    """K5: pretty-printed JSON sample sink (reference
    ``producer.py:134-139,170-173`` writes 500 events with
    ``indent=4, ensure_ascii=False``). A bounded ``take`` feeds a
    driver-side writer — this is a debugging/fixture sink, never a data
    path, so the driver bottleneck is by design. Returns rows written."""
    import json

    rows = [r.asDict(recursive=True) for r in df.limit(n).collect()]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=indent, ensure_ascii=False, default=str)
    return len(rows)


def read_staged_events(spark: SparkSession, path: str,
                       where: str | None = None) -> DataFrame:
    """S6: read the staging area with the pinned schema (no inference
    job). ``where`` may filter on partition columns, e.g.
    ``"year=2024 AND month=3 AND day=5 AND hour=14"`` — Catalyst prunes
    to just those directories (replaces the reference's manual glob of
    the current hour, ``toy_glue.py:28-32``)."""
    df = spark.read.schema(STAGED_EVENT_SCHEMA).option("basePath", path).json(path)
    if where:
        df = df.where(where)
    return df
