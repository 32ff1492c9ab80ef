"""Row-level enrichment (SURVEY.md §2.2 P1/P2/P3).

The reference enriches record-at-a-time in Python
(``toy_lambda_function.py:57-62``) and hoists ``language_id`` in its
Spark batch job (``toy_glue.py:43-45``). All of it is narrow
(shuffle-free) Catalyst projections here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def split_event_name(df: DataFrame, col: str = "event_name") -> DataFrame:
    """P1: ``event_type``/``event_subtype`` from ``"type:subtype"``.

    Parity detail (SURVEY.md §8.11): the reference uses
    ``event_name.split(":")[1]``, so the triple-colon
    ``payment:order:completed`` yields subtype ``"order"`` — ``getItem(1)``
    reproduces that exactly.
    """
    parts = F.split(F.col(col), ":")
    return df.withColumn("event_type", parts.getItem(0)).withColumn(
        "event_subtype", parts.getItem(1)
    )


def with_created_datetime(df: DataFrame, ts_col: str = "created_at") -> DataFrame:
    """P2: ISO-8601 string from the UNIX-seconds double.

    The reference formats in the machine's local timezone
    (``toy_lambda_function.py:60-62``); this engine pins UTC (session
    timezone) — local-tz output is a deployment bug, not a capability.
    Fractional seconds are preserved like ``datetime.isoformat()`` does
    (microsecond precision, trailing zeros trimmed by Python — here we
    keep a fixed 6-digit form when a fraction exists).
    """
    ts = F.timestamp_seconds(F.col(ts_col))
    return df.withColumn(
        "created_datetime", F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )


def with_language_id(df: DataFrame) -> DataFrame:
    """P3: hoist ``event_specifics.language_id`` to a top-level string
    column (partition key for the processed store).

    The reference also tries ``.drop("event_specifics.language_id")``
    which is a silent no-op in Spark (SURVEY.md §8.2); we deliberately
    keep the nested copy for output parity.
    """
    return df.withColumn(
        "language_id", F.col("event_specifics.language_id").cast("string")
    )


def enrich_events(df: DataFrame) -> DataFrame:
    """P1+P2+P3 in one projection (single narrow stage)."""
    return with_language_id(with_created_datetime(split_event_name(df)))
