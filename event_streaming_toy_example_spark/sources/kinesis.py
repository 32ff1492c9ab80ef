"""Kinesis-style envelope codec (SURVEY.md §2.1 S3/S7).

The reference JSON-serialises each event, base64-encodes it into the
``kinesis.data`` slot of an AWS Kinesis Lambda-event template, and
double-parses on the way out (reference ``producer.py:114-131,152-166``
encode; ``toy_lambda_function.py:44-46`` decode). Both directions are
single Catalyst projections here — ``to_json``/``base64`` in,
``from_json``/``unbase64`` out — so encode/decode runs in whole-stage
codegen with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from event_streaming_toy_example_spark.schemas import (
    EVENT_SCHEMA,
    KINESIS_RECORD_SCHEMA,
)

#: Envelope constants mirroring the reference's template values
#: (reference ``producer.py:114-131``).
_ENVELOPE = {
    "kinesisSchemaVersion": "1.0",
    "eventSource": "aws:kinesis",
    "eventVersion": "1.0",
    "eventName": "aws:kinesis:record",
    "invokeIdentityArn": "arn:aws:iam::EXAMPLE",
    "awsRegion": "us-east-1",
    "eventSourceARN": "arn:aws:kinesis:EXAMPLE",
}


def wrap_kinesis_envelope(events: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """S3: events (EVENT_SCHEMA columns) -> one JSON-string ``record``
    per row, shaped like an AWS Kinesis Lambda record. A micro-batch
    ``{"Records": [...]}`` is just ``collect_list(record)`` over a batch.
    ``keep`` carries extra columns through alongside ``record`` (e.g.
    an id for test-side fault injection).
    """
    payload = F.to_json(
        F.struct("created_at", "event_name", "event_specifics", "event_uuid")
    )
    kinesis = F.struct(
        F.lit(_ENVELOPE["kinesisSchemaVersion"]).alias("kinesisSchemaVersion"),
        F.col("event_uuid").alias("partitionKey"),
        F.md5(F.col("event_uuid")).alias("sequenceNumber"),
        F.base64(payload.cast("binary")).alias("data"),
        F.col("created_at").alias("approximateArrivalTimestamp"),
    )
    record = F.to_json(
        F.struct(
            kinesis.alias("kinesis"),
            F.lit(_ENVELOPE["eventSource"]).alias("eventSource"),
            F.lit(_ENVELOPE["eventVersion"]).alias("eventVersion"),
            F.concat(F.lit("shardId-000000000000:"), F.md5(F.col("event_uuid"))).alias("eventID"),
            F.lit(_ENVELOPE["eventName"]).alias("eventName"),
            F.lit(_ENVELOPE["invokeIdentityArn"]).alias("invokeIdentityArn"),
            F.lit(_ENVELOPE["awsRegion"]).alias("awsRegion"),
            F.lit(_ENVELOPE["eventSourceARN"]).alias("eventSourceARN"),
        )
    )
    return events.select(record.alias("record"), *(keep or []))


def decode_kinesis_data(record: Column) -> Column:
    """S7 as a reusable expression: Kinesis record JSON string ->
    decoded event struct (envelope parse -> base64 decode -> payload
    parse), all JVM-side."""
    envelope = F.from_json(record, KINESIS_RECORD_SCHEMA)
    payload = F.unbase64(envelope["kinesis"]["data"]).cast("string")
    return F.from_json(payload, EVENT_SCHEMA)


def decode_kinesis_records(records: DataFrame, column: str = "record") -> DataFrame:
    """S7: DataFrame with a ``record`` JSON-string column -> flattened
    EVENT_SCHEMA DataFrame."""
    ev = decode_kinesis_data(F.col(column))
    return records.select(
        ev["created_at"].alias("created_at"),
        ev["event_name"].alias("event_name"),
        ev["event_specifics"].alias("event_specifics"),
        ev["event_uuid"].alias("event_uuid"),
    )


def decode_with_dead_letter(
    records: DataFrame, column: str = "record"
) -> tuple[DataFrame, DataFrame]:
    """S7 with the error path the reference lacks (its TODO at
    ``toy_lambda_function.py:37`` admits no validation): PERMISSIVE
    decode, then route rows whose payload failed to parse (null
    ``event_uuid``) to a dead-letter DataFrame that keeps the raw
    record for replay/repair. Returns ``(valid, dead)``.

    Both branches are narrow filters over the same decoded projection —
    no shuffle, no Python; at scale each branch feeds its own sink
    (processed staging vs a DLQ directory) off one pass over the feed.
    """
    ev = decode_kinesis_data(F.col(column))
    with_ev = records.withColumn("_ev", ev)
    valid = with_ev.where(F.col("_ev.event_uuid").isNotNull()).select(
        F.col("_ev.created_at").alias("created_at"),
        F.col("_ev.event_name").alias("event_name"),
        F.col("_ev.event_specifics").alias("event_specifics"),
        F.col("_ev.event_uuid").alias("event_uuid"),
    )
    dead = with_ev.where(F.col("_ev.event_uuid").isNull()).select(column)
    return valid, dead
