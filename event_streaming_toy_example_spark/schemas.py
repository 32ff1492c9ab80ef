"""Fixed schema constants.

The reference *infers* its event schema from a 500-row sample on every
batch run (reference ``toy_glue.py:36-38``) — a full extra scan job and a
correctness hazard (sampled inference silently drops the enrichment
columns, SURVEY.md §8.6). This engine pins the schemas as constants and
never infers in production paths; ``infer_event_schema`` is kept only as
a compatibility utility.

``EVENT_SPECIFICS_FIELDS`` is the empirically-ground-truth 30-field
struct from FIXTURES.md §2 (reference ``event_config.yml`` as realised by
``producer.py:23-86``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, types as T

# ---------------------------------------------------------------------------
# Raw event (reference producer.py:90-101, FIXTURES.md §1-2)
# ---------------------------------------------------------------------------

# (name, spark type) in the alphabetical order Spark's own inference
# produces — keeping that order makes schema-equality checks trivial.
_SPECIFICS = [
    ("account_id", T.StringType()),
    ("amount", T.LongType()),
    ("attempts", T.LongType()),
    ("campaign_id", T.StringType()),
    ("currency", T.StringType()),
    ("days_active", T.LongType()),
    ("days_into_trial", T.LongType()),
    ("device", T.StringType()),
    ("difficulty", T.StringType()),
    ("duration", T.LongType()),
    ("e-mail", T.StringType()),
    ("email", T.StringType()),
    ("end_time", T.StringType()),
    ("exercise_id", T.StringType()),
    ("failcount", T.LongType()),
    ("feedback", T.StringType()),
    ("language_id", T.StringType()),
    ("last_login_time", T.StringType()),
    ("lesson_id", T.StringType()),
    ("rating", T.LongType()),
    ("referree_id", T.StringType()),
    ("registration_method", T.StringType()),
    ("resume_time", T.StringType()),
    ("score", T.LongType()),
    ("selected_language_id", T.StringType()),
    ("session_id", T.StringType()),
    ("start_time", T.StringType()),
    ("un_selected_language_id", T.StringType()),
    ("user_id", T.StringType()),
    ("user_location", T.StringType()),
]

EVENT_SPECIFICS_SCHEMA = T.StructType(
    [T.StructField(name, dtype, True) for name, dtype in _SPECIFICS]
)

#: Schema of a raw event as produced by the generator / decoded from the
#: Kinesis envelope (field order = Spark's inferred order).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("created_at", T.DoubleType(), True),
        T.StructField("event_name", T.StringType(), True),
        T.StructField("event_specifics", EVENT_SPECIFICS_SCHEMA, True),
        T.StructField("event_uuid", T.StringType(), True),
    ]
)

#: Staged record = raw event + enrichment columns (FIXTURES.md §4).
#: Unlike the reference (which silently drops these on read-back,
#: SURVEY.md §8.6), this engine carries them through to Parquet.
STAGED_EVENT_SCHEMA = T.StructType(
    list(EVENT_SCHEMA.fields)
    + [
        T.StructField("event_type", T.StringType(), True),
        T.StructField("event_subtype", T.StringType(), True),
        T.StructField("created_datetime", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Kinesis envelope (reference producer.py:114-131, FIXTURES.md §3)
# ---------------------------------------------------------------------------

KINESIS_RECORD_SCHEMA = T.StructType(
    [
        T.StructField(
            "kinesis",
            T.StructType(
                [
                    T.StructField("kinesisSchemaVersion", T.StringType(), True),
                    T.StructField("partitionKey", T.StringType(), True),
                    T.StructField("sequenceNumber", T.StringType(), True),
                    T.StructField("data", T.StringType(), True),
                    T.StructField(
                        "approximateArrivalTimestamp", T.DoubleType(), True
                    ),
                ]
            ),
            True,
        ),
        T.StructField("eventSource", T.StringType(), True),
        T.StructField("eventVersion", T.StringType(), True),
        T.StructField("eventID", T.StringType(), True),
        T.StructField("eventName", T.StringType(), True),
        T.StructField("invokeIdentityArn", T.StringType(), True),
        T.StructField("awsRegion", T.StringType(), True),
        T.StructField("eventSourceARN", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — pinned so streaming sources and
# tests never infer.
# ---------------------------------------------------------------------------

EVENTS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one driver testdata table (column-pruning/pushdown friendly).

    Timestamp normalization: generated testdata has shipped both as
    nanosecond Parquet timestamps (Spark 4 refuses by default,
    PARQUET_TYPE_ILLEGAL — read nanos as long via the legacy conf and
    floor-divide to micros, identical to DuckDB's ns->us truncation)
    and as timezone-naive ``timestamp[us]`` (Spark reads TIMESTAMP_NTZ;
    DuckDB reads plain naive TIMESTAMP). Every engine-side query and
    oracle assumes a session-timezone TimestampType, so NTZ columns are
    cast to ``timestamp`` — the session runs in UTC (``session.py``),
    making the cast a wall-clock identity that matches DuckDB's naive
    interpretation."""
    from pyspark.sql import functions as F

    # prefer fixing the type at the scan (keeps ts predicate pushdown
    # intact); the cast loop below only fires if this conf is unavailable.
    # The driver may hand us a session it configured itself, so the confs
    # must be set here — but save/restore them so a table loader doesn't
    # permanently change NTZ inference for unrelated reads in the session.
    wanted = {"spark.sql.parquet.inferTimestampNTZ.enabled": "false"}
    if name == "events":
        wanted["spark.sql.legacy.parquet.nanosAsLong"] = "true"
    saved: dict[str, str | None] = {}
    for k, v in wanted.items():
        try:
            saved[k] = spark.conf.get(k, None)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    df = None
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # force schema resolution while the confs are active — the scan
        # schema is fixed at analysis time, so later execution is safe
        df.schema
    finally:
        nano_hit = (
            df is not None
            and name == "events"
            and isinstance(df.schema["ts"].dataType, T.LongType)
        )
        for k, prior in saved.items():
            if k == "spark.sql.legacy.parquet.nanosAsLong" and nano_hit:
                # the executor-side reader consults this conf at action
                # time; restoring it would fail the scan of nano data
                continue
            if prior is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prior)
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_testdata_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register every testdata table as a temp view so arbitrary
    ``spark.sql`` text runs against them — the one-call setup for a
    user moving SQL workloads onto this engine."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def infer_event_schema(spark: SparkSession, sample_path: str) -> T.StructType:
    """Compatibility shim for the reference's sample-based inference
    (reference ``toy_glue.py:36``). Not used in production paths."""
    return spark.read.json(sample_path).schema
