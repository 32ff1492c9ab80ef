"""Round-4 additions (fifteenth wave): two more SOURCE surfaces —
native XML (new in Spark 4) and the ``binaryFile`` datasource (the
ingestion path for raw multimodal assets).

- ``source_xml_roundtrip`` — Spark 4 ships the (formerly external)
  XML datasource natively: write the orders table as row-tagged XML,
  read it back under an IMPOSED schema (XML schema inference coerces
  numeric-looking strings, so production reads pin types exactly like
  the NDJSON path, ``sources/ndjson.py``), aggregate.  The oracle
  computes the same aggregate from the parquet base table, so the
  whole roundtrip — serializer, row tags, typed re-parse — is
  value-hash-checked.

- ``source_binaryfile_ingest`` — ``format("binaryFile")`` is how raw
  image/audio/video assets enter a pipeline before any codec runs
  (one row per file: path, length, content).  Staged deterministic
  binary files (content is a pure function of the file index) are
  read back and checksummed ENTIRELY JVM-side: hex(content) then a
  ``transform``/``aggregate`` fold over byte pairs — no Python in the
  hot path.  The oracle reconstructs length and byte-sum
  arithmetically from the same generator formula, so the source's
  content fidelity is value-hash-checked end to end.

Scale notes (100 TB): binaryFile parallelizes per file (each file is
one row; ``maxPartitionBytes`` groups small files per task) — the
pattern at scale is exactly this: scan file rows, keep ``content``
inside JVM expressions or hand it to an Arrow batch, never collect.
XML write/read is row-tag streaming on both sides and partitions like
any text source.  Staging is pay-once (``stage_dir_once``).

Reference parity: the reference ingests only Kinesis-wrapped NDJSON
(``producer.py:120-146``); these are engine-surface extensions like
the ORC/CSV wave (SURVEY §2.8).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_dir_once,
)
from event_streaming_toy_example_spark.schemas import load_table

# ------------------------------------------------- XML roundtrip


def q_source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders as row-tagged XML, read back with an imposed
    schema, aggregate; the oracle aggregates the parquet base table."""
    orders = load_table(spark, sf_dir, "orders")
    proj = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias(
            "totalprice_cc"
        ),
    )
    path = stage_dir_once(
        lambda tmp: proj.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(tmp),
        "orders_xml",
        sf_dir,
    )
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("totalprice_cc", T.LongType()),
        ]
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(schema)
        .load(path)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("totalprice_cc").alias("sum_price_cc"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


SQL_SOURCE_XML_ROUNDTRIP = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cc,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
FROM orders GROUP BY o_orderstatus
"""

# ------------------------------------------------- binaryFile ingest

_BF_N_FILES = 64
#: file i holds _bf_len(i) bytes; byte j is (i*7 + j*13) % 256
_BF_LEN_BASE = 100
_BF_LEN_STEP = 17
_BF_LEN_MOD = 400


def _bf_len(i: int) -> int:
    return _BF_LEN_BASE + (i * _BF_LEN_STEP) % _BF_LEN_MOD


def q_source_binaryfile_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Read staged raw binary files via ``format("binaryFile")`` and
    checksum each fully JVM-side: byte-sum via a hex/`transform` fold
    plus the source-reported length.  The oracle regenerates both from
    the file-index formula, so a source that truncated, reordered, or
    corrupted content cannot hash-match."""
    base = stage_dir_once(_write_binary_files, "binfiles", sf_dir)
    files = (
        spark.read.format("binaryFile")
        .load(base)
        .select(
            F.regexp_extract(F.col("path"), r"blob_(\d+)\.bin", 1)
            .cast("long")
            .alias("file_id"),
            F.col("length").cast("long").alias("n_bytes"),
            F.hex("content").alias("hx"),
        )
    )
    # byte j (0-based) = conv(hx[2j+1 : 2], 16, 10); fold to a sum
    byte_sum = F.aggregate(
        F.transform(
            F.sequence(
                F.lit(0), (F.length("hx") / 2 - 1).cast("int")
            ),
            lambda j: F.conv(
                F.substring(F.col("hx"), (j * 2 + 1).cast("int"), 2),
                16,
                10,
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc + b,
    )
    return files.select(
        "file_id", "n_bytes", byte_sum.alias("byte_sum")
    )


SQL_SOURCE_BINARYFILE_INGEST = f"""
WITH f AS (
  SELECT i AS file_id,
         {_BF_LEN_BASE} + (i * {_BF_LEN_STEP}) % {_BF_LEN_MOD} AS n
  FROM unnest(generate_series(0, {_BF_N_FILES - 1})) AS t(i)
)
SELECT file_id,
       CAST(n AS BIGINT) AS n_bytes,
       CAST((SELECT sum((file_id * 7 + j * 13) % 256)
             FROM unnest(generate_series(0, n - 1)) AS u(j))
            AS BIGINT) AS byte_sum
FROM f
"""


def _write_binary_files(tmp: str) -> None:
    os.makedirs(tmp, exist_ok=True)
    for i in range(_BF_N_FILES):
        data = bytes((i * 7 + j * 13) % 256 for j in range(_bf_len(i)))
        with open(os.path.join(tmp, f"blob_{i}.bin"), "wb") as fh:
            fh.write(data)


# ------------------------------------------------------------ exports

EXT22_QUERIES = {
    "source_xml_roundtrip": q_source_xml_roundtrip,
    "source_binaryfile_ingest": q_source_binaryfile_ingest,
}

EXT22_ORACLES = {
    "source_xml_roundtrip": SQL_SOURCE_XML_ROUNDTRIP,
    "source_binaryfile_ingest": SQL_SOURCE_BINARYFILE_INGEST,
}
