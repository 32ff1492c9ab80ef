"""LEGACY ADAPTER — schema evolution for PLAIN append-mode parquet
directories (no transaction log).  On the engine's unified table stack
the same additive contract is enforced by ``txtable.tx_append`` /
``tx_upsert`` against the LOGGED schema (no footer listing needed, and
the round-6 commit loop re-unions schemas across concurrent writers).
This module remains for tables that are bare directories.

Schema evolution for append-mode parquet tables.

The reference hard-codes one inferred schema forever (``toy_glue.py:36``
— SURVEY.md §8.6 shows the enrichment columns being silently dropped
because the imposed schema predates them).  A long-lived table's schema
DOES drift: new event fields appear, old ones stop being written.  The
lakehouse answer is additive evolution — appends may introduce new
nullable columns, readers reconcile per-file schemas
(``mergeSchema``), and history rows surface the new columns as NULL.

``evolving_append`` enforces the safe subset of that contract at write
time instead of letting arbitrary drift through:

- NEW columns are allowed (additive evolution);
- MISSING columns are tolerated (filled as typed NULLs so the writer
  never silently narrows the table);
- TYPE CHANGES on an existing column are refused loudly — a
  same-name-different-type append would poison the table for every
  reader (parquet merge fails or silently coerces depending on the
  engine), which must be a deliberate migration, not an append.

``read_evolved`` is the matching reader: ``mergeSchema`` reconciles
the per-file schemas into the union schema.

Scale notes: the schema check reads FOOTERS only (one read of the
existing table's merged schema — Spark caches per-path listings), and
appends stay ordinary parquet appends; no rewrite of history ever
happens.  At 100 TB prefer a table format with a transactional schema
registry (the ``stream_upsert_sink`` generation-pointer pattern);
this operator is the plain-directory form of the same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _table_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the table's filesystem.  Checked via
    the Hadoop FS API (not a read attempt) so that a FAILED read of an
    EXISTING table — corrupt/partial file from an interrupted append,
    transient FS or permission error — can never be mistaken for
    "table not created yet"."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def evolving_append(df: DataFrame, path: str) -> None:
    """Append ``df`` to the parquet table at ``path`` under the
    additive-evolution contract (see module docstring).  First write
    creates the table.

    The create path is taken ONLY when the path genuinely does not
    exist; any failure reading an existing table's schema re-raises.
    (An earlier version caught bare ``Exception`` around the schema
    read and fell back to ``overwrite`` — which would have silently
    REPLACED the whole table with the new batch on any transient read
    failure, data loss in the one operator whose contract is that
    history is never rewritten.)"""
    spark = df.sparkSession
    if not _table_exists(spark, path):
        # errorifexists: if someone creates the path between the check
        # and the write, fail loudly rather than clobber their data
        df.write.mode("errorifexists").parquet(path)
        return
    existing = spark.read.option("mergeSchema", "true").parquet(path).schema
    by_name = {f.name: f for f in existing}
    for f in df.schema:
        old = by_name.get(f.name)
        if old is not None and old.dataType != f.dataType:
            raise ValueError(
                f"schema evolution refused: column '{f.name}' changes "
                f"type {old.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()}; type migrations must "
                "rewrite, not append"
            )
    # fill columns the new batch is missing as typed NULLs, so the
    # writer cannot silently narrow the table
    for name, f in by_name.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None).cast(f.dataType))
    df.write.mode("append").parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read an evolving table: per-file schemas reconciled to their
    union; rows from before a column existed surface it as NULL."""
    return spark.read.option("mergeSchema", "true").parquet(path)
