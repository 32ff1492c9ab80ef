"""Round-5 wave: data-skipping statistics and predicate DELETE on the
unified transactional table (``operators/txtable.py``).

Every commit now records per-file min/max/null-count stats harvested
from the parquet footers it just wrote (a metadata-only read), which is
the Delta/Iceberg data-skipping contract: a predicate reader consults
the LOG — zero file I/O — and opens only files whose value range could
hold a match, and ``tx_delete`` classifies files three ways (provably
untouched → carried by reference, provably all-matching → dropped
without being read, straddling → rewritten without the matching rows).
At 100 TB that turns a retention delete on a time-clustered table into
O(metadata) and a point/range query into a handful of file opens.

Both entries run against ONE staged artifact (a range-clustered
transactional events table that has absorbed a 25%-of-keyspace
retention delete), and the staged build ASSERTS the file accounting —
at least one whole-file drop, at most one straddler rewrite, files
skipped on a range read — so a stats or pruning regression fails the
build, not just a plan reader.  The pruned read is ALSO row-filtered
(pruning is an optimization, never the filter), so the driver hash
against the plain-SQL oracle proves end-to-end equivalence.

The reference rewrites bare directories wholesale
(``toy_glue.py:58-65``) and has no delete, no stats, no pruning; every
semantic here is greenfield scale engineering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_dir_once,
)
from event_streaming_toy_example_spark.schemas import load_table

_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _max_id(spark: SparkSession, sf_dir: str) -> int:
    # bounded scalar collect — the documented staged-artifact-parameter
    # pattern (a single MAX over one column)
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.max("event_id")).collect()[0][0]


def _build_deleted_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: a transactional events table clustered
    into 8 range files on event_id, then a retention-style DELETE of
    the first quarter of the key space."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events").select(*_COLS)
        tx.tx_append(ev.repartitionByRange(8, "event_id"), tmp)
        cutoff = _max_id(spark, sf_dir) // 4
        tx.tx_delete(spark, tmp, [("event_id", "<", cutoff)])
        c = tx.read_log(tmp)[-1]
        assert c.action == "delete"
        # the cutoff sits inside file 3 of 8, so stats must prove at
        # least one whole file all-matching (dropped unread) and at
        # most one straddler needs a rewrite
        assert len(c.remove) >= 2, c.remove
        assert len(c.add) <= 1, c.add
        # and a later range read over the log stats must skip files
        scan, skip = tx.prune_files(tmp, [("event_id", "<", cutoff + 1)])
        assert skip, "no files skipped after delete"

    return stage_dir_once(build, "txtable_delete_v1", sf_dir)


def q_tx_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over the table AFTER the retention delete: counts,
    cent-sums and the surviving key range per event_type.  Hash-equal
    to the oracle's plain ``WHERE NOT deleted`` only if the delete
    removed exactly the predicate's rows — across whole-dropped,
    straddle-rewritten and untouched files alike."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_deleted_table(spark, sf_dir)
    return (
        tx.read_table(spark, path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


SQL_TX_DELETE_WHERE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id
FROM events
WHERE event_id >= (SELECT MAX(event_id) // 4 FROM events)
GROUP BY event_type
"""


def q_tx_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A stats-pruned range read on the post-delete table: the window
    [max/2, max/2 + max/10) touches ~1 of the 8 range files; the
    query itself asserts the log stats actually skipped files, then
    returns per-type aggregates of the rows the pruned read produced
    (identical to filtering a full read — the driver hash proves it
    against the oracle's plain WHERE)."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_deleted_table(spark, sf_dir)
    m = _max_id(spark, sf_dir)
    where = [("event_id", ">=", m // 2), ("event_id", "<", m // 2 + m // 10)]
    scan, skip = tx.prune_files(path, where)
    assert skip and len(scan) < len(scan) + len(skip), (scan, skip)
    return (
        tx.read_table(spark, path, where=where)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


SQL_TX_STATS_SKIPPING = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id
FROM events
WHERE event_id >= (SELECT MAX(event_id) // 2 FROM events)
  AND event_id < (SELECT MAX(event_id) // 2 + MAX(event_id) // 10
                  FROM events)
GROUP BY event_type
"""


EXT30_QUERIES = {
    "tx_delete_where": q_tx_delete_where,
    "tx_stats_skipping": q_tx_stats_skipping,
}

EXT30_ORACLES = {
    "tx_delete_where": SQL_TX_DELETE_WHERE,
    "tx_stats_skipping": SQL_TX_STATS_SKIPPING,
}
