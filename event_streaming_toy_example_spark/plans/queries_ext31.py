"""Round-6 wave: the transaction log as a STREAMING source.

``tx_feed_follower`` is VERDICT r5 item 3 delivered end-to-end: a
follower transactional table maintained PURELY from the source table's
streaming change feed (``sources/txfeed.py`` — offset = log version,
row production = per-commit O(delta) diffs of the commit's own
removed/added files, ``txtable.commit_change_rows``), then verified
three ways:

1. the staged build asserts the follower's rows equal the source
   snapshot EXACTLY (symmetric anti-join count 0),
2. the staged build re-runs the stream from a FRESH checkpoint
   (full re-delivery of every feed batch) and asserts ZERO new
   follower commits — exactly-once via the per-app batch floor,
3. the driver hashes the follower's aggregates against a DuckDB oracle
   that recomputes the source's four-commit history (append → MERGE →
   predicate DELETE → compact) from the raw events table, INCLUDING
   the follower's literal version counter (seed + one commit per
   change-carrying feed batch; the compact emits no changes by
   contract, so it must produce no follower commit).

The reference rewrites bare directories wholesale (``toy_glue.py:
58-65``); a log-fed materialized replica is greenfield lakehouse
engineering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_dir_once,
)
from event_streaming_toy_example_spark.schemas import load_table

_FEED_CUTOFF = "2024-01-15"
_FEED_COLS = ["event_id", "ts", "user_id", "event_type", "value"]
#: follower commits: seed + v1-append batch + v2-merge batch +
#: v3-delete batch (v4 compact emits nothing)
_FOLLOWER_VERSION = 4


def _build_feed_pair(spark: SparkSession, sf_dir: str) -> str:
    """Stage source+follower once per corpus: build the source table
    through four commits, run the change-feed follower to catch-up,
    assert row-exact replication and exactly-once replay, and publish
    BOTH tables under one staged dir (``source/``, ``follower/``)."""
    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.sources import txfeed

    def build(tmp: str) -> None:
        import os

        src = os.path.join(tmp, "source")
        fol = os.path.join(tmp, "follower")
        base = (
            load_table(spark, sf_dir, "events")
            .where(F.col("event_id") % 5 == 0)
            .select(*_FEED_COLS)
        )
        pre = base.where(F.col("ts") < F.lit(_FEED_CUTOFF).cast("timestamp"))
        tx.tx_append(pre.repartitionByRange(4, "event_id"), src)
        mod = pre.where(F.col("event_id") % 100 == 0)
        updates = mod.select(
            "event_id", "ts", "user_id", "event_type",
            (F.col("value") + F.lit(500.0)).alias("value"),
        )
        inserts = mod.select(
            (F.col("event_id") + F.lit(20_000_000)).alias("event_id"),
            "ts", "user_id", "event_type",
            F.lit(3.0).alias("value"),
        )
        tx.tx_upsert(
            spark, src, updates.unionByName(inserts),
            keys=["event_id"], order_by=["ts"],
        )
        # MERGE-ON-READ delete + DV-density compaction: since round 9
        # the sized rewrites leave this table ~1 file, so a bin-pack
        # compact would be a no-op — the v4 compact instead
        # MATERIALIZES the delete's deletion vector away
        # (max_dv_fraction=0.0 rewrites every holed file), which must
        # still emit NOTHING into the feed (compaction is
        # content-invariant by contract)
        tx.tx_delete(spark, src, [("value", "<", 2.0)], merge_on_read=True)
        v4 = tx.tx_compact(spark, src, max_dv_fraction=0.0)
        assert v4 == 4, v4
        assert not tx.snapshot(src).dvs, "compact left a DV behind"

        seed = spark.createDataFrame(
            [], "event_id bigint, event_type string, value double, version long"
        )
        tx.tx_append(seed, fol)
        ck1 = os.path.join(tmp, "ck1")
        txfeed.follow_table(
            spark, src, fol, ck1,
            key="event_id", content_cols=["event_type", "value"],
        )
        # 1. row-exact replication (both directions)
        s = tx.read_table(spark, src).select("event_id", "event_type", "value")
        f = tx.read_table(spark, fol).select("event_id", "event_type", "value")
        assert s.exceptAll(f).isEmpty() and f.exceptAll(s).isEmpty(), (
            "follower diverged from source"
        )
        v_fol = tx.table_version(fol)
        assert v_fol == _FOLLOWER_VERSION, v_fol
        # since round 9 the default apply path is the SINGLE-COMMIT
        # conditional MERGE (VERDICT r8 item 7): every applied batch
        # must be one atomic merge commit
        assert all(
            c.action == "merge"
            for c in tx.read_log(fol)
            if c.version > 1
        ), [c.action for c in tx.read_log(fol)]
        # 2. exactly-once: fresh checkpoint = full feed re-delivery;
        #    the per-app batch floor must skip every batch
        ck2 = os.path.join(tmp, "ck2")
        txfeed.follow_table(
            spark, src, fol, ck2,
            key="event_id", content_cols=["event_type", "value"],
        )
        assert tx.table_version(fol) == v_fol, "replay re-applied a batch"

    # v2: round-9 sized rewrites (ceil(bytes/128 MB) output files per
    # batch apply) — the staged follower drops from 34 two-KB files to
    # one file per change batch, so the bench measures the layout the
    # engine now actually writes
    return stage_dir_once(build, "txfeed_pair_v2", sf_dir)


def q_tx_feed_follower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates of the feed-maintained FOLLOWER (not the source!),
    with its literal version counter — every number oracle-predictable
    from the raw events table; see the module docstring for the three
    verification layers."""
    import os

    from event_streaming_toy_example_spark.operators import txtable as tx

    pair = _build_feed_pair(spark, sf_dir)
    fol = tx.read_table(spark, os.path.join(pair, "follower"))
    return fol.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        F.sum("event_id").alias("id_sum"),
    ).select(
        F.lit(_FOLLOWER_VERSION).cast("int").alias("follower_version"),
        "event_type",
        "n_rows",
        "value_cents",
        "id_sum",
    )


def _build_feed_pair_pairform(spark: SparkSession, sf_dir: str) -> str:
    """The delete+upsert PAIR apply path (pre-round-9 default), kept
    exercised as an EXTENDED entry after the PRIMARY follower rotated
    to the single-commit merge apply (VERDICT r8 item 7)."""
    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.sources import txfeed

    def build(tmp: str) -> None:
        import os

        src = os.path.join(tmp, "source")
        fol = os.path.join(tmp, "follower")
        base = (
            load_table(spark, sf_dir, "events")
            .where(F.col("event_id") % 5 == 0)
            .select(*_FEED_COLS)
        )
        pre = base.where(F.col("ts") < F.lit(_FEED_CUTOFF).cast("timestamp"))
        tx.tx_append(pre.repartitionByRange(4, "event_id"), src)
        mod = pre.where(F.col("event_id") % 100 == 0)
        updates = mod.select(
            "event_id", "ts", "user_id", "event_type",
            (F.col("value") + F.lit(500.0)).alias("value"),
        )
        inserts = mod.select(
            (F.col("event_id") + F.lit(20_000_000)).alias("event_id"),
            "ts", "user_id", "event_type",
            F.lit(3.0).alias("value"),
        )
        tx.tx_upsert(
            spark, src, updates.unionByName(inserts),
            keys=["event_id"], order_by=["ts"],
        )
        tx.tx_delete(spark, src, [("value", "<", 2.0)], merge_on_read=True)
        v4 = tx.tx_compact(spark, src, max_dv_fraction=0.0)
        assert v4 == 4, v4
        seed = spark.createDataFrame(
            [], "event_id bigint, event_type string, value double, version long"
        )
        tx.tx_append(seed, fol)
        txfeed.follow_table(
            spark, src, fol, os.path.join(tmp, "ck1"),
            key="event_id", content_cols=["event_type", "value"],
            via_merge=False,
        )
        s = tx.read_table(spark, src).select("event_id", "event_type", "value")
        f = tx.read_table(spark, fol).select("event_id", "event_type", "value")
        assert s.exceptAll(f).isEmpty() and f.exceptAll(s).isEmpty()
        assert tx.table_version(fol) == _FOLLOWER_VERSION
        # the pair path applies through upsert/delete commits, never merge
        assert all(
            c.action in ("upsert", "delete", "append")
            for c in tx.read_log(fol)
        ), [c.action for c in tx.read_log(fol)]

    return stage_dir_once(build, "txfeed_pairform_v1", sf_dir)


def q_tx_feed_follower_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same oracle-predictable aggregates as ``tx_feed_follower``, over
    the follower maintained by the delete+upsert PAIR apply path."""
    import os

    from event_streaming_toy_example_spark.operators import txtable as tx

    pair = _build_feed_pair_pairform(spark, sf_dir)
    fol = tx.read_table(spark, os.path.join(pair, "follower"))
    return fol.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        F.sum("event_id").alias("id_sum"),
    ).select(
        F.lit(_FOLLOWER_VERSION).cast("int").alias("follower_version"),
        "event_type",
        "n_rows",
        "value_cents",
        "id_sum",
    )


SQL_TX_FEED_FOLLOWER = f"""
WITH base AS (
  SELECT event_id, ts, event_type, value FROM events
  WHERE event_id % 5 = 0
),
pre AS (SELECT * FROM base WHERE ts < TIMESTAMP '{_FEED_CUTOFF}'),
modk AS (SELECT event_id FROM pre WHERE event_id % 100 = 0),
after_merge AS (
  SELECT p.event_id, p.event_type,
         CASE WHEN m.event_id IS NOT NULL THEN p.value + 500.0
              ELSE p.value END AS value
  FROM pre p LEFT JOIN modk m ON p.event_id = m.event_id
  UNION ALL
  SELECT p.event_id + 20000000, p.event_type, CAST(3.0 AS DOUBLE)
  FROM pre p JOIN modk m ON p.event_id = m.event_id
),
final AS (SELECT * FROM after_merge WHERE NOT (value < 2.0))
SELECT CAST({_FOLLOWER_VERSION} AS INT) AS follower_version,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM final GROUP BY event_type
"""


# ------------------------------------ partition-transform pruning

_PRUNE_DAY = "2024-01-10"


def _build_partitioned_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage a day(ts)-declared transactional table once per corpus:
    create with ``partition_by`` properties, append ts-range-clustered
    files, compact WITHOUT an explicit order column (the declared
    property must govern), and assert the derived-stat pruning
    actually skips files — a clustering regression fails the build,
    not just a plan reader."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        import os

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        tx.tx_append(
            ev.repartitionByRange(8, "ts"),
            tmp,
            properties={"partition_by": "day(ts)"},
        )
        # scale-invariant target: ~6 clustered files at ANY SF, so the
        # pruning assertion below is meaningful from sf0.001 up
        total = sum(
            os.path.getsize(os.path.join(tmp, f))
            for f in tx.snapshot(tmp).files
        )
        v = tx.tx_compact(spark, tmp, target_bytes=max(8192, total // 6))
        assert tx.table_properties(tmp) == {"partition_by": "day(ts)"}
        _scan, skip = tx.prune_files(tmp, [("day(ts)", "=", _PRUNE_DAY)])
        assert skip, (
            "declared day(ts) layout failed to prune any file "
            f"(compact={v}, files={len(tx.snapshot(tmp).files)})"
        )

    return stage_dir_once(build, "tx_partitioned_v1", sf_dir)


def q_tx_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r5 item 6: a ``partition_by`` TRANSFORM declared in the
    log (``day(ts)``) prunes reads on the DERIVED value — no physical
    partition column, no directory layout: the raw ts column's
    per-file ISO-string stats truncate to day stats (prefix truncation
    is the transform, and it is monotone).  The staged build asserts
    files are actually skipped and that a default ``tx_compact``
    preserved the declared clustering; this query reads exactly one
    day through the pruned path and aggregates it — identical by
    construction to the oracle's plain filter over raw events."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_partitioned_table(spark, sf_dir)
    day = tx.read_table(spark, path, where=[("day(ts)", "=", _PRUNE_DAY)])
    return day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


SQL_TX_PARTITION_PRUNING = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE CAST(ts AS DATE) = DATE '{_PRUNE_DAY}'
GROUP BY event_type
"""


EXT31_QUERIES = {
    "tx_feed_follower": q_tx_feed_follower,
    "tx_feed_follower_pair": q_tx_feed_follower_pair,
    "tx_partition_pruning": q_tx_partition_pruning,
}

EXT31_ORACLES = {
    "tx_feed_follower": SQL_TX_FEED_FOLLOWER,
    "tx_feed_follower_pair": SQL_TX_FEED_FOLLOWER,
    "tx_partition_pruning": SQL_TX_PARTITION_PRUNING,
}
