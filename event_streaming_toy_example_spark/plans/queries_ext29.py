"""Round-5 wave: the unified transactional table
(``operators/txtable.py``) exercised end-to-end as a hash-checked
catalog entry.

``tx_snapshot_isolation`` builds a transactional table from the events
corpus through all four commit actions the one log serves —

1. ``tx_append`` (create): the pre-cutoff snapshot,
2. ``tx_append`` (additive schema evolution): the post-cutoff batch
   arrives WITH a new ``late_tag`` column; version-1 rows surface it
   as NULL,
3. ``tx_upsert`` (MERGE with file pruning): the ``event_id % 100 == 0``
   rows in the first ~10% of the key space are updated (+1000 value,
   tag ``upd``) and a disjoint set of synthetic rows is inserted (tag
   ``ins``) — the key range is deliberately narrow so the staged
   build can ASSERT that pruning carried the untouched
   range-partitioned files over by reference at every SF,
4. ``tx_compact``: bin-packs the accumulated small files — content-
   invariant by construction,

then reads BOTH a version-1-pinned snapshot and the current snapshot
and aggregates them into one relation.  Every number is
oracle-predictable from the raw events table, so the driver hash
covers the whole protocol at once: snapshot isolation (the version-1
rows must be exactly the pre-cutoff subset, untouched by the three
later commits), schema evolution (the tag counts), MERGE semantics
(updated cents sums), compaction invariance (the current-version
aggregates are read AFTER the compact commit), and the version
counter itself (the literal ``4`` only matches if all four commits
landed exactly once).

The reference rewrites bare directories wholesale (``toy_glue.py:58-65``)
— every semantic here is greenfield; see ``operators/txtable.py`` for
the log design and ``tests/test_txtable.py`` for crash windows and
concurrency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_dir_once,
)
from event_streaming_toy_example_spark.schemas import load_table

_TX_CUTOFF = "2024-01-15"
_TX_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _build_tx_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage the transactional table once per corpus version: the
    four-commit history is deterministic in the source data, so the
    per-query cost is two snapshot reads (the serving shape — a table
    is written once and read many times)."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events").select(*_TX_COLS)
        pre = ev.where(F.col("ts") < F.lit(_TX_CUTOFF).cast("timestamp"))
        late = ev.where(
            F.col("ts") >= F.lit(_TX_CUTOFF).cast("timestamp")
        ).withColumn("late_tag", F.lit("late"))
        # range-partition the data files by key so the MERGE's
        # file-pruning probe has ranges to prune against (the layout a
        # keyed table would carry at scale)
        v1 = tx.tx_append(pre.repartitionByRange(4, "event_id"), tmp)
        v2 = tx.tx_append(late.repartitionByRange(4, "event_id"), tmp)
        # scale-invariant update range: the first ~10% of the key
        # space (a bounded scalar collect, the documented pattern for
        # staged-artifact parameters), so pruning is observable at
        # every SF
        max_id = ev.agg(F.max("event_id")).collect()[0][0]
        mod = ev.where(
            (F.col("event_id") % 100 == 0)
            & (F.col("event_id") * 10 < F.lit(max_id))
        )
        updates = mod.select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            (F.col("value") + F.lit(1000.0)).alias("value"),
            F.lit("upd").alias("late_tag"),
        )
        inserts = mod.select(
            (F.col("event_id") + F.lit(10_000_000)).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            F.lit(7.0).alias("value"),
            F.lit("ins").alias("late_tag"),
        )
        v3 = tx.tx_upsert(
            spark,
            tmp,
            updates.unionByName(inserts),
            keys=["event_id"],
            order_by=["ts"],
        )
        # the MERGE must have pruned: only the files whose key range
        # intersects the updated keys get rewritten, the rest carry
        # over by reference (asserted here so a pruning regression
        # fails the build, not just a plan reader)
        log = tx.read_log(tmp)
        assert log[-1].action == "upsert"
        assert 0 < len(log[-1].remove) < 8, log[-1].remove
        v4 = tx.tx_compact(spark, tmp, target_bytes=1 << 30)
        assert (v1, v2, v3, v4) == (1, 2, 3, 4), (v1, v2, v3, v4)
        # exercise the physical-delete path with a window wide enough
        # to keep every version time-travelable
        tx.vacuum(tmp, retain_versions=10, min_age_seconds=0.0)

    return stage_dir_once(build, "txtable_v3", sf_dir)


def q_tx_snapshot_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation contract over the staged transactional
    table: version-1 aggregates (pinned read AFTER three later
    commits) union the current-version aggregates, with the committed
    version number itself in the output."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_tx_table(spark, sf_dir)
    cents = F.sum(
        F.round(F.col("value") * 100).cast("long")
    ).alias("value_cents")

    v1 = tx.read_table(spark, path, version=1)
    first = v1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        cents,
    ).select(
        F.lit(1).cast("int").alias("version"),
        "event_type",
        "n_events",
        "value_cents",
        F.lit(0).cast("long").alias("n_tagged"),
    )

    current_version = tx.table_version(path)
    cur = tx.read_table(spark, path)
    second = cur.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        cents,
        F.count("late_tag").alias("n_tagged"),
    ).select(
        F.lit(current_version).cast("int").alias("version"),
        "event_type",
        "n_events",
        "value_cents",
        "n_tagged",
    )
    return first.unionByName(second)


SQL_TX_SNAPSHOT_ISOLATION = f"""
WITH v1 AS (
  SELECT event_type, value FROM events
  WHERE ts < TIMESTAMP '{_TX_CUTOFF}'
),
upd AS (
  SELECT event_id, value + 1000 AS value FROM events
  WHERE event_id % 100 = 0
    AND event_id * 10 < (SELECT MAX(event_id) FROM events)
),
cur_base AS (
  SELECT e.event_type,
         COALESCE(u.value, e.value) AS value,
         CASE WHEN u.event_id IS NOT NULL THEN 'upd'
              WHEN e.ts >= TIMESTAMP '{_TX_CUTOFF}' THEN 'late'
         END AS tag
  FROM events e LEFT JOIN upd u ON e.event_id = u.event_id
),
ins AS (
  SELECT event_type, CAST(7.0 AS DOUBLE) AS value, 'ins' AS tag
  FROM events
  WHERE event_id % 100 = 0
    AND event_id * 10 < (SELECT MAX(event_id) FROM events)
),
cur AS (SELECT * FROM cur_base UNION ALL SELECT * FROM ins)
SELECT CAST(1 AS INT) AS version, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(0 AS BIGINT) AS n_tagged
FROM v1 GROUP BY event_type
UNION ALL
SELECT CAST(4 AS INT), event_type,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT),
       CAST(COUNT(tag) AS BIGINT)
FROM cur GROUP BY event_type
"""


# ------------------------------------------- streaming schema drift

_DRIFT_CUTOFF = _TX_CUTOFF


def _build_drift_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage the drift exercise once per corpus: two NDJSON text waves
    (wave 2 adds ``late_tag``) streamed with ``maxFilesPerTrigger=1``
    into a transactional table via per-batch schema inference +
    ``tx_append``.  Returns the table path; see
    :func:`q_stream_schema_drift`.

    Construction: two NDJSON text waves staged with staggered mtimes
    (pre-cutoff events; post-cutoff events WITH a new ``late_tag``
    column), delivered as ordered micro-batches by a file-source
    stream with ``maxFilesPerTrigger=1``.  Each batch is parsed with
    per-batch schema inference (text is the schema-free envelope — the
    100 TB form pins schemas in a registry, but the DRIFT path is
    exactly this: infer, then evolve additively) and appended to a
    transactional table via ``tx_append``, whose additive-evolution
    contract null-fills history and refuses type changes.  The result
    is the evolved table aggregated per event type — tag counts and
    value cents are oracle-predictable, so a dropped batch, a
    truncated schema, or wrongly-filled history flips the hash.

    The reference pins one inferred schema forever and silently drops
    new fields (``toy_glue.py:36``, SURVEY.md §8.6) — this entry is
    the fix for that bug class, exercised under streaming delivery.
    """
    import glob
    import os
    import uuid

    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.plans.queries_ext import (
        await_or_raise,
        stage_dir_once,
    )

    def build_waves(tmp: str) -> None:
        pre = (
            load_table(spark, sf_dir, "events")
            .where(F.col("ts") < F.lit(_DRIFT_CUTOFF).cast("timestamp"))
            .select("event_id", "user_id", "event_type", "value")
            .select(F.to_json(F.struct("*")).alias("value"))
        )
        late = (
            load_table(spark, sf_dir, "events")
            .where(F.col("ts") >= F.lit(_DRIFT_CUTOFF).cast("timestamp"))
            .select(
                "event_id",
                "user_id",
                "event_type",
                "value",
                F.lit("late").alias("late_tag"),
            )
            .select(F.to_json(F.struct("*")).alias("value"))
        )
        # stagger mtimes BY WAVE (identified right after each write —
        # part-file names embed a random job UUID, so sorting by name
        # would order the waves by coin flip) so the file-source
        # stream, which delivers oldest-mtime first, replays wave 0
        # before wave 1 deterministically
        seen: set[str] = set()
        base = None
        for i, wave in enumerate((pre, late)):
            wave.coalesce(1).write.mode(
                "overwrite" if i == 0 else "append"
            ).text(tmp)
            if base is None:
                base = os.path.getmtime(tmp)
            for f in sorted(glob.glob(f"{tmp}/part-*")):
                if f not in seen:
                    seen.add(f)
                    os.utime(f, (base + 60 * i, base + 60 * i))

    waves = stage_dir_once(build_waves, "drift_waves_v2", sf_dir)

    def build_table(tmp: str) -> None:
        import tempfile

        stream = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(waves)
        )

        def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            # per-batch schema inference: the schema-free drift path
            # (a registry-pinned from_json is the steady-state path;
            # DRIFT by definition arrives before the registry update).
            # Column order is whatever inference yields — the table
            # log's union schema governs the read side.
            tx.tx_append(
                spark.read.json(batch_df.rdd.map(lambda r: r.value)), tmp
            )

        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix=f"drift_ckpt_{uuid.uuid4().hex[:6]}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, "stream_schema_drift")
        assert tx.table_version(tmp) == 2, tx.table_version(tmp)

    return stage_dir_once(build_table, "drift_table_v2", sf_dir)


def q_stream_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift END-TO-END through a running stream (VERDICT r4
    item 7): producers deploy schema changes without draining, so the
    ingest path must absorb a mid-stream column addition.  See
    :func:`_build_drift_table` for the construction; the aggregate
    here is oracle-predictable per event type — a dropped batch, a
    truncated schema, or wrongly-filled history flips the hash."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    table = _build_drift_table(spark, sf_dir)
    df = tx.read_table(spark, table)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "value_cents"
        ),
        F.count("late_tag").alias("n_tagged"),
    )


SQL_STREAM_SCHEMA_DRIFT = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_DRIFT_CUTOFF}' THEN 1
                     ELSE 0 END) AS BIGINT) AS n_tagged
FROM events GROUP BY event_type
"""


def q_tx_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed over the transactional table's history: the
    row-level diff between version 1 and the current version of the
    staged table (``operators/txtable.py::tx_change_feed``) — every
    (key, change_type) row is oracle-predictable from the raw events:
    post-cutoff appends and the synthetic rows are inserts, the
    updated pre-cutoff keys are updates, nothing deletes.  One
    full-outer key join comparing md5 content fingerprints; unchanged
    keys drop out."""
    from event_streaming_toy_example_spark.operators.txtable import (
        tx_change_feed,
    )

    path = _build_tx_table(spark, sf_dir)
    return tx_change_feed(
        spark,
        path,
        key_col="event_id",
        content_cols=["event_type", "value"],
        from_version=1,
    )


SQL_TX_CHANGE_FEED = f"""
WITH upd_keys AS (
  SELECT event_id FROM events
  WHERE event_id % 100 = 0
    AND event_id * 10 < (SELECT MAX(event_id) FROM events)
)
SELECT event_id, 'update' AS change_type FROM events
WHERE ts < TIMESTAMP '{_TX_CUTOFF}'
  AND event_id IN (SELECT event_id FROM upd_keys)
UNION ALL
SELECT event_id, 'insert' FROM events
WHERE ts >= TIMESTAMP '{_TX_CUTOFF}'
UNION ALL
SELECT event_id + 10000000, 'insert' FROM upd_keys
"""


EXT29_QUERIES = {
    "tx_snapshot_isolation": q_tx_snapshot_isolation,
    "stream_schema_drift": q_stream_schema_drift,
    "tx_change_feed": q_tx_change_feed,
}

EXT29_ORACLES = {
    "tx_snapshot_isolation": SQL_TX_SNAPSHOT_ISOLATION,
    "stream_schema_drift": SQL_STREAM_SCHEMA_DRIFT,
    "tx_change_feed": SQL_TX_CHANGE_FEED,
}
