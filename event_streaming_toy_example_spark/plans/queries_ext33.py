"""Round-8 wave: conditional MERGE on the unified transactional table
(``txtable.tx_merge``, VERDICT r7 item 4).

``tx_merge`` is the full SQL:2003 / Delta clause surface — WHEN
MATCHED [AND cond] UPDATE/DELETE, WHEN NOT MATCHED INSERT, WHEN NOT
MATCHED BY SOURCE — compiled onto the key-probed rewrite / deletion-
vector machinery the table already proves.  The entry stages a real
transactional table from ``orders``, applies a three-clause CDC merge
MERGE-ON-READ (the build asserts the O(changed rows) accounting: zero
files rewritten, changes DV-borne, every clause's row count exactly
as predicted), and hash-checks the post-merge table against the same
merge expressed as a full-outer-join CASE in plain SQL — DuckDB's
MERGE INTO semantics without needing the statement itself.

The reference rewrites bare directories wholesale
(``toy_glue.py:58-65``); conditional MERGE is greenfield lakehouse
engineering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_dir_once,
)
from event_streaming_toy_example_spark.schemas import load_table


def _source_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic CDC batch: every even order key, price doubled
    for even customers and halved for odd ones — so the update
    condition (source beats target) selects exactly the doubled half."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_custkey") % 2 == 0, F.col("o_totalprice") * 2
        )
        .otherwise(F.col("o_totalprice") * 0.5)
        .alias("o_totalprice"),
        "o_orderstatus",
    )


def _build_merge_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: orders minus the ``%4 = 0`` keys as the
    target (so half the source batch is unmatched inserts), then ONE
    three-clause merge-on-read ``tx_merge``, with the O(changed rows)
    accounting asserted at build time."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        target = o.where(F.col("o_orderkey") % 4 != 0)
        tx.tx_append(target.repartitionByRange(4, "o_orderkey"), tmp)
        n_files = len(tx.snapshot(tmp).files)
        tx.tx_merge(
            spark,
            tmp,
            _source_batch(spark, sf_dir),
            on=["o_orderkey"],
            when_matched_delete="source.o_orderstatus = 'F'",
            when_matched_update={
                "o_totalprice": "source.o_totalprice",
                "o_custkey": "source.o_custkey",
            },
            when_matched_update_condition=(
                "source.o_totalprice > target.o_totalprice"
            ),
            when_not_matched_insert=True,
            merge_on_read=True,
        )
        c = tx.read_log(tmp)[-1]
        assert c.action == "merge"
        # O(changed rows), asserted: range-clustered files all hold odd
        # (untouched) keys, so NOTHING is rewritten or dropped whole —
        # every matched change is deletion-vector-borne and the new
        # rows land in fresh files
        assert c.remove == (), c.remove
        assert c.dv and len(set(c.dv.values())) == 1, c.dv
        assert len(tx.snapshot(tmp).files) > n_files

    return stage_dir_once(build, "txtable_merge_cdc_v1", sf_dir)


def q_tx_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-merge table, row-level — hash-equal to the plain-SQL
    merge oracle only if all three clause semantics (conditional
    update, conditional delete, insert) and the DV read path are
    exact."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_merge_table(spark, sf_dir)
    return tx.read_table(spark, path).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("price_cents"),
        "o_orderstatus",
    )


SQL_TX_MERGE_CDC = """
WITH target AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 4 <> 0
), source AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_custkey % 2 = 0 THEN o_totalprice * 2
              ELSE o_totalprice * 0.5 END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 2 = 0
), merged AS (
  SELECT
    COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
    CASE
      WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL THEN
        CASE WHEN s.o_orderstatus = 'F' THEN 'delete'
             WHEN s.o_totalprice > t.o_totalprice THEN 'update'
             ELSE 'keep' END
      WHEN s.o_orderkey IS NOT NULL THEN 'insert'
      ELSE 'keep'
    END AS action,
    t.o_custkey AS t_custkey, t.o_totalprice AS t_price,
    t.o_orderstatus AS t_status,
    s.o_custkey AS s_custkey, s.o_totalprice AS s_price,
    s.o_orderstatus AS s_status
  FROM target t FULL OUTER JOIN source s USING (o_orderkey)
)
SELECT o_orderkey,
       CASE WHEN action IN ('insert', 'update') THEN s_custkey
            ELSE t_custkey END AS o_custkey,
       CAST(round(CASE WHEN action IN ('insert', 'update') THEN s_price
                       ELSE t_price END * 100) AS BIGINT) AS price_cents,
       CASE WHEN action = 'insert' THEN s_status
            ELSE t_status END AS o_orderstatus
FROM merged
WHERE action <> 'delete'
"""


def _build_zorder_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: events written ROW-MAJOR on user_id (so
    event_id predicates prune nothing), then OPTIMIZE ZORDER BY
    (event_id, user_id) — the build asserts both dimensions actually
    became prunable, so a clustering regression fails the build."""
    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.schemas import load_table

    def build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        tx.tx_append(ev.repartitionByRange(8, "user_id"), tmp)
        hi = ev.agg(F.max("event_id")).collect()[0][0]
        scan0, _ = tx.prune_files(tmp, [("event_id", "<", hi // 8)])
        assert len(scan0) == len(tx.snapshot(tmp).files), (
            "precondition: event_id unprunable in the row-major layout"
        )
        # 16 output files = a 4x4 Morton grid (file boundaries align
        # with curve quadrants), so a 1/8 slice on either dimension
        # leaves most files provably disjoint; a byte-fixed target
        # degenerates to too few files at small SFs (3 files cannot
        # confine either dimension)
        import os as _os

        total = sum(
            tx.get_data_store(tmp).size(_os.path.join(tmp, f))
            for f in tx.snapshot(tmp).files
        )
        v = tx.tx_compact(
            spark, tmp, target_bytes=max(1, total // 16),
            zorder_by=("event_id", "user_id"),
        )
        assert v is not None
        n = len(tx.snapshot(tmp).files)
        _, skip_e = tx.prune_files(tmp, [("event_id", "<", hi // 8)])
        lo_u = ev.agg(F.min("user_id")).collect()[0][0]
        hi_u = ev.agg(F.max("user_id")).collect()[0][0]
        cut_u = lo_u + (hi_u - lo_u) // 8
        _, skip_u = tx.prune_files(tmp, [("user_id", "<", cut_u)])
        assert len(skip_e) >= n // 2, (len(skip_e), n)
        assert len(skip_u) >= n // 2, (len(skip_u), n)

    return stage_dir_once(build, "txtable_zorder_v3", sf_dir)


def q_tx_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A two-dimension range read over the Z-ordered table — the
    stats-pruned scan plus the real row filter must equal the plain
    SQL answer exactly (pruning is an optimization, never a filter)."""
    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.schemas import load_table

    path = _build_zorder_table(spark, sf_dir)
    hi = (
        load_table(spark, sf_dir, "events")
        .agg(F.max("event_id"))
        .collect()[0][0]
    )
    out = tx.read_table(
        spark, path, where=[("event_id", "<", hi // 4)]
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "value_cents"
        ),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )


SQL_TX_ZORDER_PRUNING = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id,
       MIN(user_id) AS min_user,
       MAX(user_id) AS max_user
FROM events
WHERE event_id < (SELECT MAX(event_id) // 4 FROM events)
GROUP BY event_type
"""


EXT33_QUERIES = {
    "tx_merge_cdc": q_tx_merge_cdc,
    "tx_zorder_pruning": q_tx_zorder_pruning,
}

EXT33_ORACLES = {
    "tx_merge_cdc": SQL_TX_MERGE_CDC,
    "tx_zorder_pruning": SQL_TX_ZORDER_PRUNING,
}
