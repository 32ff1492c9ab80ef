"""Round-9 wave: the transactional table's remaining VERDICT r8 gaps.

- ``tx_merge_evolution`` — MERGE schema evolution (Delta's
  ``withSchemaEvolution()``): the CDC source carries a column the
  table does not have; ``tx_merge(..., allow_evolution=True)`` adds it
  in the same commit (fresh column-mapping id + physical name), old
  files null-fill through the imposed-schema read, and the result is
  hash-checked against the full-outer-join CASE oracle WITH the
  evolved column.
- ``tx_sql_surface`` — the SQL-addressable read surface
  (``txtable.tx_view``): the snapshot AND a VERSION AS OF registered
  as temp views, the entry's query() is pure ``spark.sql`` text over
  them; oracle = the same ANSI SQL over the raw table in DuckDB.
- ``tx_zorder3_pruning`` — OPTIMIZE ZORDER BY over THREE columns (the
  N-dimension Morton interleave ``layout.zorder_value_n`` codegens);
  the staged build asserts all three axes prune at least half the
  files.

The reference rewrites bare directories wholesale (``toy_glue.py:
58-65``); all three surfaces are greenfield lakehouse engineering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_dir_once,
)
from event_streaming_toy_example_spark.schemas import load_table


# ------------------------------------------------- MERGE schema evolution


def _build_evolved_merge_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: orders minus the ``%4 = 0`` keys as the
    target; ONE evolving merge whose source carries ``o_channel`` (a
    column the table lacks).  The build asserts the schema actually
    evolved and the pre-merge rows read NULL for it."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        target = o.where(F.col("o_orderkey") % 4 != 0)
        tx.tx_append(target.repartitionByRange(4, "o_orderkey"), tmp)
        source = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 2 == 0)
            .select(
                "o_orderkey",
                "o_custkey",
                (F.col("o_totalprice") * 2).alias("o_totalprice"),
                "o_orderstatus",
                F.concat(
                    F.lit("ch"), (F.col("o_orderkey") % 3).cast("string")
                ).alias("o_channel"),
            )
        )
        tx.tx_merge(
            spark,
            tmp,
            source,
            on=["o_orderkey"],
            when_matched_update={
                "o_totalprice": "source.o_totalprice",
                "o_channel": "source.o_channel",
            },
            when_matched_update_condition="source.o_custkey % 2 = 0",
            when_not_matched_insert=True,
            allow_evolution=True,
        )
        out = tx.read_table(spark, tmp)
        assert "o_channel" in out.columns, out.columns
        # a key untouched by the merge (odd orderkey) must read NULL
        n_null = out.where(
            (F.col("o_orderkey") % 2 == 1) & F.col("o_channel").isNotNull()
        ).count()
        assert n_null == 0, n_null

    return stage_dir_once(build, "txtable_merge_evo_v1", sf_dir)


def q_tx_merge_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-merge table INCLUDING the evolved column — hash-equal
    to the plain-SQL oracle only if the evolution (same-commit schema
    add), the conditional update, the insert, and the null-fill of
    pre-evolution files are all exact."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_evolved_merge_table(spark, sf_dir)
    return tx.read_table(spark, path).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("price_cents"),
        "o_orderstatus",
        "o_channel",
    )


SQL_TX_MERGE_EVOLUTION = """
WITH target AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 4 <> 0
), source AS (
  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
         o_orderstatus, 'ch' || CAST(o_orderkey % 3 AS VARCHAR) AS o_channel
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT t.o_orderkey,
       t.o_custkey,
       CAST(round(CASE WHEN s.o_orderkey IS NOT NULL
                        AND s.o_custkey % 2 = 0
                       THEN s.o_totalprice
                       ELSE t.o_totalprice END * 100) AS BIGINT)
         AS price_cents,
       t.o_orderstatus,
       CASE WHEN s.o_orderkey IS NOT NULL AND s.o_custkey % 2 = 0
            THEN s.o_channel END AS o_channel
FROM target t LEFT JOIN source s USING (o_orderkey)
UNION ALL
SELECT s.o_orderkey, s.o_custkey,
       CAST(round(s.o_totalprice * 100) AS BIGINT) AS price_cents,
       s.o_orderstatus, s.o_channel
FROM source s LEFT JOIN target t USING (o_orderkey)
WHERE t.o_orderkey IS NULL
"""


# --------------------------------------------------- SQL read surface


def _build_sql_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: a customer-keyed table that EVOLVES
    between version 1 and version 2 (an upsert re-prices one nation's
    customers and deletes another's), so the AS-OF view and the head
    view answer differently — the SQL surface must carry time travel,
    not just the head."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
        )
        tx.tx_append(c.repartitionByRange(4, "c_custkey"), tmp)
        repriced = c.where(F.col("c_nationkey") == 3).select(
            "c_custkey",
            "c_nationkey",
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
            "c_mktsegment",
        )
        tx.tx_upsert(
            spark, tmp, repriced, keys=["c_custkey"],
            order_by=["c_acctbal"],
        )
        tx.tx_delete(spark, tmp, [("c_nationkey", "=", 7)])
        assert tx.table_version(tmp) == 3

    return stage_dir_once(build, "txtable_sqlview_v1", sf_dir)


def q_tx_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure ``spark.sql`` over ``tx_view``-registered relations: the
    HEAD snapshot joined against its own VERSION AS OF 1 — per market
    segment, current balances vs the seed balances and the rows the
    delete removed.  Everything SQL sees went through the resolved
    read (column mapping, imposed schema), and the half the query
    reads from v1 pins time travel through the SQL surface."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_sql_table(spark, sf_dir)
    head = tx.tx_view(spark, path, "tx_sql_head")
    seed = tx.tx_view(spark, path, "tx_sql_v1", version=1)
    return spark.sql(f"""
        SELECT h.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_now,
               CAST(SUM(CAST(round(h.c_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS bal_cents_now,
               CAST(SUM(CAST(round(s.c_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS bal_cents_seed
        FROM {head} h JOIN {seed} s USING (c_custkey)
        GROUP BY h.c_mktsegment
    """)


SQL_TX_SQL_SURFACE = """
WITH seed AS (
  SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment FROM customer
), head AS (
  SELECT c_custkey, c_nationkey,
         CASE WHEN c_nationkey = 3 THEN c_acctbal + 1000.0
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_nationkey <> 7
)
SELECT h.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_now,
       CAST(SUM(CAST(round(h.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents_now,
       CAST(SUM(CAST(round(s.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents_seed
FROM head h JOIN seed s USING (c_custkey)
GROUP BY h.c_mktsegment
"""


# --------------------------------------------- three-column Z-order


def _build_zorder3_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: lineitem written ROW-MAJOR on
    l_extendedprice (so none of the three KEY columns prunes), then
    OPTIMIZE ZORDER BY (l_orderkey, l_partkey, l_suppkey) — three
    UNIFORM keys, the shape a 100 TB fact table clusters for
    multi-dimension lookups.  The build asserts ALL THREE dimensions
    became prunable (>= half the files skip a 1/8 slice)."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        import os as _os

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
            "l_extendedprice",
        )
        tx.tx_append(li.repartitionByRange(8, "l_extendedprice"), tmp)
        # 64 output files = a 4x4x4 Morton grid on three dimensions, so
        # a 1/8 slice on any axis leaves most files provably disjoint
        total = sum(
            tx.get_data_store(tmp).size(_os.path.join(tmp, f))
            for f in tx.snapshot(tmp).files
        )
        v = tx.tx_compact(
            spark, tmp, target_bytes=max(1, total // 64),
            zorder_by=("l_orderkey", "l_partkey", "l_suppkey"),
        )
        assert v is not None
        n = len(tx.snapshot(tmp).files)
        his = li.agg(
            F.max("l_orderkey"), F.max("l_partkey"), F.max("l_suppkey")
        ).collect()[0]
        for col, hi in zip(
            ("l_orderkey", "l_partkey", "l_suppkey"), his
        ):
            _, skip = tx.prune_files(tmp, [(col, "<", max(1, hi // 8))])
            assert len(skip) >= n // 2, (col, len(skip), n)

    return stage_dir_once(build, "txtable_zorder3_v2", sf_dir)


def q_tx_zorder3_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A range read on ONE of the three Z-ordered dimensions — the
    stats-pruned scan plus the real row filter must equal the plain
    SQL answer exactly (pruning is an optimization, never a
    filter)."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_zorder3_table(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    hi = li.agg(F.max("l_partkey")).collect()[0][0]
    out = tx.read_table(
        spark, path, where=[("l_partkey", "<", max(1, hi // 4))]
    )
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
        F.min("l_orderkey").alias("min_order"),
        F.max("l_orderkey").alias("max_order"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )


# the oracle computes the same hi-watermark via a scalar subquery, so
# the SQL stays corpus-independent
SQL_TX_ZORDER3 = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(l_orderkey) AS min_order,
       MAX(l_orderkey) AS max_order,
       MIN(l_suppkey) AS min_supp,
       MAX(l_suppkey) AS max_supp
FROM lineitem
WHERE l_partkey < GREATEST(1, (SELECT MAX(l_partkey) FROM lineitem) // 4)
GROUP BY l_returnflag
"""


EXT34_QUERIES = {
    "tx_merge_evolution": q_tx_merge_evolution,
    "tx_sql_surface": q_tx_sql_surface,
    "tx_zorder3_pruning": q_tx_zorder3_pruning,
}

EXT34_ORACLES = {
    "tx_merge_evolution": SQL_TX_MERGE_EVOLUTION,
    "tx_sql_surface": SQL_TX_SQL_SURFACE,
    "tx_zorder3_pruning": SQL_TX_ZORDER3,
}
