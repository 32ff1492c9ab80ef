"""Round-9 second wave: Bloom-filter data skipping and SQL UPDATE.

- ``tx_bloom_pruning`` — per-file Bloom filters
  (``operators/bloom.py`` + ``tx_set_bloom_filters``) prune point
  lookups on a HIGH-CARDINALITY UNCLUSTERED key, the case min/max
  stats structurally cannot help: every file's [min, max] of an md5
  key spans ~the whole hex space.  The staged build asserts a point
  probe skips at least half the files and an absent key skips ALL of
  them; the read hash-checks the plain-filter oracle (pruning is an
  optimization, never a filter).
- ``tx_update_dml`` — SQL UPDATE (``tx_update``): one copy-on-write
  assignment under a status predicate and one merge-on-read assignment
  under a range predicate (deletion-vector + updated-copies commit),
  hash-checked row-level against the equivalent CASE projection.

The reference has no stats, no indexes, and no UPDATE (432-line
single-node pipeline, ``toy_glue.py`` rewrites directories wholesale);
both surfaces follow the public Delta bloom-filter-index / UPDATE
semantics re-expressed on this engine's commit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.plans.queries_ext import (
    stage_dir_once,
)
from event_streaming_toy_example_spark.schemas import load_table

# event_ids that exist at every shipped SF (ids are 0..n-1, n >= 1000)
_PROBE_IDS = (7, 42, 511)


# ------------------------------------------------- bloom-filter skipping


def _build_bloom_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: events keyed by ``md5(event_id)`` —
    maximal-entropy, unclustered — written time-clustered across 8
    files, bloom-indexed on the key via property + compaction
    backfill.  Asserts the skipping contract both ways."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        import os as _os

        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.md5(F.col("event_id").cast("string")).alias("key"),
            "user_id",
            "event_type",
            "value",
        )
        tx.tx_append(ev.repartitionByRange(12, "event_id"), tmp)
        tx.tx_set_bloom_filters(tmp, ["key"])
        total = sum(
            tx.get_data_store(tmp).size(_os.path.join(tmp, f))
            for f in tx.snapshot(tmp).files
        )
        # backfill blooms: 12 event-id-clustered files bin-pack into 8
        # (the worth check needs fewer outputs than victims); the key
        # column stays maximal-entropy in every output file
        v = tx.tx_compact(
            spark, tmp,
            target_bytes=max(1, -(-total // 8)),
            small_file_bytes=1 << 40,
            order_col="event_id",
        )
        assert v is not None
        n = len(tx.snapshot(tmp).files)
        import hashlib as _h

        probe = _h.md5(b"7").hexdigest()
        scan, skip = tx.prune_files(tmp, [("key", "=", probe)])
        assert len(skip) >= n // 2, (len(scan), len(skip), n)
        # absent key: every file's filter proves absence
        scan2, _skip2 = tx.prune_files(tmp, [("key", "=", "f" * 32)])
        assert scan2 == [], scan2

    return stage_dir_once(build, "txtable_bloom_v1", sf_dir)


def q_tx_bloom_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three point lookups through the Bloom-pruned read — identical
    values to the full-scan filter, far fewer files opened."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    import hashlib as _h

    path = _build_bloom_table(spark, sf_dir)
    keys = tuple(
        _h.md5(str(i).encode()).hexdigest() for i in _PROBE_IDS
    )
    out = tx.read_table(spark, path, where=[("key", "in", keys)])
    return out.select("event_id", "key", "user_id", "event_type", "value")


SQL_TX_BLOOM = """
SELECT event_id,
       md5(CAST(event_id AS VARCHAR)) AS key,
       user_id, event_type, value
FROM events
WHERE event_id IN (7, 42, 511)
"""


# ------------------------------------------------- SQL UPDATE


def _build_update_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: orders range-clustered on o_orderkey,
    then (1) a copy-on-write UPDATE on the F-status rows and (2) a
    merge-on-read UPDATE on the low-orderkey decile — the build
    asserts the range update carried disjoint files by reference and
    the MOR commit is DV-borne."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        hi = o.agg(F.max("o_orderkey")).collect()[0][0]
        tx.tx_append(o.repartitionByRange(8, "o_orderkey"), tmp)
        # CoW: status predicate is unclustered -> every file may match
        tx.tx_update(
            spark, tmp,
            set={
                "o_totalprice": "o_totalprice + 1.0",
                "o_orderstatus": "'X'",
            },
            where=[("o_orderstatus", "=", "F")],
        )
        # MOR: range predicate on the clustered key -> disjoint files
        # carry by reference, matched rows are DV'd + re-appended
        before = set(tx.snapshot(tmp).files)
        tx.tx_update(
            spark, tmp,
            set={"o_custkey": "o_custkey + 1000000"},
            where=[("o_orderkey", "<", max(1, hi // 10))],
            merge_on_read=True,
        )
        snap = tx.snapshot(tmp)
        assert before & set(snap.files), "range update rewrote everything"
        assert snap.dvs, "merge-on-read update committed no DV"

    return stage_dir_once(build, "txtable_update_v1", sf_dir)


def q_tx_update_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-updated table, row-level — every row's value must
    equal the oracle's CASE projection bit-for-bit."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_update_table(spark, sf_dir)
    return tx.read_table(spark, path)


SQL_TX_UPDATE = """
SELECT o_orderkey,
       CASE WHEN o_orderkey <
                 GREATEST(1, (SELECT MAX(o_orderkey) FROM orders) // 10)
            THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey,
       CASE WHEN o_orderstatus = 'F'
            THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderstatus = 'F'
            THEN 'X' ELSE o_orderstatus END AS o_orderstatus
FROM orders
"""


# ------------------------------------------------- shallow clone


def _build_clone_pair(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: customer as the SOURCE (with a live
    deletion vector the clone must inherit), a ZERO-COPY clone, then
    divergent writes on the clone only — a CoW update over absolutely
    referenced files and a MOR delete punching a DV into one.  The
    build asserts the clone staged no data parquet and the source
    stayed bit-identical."""
    import os as _os

    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        src = _os.path.join(tmp, "src")
        dst = _os.path.join(tmp, "dst")
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
        )
        tx.tx_append(c.repartitionByRange(4, "c_custkey"), src)
        tx.tx_delete(
            spark, src, [("c_mktsegment", "=", "BUILDING")],
            merge_on_read=True,
        )
        before = sorted(
            tuple(r) for r in tx.read_table(spark, src).collect()
        )
        tx.tx_clone(spark, src, dst)
        n_copied = sum(
            1
            for root, _d, fs in _os.walk(_os.path.join(dst, "data"))
            for f in fs
            if f.endswith(".parquet")
        )
        assert n_copied <= 1, n_copied  # only the translated DV sidecar
        tx.tx_update(
            spark, dst,
            set={"c_acctbal": "c_acctbal + 1000"},
            where=[("c_nationkey", "=", 3)],
        )
        tx.tx_delete(
            spark, dst, [("c_nationkey", "=", 5)], merge_on_read=True
        )
        after = sorted(
            tuple(r) for r in tx.read_table(spark, src).collect()
        )
        assert after == before, "divergent clone writes leaked to source"

    return stage_dir_once(build, "txtable_clone_v1", sf_dir)


def q_tx_clone_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diverged clone, row-level: inherited DV applied, the
    clone-only update and delete visible, the source untouched."""
    import os as _os

    from event_streaming_toy_example_spark.operators import txtable as tx

    pair = _build_clone_pair(spark, sf_dir)
    return tx.read_table(spark, _os.path.join(pair, "dst"))


SQL_TX_CLONE = """
SELECT c_custkey, c_nationkey,
       CASE WHEN c_nationkey = 3
            THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
       c_mktsegment
FROM customer
WHERE c_mktsegment <> 'BUILDING' AND c_nationkey <> 5
"""


# ------------------------------------------------- SQL DML routing


def _build_sql_dml_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: orders mutated ENTIRELY through SQL text
    (``operators/txsql.py``) — a clause-tuple DELETE, a raw-predicate
    UPDATE (modulo arithmetic: no stats fast path), a MERGE whose
    source is a subquery over the registered view, and an INSERT with
    named-column null-fill."""
    from event_streaming_toy_example_spark.operators import txsql
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        tx.tx_append(o.repartitionByRange(4, "o_orderkey"), tmp)
        txsql.tx_register(spark, tmp, "sqldml_orders")
        txsql.tx_sql(
            spark, "DELETE FROM sqldml_orders WHERE o_orderstatus = 'P'"
        )
        txsql.tx_sql(
            spark,
            "UPDATE sqldml_orders SET o_totalprice = o_totalprice + 1.0 "
            "WHERE o_orderkey % 3 = 0",
        )
        txsql.tx_sql(spark, """
            MERGE INTO sqldml_orders t
            USING (SELECT * FROM sqldml_orders WHERE o_orderkey % 5 = 0) s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'
        """)
        txsql.tx_sql(
            spark,
            "INSERT INTO sqldml_orders (o_orderkey, o_orderstatus) "
            "VALUES (99999999, 'Z')",
        )
        assert tx.table_version(tmp) == 5

    return stage_dir_once(build, "txtable_sqldml_v1", sf_dir)


def q_tx_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-mutated table, row-level against the oracle's composed
    CASE/filter/UNION projection."""
    from event_streaming_toy_example_spark.operators import txtable as tx

    path = _build_sql_dml_table(spark, sf_dir)
    return tx.read_table(spark, path)


SQL_TX_SQL_DML = """
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % 3 = 0
            THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 5 = 0
            THEN 'M' ELSE o_orderstatus END AS o_orderstatus
FROM orders
WHERE o_orderstatus <> 'P'
UNION ALL
SELECT 99999999, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), 'Z'
"""


# ------------------------------------------- incremental materialized view


def _build_matview(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: orders → a count/sum/avg view by status
    (delta mode), then a group-killing DELETE, a raw-predicate UPDATE,
    and an APPEND on the source — ONE refresh catches the view up from
    the change feed alone (O(changed rows), the build pins that the
    source table is never re-read), applied as one exactly-once
    MERGE."""
    import os as _os
    import unittest.mock as _m

    from event_streaming_toy_example_spark.operators import matview as mvw
    from event_streaming_toy_example_spark.operators import txtable as tx

    def build(tmp: str) -> None:
        src = _os.path.join(tmp, "src")
        dst = _os.path.join(tmp, "mv")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        tx.tx_append(o.repartitionByRange(4, "o_orderkey"), src)
        mvw.tx_create_matview(
            spark, src, dst, ["o_orderstatus"],
            {
                "n": ("count", "*"),
                "revenue": ("sum", "o_totalprice"),
                "avg_price": ("avg", "o_totalprice"),
            },
        )
        tx.tx_delete(spark, src, [("o_orderstatus", "=", "P")])
        tx.tx_update(
            spark, src,
            set={"o_totalprice": "o_totalprice + 1.0"},
            where="o_orderkey % 2 = 0",
        )
        tx.tx_append(
            o.where(F.col("o_orderkey") % 100 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
                F.lit("Q").alias("o_orderstatus"),
            ),
            src,
        )
        calls = []
        orig = tx.read_table

        def spy(sp, path, *a, **k):
            calls.append(path)
            return orig(sp, path, *a, **k)

        with _m.patch.object(mvw.tx, "read_table", side_effect=spy):
            mvw.tx_refresh_matview(spark, dst)
        assert src not in calls, "delta refresh re-read the source"
        applied, cur = mvw.matview_lag(dst)
        assert applied == cur == tx.table_version(src)
        groups = {
            r["o_orderstatus"]
            for r in tx.read_table(spark, dst).collect()
        }
        assert "P" not in groups and "Q" in groups

    return stage_dir_once(build, "txtable_matview_v1", sf_dir)


def q_tx_matview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incrementally-maintained view's public columns; double
    aggregates rounded (cents / 2dp) because incremental addition
    order legitimately differs from a single-pass sum."""
    import os as _os

    from event_streaming_toy_example_spark.operators import txtable as tx

    base = _build_matview(spark, sf_dir)
    out = tx.read_table(spark, _os.path.join(base, "mv"))
    return out.select(
        "o_orderstatus",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("revenue"), 2).alias("revenue"),
        F.round(F.col("avg_price"), 2).alias("avg_price"),
    )


SQL_TX_MATVIEW = """
WITH final AS (
  SELECT CASE WHEN o_orderkey % 2 = 0
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS price,
         o_orderstatus AS st
  FROM orders WHERE o_orderstatus <> 'P'
  UNION ALL
  SELECT o_totalprice AS price, 'Q' AS st
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT st AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(price), 2) AS revenue,
       ROUND(AVG(price), 2) AS avg_price
FROM final GROUP BY st
"""


# ------------------------------------------ pushdown DataSource reads


def _build_pushdown_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage once per corpus: lineitem range-clustered into 8 files as
    a transactional table; the build asserts a pushed range filter
    prunes the reader's FILE PARTITIONS (Spark 4.1 Python DataSource
    pushFilters → the engine's stats pruning)."""
    from pyspark.sql.datasource import LessThan

    from event_streaming_toy_example_spark.operators import txtable as tx
    from event_streaming_toy_example_spark.sources import txsource

    def build(tmp: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"
        )
        tx.tx_append(li.repartitionByRange(8, "l_orderkey"), tmp)
        hi = li.agg(F.max("l_orderkey")).collect()[0][0]
        r = txsource.TxTableReader({"path": tmp, "pushdown": "true"})
        leftover = list(r.pushFilters([LessThan(("l_orderkey",), max(1, hi // 4))]))
        assert leftover == []  # fully translated -> retained
        n_all = len(tx.snapshot(tmp).files)
        n_pruned = len(r.partitions())
        assert n_pruned <= max(1, n_all // 2), (n_pruned, n_all)

    return stage_dir_once(build, "txtable_pushdown_v1", sf_dir)


def q_tx_pushdown_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain SQL over the registered ``txtable`` source — the WHERE
    clause reaches the commit log as a pushed filter and the answer
    equals the oracle exactly (Spark re-applies every filter
    post-scan)."""
    from event_streaming_toy_example_spark.sources import txsource

    path = _build_pushdown_table(spark, sf_dir)
    txsource.register(spark)
    df = (
        spark.read.format("txtable")
        .option("path", path)
        .option("pushdown", "true")  # one load, one query: the safe
        # opted-in pattern (see sources/txsource.py)
        .load()
    )
    df.createOrReplaceTempView("tx_pushdown_t")
    return spark.sql("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents,
               MIN(l_orderkey) AS min_order,
               MAX(l_orderkey) AS max_order
        FROM tx_pushdown_t
        WHERE l_orderkey < GREATEST(1,
              (SELECT MAX(l_orderkey) FROM tx_pushdown_t) DIV 4)
          AND l_partkey % 2 = 0
        GROUP BY l_returnflag
    """)


SQL_TX_PUSHDOWN = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(l_orderkey) AS min_order,
       MAX(l_orderkey) AS max_order
FROM lineitem
WHERE l_orderkey < GREATEST(1, (SELECT MAX(l_orderkey) FROM lineitem) // 4)
  AND l_partkey % 2 = 0
GROUP BY l_returnflag
"""


EXT35_QUERIES = {
    "tx_bloom_pruning": q_tx_bloom_pruning,
    "tx_update_dml": q_tx_update_dml,
    "tx_clone_divergence": q_tx_clone_divergence,
    "tx_sql_dml": q_tx_sql_dml,
    "tx_matview_incremental": q_tx_matview_incremental,
    "tx_pushdown_source": q_tx_pushdown_source,
}

EXT35_ORACLES = {
    "tx_bloom_pruning": SQL_TX_BLOOM,
    "tx_update_dml": SQL_TX_UPDATE,
    "tx_clone_divergence": SQL_TX_CLONE,
    "tx_sql_dml": SQL_TX_SQL_DML,
    "tx_matview_incremental": SQL_TX_MATVIEW,
    "tx_pushdown_source": SQL_TX_PUSHDOWN,
}
