"""Bucketed co-located join: correct results AND a shuffle-free plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from event_streaming_toy_example_spark.schemas import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; give the database its own
    # location instead so the test writes under tmp_path
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path / 'wh'}'"
    )
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(ev, "bktest.ev_b", "user_id", buckets=4)
    write_bucketed(orders, "bktest.ord_b", "o_custkey", buckets=4)

    # disable auto-broadcast so a small-table test can't cheat the
    # assertion with a broadcast join
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "bktest.ev_b", "bktest.ord_b", "user_id", "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness vs plain join on the raw tables
        expected = (
            ev.join(orders, ev.user_id == orders.o_custkey)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("s"),
            )
            .first()
        )
        got = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        ).first()
        assert (got["n"], got["s"]) == (expected["n"], expected["s"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bktest.ev_b")
        spark.sql("DROP TABLE IF EXISTS bktest.ord_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucketed_anti_join_no_shuffle(spark, tmp_path):
    """The incremental-dedup scale path (docs/PLANS.md): with snapshot
    and prior-corpus fingerprint tables bucketed on the fingerprint,
    the left_anti subtraction runs with zero exchanges."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bkanti LOCATION '{tmp_path / 'wh'}'"
    )
    docs = load_table(spark, SF_DIR, "documents")
    snap = docs.select("doc_id", F.md5("text").alias("fingerprint"))
    prior = snap.where(F.col("doc_id") % 2 == 0).select("fingerprint")
    write_bucketed(snap, "bkanti.snap_b", "fingerprint", buckets=4)
    write_bucketed(prior, "bkanti.prior_b", "fingerprint", buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark,
            "bkanti.snap_b",
            "bkanti.prior_b",
            "fingerprint",
            "fingerprint",
            how="left_anti",
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        expected = snap.join(prior, "fingerprint", "left_anti").count()
        assert j.count() == expected and expected > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkanti.snap_b")
        spark.sql("DROP TABLE IF EXISTS bkanti.prior_b")
        spark.sql("DROP DATABASE IF EXISTS bkanti")
