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
