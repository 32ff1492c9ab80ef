"""Accuracy/behavior tests for catalog queries without a SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.plans.queries import (
    q_approx_distinct_users,
)
from event_streaming_toy_example_spark.schemas import load_table
from tests.conftest import SF_DIR_ORACLE


def test_approx_distinct_within_rsd(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_approx_distinct_users(spark, SF_DIR_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, SF_DIR_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        # 0.02 rsd -> allow a generous 3-sigma band plus small-n slack
        assert abs(approx[et] - ex) <= max(3, 0.06 * ex), (et, approx[et], ex)
