"""Salted join / aggregation must be result-identical to the plain
formulations on a deliberately skewed dataset (one key owns 90%)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def _skewed(spark, n=20000):
    # key 0 owns ~90% of rows; keys 1..99 share the rest
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(99)) + 1)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
        F.col("id"),
    )


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "s": ("sum", "v"),
                "c": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    probe = _skewed(spark, 5000)
    build = spark.range(100).select(
        F.col("id").alias("bk"), (F.col("id") * 10).alias("bv")
    )
    plain = sorted(
        (r["k"], r["id"], r["bv"])
        for r in probe.join(build, probe.k == build.bk).collect()
    )
    salted = sorted(
        (r["k"], r["id"], r["bv"])
        for r in salted_join(probe, build, "k", "bk", buckets=4).collect()
    )
    assert plain == salted


def test_salted_join_left_outer(spark):
    probe = _skewed(spark, 2000)
    build = spark.range(5).select(  # most probe keys unmatched
        F.col("id").alias("bk"), (F.col("id") * 10).alias("bv")
    )
    plain = sorted(
        (r["k"], r["id"], r["bv"])
        for r in probe.join(build, probe.k == build.bk, "left").collect()
    )
    salted = sorted(
        (r["k"], r["id"], r["bv"])
        for r in salted_join(probe, build, "k", "bk", buckets=4, how="left").collect()
    )
    assert plain == salted


def test_salted_join_rejects_build_preserving_how(spark):
    # right/full outer would emit unmatched build rows once per bucket
    probe = _skewed(spark, 100)
    build = spark.range(5).select(F.col("id").alias("bk"))
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(probe, build, "k", "bk", buckets=4, how=how)


def test_aqe_skew_join_split_fires(spark):
    """The FIRST line of defense the module docstring names — AQE's
    runtime skew-join split — must actually fire on a skewed
    sort-merge join: the final adaptive plan marks the SMJ with
    skew=true and the hot partition is read as multiple skew-split
    sub-partitions.  (Thresholds are lowered to make the detector
    fire at test scale; restored after.)"""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # force SMJ (no broadcast), and shrink the skew thresholds so a
        # ~MB hot key is "skewed" at test scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        left = _skewed(spark, 200_000).withColumn(
            "pad", F.repeat(F.lit("x"), 64)
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k")
        # materialize THIS dataframe (count() would execute a different
        # QueryExecution and leave this one's AQE un-finalized)
        assert len(joined.collect()) > 0
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final, final
        assert "skew=true" in final, final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
