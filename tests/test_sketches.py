"""Count-min sketch: overestimate property, bounded size, mergeability."""

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)

DEPTH, WIDTH = 4, 64  # narrow width so collisions actually occur


@pytest.fixture(scope="module")
def keyed(spark):
    # 500 rows over 100 keys with a skewed head (key 0 appears 101x)
    rows = [(i % 100,) for i in range(400)] + [(0,)] * 100
    return spark.createDataFrame(rows, ["k"])


def test_cms_never_undercounts_and_is_often_exact(spark, keyed):
    sketch = cms_build(keyed, "k", DEPTH, WIDTH)
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, sketch, "k", DEPTH, WIDTH)
    joined = exact.join(est, "k").collect()
    assert len(joined) == 100
    assert all(r["cms_est"] >= r["exact"] for r in joined)
    # the heavy hitter's estimate is within collision noise of truth
    head = next(r for r in joined if r["k"] == 0)
    assert head["exact"] == 104
    assert head["cms_est"] <= head["exact"] + 50
    # most keys should estimate exactly even at width 64
    exact_hits = sum(1 for r in joined if r["cms_est"] == r["exact"])
    assert exact_hits >= 50


def test_cms_sketch_size_is_bounded(spark, keyed):
    sketch = cms_build(keyed, "k", DEPTH, WIDTH).collect()
    assert len(sketch) <= DEPTH * WIDTH
    # every input row increments exactly one counter per hash row
    per_d = {}
    for r in sketch:
        per_d[r["d"]] = per_d.get(r["d"], 0) + r["cnt"]
    assert per_d == {d: 500 for d in range(DEPTH)}


def test_cms_merge_equals_sketch_of_union(spark, keyed):
    a = keyed.limit(200)
    merged = cms_merge(
        cms_build(a, "k", DEPTH, WIDTH), cms_build(keyed, "k", DEPTH, WIDTH)
    )
    direct = cms_build(a.unionAll(keyed), "k", DEPTH, WIDTH)
    m = {(r["d"], r["b"]): r["cnt"] for r in merged.collect()}
    d = {(r["d"], r["b"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_cms_null_keys_bucket_together(spark):
    df = spark.createDataFrame([(None,), (None,), (1,)], "k int")
    sketch = cms_build(df, "k", DEPTH, WIDTH)
    est = cms_estimate(
        spark.createDataFrame([(None,), (1,)], "k int"), sketch, "k", DEPTH, WIDTH
    ).collect()
    by_key = {r["k"]: r["cms_est"] for r in est}
    assert by_key[None] >= 2 and by_key[1] >= 1


def test_kmv_estimate_accuracy_and_exact_degrade(spark):
    from event_streaming_toy_example_spark.functions.sketches import (
        kmv_distinct,
    )

    big = spark.range(5000).withColumnRenamed("id", "k")
    row = kmv_distinct(big, "k", 128).collect()[0]
    assert row["exact_distinct"] == 5000
    # 1/sqrt(128) ~ 9% expected relative error; allow 3 sigma
    assert abs(row["kmv_est"] - 5000) / 5000 < 0.27
    small = spark.range(40).withColumnRenamed("id", "k")
    row = kmv_distinct(small, "k", 128).collect()[0]
    assert row["kmv_est"] == row["exact_distinct"] == 40  # degrades exact


def test_kmv_topk_selection_avoids_global_sort(spark):
    from event_streaming_toy_example_spark.functions.sketches import (
        kmv_distinct,
    )

    df = kmv_distinct(spark.range(1000).withColumnRenamed("id", "k"), "k", 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
