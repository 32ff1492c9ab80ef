"""Bloom join pruning: no false negatives, bounded build, null keys."""

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.bloomjoin import (
    bloom_build,
    bloom_prune,
)

M, K = 512, 3  # small filter so false positives actually appear


@pytest.fixture(scope="module")
def tables(spark):
    dim = spark.createDataFrame(
        [(i * 7,) for i in range(40)], ["key"]
    )  # keys 0, 7, ..., 273
    fact = spark.createDataFrame([(i,) for i in range(400)], ["key"])
    return dim, fact


def test_no_false_negatives_and_superset(spark, tables):
    dim, fact = tables
    bloom = bloom_build(dim, "key", M, K)
    passed = {r["key"] for r in bloom_prune(fact, bloom, "key", M, K).collect()}
    true_matches = {
        r["key"] for r in fact.join(dim, "key", "left_semi").collect()
    }
    assert true_matches <= passed  # every real match survives the prune
    assert passed < {r["key"] for r in fact.collect()}  # it actually pruned


def test_false_positive_rate_bounded(spark, tables):
    dim, fact = tables
    bloom = bloom_build(dim, "key", M, K)
    n_passed = bloom_prune(fact, bloom, "key", M, K).count()
    # 40 keys in 512 bits / 3 hashes -> expected FP ~ 1.2%; allow slack
    assert 40 <= n_passed <= 40 + 40


def test_build_is_dense_bounded_bitmap(spark, tables):
    dim, _ = tables
    words = bloom_build(dim, "key", M, K).collect()[0]["bloom_words"]
    assert len(words) == M // 64  # dense: O(1) element_at probes
    set_bits = sum(bin(w & (2**64 - 1)).count("1") for w in words)
    assert 0 < set_bits <= 40 * K  # k positions per key, minus collisions


def test_null_keys_round_trip(spark):
    dim = spark.createDataFrame([(1,), (None,)], "key int")
    fact = spark.createDataFrame([(1,), (2,), (None,)], "key int")
    bloom = bloom_build(dim, "key", M, K)
    kept = [
        r["key"] for r in bloom_prune(fact, bloom, "key", M, K).collect()
    ]
    assert 1 in kept and None in kept  # null hits the dim's null sentinel


def test_empty_dim_prunes_everything(spark, tables):
    _, fact = tables
    empty = spark.createDataFrame([], "key bigint")
    bloom = bloom_build(empty, "key", M, K)
    # zero dim rows -> all-zero bitmap, nothing can pass
    assert bloom_prune(fact, bloom, "key", M, K).count() == 0
