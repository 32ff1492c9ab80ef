"""Deletion-neighborhood fuzzy matching: the blocking scheme must be
COMPLETE for edit distance 1 (a missed candidate is a silent false
negative — the failure mode blocking schemes are notorious for), and
the verify step must keep it exact."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.functions.fuzzy import (
    deletion_keys,
    fuzzy_match_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute_pairs(rows):
    out = set()
    for k1, n1 in rows:
        for k2, n2 in rows:
            if k1 < k2 and _lev(n1, n2) <= 1:
                out.add((k1, k2))
    return out


def test_matches_brute_force_on_adversarial_corpus(spark):
    """Dense corpus over a 2-letter alphabet (maximizes near-misses:
    substitutions, insertions, deletions, transpositions, repeats)."""
    rng = random.Random(7)
    alphabet = "ab"
    names = set()
    while len(names) < 60:
        names.add(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 6)))
        )
    rows = [(i, n) for i, n in enumerate(sorted(names))]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.a_key, r.b_key)
        for r in fuzzy_match_pairs(df, "id", "name").collect()
    }
    assert got == _brute_pairs(rows)


def test_verify_rejects_distance_two_blockmates(spark):
    """Transpositions are distance 2 but share a deletion key — the
    levenshtein verify must drop them."""
    rows = [(1, "abcd"), (2, "acbd")]  # share deletion key "abd"... no:
    # del pos2 of 'abcd' -> 'acd'; del pos3 of 'acbd' -> 'acd' — shared.
    df = spark.createDataFrame(rows, ["id", "name"])
    assert fuzzy_match_pairs(df, "id", "name").count() == 0


def test_identical_names_match_at_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], ["id", "name"]
    )
    rows = fuzzy_match_pairs(df, "id", "name").collect()
    assert [(r.a_key, r.b_key, r.lev_dist) for r in rows] == [(1, 2, 0)]


def test_deletion_keys_shape(spark):
    row = (
        spark.range(1)
        .select(deletion_keys(F.lit("abc")).alias("k"))
        .first()
    )
    assert set(row.k) == {"abc", "bc", "ac", "ab"}


def test_max_dist_above_one_rejected(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    with pytest.raises(ValueError, match="max_dist=1"):
        fuzzy_match_pairs(df, "id", "name", max_dist=2)
