"""Bloom-filter join pruning: cut a fact table down to near-matches
BEFORE the join shuffle.

The 100 TB pattern: a selective dimension (filtered orders, a benchmark
id list, yesterday's churned users) joins a huge fact table.  A plain
join shuffles every fact row; a broadcast hash join avoids the shuffle
but still *scans and hashes* every row against the full build side at
probe width.  The bloom pattern condenses the build side's keys into a
few-KB bit set, broadcasts THAT, and drops non-matching fact rows in
the scan stage — the subsequent exact join (still required: blooms have
false positives) only pays for survivors.  Spark's AQE injects the same
structure automatically in some shapes (`spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled`); this operator is the explicit,
composable form with engine-portable hashing.

Portability: bit positions are ``int(md5(i || ':' || key)[:8], 16) % m``
for ``i < k`` — the repo's standard md5 idiom (``functions/
sketches.py``), computable verbatim in DuckDB, so a catalog entry can
hash-check not just the final (bloom-transparent) join result but the
bloom's own survivor count, which would silently hide false-negative
bugs otherwise.

Representation: the filter is a DENSE ``array<long>`` bitmap of
``m / 64`` words (one broadcast row, ``m/8`` bytes).  The membership
probe is ``element_at(words, (pos >> 6) + 1)`` — O(1) array indexing —
plus a shift/mask, all pure Catalyst expressions inside whole-stage
codegen.  (The first cut broadcast the sorted array of set positions
and probed with ``array_contains``; that is a LINEAR scan per probe,
which at sf0.1 turned a 1 s query into 30 s — measured — and would be
quadratic-ish at scale.  A position list is only viable for tiny key
sets; the dense bitmap costs a fixed ``m/8`` bytes and probes O(1)
regardless of how many keys are set.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from event_streaming_toy_example_spark.functions.hashkeys import (
    NULL_KEY as _NULL_KEY,
)

#: Defaults: 4096 bits / 3 hashes ≈ 1% false-positive rate at ~340
#: keys; at 1000 keys FP ≈ (1 - e^(-3000/4096))^3 ≈ 14% — size m to
#: ~12 bits/key for ~1%.  The broadcast is a few KB either way.
BLOOM_BITS = 4096
BLOOM_HASHES = 3



def _positions(key: Column, m: int, k: int) -> list[Column]:
    s = F.coalesce(key.cast("string"), F.lit(_NULL_KEY))
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 8), 16, 10
            ).cast("long")
            % m
        )
        for i in range(k)
    ]


def bloom_build(
    dim: DataFrame, key_col: str, m: int = BLOOM_BITS, k: int = BLOOM_HASHES
) -> DataFrame:
    """Build the filter: ONE row holding the dense ``m / 64``-word
    bitmap (``bloom_words: array<long>``).

    Per-word OR-aggregation is bounded at ``m / 64`` groups no matter
    how many dim rows feed it (map-side partial combine), and the
    final densification (fill absent words with 0) runs over one
    bounded row — the build costs one tiny all-to-one aggregation."""
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    pos = F.array(*_positions(F.col(key_col), m, k))
    words = (
        dim.select(F.explode(pos).alias("p"))
        .select(
            F.shiftrightunsigned(F.col("p"), 6).alias("w"),
            # column-valued shift amounts need call_function (the Python
            # shiftleft wrapper only accepts a literal int)
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("w", "bits"))
        ).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m // 64 - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("wm"), w.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("bloom_words")
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key hits ALL ``k`` bloom positions.

    The one-row bitmap is broadcast and each probe is O(1):
    ``element_at(words, (pos >> 6) + 1)`` then shift/mask — inside
    codegen, no UDF, independent of how many keys are set.  Fact rows
    are dropped at the scan stage, before any exchange.  Guarantees a
    superset of the true matches (no false negatives); follow with the
    exact join."""
    cond = None
    for p in _positions(F.col(key_col), m, k):
        word = F.element_at(
            F.col("bloom_words"),
            (F.shiftrightunsigned(p, 6) + 1).cast("int"),
        )
        c = (
            F.call_function(
                "shiftrightunsigned", word, (p % 64).cast("int")
            ).bitwiseAND(F.lit(1).cast("long"))
            == 1
        )
        cond = c if cond is None else (cond & c)
    return (
        fact.crossJoin(F.broadcast(bloom)).where(cond).drop("bloom_words")
    )


def sql_bloom_positions(key_expr: str, m: int, k: int) -> list[str]:
    """DuckDB twins of the per-hash position expressions."""
    s = f"coalesce(CAST({key_expr} AS VARCHAR), '{_NULL_KEY}')"
    return [
        f"(('0x' || substr(md5('{i}:' || {s}), 1, 8))::BIGINT % {m})"
        for i in range(k)
    ]
