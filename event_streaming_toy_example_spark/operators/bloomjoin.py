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

Representation: the filter is the SORTED ARRAY of distinct set bit
positions (at most ``m`` ints, one broadcast row).  For the selective
dimensions this pattern targets (n_keys << m), that is smaller than a
dense bitmap and keeps the membership probe a pure Catalyst expression:
``array_contains`` per hash function — no UDF, no Python, stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Defaults: 4096 bits / 3 hashes ≈ 1% false-positive rate at ~340 keys,
#: still < 3% at 1000 keys — and the broadcast is a few KB either way.
BLOOM_BITS = 4096
BLOOM_HASHES = 3

_NULL_KEY = "<NULL>"


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
    """Build the filter: ONE row holding the sorted array of set bit
    positions.  The aggregate is bounded at ``m`` distinct ints no
    matter how many dim rows feed it (positions dedup in the set), so
    the build costs one tiny all-to-one aggregation."""
    pos = F.array(*_positions(F.col(key_col), m, k))
    return (
        dim.select(F.explode(pos).alias("p"))
        .distinct()
        .agg(F.sort_array(F.collect_list("p")).alias("bloom_bits"))
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key hits ALL ``k`` bloom positions.

    The one-row filter is broadcast and the probe is ``array_contains``
    x k inside codegen — fact rows are dropped at the scan stage,
    before any exchange.  Guarantees a superset of the true matches
    (no false negatives); follow with the exact join."""
    probe = _positions(F.col(key_col), m, k)
    cond = None
    for p in probe:
        c = F.array_contains(F.col("bloom_bits"), p)
        cond = c if cond is None else (cond & c)
    return (
        fact.crossJoin(F.broadcast(bloom)).where(cond).drop("bloom_bits")
    )


def sql_bloom_positions(key_expr: str, m: int, k: int) -> list[str]:
    """DuckDB twins of the per-hash position expressions."""
    s = f"coalesce(CAST({key_expr} AS VARCHAR), '{_NULL_KEY}')"
    return [
        f"(('0x' || substr(md5('{i}:' || {s}), 1, 8))::BIGINT % {m})"
        for i in range(k)
    ]
