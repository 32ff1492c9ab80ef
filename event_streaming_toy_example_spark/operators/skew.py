"""Skew mitigation (SURVEY.md §4 "shuffle/partitioning strategy").

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
``session.get_spark``) is the first line of defense and needs no code.
These operators cover the cases AQE cannot re-plan:

- ``salted_join``: an equi-join whose *build* side is too big to
  broadcast and whose probe side has pathological hot keys. Salting
  splits each hot key into ``buckets`` sub-keys (probe side gets a
  random salt; build side is exploded ``buckets``-fold), bounding any
  single task at ~1/buckets of a hot key's rows. Correctness: every
  (probe-row, build-row) key match still meets in exactly one bucket.
- ``salted_agg``: two-phase aggregation for *algebraic* aggregates
  (sum/count/min/max). Plain hash aggregation already partial-combines
  map-side, so this is NOT for ordinary skew — it is for aggregates
  whose per-key partial state is itself large (long collect-ish state,
  huge distinct maps) where one reducer would own a hot key's whole
  state. Phase 1 aggregates (key, salt); phase 2 merges the ``buckets``
  partial rows per key.

Both are pure DataFrame compositions — no RDDs, no UDFs — so Catalyst
still prunes/pushes through them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: phase-2 merge function for each algebraic phase-1 aggregate
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform per-row salt in [0, buckets). Derived from a random draw
    (salt only routes rows; results never depend on its value)."""
    return df.withColumn(col_name, (F.rand() * buckets).cast("int"))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (possibly hot-keyed) probe
    side, explode the build side ``buckets``-fold, join on
    (key, salt). Output columns = probe ∪ build columns, like a plain
    equi-join on ``probe_key == build_key``.

    Cost model: build side shuffles ``buckets``x its size — use the
    smallest ``buckets`` that caps the hot key (rows_of_hottest_key /
    buckets ≈ target task size). For build sides under the broadcast
    threshold, use ``F.broadcast`` instead — no salt needed.

    Only probe-preserving join types are supported: with ``right`` or
    ``full`` outer joins an unmatched build row (exploded
    ``buckets``-fold) would surface once per bucket instead of once.
    """
    supported = {"inner", "left", "left_outer", "leftouter", "cross",
                 "left_semi", "leftsemi", "semi",
                 "left_anti", "leftanti", "anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in supported}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the exploded build side "
            "would emit unmatched build rows once per bucket; use inner/left/"
            "semi/anti, or an unsalted join for right/full outer."
        )
    salted_probe = with_salt(probe, buckets)
    exploded_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    cond = (salted_probe[probe_key] == exploded_build[build_key]) & (
        salted_probe["__salt"] == exploded_build["__salt"]
    )
    out = salted_probe.join(exploded_build, cond, how)
    return out.drop(salted_probe["__salt"]).drop(exploded_build["__salt"])


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name -> (fn, input), fn in
    {sum, count, min, max}; input is a column name or Column
    expression. Result equals ``df.groupBy(keys).agg(...)`` exactly
    (all supported aggregates are commutative + associative).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r}")
    phase1 = with_salt(df, buckets).groupBy(*keys, "__salt")
    p1_exprs = []
    for name, (fn, col) in aggs.items():
        col = F.col(col) if isinstance(col, str) else col
        p1_exprs.append(
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(name)
        )
    partial = phase1.agg(*p1_exprs)
    p2_exprs = [
        _MERGE[fn](name).alias(name) for name, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*p2_exprs)
