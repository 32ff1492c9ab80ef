"""Count-min sketch: frequency estimation / heavy hitters at scale.

The reference has no sketch operators (its metrics are exact counters,
``mock_cloudwatch.py:1-54``); this module adds the frequency-sketch
family a 100 TB training-data pipeline needs next to the HLL
distinct-count sketch (``plans/queries_ext3.py``): "which keys are hot,
without keeping a counter per key".

Design (Cormode & Muthukrishnan, "An Improved Data Stream Summary: the
Count-Min Sketch and its Applications", J. Algorithms 2005):

- The sketch is a ``depth x width`` grid of counters.  Every input row
  increments one counter per hash row: ``(d, bucket_d(key))``.
- In Spark this is ONE hash aggregation: explode each input row into
  ``depth`` ``(d, bucket)`` pairs and ``groupBy(d, bucket).count()``.
  Map-side partial aggregation collapses each task's contribution to at
  most ``depth * width`` rows before the shuffle, so the exchange
  carries a bounded number of rows **independent of input size** — the
  whole point of a sketch.  The materialized sketch is tiny
  (``depth * width`` rows) and mergeable across corpora/days by
  summing counters (``merge_cms``).
- Point estimates are biased high, never low:
  ``est(key) = min_d sketch[d][bucket_d(key)] >= true_count``.
  The estimate join broadcasts the sketch (bounded size) against the
  queried keys — corpus-sized data never shuffles a second time.

Hashes are the repo's portable md5 idiom (``functions/minhash.py:362``):
``bucket_d(key) = int(md5(d || ':' || key)[:8], 16) % width`` — computable
verbatim in DuckDB, so estimates are engine-identical and the catalog
entry is value-hash-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from event_streaming_toy_example_spark.functions.hashkeys import (
    NULL_KEY as _NULL_KEY,
)

#: Defaults sized so the sketch stays well under a broadcast threshold
#: (4 * 1024 counters = 8 KiB of longs) while keeping collision noise
#: visible at toy scale.
CMS_DEPTH = 4
CMS_WIDTH = 1024

#: NULL keys hash as one stable sentinel bucket on both engines —
#: the shared convention lives in functions/hashkeys.py.


def _bucket(key: Column, d: int, width: int) -> Column:
    """Portable bucket index: first 8 md5 hex chars as int, mod width."""
    salted = F.concat(
        F.lit(f"{d}:"), F.coalesce(key.cast("string"), F.lit(_NULL_KEY))
    )
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % width
    ).alias("b")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: one ``(d, b, cnt)`` row per non-empty counter.

    Explode-then-aggregate: the explode multiplies rows by ``depth``
    inside the map task, but the hash aggregate's partial (map-side)
    combine caps each task's shuffle output at ``depth * width`` rows,
    so the exchange is O(sketch), not O(data).
    """
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width) by summing
    counters — the property that lets per-day / per-shard sketches
    roll up without touching row data again."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("d", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for the keys in ``keys`` (any projection with
    ``key_col``): ``cms_est = min_d sketch[d][bucket_d(key)]``.

    The sketch is broadcast (bounded ``depth * width`` rows); the keys
    side expands by ``depth`` and aggregates right back down, so the
    only exchange is the final per-key min — and that one is
    partial-aggregatable too."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width))
            for d in range(depth)
        ]
    )
    exploded = keys.select(key_col, F.explode(cells).alias("c")).select(
        key_col, F.col("c.d").alias("d"), F.col("c.b").alias("b")
    )
    return (
        exploded.join(F.broadcast(sketch), ["d", "b"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


KMV_K = 64
#: md5-prefix hash space: 12 hex chars = 48 uniform bits
_KMV_SPACE = 16**12


def kmv_distinct(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.,
    "Counting Distinct Elements in a Data Stream", RANDOM 2002):
    hash keys uniformly, keep the k smallest distinct hash values; the
    k-th smallest estimates density, so
    ``n ~ (k-1) * SPACE / h_(k)``.

    Returns ONE row ``(exact_distinct, kmv_est)``.  The estimate is
    computed in pure BIGINT arithmetic ((k-1)*2^48 fits comfortably),
    so unlike HLL it is bit-identical across engines and the catalog
    entry is value-hash-checked — the only engine-specific part of
    most sketches (float estimator math) is eliminated by construction.
    When fewer than k distinct keys exist the sketch degrades to the
    exact count (it has seen every hash), identically on both sides.

    Scale shape: distinct hash values reduce map-side; the k-smallest
    selection is a global sort+limit, which Spark compiles to
    ``TakeOrderedAndProject`` — per-partition heaps merged on the
    driver, NO shuffle of the distinct set.  The sketch merges by
    union + re-take-k (union the top-k lists of shards, keep the k
    smallest), the same property the CMS relies on.

    The ``exact_distinct`` column is the verification twin a real
    pipeline would not compute; production use returns just the k-list.
    """
    h = F.conv(
        F.substring(
            F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL_KEY))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    hashes = df.select(h.alias("h")).distinct()
    stats = (
        hashes.orderBy("h")
        .limit(k)
        .agg(F.count(F.lit(1)).alias("kc"), F.max("h").alias("hk"))
    )
    exact = hashes.agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = F.when(
        F.col("kc") < k, F.col("exact_distinct")
    ).otherwise(F.expr(f"CAST({(k - 1) * _KMV_SPACE} AS BIGINT) div hk"))
    return exact.crossJoin(stats).select(
        "exact_distinct", est.alias("kmv_est")
    )


def sql_kmv_distinct(table_expr: str, key_expr: str, k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same md5 prefix, same
    integer estimator).  ``table_expr`` is a relation expression (table
    name or parenthesized subquery)."""
    key = f"coalesce(CAST({key_expr} AS VARCHAR), '{_NULL_KEY}')"
    return f"""
(WITH hashes AS (
  SELECT DISTINCT ('0x' || substr(md5({key}), 1, 12))::BIGINT AS h
  FROM {table_expr}
), topk AS (
  SELECT h FROM hashes ORDER BY h LIMIT {k}
), stats AS (
  SELECT count(*) AS kc, max(h) AS hk FROM topk
), ex AS (
  SELECT count(*) AS exact_distinct FROM hashes
)
SELECT ex.exact_distinct,
       CASE WHEN stats.kc < {k} THEN ex.exact_distinct
            ELSE CAST({(k - 1) * _KMV_SPACE} AS BIGINT) // stats.hk
       END AS kmv_est
FROM ex, stats)
"""


def sql_cms_estimates(
    table: str,
    key_expr: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin: exact per-key counts joined with the identical
    md5-bucket count-min estimate, for every distinct key in ``table``.
    Returns columns ``(key, exact_cnt, cms_est)``."""
    key = f"coalesce(CAST({key_expr} AS VARCHAR), '{_NULL_KEY}')"
    return f"""
WITH ds AS (SELECT unnest(range({depth})) AS d),
hashed AS (
  SELECT {key_expr} AS key, d,
         ('0x' || substr(md5(d::VARCHAR || ':' || {key}), 1, 8))::BIGINT
           % {width} AS b
  FROM {table}, ds
),
sketch AS (SELECT d, b, count(*) AS cnt FROM hashed GROUP BY d, b),
keyb AS (SELECT DISTINCT key, d, b FROM hashed),
est AS (
  SELECT keyb.key, min(sketch.cnt) AS cms_est
  FROM keyb JOIN sketch USING (d, b) GROUP BY keyb.key
),
exact AS (SELECT {key_expr} AS key, count(*) AS exact_cnt FROM {table} GROUP BY 1)
SELECT exact.key, exact.exact_cnt, est.cms_est
FROM exact JOIN est ON exact.key IS NOT DISTINCT FROM est.key
"""
