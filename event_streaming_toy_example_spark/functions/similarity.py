"""Similarity search over embedding columns (``array<float>``).

Baseline: exact brute-force cosine top-k — a broadcast join of the
(small) query set against the corpus plus a per-query top-k. The
dot product is a single Catalyst ``aggregate`` over ``zip_with`` —
JVM-side, no UDF, no Python.

Scale path: random-hyperplane LSH bucketing — each vector gets a
b-bit signature (sign of dot with b pseudo-random planes); neighbors
are searched only within matching buckets (multi-probe = also adjacent
buckets). Turns the corpus scan per query into a bucket scan.

An IVF-style variant with learned centroids (KMeans) belongs in
pyspark.ml; the LSH variant here needs no training pass, which matters
when the corpus churns daily.

Precision note for oracle checking: all arithmetic is double (floats
are cast first), accumulation is element-order sequential in both Spark
``aggregate`` and DuckDB's list functions, so results are bit-stable
across engines; outputs are rounded to 6 dp anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    One broadcast nested-loop join (no shuffle of the corpus), one
    window top-k per query. Ordering ties break on neighbor id so the
    result is total-deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_signature(vec: Column, dim: int, bits: int = 8, seed: int = 42) -> Column:
    """b-bit random-hyperplane LSH signature. Plane coefficients are
    pseudo-random in {-1,+1} derived from ``xxhash64(seed, bit, dim_idx)``
    — deterministic, no stored model, identical on every executor."""
    sig = F.lit(0).cast("long")
    for b in range(bits):
        coeffs = F.array(
            *[
                F.when(
                    F.xxhash64(F.lit(f"plane:{seed}:{b}"), F.lit(j)) % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
                for j in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket (or
    differ by exactly one bit — single-probe multi-probe). The join is
    an equi-join on bucket id, so cost ~ corpus/2^bits per query bucket
    instead of the whole corpus."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), dim, bits, seed).alias("bucket"),
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), dim, bits, seed).alias("bucket"),
    )
    # multi-probe: original bucket + each 1-bit flip
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)]
    )
    q = q_base.select(
        "query_id", "q_vec", F.explode(probes).alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking groups
    (exact within block; use LSH buckets as blocks when no natural
    block key exists)."""
    sel = [F.col(id_col).alias("id"), F.col(vec_col).alias("vec")]
    if block_col:
        sel.append(F.col(block_col).alias("block"))
    v = df.select(*sel)
    l, r = v.alias("l"), v.alias("r")
    cond = F.col("l.id") < F.col("r.id")
    if block_col:
        cond = cond & (F.col("l.block") == F.col("r.block"))
    return (
        l.join(r, cond)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            *( [F.col("l.block").alias(block_col)] if block_col else [] ),
            F.round(cosine_similarity(F.col("l.vec"), F.col("r.vec")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
