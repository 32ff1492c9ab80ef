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


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids (by
    cosine). Centroids are broadcast; assignment is a map-side scored
    cross join + per-vector top-``n_probe`` — O(|corpus| * n_cells)
    dot products, the standard IVF build/probe cost."""
    scored = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(centroids)).select(
        "vid",
        "vec",
        "cell",
        cosine_similarity(F.col("vec"), F.col("cent")).alias("cscore"),
    )
    w = Window.partitionBy("vid").orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= n_probe)
        .select("vid", "vec", "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: partition
    the corpus into ``n_cells`` Voronoi cells around sampled centroids,
    then search only the ``n_probe`` cells nearest each query —
    cost ~ corpus * n_probe / n_cells per query instead of the whole
    corpus.

    Centroids here are a deterministic pseudo-random sample of corpus
    vectors (seeded hash order). At 100 TB you would train them with
    k-means (sample -> MLlib KMeans -> store); the index build, probe
    routing, and search plan — broadcast centroids, map-side
    assignment, equi-join on cell id, per-query top-k — are identical
    either way, and that plan is what this implements.
    """
    centroids = F.broadcast(
        corpus.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cent"))
        .orderBy(F.xxhash64(F.col("cell"), F.lit(seed)))
        .limit(n_cells)
    )
    # index: each corpus vector lives in exactly one cell
    indexed = ivf_assign(corpus, centroids, id_col, vec_col, n_probe=1).select(
        F.col("vid").alias("neighbor_id"), F.col("vec").alias("c_vec"), "cell"
    )
    # probe: each query searches its n_probe nearest cells
    probes = ivf_assign(queries, centroids, id_col, vec_col, n_probe=n_probe).select(
        F.col("vid").alias("query_id"), F.col("vec").alias("q_vec"), "cell"
    )
    # (query_id, neighbor_id) is already unique here: ivf_assign ranks
    # over distinct cells, each corpus vector lives in exactly one cell,
    # and each query probes n_probe DISTINCT cells — so no dedup pass
    # (and its full pair shuffle) is needed before the top-k window.
    scored = (
        indexed.join(F.broadcast(probes), ["cell"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
            ).alias("cosine"),
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
