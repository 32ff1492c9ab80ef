"""Fixed-iteration PageRank in exact integer arithmetic.

The reference has no iterative-algorithm surface at all (its closest
thing is the per-batch loop in ``run_toy_example.py:1-49``); a graph
signal (authority of a domain, centrality of an entity) is a standard
feature in large-scale data curation, so the engine provides the
canonical iterative example as a first-class operator.

Design decisions, all in service of *cross-engine bit-exactness* and
*scale*:

- **Integer parts-per-billion ranks.**  Float PageRank is summation-
  order dependent — a distributed engine cannot promise the same
  double twice, let alone match a single-threaded oracle.  Here every
  rank is a ``long`` in ppb; each edge contributes
  ``(rank * w) div out_w`` (exact integral division, truncation), and
  integer addition is associative+commutative, so ANY partitioning or
  aggregation order yields identical bits.  Truncation loses < 1 ppb
  per in-edge per iteration — irrelevant to ranking, critical to
  verifiability (the DuckDB oracle reproduces the exact longs).
- **Unrolled iterations, one join + one aggregate each.**  PageRank at
  scale is the Pregel pattern: shuffle contributions by dst, aggregate
  (map-side combinable), rejoin ranks to the edge list.  The edge list
  with its precomputed ``out_w`` is the loop invariant — it is
  ``persist()``-ed once; at cluster scale it would also be
  pre-partitioned by ``src`` so each iteration's rank join reuses one
  partitioning instead of re-shuffling the (large) edge side.
- **Fixed iteration count** rather than convergence polling keeps the
  plan static and the oracle expressible as a CTE chain.  Dangling
  nodes (no out-edges) leak their mass — documented PageRank variant;
  both engines implement the same choice so results agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from event_streaming_toy_example_spark.caching import track

TOTAL_PPB = 1_000_000_000


def pagerank_ppb(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    n_nodes: int,
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer PageRank over ``nodes(node_id)`` /
    ``edges(src, dst, w)``; returns ``(node_id, rank_ppb)``.

    ``n_nodes`` is passed by the caller (a driver-side scalar like the
    connected-components convergence checksum — legitimate control
    flow, not data movement).
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100): {damping_pct}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    base = (100 - damping_pct) * TOTAL_PPB // (100 * n_nodes)
    init = TOTAL_PPB // n_nodes

    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # loop invariant: edge list + out-degree, shuffled once and reused
    # by every iteration
    en = track(edges.join(out_w, "src").persist())

    ranks = nodes.select(
        "node_id", F.lit(init).cast("long").alias("rank_ppb")
    )
    for _ in range(iterations):
        contribs = (
            en.join(ranks, en["src"] == ranks["node_id"])
            .select(
                F.col("dst"),
                F.expr("rank_ppb * w div out_w").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, nodes["node_id"] == contribs["dst"], "left")
            .select(
                "node_id",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_pct} * coalesce(in_sum, 0L) div 100"
                    )
                ).cast("long").alias("rank_ppb"),
            )
        )
    return ranks


def sql_pagerank_ppb(
    nodes_rel: str,
    edges_rel: str,
    *,
    n_nodes: int,
    iterations: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB CTE-chain twin of :func:`pagerank_ppb`.

    ``nodes_rel`` must yield ``node_id``; ``edges_rel`` must yield
    ``(src, dst, w)``.  Returns a relation ``(node_id, rank_ppb)``.
    """
    base = (100 - damping_pct) * TOTAL_PPB // (100 * n_nodes)
    init = TOTAL_PPB // n_nodes
    ctes = [
        f"nodes AS ({nodes_rel})",
        f"en AS (SELECT e.src, e.dst, e.w, o.out_w FROM ({edges_rel}) e "
        "JOIN (SELECT src, sum(w) AS out_w FROM "
        f"({edges_rel}) GROUP BY src) o USING (src))",
        f"r0 AS (SELECT node_id, CAST({init} AS BIGINT) AS rank_ppb "
        "FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"r{i} AS (SELECT n.node_id, CAST({base} + "
            f"({damping_pct} * coalesce(s.in_sum, 0)) // 100 AS BIGINT) "
            "AS rank_ppb FROM nodes n LEFT JOIN ("
            "SELECT en.dst, sum((r.rank_ppb * en.w) // en.out_w) AS in_sum "
            f"FROM en JOIN r{i - 1} r ON en.src = r.node_id GROUP BY en.dst"
            ") s ON n.node_id = s.dst)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node_id, rank_ppb FROM r{iterations}"
    )
