"""Connected components on DataFrames — duplicate-cluster formation.

A near-dup pipeline emits *pairs* (MinHash/LSH, SimHash, n-gram
Jaccard); deduplication needs *clusters*: group transitively-connected
docs and keep one canonical survivor per cluster. That is connected
components over the pair graph.

Spark-first shape: iterative min-label propagation using only joins and
aggregates — no RDDs, no GraphX dependency, no Python. Each round is
one equi-join (edge src -> current label) plus one min-aggregate per
node: two key shuffles. Labels converge in <= graph-diameter rounds;
near-dup graphs are overwhelmingly tiny cliques/stars (diameter 2-3),
so real corpora settle in a handful of rounds. ``localCheckpoint``
truncates lineage each round so the plan does not grow with iterations,
and the changed-label count doubles as the convergence test.

Two variants, same ``(id, label)`` contract:

- ``connected_components`` — simple min-label propagation, O(diameter)
  rounds. Near-dup graphs are overwhelmingly tiny cliques/stars
  (diameter 2-3), so this settles in a handful of rounds; it RAISES if
  the round budget is exhausted before convergence rather than
  returning silently-truncated labels.
- ``connected_components_star`` — alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14), O(log^2 n) rounds regardless of diameter: the 100 TB /
  adversarial-chain path. Each phase is one groupBy-min plus one
  equi-join over the edge list — the same shuffle shape as a round of
  propagation, just fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """Label each node with the minimum node id of its component.

    ``pairs``: undirected edges as columns ``id_a``, ``id_b``.
    ``nodes``: one row per node, column ``id`` (isolated nodes become
    singleton clusters). Returns ``id, label`` — deterministic.

    Raises ``RuntimeError`` if labels have not converged within
    ``max_iter`` rounds (long-chain graphs): non-converged labels are
    silently WRONG clusters, so failing loudly beats returning them.
    Use ``connected_components_star`` for high-diameter graphs.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            edges.alias("e")
            .join(labels.alias("l"), F.col("e.src") == F.col("l.id"))
            .groupBy(F.col("e.dst").alias("id"))
            .agg(F.min("l.label").alias("nbr_label"))
        )
        new_labels = (
            labels.alias("l")
            .join(nbr_min.alias("n"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("l.label"),
                    F.coalesce(F.col("n.nbr_label"), F.col("l.label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            f"({changed} labels still changing) — the pair graph has a longer "
            "diameter than min-label propagation is budgeted for; use "
            "connected_components_star (O(log^2 n) rounds) instead"
        )
    return labels


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node connects its LARGER neighbors to the
    minimum of its neighborhood (incl. itself). Input and output are
    symmetric edge lists without self-loops."""
    m = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least(F.col("src"), F.col("mn")).alias("m"))
    )
    out = (
        edges.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return _symmetric(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient edges larger->smaller; every node connects
    its smaller neighbors (and itself) to the minimum of them. Output
    is a symmetric edge list without self-loops."""
    oriented = edges.where(F.col("src") > F.col("dst"))
    m = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    out = (
        oriented.join(m, "src")
        .where(F.col("dst") != F.col("mn"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .unionAll(m.select(F.col("src"), F.col("mn").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return _symmetric(out)


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame,
    max_iter: int = 40,
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., SoCC'14) — converges in O(log^2 n) phase pairs on
    ANY graph, including long chains where plain min-label propagation
    needs O(diameter) rounds. Same contract as
    ``connected_components``: ``pairs(id_a, id_b)``, ``nodes(id)`` ->
    ``(id, label)`` with label = component minimum.

    Convergence test: the edge set is a fixed point of
    large-star ∘ small-star (checked by an order-insensitive checksum:
    count + bit_xor of per-edge xxhash64 — xor can't overflow under
    ANSI arithmetic and is collision-safe enough for a convergence
    heuristic; each phase only moves edges toward the component
    minimum, so a checksum tie at the fixed point is stable).
    """
    edges = _symmetric(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"]).localCheckpoint()

    def _checksum(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _checksum(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star did not converge within {max_iter} "
            "phase pairs — unexpected for O(log^2 n) convergence; check the "
            "input pair graph for pathological duplication"
        )
    # fixed point = union of stars centered at each component minimum:
    # a node's label is its minimum neighbor (or itself if isolated)
    labels = edges.groupBy(F.col("src").alias("id")).agg(
        F.min("dst").alias("nbr_min")
    )
    return (
        nodes.select("id")
        .join(labels, "id", "left")
        .select(
            "id",
            F.least(F.col("id"), F.coalesce(F.col("nbr_min"), F.col("id"))).alias(
                "label"
            ),
        )
    )
