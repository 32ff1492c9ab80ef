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

At 100 TB: this is the simple propagation variant. For adversarial
graphs with long chains, switch to alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — the same join shape per round, O(log^2 n) rounds.
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
    return labels
