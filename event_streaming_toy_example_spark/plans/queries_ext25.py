"""Round-4 additions (eighteenth wave): end-to-end entity resolution.

``entity_resolution`` composes three verified stages into the full ER
pipeline a real master-data / dedup system runs:

1. candidate pairs via deletion-neighborhood blocking
   (``functions/fuzzy.py`` — the blocked equi-join, never all-pairs);
2. transitive closure via min-label connected components
   (``operators/components.py``);
3. canonical-entity rollup: one row per resolved entity (label = the
   minimum member key) with member count, member-key checksum, and
   pooled balance.

The oracle re-derives ALL of it independently: the naive quadratic
levenshtein join for pairs and a WITH RECURSIVE reachability closure
for the components — so the driver hash verifies the blocking scheme,
the iterative label propagation, AND the rollup in one relation.
(``dedup_survivors`` checks components over minhash pairs;
this entry's oracle uses a genuinely different closure construction —
recursive SQL — and a different pair generator.)

Scale notes (100 TB): candidate generation is the deletion-key
equi-join (bounded ~|name|+1 keys per entity); components run
min-label propagation with per-round localCheckpoints (the
O(log^2 n) star variant is the high-diameter fallback, see
``components.py``); the rollup is one key aggregate.  Nothing
all-pairs, nothing driver-side beyond the convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import load_table


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy pairs -> connected components -> canonical entities; see
    module docstring.

    PLANTED cluster structure: the raw ``c_name`` values are
    zero-padded serial numbers, whose Hamming-1 graph is one giant
    component (verified: every customer collapses into a single entity
    at every SF) — a degenerate instance where the hash could not
    detect a broken blocking scheme or mislabeled components.  So the
    entity names are DERIVED with known ground truth instead: members
    of entity ``b = custkey // 3`` are named ``ent_{b}_{b}_{m}`` — the
    doubled base makes any cross-entity distance >= 2 while
    within-entity names differ by exactly the one member digit, so
    edit-distance-1 clustering must recover exactly the 3-member
    entities.  One dropped candidate pair splits an entity; one
    spurious pair merges two — either flips the hash (the planted-
    ground-truth construction of the PII-redaction entry)."""
    from event_streaming_toy_example_spark.functions.fuzzy import (
        fuzzy_match_pairs,
    )
    from event_streaming_toy_example_spark.operators.components import (
        connected_components,
    )

    cust = load_table(spark, sf_dir, "customer")
    base = (F.col("c_custkey") / 3).cast("long")
    named = cust.select(
        "c_custkey",
        "c_acctbal",
        F.concat(
            F.lit("ent_"),
            base,
            F.lit("_"),
            base,
            F.lit("_"),
            F.col("c_custkey") % 3,
        ).alias("ent_name"),
    )
    pairs = fuzzy_match_pairs(named, "c_custkey", "ent_name", max_dist=1)
    nodes = named.select(F.col("c_custkey").alias("id"))
    labels = connected_components(
        pairs.select(
            F.col("a_key").alias("id_a"), F.col("b_key").alias("id_b")
        ),
        nodes,
    )
    bal_cc = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        labels.join(named, labels["id"] == named["c_custkey"])
        .groupBy(F.col("label").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("id").alias("member_key_sum"),
            F.sum(bal_cc).alias("total_bal_cc"),
        )
    )


SQL_ENTITY_RESOLUTION = """
WITH RECURSIVE named AS (
  SELECT c_custkey, c_acctbal,
         'ent_' || (c_custkey // 3) || '_' || (c_custkey // 3) || '_'
                || (c_custkey % 3) AS ent_name
  FROM customer
),
sym AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM named a JOIN named b
    ON a.c_custkey <> b.c_custkey
   AND abs(length(a.ent_name) - length(b.ent_name)) <= 1
 WHERE levenshtein(a.ent_name, b.ent_name) <= 1
),
reach(id, lbl) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.id
),
lab AS (
  SELECT id, min(lbl) AS entity_id FROM reach GROUP BY id
)
SELECT lab.entity_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(lab.id) AS BIGINT) AS member_key_sum,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS total_bal_cc
FROM lab JOIN customer c ON lab.id = c.c_custkey
GROUP BY lab.entity_id
"""

# ------------------------------------------------------------ exports

EXT25_QUERIES = {
    "entity_resolution": q_entity_resolution,
}

EXT25_ORACLES = {
    "entity_resolution": SQL_ENTITY_RESOLUTION,
}
