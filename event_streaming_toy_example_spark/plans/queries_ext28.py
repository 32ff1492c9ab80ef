"""Round-4 additions (twenty-first wave): LATERAL correlated
subqueries and the pandas API on Spark.

``sql_lateral_topn`` — a correlated LATERAL subquery (per-nation
top-2 customers by account balance) through the ``spark.sql`` string
surface.  The SAME SQL text runs on both engines (Spark and the
DuckDB oracle both accept the ``FROM t, LATERAL (...)`` form), so the
entry proves the surface, not a translation.  The scale story is the
interesting part: Catalyst DECORRELATES the lateral — the physical
plan is a per-key ``row_number`` window over the fact side plus a
broadcast hash join against the dim, not a per-outer-row subquery
execution.  At 100 TB that is the difference between one shuffle and
|nation| scans; ``tests/test_plans.py`` pins the decorrelated shape
(no cartesian, broadcast join, Window present).

``ps_pandas_api_stats`` — the pandas API on Spark
(``pyspark.pandas``), the third *user-facing dialect* after the
DataFrame DSL and SQL text.  A pandas-shaped program (``assign`` /
``groupby(as_index=False).agg`` with named aggregates) compiles to
the SAME Catalyst plan family as the native groupBy entries — the
entry exists to pin that the dialect is a front-end, not an engine:
``to_spark()`` hands back a plain DataFrame whose aggregate is
hash-checked against the ANSI oracle like every other entry.  Exact
integer cents throughout (the repo's cross-engine float rule).

Reference parity note: the reference repo (432 lines of
record-at-a-time Python; see SURVEY.md §2) has no SQL or pandas
surface at all — both entries are §2.8 extensions, part of making the
engine a complete replacement rather than a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import (
    load_table,
    register_testdata_views,
)

# Shared verbatim between Spark and the DuckDB oracle: both engines
# accept comma-LATERAL, CAST(round(x*100) AS BIGINT) is the repo's
# validated exact-cents convention, and the (bal_cents DESC, c_name)
# ordering key is unique per nation so top-2 is deterministic.
_SQL_LATERAL_TOPN = """
SELECT n.n_name AS nation, t.cust, t.bal_cents
FROM nation n, LATERAL (
    SELECT c_name AS cust,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY bal_cents DESC, c_name
    LIMIT 2
) t
ORDER BY nation, bal_cents DESC, cust
"""


def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers via a correlated LATERAL subquery;
    same SQL text as the oracle (see module docstring)."""
    register_testdata_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_SQL_LATERAL_TOPN)


SQL_SQL_LATERAL_TOPN = _SQL_LATERAL_TOPN


def q_ps_pandas_api_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status revenue profile written in the pandas dialect
    (``pyspark.pandas``), answered as a plain Spark DataFrame.

    ``as_index=False`` keeps the group key a column (no pandas index
    materializes, so ``to_spark()`` round-trips without an index
    column and without the distributed-default-index machinery);
    ``Series.round`` compiles to ``F.round`` (HALF_UP), matching the
    oracle's ``round()`` — the same cents convention every native
    entry uses."""
    import pyspark.pandas as ps  # noqa: F401  (dialect under test)

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    pdf = orders.pandas_api()
    cents = (pdf.o_totalprice * 100).round().astype("int64")
    g = (
        pdf.assign(cents=cents)
        .groupby("o_orderstatus", as_index=False)
        .agg(
            n_orders=("o_orderstatus", "count"),
            total_cents=("cents", "sum"),
            max_cents=("cents", "max"),
        )
    )
    out = g.to_spark()
    return out.orderBy("o_orderstatus")


SQL_PS_PANDAS_API_STATS = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS max_cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_sql_udf_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 ``CREATE FUNCTION …
    RETURN expr``) used inside a grouped aggregate.

    The point this entry pins: a SQL UDF is NOT a UDF in the execution
    sense — Catalyst inlines the body into the caller's plan, so the
    physical plan is the same partial/final HashAggregate over a
    codegen expression as if the formula were written inline (no
    Python/eval node of any kind; plan-asserted).  This is the
    zero-cost path for shared business formulas at 100 TB — the
    contrast to the registered-Python-UDTF slow-path surface
    (``queries_ext7``).  Exact integer cents per the repo's
    cross-engine convention."""
    register_testdata_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rev_cents(price DOUBLE, "
        "disc DOUBLE) RETURNS BIGINT "
        "RETURN CAST(round(price * (1 - disc) * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(rev_cents(l_extendedprice, l_discount)) AS revenue_cents,
               max(rev_cents(l_extendedprice, l_discount)) AS max_item_cents,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


# the oracle inlines the function body — which is exactly what Catalyst
# does on the Spark side (the semantic claim under test)
SQL_SQL_UDF_INLINE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       max(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS max_item_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


_CONTAM_RATE = 0.05
_CONTAM_SALT = "bench"
_CONTAM_K = 3


def q_curate_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional benchmark-contamination report: for EVERY corpus doc
    (not just hits), its shingle count, how many of those shingles
    appear in the benchmark split, and the contamination rate in
    exact integer ppm — the report a training-data release actually
    publishes, where the boolean ``curate_decontaminate`` twin only
    lists offenders.

    Plan shape for 100 TB (same family as the boolean twin): benchmark
    shingles are tiny and broadcast; the corpus builds shingles
    row-locally, explodes, LEFT-broadcast-joins to mark membership,
    and pays exactly one exchange — the per-doc aggregate.  The ppm is
    integer arithmetic end-to-end (the repo's cross-engine rule)."""
    from event_streaming_toy_example_spark.functions.curation import hash_gate
    from event_streaming_toy_example_spark.functions.minhash import shingle_array

    docs = load_table(spark, sf_dir, "documents")
    gate = hash_gate(F.col("doc_id"), _CONTAM_RATE, _CONTAM_SALT)
    bench_sh = (
        docs.where(gate)
        .select(F.explode(shingle_array(F.col("text"), _CONTAM_K)).alias("shingle"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corp_sh = docs.where(~gate).select(
        "doc_id",
        F.size(shingle_array(F.col("text"), _CONTAM_K)).alias("n_shingles"),
        F.explode(shingle_array(F.col("text"), _CONTAM_K)).alias("shingle"),
    )
    return (
        corp_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_shingles").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_ppm",
            F.expr("n_contaminated * 1000000L div n_shingles"),
        )
    )


def _sql_curate_contamination_score() -> str:
    from event_streaming_toy_example_spark.functions.curation import sql_hash_gate
    from event_streaming_toy_example_spark.plans.queries_ext import (
        _sql_shingles,
        _sql_tokens,
    )

    gate = sql_hash_gate("doc_id", _CONTAM_RATE, _CONTAM_SALT)
    toks = _sql_tokens("text")
    shingles = _sql_shingles("toks", _CONTAM_K)
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks, {gate} AS is_bench FROM documents
),
s AS (
  SELECT doc_id, is_bench, {shingles} AS sh FROM t
),
bench_sh AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM s WHERE is_bench
),
corp_sh AS (
  SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS shingle
  FROM s WHERE NOT is_bench
)
SELECT c.doc_id,
       CAST(max(c.n_shingles) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST((CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) * 1000000) // max(c.n_shingles)
            AS BIGINT) AS contamination_ppm
FROM corp_sh c LEFT JOIN bench_sh b USING (shingle)
GROUP BY c.doc_id
"""


EXT28_QUERIES = {
    "sql_lateral_topn": q_sql_lateral_topn,
    "ps_pandas_api_stats": q_ps_pandas_api_stats,
    "sql_udf_inline": q_sql_udf_inline,
    "curate_contamination_score": q_curate_contamination_score,
}

EXT28_ORACLES = {
    "sql_lateral_topn": SQL_SQL_LATERAL_TOPN,
    "ps_pandas_api_stats": SQL_PS_PANDAS_API_STATS,
    "sql_udf_inline": SQL_SQL_UDF_INLINE,
    "curate_contamination_score": _sql_curate_contamination_score(),
}
