"""Oracle-checked query catalog — breadth: a six-way join with a
co-location constraint (TPC-H Q5 shape — the canonical Catalyst
join-reordering / broadcast-selection showcase), JSON payload
extraction (the `props` column is a JSON document, as event payloads
are in practice), and a wide scalar-function surface (date parts,
string ops, conditionals) proving function parity with ANSI SQL.

Same conventions as ``queries.py``: identical aliases both sides,
rounded floats, deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.schemas import load_table

# --------------------------------------------------------------------------
# TPC-H Q5 shape: local-supplier volume
# --------------------------------------------------------------------------


def q_join_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation for orders where the customer and the line's
    supplier share a nation, region ASIA, one order year. Six-way join:
    the big fact-fact join (orders x lineitem) shuffles once on the
    order key; every dimension (customer, supplier, nation, region) is
    broadcast, so adding dimensions never adds shuffles."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


SQL_JOIN_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# JSON payload extraction
# --------------------------------------------------------------------------


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a typed field out of the JSON `props` payload
    (`get_json_object` — JVM-side JSON path, no Python) and aggregate
    it per event type. This is the semi-structured-payload pattern the
    reference sidesteps by inferring a fixed struct (SURVEY.md §1.3);
    at 100 TB keep hot fields extracted at ingest and cold ones as
    JSON."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("long").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


SQL_JSON_PROPS_STATS = """
SELECT event_type,
       CAST(count(k) AS BIGINT) AS n_with_k,
       min(k) AS min_k,
       max(k) AS max_k,
       round(avg(k), 4) AS avg_k
FROM (SELECT event_type, CAST(props::JSON->>'k' AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Scalar-function surface
# --------------------------------------------------------------------------


def q_scalar_surface_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A wide slice of the scalar library in one aggregation: date
    parts (year/quarter/month/dayofweek), string ops (regexp_extract,
    substring, lower/concat), conditional logic, and math — all JVM
    column expressions inside whole-stage codegen, zero Python."""
    o = load_table(spark, sf_dir, "orders")
    prio_num = F.regexp_extract("o_orderpriority", r"^(\d+)", 1).cast("long")
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            prio_num.alias("prio_num"),
            F.concat(
                F.lower(F.substring("o_orderstatus", 1, 1)),
                F.lit("-"),
                F.lpad(prio_num.cast("string"), 2, "0"),
            ).alias("status_prio"),
            F.when(F.col("o_totalprice") > 200000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.col("o_totalprice"),
        )
        .groupBy("yr", "qtr", "price_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("prio_num"), 4).alias("avg_prio"),
            F.count_distinct(F.col("status_prio")).cast("long").alias(
                "n_status_prio"
            ),
        )
    )


SQL_SCALAR_SURFACE_ORDERS = r"""
SELECT year(o_orderdate) AS yr,
       quarter(o_orderdate) AS qtr,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       round(avg(CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS BIGINT)), 4) AS avg_prio,
       CAST(count(DISTINCT lower(substring(o_orderstatus, 1, 1)) || '-' ||
                 lpad(CAST(CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS BIGINT) AS VARCHAR), 2, '0'))
            AS BIGINT) AS n_status_prio
FROM orders
GROUP BY 1, 2, 3
"""


EXT4_QUERIES = {
    "join_local_supplier_volume": q_join_local_supplier_volume,
    "json_props_stats": q_json_props_stats,
    "scalar_surface_orders": q_scalar_surface_orders,
}

EXT4_ORACLES = {
    "join_local_supplier_volume": SQL_JOIN_LOCAL_SUPPLIER_VOLUME,
    "json_props_stats": SQL_JSON_PROPS_STATS,
    "scalar_surface_orders": SQL_SCALAR_SURFACE_ORDERS,
}
