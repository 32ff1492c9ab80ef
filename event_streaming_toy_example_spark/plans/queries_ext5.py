"""Oracle-checked query catalog — the Python-extension slow path done
right: Arrow-batched grouped-map (`applyInPandas`) and grouped-agg
(`pandas_udf`) operators, plus a scalar correlated subquery through the
SQL API. These prove the engine's UDF surface where built-ins genuinely
run out (custom per-group statistics), while keeping the data movement
pattern scalable: one hash shuffle on the group key, Arrow batches
across the Python boundary, no driver-side collection.

Same conventions as ``queries.py``: identical aliases both sides,
rounded floats, deterministic output.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from event_streaming_toy_example_spark.schemas import (
    load_table,
    register_testdata_views,
)

# --------------------------------------------------------------------------
# Grouped-map per-customer z-score outliers: scalable mapInPandas form
# (headline) + naive applyInPandas form (surface coverage)
# --------------------------------------------------------------------------

_ZSCORE_SCHEMA = StructType(
    [
        StructField("o_custkey", LongType()),
        StructField("o_orderkey", LongType()),
        StructField("zscore", DoubleType()),
    ]
)


def _zscore_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized z-score over a block holding only whole groups.

    ``transform("std")`` is sample stddev (ddof=1), matching SQL
    ``stddev_samp``; single-order customers (std = NaN) and
    zero-variance groups produce a False mask, same as the oracle's
    ``sd > 0`` guard.
    """
    g = pdf.groupby("o_custkey")["o_totalprice"]
    sd = g.transform("std")
    z = ((pdf["o_totalprice"] - g.transform("mean")) / sd).round(4)
    mask = sd.gt(0) & z.abs().gt(2)
    out = pdf.loc[mask, ["o_custkey", "o_orderkey"]].copy()
    out["zscore"] = z[mask]
    return out


def _zscore_batches(batches):
    """mapInPandas body: pandas-groupby each Arrow batch, carrying the
    trailing (possibly incomplete) group into the next batch. Requires
    rows sorted by o_custkey within the partition so each group is
    contiguous."""
    leftover = None
    for pdf in batches:
        if leftover is not None and len(leftover):
            pdf = pd.concat([leftover, pdf], ignore_index=True)
        if not len(pdf):
            continue
        tail = pdf["o_custkey"] == pdf["o_custkey"].iat[-1]
        leftover = pdf[tail]
        cur = pdf[~tail]
        if len(cur):
            yield _zscore_block(cur)
    if leftover is not None and len(leftover):
        yield _zscore_block(leftover)


def q_grouped_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-price z-scores through the Arrow boundary,
    shaped for many tiny groups: shuffle on o_custkey, task-local sort,
    then `mapInPandas` with a vectorized pandas groupby per ~10k-row
    Arrow batch. `applyInPandas` would make one Python call per
    customer (~1.6 ms/group measured — 24 s at sf0.1, unbounded at
    100 TB); this form amortizes the boundary over whole batches and is
    ~25x faster at identical semantics. Groups straddling an Arrow
    batch boundary are carried over, so correctness is independent of
    `spark.sql.execution.arrow.maxRecordsPerBatch`.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return (
        orders.repartition("o_custkey")
        .sortWithinPartitions("o_custkey")
        .mapInPandas(_zscore_batches, schema=_ZSCORE_SCHEMA)
    )


def _zscore_outliers_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group (one customer) z-score; emit |z| > 2 outliers."""
    x = pdf["o_totalprice"]
    sd = x.std(ddof=1)
    if not (sd and sd > 0):
        return pdf.iloc[0:0][["o_custkey", "o_orderkey"]].assign(zscore=0.0)
    z = ((x - x.mean()) / sd).round(4)
    out = pdf.loc[z.abs() > 2, ["o_custkey", "o_orderkey"]].copy()
    out["zscore"] = z[z.abs() > 2]
    return out


def q_zscore_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same z-scores via `groupBy().applyInPandas` — the grouped-map
    surface itself (one Python call per group). Correct and
    oracle-checked, but kept off the bench headline: per-group overhead
    dominates when groups are small (see q_grouped_zscore_outliers for
    the scale form)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return orders.groupBy("o_custkey").applyInPandas(
        _zscore_outliers_pdf, schema=_ZSCORE_SCHEMA
    )


SQL_GROUPED_ZSCORE_OUTLIERS = """
SELECT o_custkey, o_orderkey, zscore
FROM (
  SELECT o_custkey, o_orderkey,
         round((o_totalprice - avg(o_totalprice) OVER w)
               / stddev_samp(o_totalprice) OVER w, 4) AS zscore,
         stddev_samp(o_totalprice) OVER w AS sd
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey)
)
WHERE sd > 0 AND abs(zscore) > 2
"""


# --------------------------------------------------------------------------
# Grouped-agg pandas_udf: quantity-weighted average discount
# --------------------------------------------------------------------------


@F.pandas_udf(DoubleType())
def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    return float((v * w).sum() / w.sum())


# Spark disallows mixing GROUPED_AGG pandas UDFs with non-pandas
# aggregates in one agg() — so the row count rides along as a second
# pandas aggregate rather than a built-in count().
@F.pandas_udf(LongType())
def _count_rows(v: pd.Series) -> int:
    return len(v)


def q_weighted_avg_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean discount per return flag/status via a
    GROUPED_AGG `pandas_udf` — the Arrow aggregate path for custom
    reductions. Spark still plans a normal hash aggregate around it
    (shuffle on the group key), so it scales like any groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_weighted_mean("l_discount", "l_quantity"), 6).alias(
                "w_avg_discount"
            ),
            _count_rows("l_quantity").alias("n_lines"),
        )
    )


SQL_WEIGHTED_AVG_DISCOUNT = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS w_avg_discount,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Scalar + correlated subquery via the SQL API
# --------------------------------------------------------------------------

_SQL_ABOVE_AVG = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_big_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""


def q_sql_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders 1.5x above the global mean price, by priority — a scalar
    subquery through `spark.sql`. Catalyst executes the subquery once
    and broadcasts the scalar into the filter, which is pushed to the
    scan; the oracle runs the identical text."""
    register_testdata_views(spark, sf_dir, ("orders",))
    return spark.sql(_SQL_ABOVE_AVG)


EXT5_QUERIES = {
    "grouped_zscore_outliers": q_grouped_zscore_outliers,
    "zscore_grouped_map": q_zscore_grouped_map,
    "weighted_avg_discount": q_weighted_avg_discount,
    "sql_above_avg_orders": q_sql_above_avg_orders,
}

EXT5_ORACLES = {
    "grouped_zscore_outliers": SQL_GROUPED_ZSCORE_OUTLIERS,
    "zscore_grouped_map": SQL_GROUPED_ZSCORE_OUTLIERS,
    "weighted_avg_discount": SQL_WEIGHTED_AVG_DISCOUNT,
    "sql_above_avg_orders": _SQL_ABOVE_AVG,
}
