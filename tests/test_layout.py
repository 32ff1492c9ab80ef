"""Z-order layout: interleave correctness + measured file skipping."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.layout import (
    write_zordered,
    zorder_value,
)


def _morton_py(a: int, b: int) -> int:
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_value_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 1000)]
    df = spark.createDataFrame(rows, ["a", "b"]).select(
        "a", "b", zorder_value(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _morton_py(r["a"], r["b"]), (r["a"], r["b"])


def _files_touched(path: str, col_a, col_b, box) -> tuple[int, int]:
    """(files whose [min,max] stats intersect the box, total files)."""
    (a_lo, a_hi), (b_lo, b_hi) = box
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    touched = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        a_min = b_min = None
        a_max = b_max = None
        for rg in range(meta.num_row_groups):
            row = meta.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                name = c.path_in_schema
                st = c.statistics
                if st is None:
                    continue
                if name == col_a:
                    a_min = st.min if a_min is None else min(a_min, st.min)
                    a_max = st.max if a_max is None else max(a_max, st.max)
                elif name == col_b:
                    b_min = st.min if b_min is None else min(b_min, st.min)
                    b_max = st.max if b_max is None else max(b_max, st.max)
        if a_min is None or b_min is None:
            touched += 1  # no stats -> must read
        elif a_min <= a_hi and a_max >= a_lo and b_min <= b_hi and b_max >= b_lo:
            touched += 1
    return touched, len(files)


N_FILES = 64


def test_zorder_layout_skips_files_on_both_dims(spark, tmp_path):
    # every cell of a 200 x 200 (x, y) grid exactly once — genuinely
    # independent dimensions (a multiplicative-hash pair of the same id
    # is secretly bijective mod 200 and breaks the experiment)
    df = spark.range(40_000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") / 200).cast("long") % 200).alias("y"),
        F.col("id").alias("payload"),
    )
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    write_zordered(df, z_path, "x", "y", num_files=N_FILES)
    # baseline: the best SINGLE-column layout (perfect on x, none on y)
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lin_path)
    )

    # the value proposition is BALANCED pruning: a single-column sort
    # is perfect on its own column and useless on the other, z-order is
    # good on both. Compare an x-selective and a y-selective box.
    x_box = ((20, 39), (0, 199))    # 10% of x, all of y
    y_box = ((0, 199), (120, 139))  # all of x, 10% of y
    zx, z_total = _files_touched(z_path, "x", "y", x_box)
    zy, _ = _files_touched(z_path, "x", "y", y_box)
    lx, l_total = _files_touched(lin_path, "x", "y", x_box)
    ly, _ = _files_touched(lin_path, "x", "y", y_box)
    assert z_total == N_FILES and l_total == N_FILES
    assert ly == N_FILES           # single-col layout cannot prune y
    assert zy <= N_FILES // 2      # z-order skips a majority on y
    assert zx <= N_FILES // 2      # ... while still pruning x
    assert zx + zy < lx + ly       # and wins across the query mix

    # correctness: both layouts return identical box-query results
    za = (
        spark.read.parquet(z_path)
        .where("x BETWEEN 20 AND 39 AND y BETWEEN 120 AND 139")
        .agg(F.count("*"), F.sum("payload"))
        .collect()
    )
    la = (
        spark.read.parquet(lin_path)
        .where("x BETWEEN 20 AND 39 AND y BETWEEN 120 AND 139")
        .agg(F.count("*"), F.sum("payload"))
        .collect()
    )
    assert za == la
