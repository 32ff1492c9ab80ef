"""File-shape knobs on the processed-parquet sink: per-file row caps
(the 100 MB-1 GB target file size, BASELINE.md) and task-local sorting
for parquet min/max row-group skipping."""

from __future__ import annotations

import glob

import pandas as pd
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators.partitioning import (
    write_processed_parquet,
)


def _events_df(spark, n=400):
    return spark.range(n).select(
        (F.lit(1704067200) + (F.col("id") % 2) * 3600).cast("double").alias(
            "created_at"
        ),
        F.concat(F.lit("lang_"), (F.col("id") % 2).cast("string")).alias(
            "language_id"
        ),
        (F.col("id") * 37 % 1000).alias("v"),
    )


def test_max_records_per_file_caps_file_size(spark, tmp_path):
    out = str(tmp_path / "capped")
    write_processed_parquet(
        _events_df(spark), out, max_records_per_file=50, compression="zstd"
    )
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert files, "no parquet files written"
    sizes = [len(pd.read_parquet(f)) for f in files]
    assert max(sizes) <= 50, sizes
    assert sum(sizes) == 400


def test_sort_within_partitions_orders_rows_in_files(spark, tmp_path):
    out = str(tmp_path / "sorted")
    write_processed_parquet(
        _events_df(spark), out, sort_within_partitions=["v"]
    )
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert files
    for f in files:
        vs = pd.read_parquet(f)["v"].tolist()
        assert vs == sorted(vs), f
