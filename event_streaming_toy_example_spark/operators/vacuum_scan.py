"""Executor-side data-tree listing for the DISTRIBUTED vacuum
(VERDICT r8 item 5).

``txtable.vacuum`` selects victims by diffing the store listing
against the live-file set.  Driver-side that is one recursive LIST
plus an O(table) python diff — the classic object-store slow path at a
million files.  The distributed form keeps exactly ONE driver LIST
(the top-level ``data/`` prefix list) and fans the per-prefix listing
out to executors as a ``mapInPandas`` over the prefix list, then
anti-joins the listing against the live-file inventory
(``checkpoint_files_df`` + recent commit adds) as a Spark join.

The executor scan walks the filesystem directly (``os.scandir``) —
the same layer executors use to read parquet by path: on a real
deployment this is the s3a/dbfs connector's parallel LIST, and the
driver-resident LogStore abstraction intentionally does not reach
into executors.  That is why this helper lives OUTSIDE ``txtable.py``:
the static gate (``tests/test_logstore.py``) pins the metadata plane
there to the store interface, while this module is executor-side
content I/O by construction.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def scan_prefixes(
    spark: SparkSession, table_path: str, prefixes: list[str]
) -> DataFrame:
    """``(rel, mtime)`` for every file under the given ABSOLUTE prefix
    directories, listed BY EXECUTORS (one task per chunk of prefixes —
    the write-once ``data/s-*`` layout gives one prefix per historical
    transaction, so a long-lived table fans out wide).  ``rel`` is the
    table-relative name (``data/...``) the commit log uses."""
    import pandas as pd

    data_marker = "/data/"

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rels: list[str] = []
            mtimes: list[float] = []
            for prefix in pdf["prefix"]:
                if os.path.isfile(prefix):
                    # legacy FLAT layout: data/<file> directly
                    try:
                        mt = os.stat(prefix).st_mtime
                    except OSError:
                        continue
                    rels.append(
                        "data/" + prefix.rsplit(data_marker, 1)[-1]
                    )
                    mtimes.append(mt)
                    continue
                for root, _dirs, files in os.walk(prefix):
                    for f in files:
                        full = os.path.join(root, f)
                        try:
                            mt = os.stat(full).st_mtime
                        except OSError:
                            continue  # raced a concurrent delete
                        rels.append(
                            "data/" + full.rsplit(data_marker, 1)[-1]
                        )
                        mtimes.append(mt)
            yield pd.DataFrame({"rel": rels, "mtime": mtimes})

    prefixes_df = spark.createDataFrame(
        [(p,) for p in prefixes], "prefix string"
    )
    n = max(1, min(len(prefixes), 64))
    return prefixes_df.repartition(n).mapInPandas(
        scan, "rel string, mtime double"
    )
