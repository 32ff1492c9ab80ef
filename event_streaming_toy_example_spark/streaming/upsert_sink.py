"""Streaming MERGE sink: apply a change stream to a keyed table via
``foreachBatch``.

The reference appends NDJSON per batch and rewrites whole partitions
(``toy_lambda_function.py:64-69``, ``toy_glue.py:58-65``); it has no
keyed-table maintenance at all.  This module is the streaming CDC
APPLY surface: each micro-batch MERGEs into the current snapshot with
the same ``upsert_snapshot`` operator the batch catalog verifies
(newest row per key, changes win ties, tombstone deletes), so the
streaming sink and the batch upsert share one tested merge semantics.

Mechanics: ``foreachBatch`` runs the merge on the cluster and the
driver swaps a generation directory pointer afterwards — the
write-new-then-retarget pattern that stands in for a lakehouse
table's atomic commit.  Each generation is a complete snapshot, so a
replayed batch (failure/retry) regenerates the same state:
idempotent by construction.

Scale: the per-batch merge cost is one key shuffle over
``state ∪ batch`` with ``WindowGroupLimit`` pre-limiting (see
``operators/upsert.py``); a production deployment replaces the
full-snapshot rewrite with MERGE INTO on a format that supports
row-level commits (Delta/Iceberg) — the dataflow above it is
unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from event_streaming_toy_example_spark.operators.upsert import (
    upsert_snapshot,
)

_PTR = "CURRENT"


def _current_gen(state_dir: str) -> str | None:
    ptr = os.path.join(state_dir, _PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        gen = f.read().strip()
    path = os.path.join(state_dir, gen)
    return path if os.path.isdir(path) else None


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current snapshot, or None before the first commit."""
    path = _current_gen(state_dir)
    return spark.read.parquet(path) if path else None


def start_upsert_stream(
    changes: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    available_now: bool = True,
):
    """Run a streaming query that MERGEs ``changes`` (a streaming
    DataFrame) into the keyed snapshot under ``state_dir``."""
    os.makedirs(state_dir, exist_ok=True)
    spark = changes.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        state = read_state(spark, state_dir)
        merged = (
            upsert_snapshot(state, batch_df, keys, order_by)
            if state is not None
            else upsert_snapshot(
                batch_df.limit(0), batch_df, keys, order_by
            )
        )
        # every attempt writes a FRESH generation: a retried batch must
        # never overwrite the directory its own read side is scanning
        # (Spark deletes target files before the lazy read runs —
        # overwrite-in-place guts the committed state).  Re-merging an
        # already-applied batch is a semantic no-op (newest-per-key of
        # state ∪ same-rows = state), so retry idempotence comes from
        # the MERGE, and crash safety from write-new-then-swap.
        gen = f"gen_{batch_id}_{uuid.uuid4().hex[:8]}"
        out = os.path.join(state_dir, gen)
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(state_dir, f".{_PTR}.tmp")
        with open(tmp, "w") as f:
            f.write(gen)
        os.replace(tmp, os.path.join(state_dir, _PTR))
        # drop superseded generations (keep the one just committed)
        for d in os.listdir(state_dir):
            if d.startswith("gen_") and d != gen:
                shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)

    writer = changes.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
