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
_LOG = "COMMITS"


def _commit_log(state_dir: str) -> list[str]:
    """Committed generation names, oldest first; only entries whose
    directory still exists (older ones may be retention-pruned)."""
    log = os.path.join(state_dir, _LOG)
    if not os.path.exists(log):
        return []
    with open(log) as f:
        gens = [line.strip() for line in f if line.strip()]
    return [g for g in gens if os.path.isdir(os.path.join(state_dir, g))]


def _current_gen(state_dir: str) -> str | None:
    ptr = os.path.join(state_dir, _PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        gen = f.read().strip()
    path = os.path.join(state_dir, gen)
    return path if os.path.isdir(path) else None


def read_state(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame | None:
    """Snapshot read with TIME TRAVEL: ``version=None`` reads the
    current commit; a negative ``version`` indexes back from it
    (``-2`` = the snapshot one commit before current) and a
    non-negative one indexes the retained commit log from its oldest
    entry.  Returns None before the first commit; raises IndexError
    for a version outside the retained window (pruned by
    ``keep_generations``)."""
    if version is None:
        path = _current_gen(state_dir)
        return spark.read.parquet(path) if path else None
    gens = _commit_log(state_dir)
    if not gens:
        return None
    try:
        gen = gens[version]
    except IndexError:
        raise IndexError(
            f"version {version} outside the retained window of "
            f"{len(gens)} commits (older generations were pruned)"
        ) from None
    return spark.read.parquet(os.path.join(state_dir, gen))


def list_versions(state_dir: str) -> list[str]:
    """Retained commit ids, oldest first (the time-travel index)."""
    return _commit_log(state_dir)


def start_upsert_stream(
    changes: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    available_now: bool = True,
    keep_generations: int = 1,
):
    """Run a streaming query that MERGEs ``changes`` (a streaming
    DataFrame) into the keyed snapshot under ``state_dir``.

    ``keep_generations`` is the retention window: how many committed
    snapshots stay readable via ``read_state(version=...)`` — the
    time-travel surface a lakehouse table format provides (1 = only
    the current snapshot, the minimum)."""
    if keep_generations < 1:
        raise ValueError(f"keep_generations must be >= 1: {keep_generations}")
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
        with open(os.path.join(state_dir, _LOG), "a") as f:
            f.write(gen + "\n")
        # retention: keep the newest `keep_generations` committed
        # snapshots readable (time travel), prune everything older
        keep = set(_commit_log(state_dir)[-keep_generations:]) | {gen}
        for d in os.listdir(state_dir):
            if d.startswith("gen_") and d not in keep:
                shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)

    writer = changes.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
