"""LEGACY ADAPTER — streaming MERGE sink over a generation-pointer
snapshot store.  The engine's table stack is the unified transactional
log (``operators/txtable.py``); the streaming MERGE surface on it is
``txtable.tx_upsert_stream`` (exactly-once via the per-app batch token)
and the catalog's ``stream_upsert_sink`` entry commits through it since
round 6.  This module remains for deployments that want a
whole-snapshot-per-commit store with no log to manage; its
crash-injection suite (``tests/test_upsert.py``) still runs.

Streaming MERGE sink: apply a change stream to a keyed table via
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


def _pointer_name(state_dir: str) -> str | None:
    """Raw generation name the pointer designates, or None.  The
    atomic pointer swap IS the commit point — a generation is
    committed iff the pointer has ever designated it."""
    ptr = os.path.join(state_dir, _PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        gen = f.read().strip()
    return gen or None


def _commit_log(state_dir: str) -> list[str]:
    """Committed generation names, oldest first; only entries whose
    directory still exists (older ones may be retention-pruned).

    The pointer is the commit point and the log is appended AFTER the
    swap, so a crash between the two leaves the newest commit out of
    the log file — the union below makes that torn window invisible to
    readers (time travel stays consistent with ``read_state(None)``),
    and the next successful merge persists the missing entry
    (``_heal_log``)."""
    log = os.path.join(state_dir, _LOG)
    gens: list[str] = []
    if os.path.exists(log):
        with open(log) as f:
            gens = [line.strip() for line in f if line.strip()]
    ptr = _pointer_name(state_dir)
    if ptr is not None and ptr not in gens:
        gens.append(ptr)
    return [g for g in gens if os.path.isdir(os.path.join(state_dir, g))]


def _heal_log(state_dir: str) -> None:
    """Persist a pointer-committed generation the log file missed (a
    crash landed between pointer swap and log append)."""
    ptr = _pointer_name(state_dir)
    if ptr is None:
        return
    log = os.path.join(state_dir, _LOG)
    on_disk: list[str] = []
    if os.path.exists(log):
        with open(log) as f:
            on_disk = [line.strip() for line in f if line.strip()]
    if ptr not in on_disk:
        with open(log, "a") as f:
            f.write(ptr + "\n")


def _current_gen(state_dir: str) -> str | None:
    gen = _pointer_name(state_dir)
    if gen is None:
        return None
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


def _swap_pointer(state_dir: str, gen: str) -> None:
    """Atomic commit point: write-new + rename.  Module-level so
    failure-injection tests can crash exactly here."""
    tmp = os.path.join(state_dir, f".{_PTR}.tmp")
    with open(tmp, "w") as f:
        f.write(gen)
    os.replace(tmp, os.path.join(state_dir, _PTR))


def _append_log(state_dir: str, gen: str) -> None:
    """Append the committed generation to the time-travel index.
    Module-level so failure-injection tests can crash exactly here."""
    with open(os.path.join(state_dir, _LOG), "a") as f:
        f.write(gen + "\n")


def apply_merge_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    keep_generations: int = 1,
    batch_id: int = 0,
) -> str:
    """MERGE one batch into the snapshot and commit a new generation;
    returns the committed generation name.

    Crash-window contract (exercised by the failure-injection tests in
    ``tests/test_upsert.py``):

    - crash BETWEEN parquet write and pointer swap -> the pointer
      still designates the previous generation, readers see the old
      committed snapshot, and the orphan directory (in no log, never
      pointed at) is pruned by a later successful commit;
    - crash BETWEEN pointer swap and log append -> the pointer IS the
      commit, readers see the new snapshot immediately, the log's
      missing tail entry is reconstructed in-memory by ``_commit_log``
      (time travel stays consistent) and persisted by the
      ``_heal_log`` pass of the next merge;
    - a REPLAYED batch re-merges into whatever state was committed —
      newest-per-key of ``state ∪ same-rows`` is ``state``, so replay
      converges to the same snapshot content.
    """
    _heal_log(state_dir)
    state = read_state(spark, state_dir)
    merged = (
        upsert_snapshot(state, batch_df, keys, order_by)
        if state is not None
        else upsert_snapshot(batch_df.limit(0), batch_df, keys, order_by)
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
    _swap_pointer(state_dir, gen)
    _append_log(state_dir, gen)
    # retention: keep the newest `keep_generations` committed
    # snapshots readable (time travel), prune everything older —
    # including orphan directories from crashes before the swap
    keep = set(_commit_log(state_dir)[-keep_generations:]) | {gen}
    for d in os.listdir(state_dir):
        if d.startswith("gen_") and d not in keep:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)
    return gen


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
        apply_merge_batch(
            spark,
            state_dir,
            batch_df,
            keys,
            order_by,
            keep_generations=keep_generations,
            batch_id=batch_id,
        )

    writer = changes.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
