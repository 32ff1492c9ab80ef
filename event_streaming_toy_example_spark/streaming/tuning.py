"""Streaming state-partition tuning (optimization guide §2.4/§5).

A streaming query's stateful operators create one state-store instance
per shuffle partition, and every micro-batch pays a fixed per-store
commit cost — delta-file create + write + rename (plus provider load
and maintenance bookkeeping) per store per batch — regardless of how
many rows the partition carries.  Batch queries get their effective
shuffle width coalesced at runtime by AQE; streaming state partitioning
is pinned into the checkpoint at query start and never coalesced, so
inheriting the batch ``spark.sql.shuffle.partitions`` over-partitions
the state store whenever per-batch state volume is small relative to
the configured width.

Measured on this workload (sf0.1, local[32], 3-run medians; the
per-batch breakdown in ``tools/stream_profile.py`` attributes the gap
to ``stateOperators.commitTimeMs``):

====================  ==========  =========  =====
entry                 32 parts    8 parts    ratio
====================  ==========  =========  =====
stream_join_outer       13.8 s      3.0 s     4.6x
stream_session_window    5.3 s      1.6 s     3.3x
stream_running_stats     8.4 s      4.3 s     2.0x
pysource_stream_agg      7.4 s      4.3 s     1.7x
tx_stream_source         3.1 s      2.3 s     1.3x
stream_cep_pattern      15.0 s     24.1 s     0.6x  (REGRESSION)
====================  ==========  =========  =====

The last row is the design constraint: entries whose micro-batch work
is Python-compute-bound (``applyInPandasWithState`` over many/large
groups) need the full batch width for worker parallelism — for those,
pass ``python_heavy=True`` and the width is left alone.

Sizing is scale-adaptive, never a local constant: the default is
``max(4, defaultParallelism // 4)`` — it grows with the cluster (250
state partitions at 1000 cores), but stays a fraction of the batch
width because stateful stages are commit-bound, not CPU-bound.  A
deployment whose state genuinely needs more width (state must fit the
executor heap per partition) sets ``spark_graft.stream.statePartitions``
on the session or ``SPARK_GRAFT_STREAM_STATE_PARTITIONS`` in the
environment; both override the heuristic.

Concurrency note (ADVICE r12): ``stream_tuning`` mutates the
session-global ``spark.sql.shuffle.partitions`` for the whole
start→await region, so any OTHER query planned on the shared session
inside that window — a concurrent stream, or a batch action issued from
another driver thread — also plans at the reduced width.  Batch plans
are insulated in practice (AQE coalesces/grows batch shuffles at
runtime), but the scope is process-global state: callers driving
several streaming queries concurrently from one session must either
serialize the tuned regions or set the width once session-wide via the
conf/env override instead of this context manager.  Nested/overlapping
regions are not thread-safe (the restore writes back whatever value the
region saw at entry).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

_PARTS_CONF = "spark_graft.stream.statePartitions"
_PARTS_ENV = "SPARK_GRAFT_STREAM_STATE_PARTITIONS"
_SHUFFLE_KEY = "spark.sql.shuffle.partitions"


def _parse_width(raw: str, source: str) -> int:
    """Parse a width override, naming the misconfigured source in the
    error instead of raising a bare ``ValueError`` from ``int()`` deep
    inside query execution (ADVICE r12)."""
    try:
        return max(1, int(raw))
    except ValueError:
        raise ValueError(
            f"invalid streaming state-partition override {raw!r} from "
            f"{source}: expected a positive integer"
        ) from None


def stream_state_partitions(spark: SparkSession) -> int:
    """Resolve the streaming state-partition width for this session:
    explicit conf > env override > ``max(4, defaultParallelism // 4)``.
    An empty conf/env value is treated as unset (falls through)."""
    conf = spark.conf.get(_PARTS_CONF, None)
    if conf:
        return _parse_width(conf, f"session conf {_PARTS_CONF}")
    env = os.environ.get(_PARTS_ENV)
    if env:
        return _parse_width(env, f"environment variable {_PARTS_ENV}")
    return max(4, spark.sparkContext.defaultParallelism // 4)


@contextmanager
def stream_tuning(spark: SparkSession, python_heavy: bool = False):
    """Scope ``spark.sql.shuffle.partitions`` to the streaming width
    for the duration of a start→awaitTermination region.

    The width a streaming query plans its stateful exchanges with is
    read from the session conf when the first micro-batch's offsets are
    constructed, so the override must stay in place until the query
    terminates — wrap the WHOLE start+await region, not just
    ``.start()``.  ``python_heavy=True`` keeps the session width (see
    module docstring) while still scoping a no-op region so call sites
    stay uniform."""
    if python_heavy:
        yield
        return
    prev = spark.conf.get(_SHUFFLE_KEY)
    spark.conf.set(_SHUFFLE_KEY, str(stream_state_partitions(spark)))
    try:
        yield
    finally:
        spark.conf.set(_SHUFFLE_KEY, prev)
