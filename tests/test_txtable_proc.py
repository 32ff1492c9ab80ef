"""PROCESS-level commit race for the transactional log (VERDICT r5
item 7): the threaded race in tests/test_txtable.py shares one
interpreter, so the ``link(2)``-EEXIST claim semantics — process-safe
by construction — were untested across real process boundaries.  Here
several OS processes race pure-Python ``txtable.commit`` calls (no
SparkSession anywhere: the log layer is deliberately Spark-free) and
the log must come out contiguous with no lost or duplicated commits.
"""

from __future__ import annotations

import json
import multiprocessing
import os

from event_streaming_toy_example_spark.operators import txtable as tx

_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}}
        ],
    }
)


def _writer(args: tuple[str, int, int]) -> list[int]:
    """One racing process: N appends, all prepared against the SAME
    stale read version (1) — every commit must land via the
    lost-race retry loop."""
    path, wid, n = args
    out = []
    for i in range(n):
        out.append(
            tx.commit(
                path,
                "append",
                [f"data/w{wid}_{i}.parquet"],
                [],
                _SCHEMA,
                read_version=1,
            )
        )
    return out


def test_multiprocess_commit_race_no_lost_commits(tmp_path):
    p = str(tmp_path / "t")
    assert tx.commit(p, "append", ["data/seed.parquet"], [], _SCHEMA, 0) == 1

    n_procs, per_proc = 6, 8
    ctx = multiprocessing.get_context("fork")
    with ctx.Pool(n_procs) as pool:
        results = pool.map(
            _writer, [(p, w, per_proc) for w in range(n_procs)]
        )

    versions = sorted(v for r in results for v in r)
    total = n_procs * per_proc
    # contiguous, unique, none lost: versions 2..total+1 exactly once
    assert versions == list(range(2, total + 2)), versions[:10]
    assert tx.table_version(p) == total + 1
    log = tx.read_log(p)  # asserts contiguity + parses every commit
    assert [c.version for c in log] == list(range(1, total + 2))
    # every process's every file is live exactly once in the fold
    snap = tx.snapshot(p)
    want = {"data/seed.parquet"} | {
        f"data/w{w}_{i}.parquet"
        for w in range(n_procs)
        for i in range(per_proc)
    }
    assert set(snap.files) == want
    # no stray tmp staging files survived the races
    leftovers = [
        f for f in os.listdir(tx._log_dir(p)) if f.endswith(".tmp")
    ]
    assert leftovers == []


def test_multiprocess_upsert_vs_append_conflicts_detected(tmp_path):
    """Cross-process OCC: one process repeatedly appends files with NO
    stats while another tries a strict (conflict=None) upsert against a
    stale read version — the upsert must abort with
    ConcurrentWriteError, never silently fold."""
    p = str(tmp_path / "t")
    tx.commit(p, "append", ["data/base.parquet"], [], _SCHEMA, 0)

    ctx = multiprocessing.get_context("fork")
    with ctx.Pool(1) as pool:
        pool.map(_writer, [(p, 99, 3)])  # three appends land first

    try:
        tx.commit(
            p,
            "upsert",
            ["data/merged.parquet"],
            ["data/base.parquet"],
            _SCHEMA,
            read_version=1,
        )
        raise AssertionError("stale upsert must not commit")
    except tx.ConcurrentWriteError:
        pass
    assert tx.table_version(p) == 4  # the aborted upsert left no commit
