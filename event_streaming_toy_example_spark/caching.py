"""Registry for persisted intermediates that outlive their builder.

Several operators persist an intermediate whose lineage is shared by
both sides of a self-join (`minhash_lsh_candidates`,
`simhash_near_dup_pairs`, `ngram_jaccard_pairs`): without the persist
the upstream pipeline executes twice, but the consuming action happens
in the *caller*, so the builder cannot unpersist before returning.

Builders register those intermediates here via :func:`track`; a
long-lived session (bench loop, REPL, notebook) calls
:func:`release_caches` after each consuming action so cached blocks do
not accumulate across repeated catalog invocations. Blocks are
MEMORY_AND_DISK and evict LRU, so forgetting to release is a
memory-pressure issue, never a correctness one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later release."""
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
