#!/usr/bin/env python
"""Scale probe: does the token Bloom index turn a rare-word search
into an O(matching files) scan?

Builds a token-indexed documents table at sf0.1 with per-language
marker tokens clustered one-language-per-commit (the catalog entry's
staged layout), then measures a rare-token search three ways:

- ``pruned``  — ``tx_text_search`` (token blooms prune the file list,
  the exact tokenizer predicate re-filters survivors);
- ``full``    — the same exact predicate over a full snapshot read
  (what every engine without the index pays);
- files opened under each (the plan-level fact the wall clock rides).

At 100 TB the ratio of files opened IS the speedup: token pruning
reads only files that might hold the word.  Both paths must agree on
the result (asserted).

Run:  python tools/tokenindex_probe.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_streaming_toy_example_spark.operators import (  # noqa: E402
    tokenindex as ti,
)
from event_streaming_toy_example_spark.operators import txtable as tx  # noqa: E402
from event_streaming_toy_example_spark.plans.queries_ext38 import (  # noqa: E402
    _build_token_index,
)
from event_streaming_toy_example_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    t = os.path.join(_build_token_index(spark, sf_dir), "t")
    token = "marker_es"
    n_files = len(tx.snapshot(t).files)
    scan, skip = tx.prune_files(t, [("text", "has_token", token)])

    def _timed(df) -> tuple[float, tuple]:
        t0 = time.time()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        ).collect()[0]
        return time.time() - t0, tuple(row)

    # warm both paths (first job in a session pays JVM/scan spin-up,
    # which is not what the index changes), then take best-of-3
    pruned_secs, full_secs = [], []
    pruned_res = full_res = None
    for _ in range(3):
        sec, pruned_res = _timed(ti.tx_text_search(spark, t, "text", token))
        pruned_secs.append(sec)
        sec, full_res = _timed(
            tx.read_table(spark, t).where(
                ti.token_filter_expr(F.col("text"), token)
            )
        )
        full_secs.append(sec)
    assert pruned_res == full_res, (pruned_res, full_res)
    print(json.dumps({
        "sf_dir": sf_dir,
        "token": token,
        # the SCALE fact: token pruning opens only files that might
        # hold the word — at a 5-file toy corpus the warm wall-clock
        # is job-overhead-bound, the opened-file ratio is what grows
        # with corpus size
        "files_total": n_files,
        "files_opened_pruned": len(scan),
        "files_skipped": len(skip),
        "rows_matched": int(pruned_res[0]),
        "pruned_sec_warm": round(min(pruned_secs), 3),
        "full_scan_sec_warm": round(min(full_secs), 3),
        "pruned_sec_cold": round(pruned_secs[0], 3),
        "full_scan_sec_cold": round(full_secs[0], 3),
    }))


if __name__ == "__main__":
    main()
