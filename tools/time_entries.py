#!/usr/bin/env python
"""Isolated per-entry timing: run named catalog entries N times each
(after one untimed prestage/warm pass) and print per-entry runs +
median.  The A/B protocol for optimization rounds: same box, same
session shape as bench.py, one entry at a time so measurements are not
polluted by bench-loop JVM state.

Usage: python tools/time_entries.py [--sf-dir D] [--runs N] entry ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_streaming_toy_example_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="time_entries")
    from event_streaming_toy_example_spark.caching import release_caches
    from event_streaming_toy_example_spark.plans.catalog import ALL_QUERIES

    out: dict[str, dict] = {}
    for name in args.entries:
        fn = ALL_QUERIES[name]
        fn(spark, args.sf_dir).count()  # untimed warm/prestage pass
        release_caches()
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"time_entries:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            release_caches()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
        out[name] = {"runs": runs, "median": sorted(runs)[len(runs) // 2]}
        print(f"## {name}: median {out[name]['median']}s {runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
