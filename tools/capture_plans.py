#!/usr/bin/env python
"""Capture .explain('formatted') for headline entries into
plans/r12/<query>_<tag>.txt (guide section 1: record the plan shape
before and after each optimization).

Usage: python tools/capture_plans.py <tag> [sf_dir] [entry ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_streaming_toy_example_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    from event_streaming_toy_example_spark.plans.catalog import ALL_QUERIES

    entries = sys.argv[3:]
    if not entries:
        from bench import HEADLINE  # noqa: F401

        entries = HEADLINE
    for name in entries:
        try:
            df = ALL_QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc!r}"
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(name, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
