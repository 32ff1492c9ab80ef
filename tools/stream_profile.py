#!/usr/bin/env python
"""Profile the streaming headline entries: per-micro-batch durationMs
breakdown (addBatch / walCommit / stateOperators commit times) captured
through a StreamingQueryListener, so the optimization round can see
WHERE the streaming-trigger tax goes (guide section 1: measure first).

Usage: python tools/stream_profile.py [sf_dir] [entry ...]
Writes a JSON report to stdout; each entry is run once (after an
untimed prestage pass so stage_once artifacts exist).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from event_streaming_toy_example_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

STREAM_ENTRIES = [
    "stream_join_outer",
    "pysource_stream_agg",
    "stream_cep_pattern",
    "stream_running_stats",
    "stream_watermark_flush",
    "stream_session_window",
    "stream_hourly_counts",
    "tx_stream_sql",
    "tx_stream_source",
    "stream_static_enrich",
    "stream_upsert_sink",
    "tx_stream_sink",
    "stream_dedup",
]


class _Capture(StreamingQueryListener):
    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        try:
            self.progress.append(json.loads(event.progress.json))
        except Exception:
            pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    entries = sys.argv[2:] or STREAM_ENTRIES
    spark = get_spark(app_name="stream_profile")
    cap = _Capture()
    spark.streams.addListener(cap)

    from event_streaming_toy_example_spark.plans.catalog import ALL_QUERIES

    report: dict[str, dict] = {}
    for name in entries:
        fn = ALL_QUERIES[name]
        # prestage pass (untimed): builds stage_once artifacts
        try:
            fn(spark, SF_DIR).count()
        except Exception as exc:  # noqa: BLE001
            report[name] = {"error": f"prestage: {exc!r}"}
            continue
        cap.progress.clear()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        wall = round(time.perf_counter() - t0, 3)
        batches = []
        for p in cap.progress:
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            "operatorName": s.get("operatorName"),
                            "commitTimeMs": s.get("commitTimeMs"),
                            "stateMemory": s.get("memoryUsedBytes"),
                            "numShufflePartitions": s.get(
                                "numShufflePartitions"
                            ),
                        }
                        for s in p.get("stateOperators", [])
                    ],
                }
            )
        report[name] = {"wall_sec": wall, "batches": batches}
        print(f"## {name}: {wall}s", file=sys.stderr)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
