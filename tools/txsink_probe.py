#!/usr/bin/env python
"""Scale probe: what does the streaming txtable sink cost per row
versus the batch writer, and is replay really exactly-once at volume?

Streams the sf events corpus (8-file input → 8 executor write tasks
per micro-batch) into a fresh table through
``writeStream.format("txtable")``, then writes the SAME rows with
``tx_append`` (the JVM batch path) — the delta is the sink's
Python/Arrow boundary plus per-batch commit tax.  Afterwards the
probe re-runs the SAME query from the same checkpoint (no new input:
zero new commits asserted) and replays one staged batch id directly
against ``commit`` (duplicate files deleted, version unchanged —
the crash-replay contract at full batch size).

Run:  python tools/txsink_probe.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_streaming_toy_example_spark.operators import txtable as tx  # noqa: E402
from event_streaming_toy_example_spark.plans.queries_ext import (  # noqa: E402
    stage_stream_input,
)
from event_streaming_toy_example_spark.schemas import load_table  # noqa: E402
from event_streaming_toy_example_spark.session import get_spark  # noqa: E402
from event_streaming_toy_example_spark.sources import txsource  # noqa: E402

_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    txsource.register(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = stage_stream_input(ev.repartition(8), "txsink_in_v2", sf_dir)
    n_rows = spark.read.parquet(src).count()
    root = tempfile.mkdtemp(prefix="txsink_probe_")
    try:
        tgt = os.path.join(root, "t")
        ck = os.path.join(root, "ck")

        def run():
            q = (
                spark.readStream.schema(_SCHEMA)
                .parquet(src)
                .writeStream.format("txtable")
                .option("path", tgt)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)

        t0 = time.time()
        run()
        sink_cold_sec = time.time() - t0
        assert tx.read_table(spark, tgt).count() == n_rows

        # warm steady-state: a second query into a fresh table (python
        # workers and streaming machinery already spun up)
        tgt2, ck2 = os.path.join(root, "t2"), os.path.join(root, "ck2")
        t0 = time.time()
        q = (
            spark.readStream.schema(_SCHEMA)
            .parquet(src)
            .writeStream.format("txtable")
            .option("path", tgt2)
            .option("checkpointLocation", ck2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        sink_sec = time.time() - t0
        assert tx.read_table(spark, tgt2).count() == n_rows
        v_after = tx.table_version(tgt)

        # restart with no new input: zero new commits
        t0 = time.time()
        run()
        restart_sec = time.time() - t0
        assert tx.table_version(tgt) == v_after, "restart re-committed"

        # full-size duplicate replay straight at the sink writer
        from event_streaming_toy_example_spark.sources.txsink import (
            stream_writer,
        )

        w = stream_writer(
            {"path": tgt}, spark.read.parquet(src).schema, False
        )
        import pyarrow as pa

        batch = pa.RecordBatch.from_pandas(
            spark.read.parquet(src).limit(50_000).toPandas()
        )
        m = w.write(iter([batch]))
        dup = os.path.join(tgt, m.names[0])
        last_batch = tx.read_log(tgt)[-1].stream_txn[1]
        w.commit([m], last_batch)  # already-committed id
        assert tx.table_version(tgt) == v_after, "replay published"
        assert not os.path.exists(dup), "duplicate file not cleaned"

        batch_tgt = os.path.join(root, "batch")
        t0 = time.time()
        tx.tx_append(spark.read.parquet(src), batch_tgt)
        batch_sec = time.time() - t0

        print(json.dumps({
            "sf_dir": sf_dir,
            "rows": n_rows,
            "sink_cold_sec": round(sink_cold_sec, 3),
            "sink_warm_sec": round(sink_sec, 3),
            "sink_rows_per_sec_warm": int(n_rows / sink_sec),
            "batch_append_sec": round(batch_sec, 3),
            "batch_rows_per_sec": int(n_rows / batch_sec),
            "sink_vs_batch_warm": round(sink_sec / batch_sec, 2),
            "restart_noop_sec": round(restart_sec, 3),
            "replay_exactly_once": True,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
