"""Round-9 A/B probe for the tx_feed_follower bench regression
(VERDICT r8 item 1, the round's one `weak`).

Decomposes the timed entry's cost and A/Bs the layout hypotheses:

  python tools/follower_ab_probe.py

Measured on local[32], sf0.1 staged follower (34 live files):

  snapshot() fold (python log reads)       ~1 ms    -> protocol-gate
                                                       reads are NOT it
  read_table() construction                ~247 ms  -> the cost center
  flat data/*.parquet layout               ~185 ms
  round-8 data/s-*/ layout                 ~209 ms  -> fan-out adds only
                                                       ~24 ms, NOT it
  34 / 340 / 3400 paths construction       190 / 900 / 7638 ms

Root cause: Spark's ``parallelPartitionDiscovery.threshold`` defaults
to 32 — at 33+ EXPLICIT file paths every DataFrame construction
schedules a DISTRIBUTED listing job with one task per path.  The
round-7 follower sat under 32 live files; round 8's crossed it (the
unsized upsert rewrites wrote one 2-3 KB file per shuffle partition).

Fixes shipped (both, independently verified here):
  1. session.py sets the threshold to 4096: driver threadpool listing
     handles 34/340/3400 paths in 107/166/728 ms (~10x).
  2. txtable rewrites size their output by bytes
     (``_sized_for_write``): ceil(est/128 MB) files per commit, so the
     follower holds ~4 files, not 34 — the file count that crossed the
     threshold was itself a small-files bug.
"""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_streaming_toy_example_spark.session import get_spark  # noqa: E402
from event_streaming_toy_example_spark.operators import txtable as tx  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def t(label, fn, n=5):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    med = runs[len(runs) // 2]
    print(f"{label:50s} med={med * 1000:8.1f} ms  min={runs[0] * 1000:8.1f}")
    return med


def main() -> None:
    spark = get_spark(app_name="follower-ab-probe")
    cands = sorted(
        glob.glob("/tmp/spark_graft_stage/txfeed_pair_v*_ddbe1476_*")
    )
    assert cands, "stage the sf0.1 feed pair first (run the bench once)"
    fol = os.path.join(cands[-1], "follower")
    snap = tx.snapshot(fol)
    print(f"follower: {fol}  live files: {len(snap.files)}")

    tx.read_table(spark, fol).count()  # warm
    t("snapshot() fold (python log reads)", lambda: tx.snapshot(fol))
    t("read_table() construction only", lambda: tx.read_table(spark, fol))

    def full_query():
        d = tx.read_table(spark, fol)
        d.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
            F.sum("event_id").alias("id_sum"),
        ).count()

    full_query()
    t("full bench query (agg + count)", full_query)

    # ---- flat vs s-*/ layout at equal file counts ----
    ab = "/tmp/probe_ab_r9"
    shutil.rmtree(ab, ignore_errors=True)
    for layout in ("flat", "nested"):
        root = os.path.join(ab, layout)
        os.makedirs(os.path.join(root, "data"))
        names = []
        for i, f in enumerate(sorted(snap.files)):
            base = f"part-{i:04d}.parquet"
            rel = (
                os.path.join("data", base)
                if layout == "flat"
                else os.path.join("data", f"s-{i:012x}", base)
            )
            os.makedirs(
                os.path.dirname(os.path.join(root, rel)), exist_ok=True
            )
            shutil.copy(os.path.join(fol, f), os.path.join(root, rel))
            names.append(rel)
        tx.commit(root, "append", names, [], snap.schema, 0)
        tx.read_table(spark, root).count()
        t(
            f"[{layout}] read_table() construction",
            lambda root=root: tx.read_table(spark, root),
        )

    # ---- path-count scaling curve ----
    one = os.path.join(fol, sorted(snap.files)[0])
    results = {}
    for n in (34, 340, 3400):
        root = os.path.join(ab, f"scale{n}")
        os.makedirs(os.path.join(root, "data"))
        names = []
        for i in range(n):
            rel = os.path.join(
                "data", f"s-{i:012x}", f"part-{i:04d}.parquet"
            )
            os.makedirs(
                os.path.dirname(os.path.join(root, rel)), exist_ok=True
            )
            os.link(one, os.path.join(root, rel))
            names.append(rel)
        tx.commit(root, "append", names, [], snap.schema, 0)
        tx.read_table(spark, root)
        results[n] = t(
            f"[{n} paths] construction",
            lambda root=root: tx.read_table(spark, root),
            n=3,
        )
    print(json.dumps({"construction_ms_by_paths": {
        k: round(v * 1000, 1) for k, v in results.items()
    }}))
    spark.stop()


if __name__ == "__main__":
    main()
