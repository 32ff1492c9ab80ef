"""Scale-factor-1 probe (VERDICT r7 item 7): synthesize an sf1-shaped
corpus locally (~10x sf0.1) and wall-clock a handful of flagship
entries at sf0.1 vs sf1 back-to-back on the same box, so super-linear
scale cliffs surface as a ratio far above ~10x instead of waiting to
become design debt.  The sf1 tables are DERIVED (10 deterministic
id-shifted copies of sf0.1 with text perturbed so near-dup structure
is preserved rather than exploded), so results are unchecked by any
oracle — this is a PERFORMANCE probe, correctness lives at sf<=0.1.

Usage:  python tools/sf1_probe.py [--sf1-dir /tmp/sf1] [--entries ...]
Prints one JSON line: {"probe": "sf1", "entries": {name: {"sf01_s": x,
"sf1_s": y, "ratio": y/x}}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF01 = "/root/testdata/sf0.1"

# entries picked per VERDICT r7 item 7: one codec/enrich pipeline
# shape, one shuffle-heavy text dedup, one transactional build, one
# feed catch-up, one streaming dedup
DEFAULT_ENTRIES = [
    "pipe_enrich",
    "dedup_minhash_lsh",
    "tx_delete_dv",
    "tx_feed_follower",
    "stream_dedup",
]


def build_sf1(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from event_streaming_toy_example_spark.schemas import load_table

    os.makedirs(out_dir, exist_ok=True)
    copies = 10

    def done(name: str) -> bool:
        return os.path.exists(os.path.join(out_dir, name, "_SUCCESS"))

    if not done("events.parquet"):
        ev = load_table(spark, SF01, "events")
        max_id = ev.agg(F.max("event_id")).collect()[0][0] + 1
        parts = []
        for i in range(copies):
            parts.append(
                ev.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * max_id)
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(64).write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )
    if not done("documents.parquet"):
        docs = load_table(spark, SF01, "documents")
        max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        parts = []
        for i in range(copies):
            # perturb the text per copy so shingle sets differ: the
            # corpus keeps realistic near-dup DENSITY instead of every
            # doc gaining 9 exact clones (which would explode every
            # LSH bucket and measure a different workload)
            parts.append(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * max_id)
                ).withColumn(
                    "text",
                    F.concat(
                        F.col("text"),
                        F.lit(f" copytag{i} marker"),
                        F.col("doc_id").cast("string"),
                    ),
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )
    # small dims pass through unchanged (the probed entries only need
    # events/documents, but load_table may resolve others)
    import shutil

    for name in os.listdir(SF01):
        src = os.path.join(SF01, name)
        dst = os.path.join(out_dir, name)
        if name not in ("events.parquet", "documents.parquet") and not (
            os.path.exists(dst)
        ):
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/sf1")
    ap.add_argument("--entries", nargs="*", default=DEFAULT_ENTRIES)
    ap.add_argument(
        "--clear-stage",
        action="store_true",
        help="drop /tmp/spark_graft_stage first so BOTH scale factors "
        "pay their staged-artifact builds (honest build-vs-build "
        "ratios for the tx entries); do not use while tests run",
    )
    args = ap.parse_args()
    if args.clear_stage:
        import shutil
        import tempfile

        shutil.rmtree(
            os.path.join(tempfile.gettempdir(), "spark_graft_stage"),
            ignore_errors=True,
        )

    from event_streaming_toy_example_spark.plans.catalog import ALL_QUERIES
    from event_streaming_toy_example_spark.session import get_spark

    spark = get_spark(app_name="sf1-probe", shuffle_partitions=64)
    t0 = time.perf_counter()
    build_sf1(spark, args.sf1_dir)
    build_s = time.perf_counter() - t0

    out: dict = {}
    for name in args.entries:
        fn = ALL_QUERIES[name]
        row = {}
        for label, sf_dir in (("sf01_s", SF01), ("sf1_s", args.sf1_dir)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            row[label] = round(time.perf_counter() - t0, 2)
            row[f"{label[:-2]}_rows"] = n
        row["ratio"] = round(row["sf1_s"] / max(row["sf01_s"], 1e-9), 2)
        out[name] = row
        print(f"# {name}: {row}", flush=True)
    print(json.dumps({"probe": "sf1", "build_s": round(build_s, 1),
                      "entries": out}))


if __name__ == "__main__":
    main()
