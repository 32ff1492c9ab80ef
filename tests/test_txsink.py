"""The ``txtable`` STREAMING SINK (``sources/txsink.py``):
``df.writeStream.format("txtable")`` — executor-parallel parquet
staging, one atomic log commit per micro-batch carrying the
``(app, batchId)`` stream-transaction token, exactly-once replay,
abort cleanup, complete-mode REPLACE commits, column-mapping-aware
files, and the auto-maintenance post-commit hook."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import txtable as tx
from event_streaming_toy_example_spark.sources import txsource
from event_streaming_toy_example_spark.sources.txsink import stream_writer

_SCHEMA = "k long, amt double"


def _feed(spark, tmp_path, lo, hi, mode="overwrite"):
    (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 1.5).alias("amt"))
        .coalesce(2)
        .write.mode(mode)
        .parquet(str(tmp_path / "in"))
    )


def _run_stream(spark, tmp_path, p, ck="ck", **opts):
    txsource.register(spark)
    w = (
        spark.readStream.schema(_SCHEMA)
        .parquet(str(tmp_path / "in"))
        .writeStream.format("txtable")
        .option("path", p)
        .option("checkpointLocation", str(tmp_path / ck))
    )
    for k, v in opts.items():
        w = w.option(k, str(v))
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_sink_appends_with_stream_txn_and_stats(spark, tmp_path):
    p = str(tmp_path / "t")
    _feed(spark, tmp_path, 0, 100)
    _run_stream(spark, tmp_path, p)
    df = tx.read_table(spark, p)
    assert df.count() == 100
    assert sorted(r["k"] for r in df.collect()) == list(range(100))
    log = tx.read_log(p)
    assert [c.action for c in log] == ["append"]
    assert log[-1].stream_txn == ("txsink", 0)
    # footer stats harvested for streamed files -> data skipping works
    snap = tx.snapshot(p)
    assert all(snap.stats.get(f, {}).get("k") for f in snap.files)
    scan, skip = tx.prune_files(p, [("k", "<", 0)])
    assert not scan and len(skip) == len(snap.files)


def test_sink_restart_continues_exactly_once(spark, tmp_path):
    p = str(tmp_path / "t")
    _feed(spark, tmp_path, 0, 50)
    _run_stream(spark, tmp_path, p)
    _feed(spark, tmp_path, 50, 80, mode="append")
    _run_stream(spark, tmp_path, p)  # same checkpoint
    got = sorted(r["k"] for r in tx.read_table(spark, p).collect())
    assert got == list(range(80)), "restart duplicated or dropped rows"
    apps = {c.stream_txn[0] for c in tx.read_log(p)}
    assert apps == {"txsink"}
    batches = [c.stream_txn[1] for c in tx.read_log(p)]
    assert batches == sorted(batches)


def test_replayed_batch_commits_nothing_twice(spark, tmp_path):
    """Crash between sink commit and checkpoint commit = the SAME
    batch id re-enters commit(): the second call must publish no new
    version and remove the duplicate staged files."""
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], _SCHEMA).coalesce(1), p
    )
    w = stream_writer(
        {"path": p}, spark.createDataFrame([], _SCHEMA).schema, False
    )

    import pyarrow as pa

    def staged():
        batch = pa.RecordBatch.from_pydict(
            {"k": pa.array([7, 8], pa.int64()),
             "amt": pa.array([7.5, 8.5], pa.float64())}
        )
        return w.write(iter([batch]))

    m1 = staged()
    w.commit([m1], 5)
    v = tx.table_version(p)
    assert tx.read_log(p)[-1].stream_txn == ("txsink", 5)
    # replay: stage fresh duplicate files, same batch id
    m2 = staged()
    dup = os.path.join(p, m2.names[0])
    assert os.path.exists(dup)
    w.commit([m2], 5)
    assert tx.table_version(p) == v, "replayed batch published a commit"
    assert not os.path.exists(dup), "duplicate staged file not cleaned"
    got = sorted(r["k"] for r in tx.read_table(spark, p).collect())
    assert got == [1, 7, 8]


def test_abort_deletes_staged_files(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], _SCHEMA).coalesce(1), p
    )
    w = stream_writer(
        {"path": p}, spark.createDataFrame([], _SCHEMA).schema, False
    )
    import pyarrow as pa

    batch = pa.RecordBatch.from_pydict(
        {"k": pa.array([9], pa.int64()), "amt": pa.array([9.0])}
    )
    m = w.write(iter([batch]))
    f = os.path.join(p, m.names[0])
    assert os.path.exists(f)
    w.abort([m, None], 3)  # None = a failed task's message
    assert not os.path.exists(f)
    assert tx.table_version(p) == 1  # nothing published


def test_complete_mode_replaces_per_batch(spark, tmp_path):
    """outputMode('complete') on a streaming aggregation lands as
    REPLACE commits: the table always holds exactly the latest full
    aggregate state."""
    txsource.register(spark)
    p = str(tmp_path / "t")
    _feed(spark, tmp_path, 0, 40)
    agg_q = (
        spark.readStream.schema(_SCHEMA)
        .parquet(str(tmp_path / "in"))
        .groupBy((F.col("k") % 4).alias("g"))
        .agg(F.sum("amt").alias("total"))
    )
    q = (
        agg_q.writeStream.format("txtable")
        .option("path", p)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert tx.read_log(p)[-1].action == "replace"
    got = {r["g"]: r["total"] for r in tx.read_table(spark, p).collect()}
    want = {
        r["g"]: r["total"]
        for r in spark.read.parquet(str(tmp_path / "in"))
        .groupBy((F.col("k") % 4).alias("g"))
        .agg(F.sum("amt").alias("total"))
        .collect()
    }
    assert got == want


def test_constrained_table_refused_by_name(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], _SCHEMA).coalesce(1), p
    )
    tx.tx_add_constraint(spark, p, "amt_pos", "amt > 0")
    with pytest.raises(ValueError, match="CHECK constraints"):
        stream_writer(
            {"path": p}, spark.createDataFrame([], _SCHEMA).schema, False
        )


def test_schema_mismatch_refused_by_name(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], _SCHEMA).coalesce(1), p
    )
    bad = spark.createDataFrame([], "k long, amt double, extra int").schema
    with pytest.raises(ValueError, match="extra"):
        stream_writer({"path": p}, bad, False)
    drift = spark.createDataFrame([], "k long, amt string").schema
    with pytest.raises(ValueError, match="type drift"):
        stream_writer({"path": p}, drift, False)


def test_sink_writes_physical_names_on_mapped_table(spark, tmp_path):
    """After a metadata-only column rename, the stream presents the
    LOGICAL name and the staged files carry the PHYSICAL one — reads
    by either code path resolve the logical name."""
    import pyarrow.parquet as pq

    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], _SCHEMA).coalesce(1), p
    )
    tx.tx_rename_column(p, "amt", "amount")
    w = stream_writer(
        {"path": p},
        spark.createDataFrame([], "k long, amount double").schema,
        False,
    )
    import pyarrow as pa

    batch = pa.RecordBatch.from_pydict(
        {"k": pa.array([2], pa.int64()), "amount": pa.array([2.0])}
    )
    m = w.write(iter([batch]))
    w.commit([m], 0)
    phys = pq.read_schema(os.path.join(p, m.names[0])).names
    assert phys == ["k", "amt"], phys  # physical name on disk
    got = sorted(
        tuple(r) for r in tx.read_table(spark, p).collect()
    )
    assert got == [(1, 1.0), (2, 2.0)]


def test_sink_maintenance_listener_compacts(spark, tmp_path):
    """The sink's commit() runs in a sessionless python worker, so the
    maintenance policy is driven from the driver-side listener: after
    the streamed micro-batches land, the listener's post-progress look
    fires exactly the policy's sized compaction."""
    from event_streaming_toy_example_spark.sources import txsink

    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(0, 0.0)], _SCHEMA).coalesce(1), p
    )
    tx.tx_set_maintenance(p, small_file_bytes=1 << 20, small_file_count=2)
    listener = txsink.attach_maintenance(spark, p)
    try:
        _feed(spark, tmp_path, 0, 60)
        _run_stream(spark, tmp_path, p)
        # listener events are asynchronous: give the bus a beat
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if "compact" in [c.action for c in tx.read_log(p)]:
                break
            time.sleep(0.5)
    finally:
        txsink.detach_maintenance(spark, listener)
    acts = [c.action for c in tx.read_log(p)]
    assert "compact" in acts, acts
    assert len(tx.snapshot(p).files) <= 3
    got = sorted(r["k"] for r in tx.read_table(spark, p).collect())
    assert got == [0] + list(range(60))


def test_empty_append_batch_publishes_nothing(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], _SCHEMA).coalesce(1), p
    )
    w = stream_writer(
        {"path": p}, spark.createDataFrame([], _SCHEMA).schema, False
    )
    import pyarrow as pa

    empty = pa.RecordBatch.from_pydict(
        {"k": pa.array([], pa.int64()), "amt": pa.array([], pa.float64())}
    )
    m = w.write(iter([empty]))
    assert m.names == []
    w.commit([m, None], 11)
    assert tx.table_version(p) == 1


def test_register_pins_jvm_active_session(spark, tmp_path):
    """Python data-source LOOKUP resolves through the JVM's ACTIVE
    session: with a sibling newSession left active, format("txtable")
    raised DATA_SOURCE_NOT_FOUND even though register() ran on the
    right session.  register() now pins activeness, so the
    register-then-build flow survives any session interleaving."""
    s2 = spark.newSession()
    spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
        s2._jsparkSession
    )
    try:
        p = str(tmp_path / "t")
        _feed(spark, tmp_path, 0, 10)
        _run_stream(spark, tmp_path, p)  # register() runs inside
        assert tx.read_table(spark, p).count() == 10
    finally:
        spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
            spark._jsparkSession
        )


def test_sink_creates_table_on_first_batch(spark, tmp_path):
    p = str(tmp_path / "t")
    _feed(spark, tmp_path, 0, 10)
    _run_stream(spark, tmp_path, p)
    assert tx.table_version(p) == 1
    # column-mapping ids assigned at create, like tx_append's create
    tx.tx_rename_column(p, "amt", "amount")
    assert "amount" in tx.read_table(spark, p).columns
