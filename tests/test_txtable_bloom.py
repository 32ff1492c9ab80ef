"""Per-file Bloom-filter data skipping (``operators/bloom.py`` +
``tx_set_bloom_filters``): point predicates on a high-cardinality
UNCLUSTERED key prune files min/max stats cannot — every file's range
spans the key space, but each file's Bloom filter proves which keys it
actually holds.  False positives cost a scan; false negatives are
impossible; reads stay value-identical to a full-scan filter."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import bloom as bl
from event_streaming_toy_example_spark.operators import txtable as tx


def _key(i: int) -> str:
    return hashlib.md5(f"k{i}".encode()).hexdigest()


def _stage(spark, tmp_path, n=400, files=8):
    """`files` single-file appends of md5 keys: every file's [min,max]
    spans ~the whole hex space, so range stats alone never prune."""
    p = str(tmp_path / "t")
    per = n // files
    tx.tx_append(
        spark.createDataFrame(
            [(i, _key(i)) for i in range(per)], "id int, key string"
        ).coalesce(1),
        p,
    )
    tx.tx_set_bloom_filters(p, ["key"])
    for f in range(1, files):
        rows = [(i, _key(i)) for i in range(f * per, (f + 1) * per)]
        tx.tx_append(
            spark.createDataFrame(rows, "id int, key string").coalesce(1), p
        )
    return p


def test_unit_bloom_roundtrip_and_absence():
    b = bl.build_bloom([f"v{i}" for i in range(1000)])
    assert all(bl.bloom_may_contain(b, f"v{i}") for i in range(1000))
    misses = sum(
        1 for i in range(1000) if bl.bloom_may_contain(b, f"absent{i}")
    )
    assert misses < 50  # fpp 1% with slack


def test_unit_bloom_types_and_empty():
    b = bl.build_bloom([1, 2, 3])
    assert bl.bloom_may_contain(b, 2) and not bl.bloom_may_contain(b, 9)
    # empty column: all-zero filter proves universal absence
    e = bl.build_bloom([])
    assert not bl.bloom_may_contain(e, "anything")
    # unindexable type in the column -> no filter at all
    assert bl.build_bloom([1.5, 2.5]) is None
    # unknown probe type never prunes
    assert bl.bloom_may_contain(b, 2.5)


def test_unit_bloom_size_cap():
    b = bl.build_bloom([f"v{i}" for i in range(100_000)], max_bytes=1024)
    import base64

    assert len(base64.b64decode(b["b"])) <= 1024


def test_set_bloom_filters_validates(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], "k int, amt double"), p
    )
    with pytest.raises(ValueError, match="nope"):
        tx.tx_set_bloom_filters(p, ["nope"])
    with pytest.raises(ValueError, match="amt"):
        tx.tx_set_bloom_filters(p, ["amt"])  # float: ill-posed equality
    assert tx.tx_set_bloom_filters(p, ["k"]) == 2


def test_point_lookup_prunes_unclustered_key(spark, tmp_path):
    p = _stage(spark, tmp_path)
    # present key: its one carrying file must scan; bloom may admit a
    # few false positives, but never most of the 8 files
    scan, skip = tx.prune_files(p, [("key", "=", _key(250))])
    assert len(skip) >= 5, (len(scan), len(skip))
    assert len(scan) >= 1
    # absent key: every bloom-equipped file proves absence (the first
    # pre-property file has no filter and min/max can't prune it)
    scan2, skip2 = tx.prune_files(p, [("key", "=", "f" * 32)])
    assert len(skip2) >= 6, (len(scan2), len(skip2))


def test_point_lookup_reads_are_value_identical(spark, tmp_path):
    p = _stage(spark, tmp_path, n=200, files=4)
    got = sorted(
        tuple(r)
        for r in tx.read_table(
            spark, p, where=[("key", "=", _key(50))]
        ).collect()
    )
    full = sorted(
        tuple(r)
        for r in tx.read_table(spark, p)
        .where(F.col("key") == _key(50))
        .collect()
    )
    assert got == full and len(got) == 1


def test_in_predicate_uses_bloom(spark, tmp_path):
    p = _stage(spark, tmp_path, n=200, files=4)
    scan, skip = tx.prune_files(
        p, [("key", "in", (_key(10), _key(180)))]
    )
    # keys live in file 1 (pre-bloom, always scans) and file 4
    assert len(skip) >= 1
    got = sorted(
        r["id"]
        for r in tx.read_table(
            spark, p, where=[("key", "in", (_key(10), _key(180)))]
        ).collect()
    )
    assert got == [10, 180]


def test_compact_backfills_blooms(spark, tmp_path):
    p = _stage(spark, tmp_path, n=200, files=4)
    # the pre-property file has no filter; compaction rewrites -> all
    # files indexed, an absent key now skips EVERY file
    tx.tx_compact(spark, p, small_file_bytes=1 << 30)
    scan, skip = tx.prune_files(p, [("key", "=", "f" * 32)])
    assert scan == [], (scan, skip)


def test_blooms_survive_checkpoint_and_expiry(spark, tmp_path):
    p = _stage(spark, tmp_path, n=200, files=4)
    v = tx.write_checkpoint(p)
    tx.expire_log(p, retain_versions=1)
    tx.invalidate_fold_memo(p)
    scan, skip = tx.prune_files(p, [("key", "=", _key(150))])
    assert len(skip) >= 2
    got = tx.read_table(spark, p, where=[("key", "=", _key(150))]).collect()
    assert [r["id"] for r in got] == [150]


def test_update_rewrite_keeps_bloom_current(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame(
            [(i, _key(i)) for i in range(50)], "id int, key string"
        ).coalesce(1),
        p,
    )
    tx.tx_set_bloom_filters(p, ["key"])
    # rewrite via UPDATE: the new file's filter indexes the NEW values
    tx.tx_update(spark, p, set={"key": "concat('z_', key)"})
    scan, skip = tx.prune_files(p, [("key", "=", _key(10))])
    assert scan == []  # old value provably gone
    scan2, _ = tx.prune_files(p, [("key", "=", "z_" + _key(10))])
    assert len(scan2) == 1


def test_cross_type_probe_never_proves_absence():
    # a filter built from datetimes probed with the value's STRING
    # form must scan (the canonical encodings differ); a false
    # negative here would silently lose rows
    import datetime

    vals = [datetime.datetime(2024, 3, 5, 10), datetime.datetime(2024, 3, 6)]
    b = bl.build_bloom(vals)
    assert bl.bloom_may_contain(b, vals[0])
    assert bl.bloom_may_contain(b, "2024-03-05T10:00:00")  # cross-type
    assert not bl.bloom_may_contain(b, datetime.datetime(1999, 1, 1))
    ints = bl.build_bloom([1, 2, 3])
    assert bl.bloom_may_contain(ints, "2")  # cross-type: cannot prove
