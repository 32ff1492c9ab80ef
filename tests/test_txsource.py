"""The ``txtable`` Python DataSource (``sources/txsource.py``): SQL
reads with FILTER PUSHDOWN into the commit log's stats/bloom pruning —
one input partition per surviving file, executor-side pyarrow reads
with DV anti-filtering and column-mapping projection."""

from __future__ import annotations

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In

from event_streaming_toy_example_spark.operators import txtable as tx
from event_streaming_toy_example_spark.sources import txsource

_SCHEMA = "k int, grp int, amt double"


def _register(spark):
    txsource.register(spark)


def _stage(spark, tmp_path, files=3, per=10):
    p = str(tmp_path / "t")
    for f in range(files):
        rows = [(i, i % 3, float(i)) for i in range(f * per, (f + 1) * per)]
        tx.tx_append(
            spark.createDataFrame(rows, _SCHEMA).coalesce(1), p
        )
    return p


def _src(spark, p, pushdown=True, **opts):
    r = spark.read.format("txtable").option("path", p)
    if pushdown:
        r = r.option("pushdown", "true")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_full_read_matches_read_table(spark, tmp_path):
    _register(spark)
    p = _stage(spark, tmp_path)
    got = sorted(tuple(r) for r in _src(spark, p).collect())
    want = sorted(tuple(r) for r in tx.read_table(spark, p).collect())
    assert got == want and len(got) == 30


def test_sql_where_answers_match(spark, tmp_path):
    _register(spark)
    p = _stage(spark, tmp_path)
    _src(spark, p).createOrReplaceTempView("txsrc_t")
    got = spark.sql(
        "SELECT grp, count(*) n, sum(amt) s FROM txsrc_t "
        "WHERE k >= 10 AND k < 20 GROUP BY grp ORDER BY grp"
    ).collect()
    assert [(r["grp"], r["n"], r["s"]) for r in got] == [
        (g, len([i for i in range(10, 20) if i % 3 == g]),
         float(sum(i for i in range(10, 20) if i % 3 == g)))
        for g in (0, 1, 2)
    ]


def test_pushdown_prunes_file_partitions(spark, tmp_path):
    p = _stage(spark, tmp_path)  # 3 files: k in [0,10), [10,20), [20,30)
    r = txsource.TxTableReader({"path": p, "pushdown": "true"})
    leftover = list(r.pushFilters([EqualTo(("k",), 5)]))
    assert leftover == []  # fully translated -> RETAINED by the source
    parts = r.partitions()
    assert len(parts) == 1  # two files provably disjoint

    r2 = txsource.TxTableReader({"path": p, "pushdown": "true"})
    assert list(r2.pushFilters([GreaterThanOrEqual(("k",), 20)])) == []
    assert len(r2.partitions()) == 1

    r3 = txsource.TxTableReader({"path": p, "pushdown": "true"})
    assert list(r3.pushFilters([In(("k",), (1, 25))])) == []
    assert len(r3.partitions()) == 2


def test_pushdown_with_bloom_filters(spark, tmp_path):
    import hashlib

    p = str(tmp_path / "t")
    per = 20
    tx.tx_append(
        spark.createDataFrame(
            [(i, hashlib.md5(str(i).encode()).hexdigest())
             for i in range(per)],
            "id int, key string",
        ).coalesce(1),
        p,
    )
    tx.tx_set_bloom_filters(p, ["key"])
    for f in range(1, 4):
        rows = [
            (i, hashlib.md5(str(i).encode()).hexdigest())
            for i in range(f * per, (f + 1) * per)
        ]
        tx.tx_append(
            spark.createDataFrame(rows, "id int, key string").coalesce(1), p
        )
    # an absent key: every bloom-equipped file proves absence (file 1
    # predates the property and still scans)
    r = txsource.TxTableReader({"path": p, "pushdown": "true"})
    assert list(r.pushFilters([EqualTo(("key",), "f" * 32)])) == []
    assert len(r.partitions()) == 1
    # and through SQL the answer is correct (zero rows)
    _register(spark)
    _src(spark, p).createOrReplaceTempView("txsrc_bloom")
    assert (
        spark.sql(
            f"SELECT count(*) n FROM txsrc_bloom WHERE key = '{'f' * 32}'"
        ).first()["n"]
        == 0
    )


def test_dv_rows_are_anti_filtered(spark, tmp_path):
    _register(spark)
    p = _stage(spark, tmp_path, files=2, per=10)
    tx.tx_delete(spark, p, [("k", "in", (3, 12))], merge_on_read=True)
    got = sorted(r["k"] for r in _src(spark, p).collect())
    assert got == [i for i in range(20) if i not in (3, 12)]


def test_time_travel_option(spark, tmp_path):
    _register(spark)
    p = _stage(spark, tmp_path, files=2, per=5)
    tx.tx_delete(spark, p, [("k", "<", 3)])
    assert _src(spark, p).count() == 7
    assert _src(spark, p, version=2).count() == 10


def test_as_of_resolves_the_schema_of_that_version(spark, tmp_path):
    # ADVICE r10: schema() honored 'version' but ignored 'as_of', so an
    # as_of read after a schema evolution paired the LATEST relation
    # schema with the as_of version's Arrow batches.
    import time

    _register(spark)
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], "k int, amt double"), p
    )
    time.sleep(0.05)
    cut = time.time()
    time.sleep(0.05)
    tx.tx_append(
        spark.createDataFrame(
            [(2, 2.0, "x")], "k int, amt double, note string"
        ),
        p,
    )
    df = _src(spark, p, pushdown=False, as_of=cut)
    assert df.columns == ["k", "amt"]
    assert sorted(tuple(r) for r in df.collect()) == [(1, 1.0)]


def test_column_mapping_and_evolution(spark, tmp_path):
    _register(spark)
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1.0)], "k int, amt double"), p
    )
    tx.tx_rename_column(p, "amt", "value")
    tx.tx_append(
        spark.createDataFrame(
            [(2, 2.0, "x")], "k int, value double, note string"
        ),
        p,
    )
    got = sorted(tuple(r) for r in _src(spark, p).collect())
    assert got == [(1, 1.0, None), (2, 2.0, "x")]


def test_clone_reads_through_source(spark, tmp_path):
    _register(spark)
    src = _stage(spark, tmp_path, files=2, per=5)
    dst = str(tmp_path / "clone")
    tx.tx_clone(spark, src, dst)
    tx.tx_delete(spark, dst, [("k", "=", 7)], merge_on_read=True)
    got = sorted(r["k"] for r in _src(spark, dst).collect())
    assert got == [i for i in range(10) if i != 7]


def test_shared_view_default_is_safe_for_any_query_mix(spark, tmp_path):
    # Spark 4.1 reuses a relation's cached scan for filter-less
    # queries; a pushdown-specialized scan in that slot would lose
    # rows.  The DEFAULT (pushdown off) never specializes, so one
    # registered view answers any interleaving correctly.
    _register(spark)
    p = _stage(spark, tmp_path)
    _src(spark, p, pushdown=False).createOrReplaceTempView("txsrc_safe")
    seq = [
        spark.sql(q).first()["n"]
        for q in (
            "SELECT count(*) n FROM txsrc_safe",
            "SELECT count(*) n FROM txsrc_safe WHERE k >= 10",
            "SELECT count(*) n FROM txsrc_safe",
            "SELECT count(*) n FROM txsrc_safe WHERE k >= 20",
            "SELECT count(*) n FROM txsrc_safe",
        )
    ]
    assert seq == [30, 20, 30, 10, 30], seq


def test_pushdown_retains_translated_filters(spark, tmp_path):
    # retained filters are the source's responsibility: the read-side
    # re-filter must produce EXACT rows even when pruning kept a file
    # holding non-matching rows
    _register(spark)
    p = _stage(spark, tmp_path)
    got = sorted(
        r["k"]
        for r in _src(spark, p).where("k >= 5 AND k < 15").collect()
    )
    assert got == list(range(5, 15))


def test_missing_path_and_empty_table(spark, tmp_path):
    with pytest.raises(ValueError, match="path"):
        txsource.TxTableReader({})
    _register(spark)
    p = str(tmp_path / "t")
    tx.tx_append(
        spark.createDataFrame([(1, 1, 1.0)], _SCHEMA), p
    )
    tx.tx_delete(spark, p, [("k", "=", 1)])
    assert _src(spark, p).count() == 0
