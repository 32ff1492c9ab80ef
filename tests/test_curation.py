"""Training-data curation operators: deterministic hash sampling,
benchmark decontamination, PII scrubbing, mixture weighting.

Cross-engine value parity for the catalog entries is covered by
``tests/test_oracle_parity.py`` (parametrized over the full catalog);
these tests pin the operator-level semantics and the scale-relevant
plan properties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.functions.curation import (
    decontaminate,
    hash_gate,
    hash_sample,
    mixture_weights,
    scrub_pii,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10000).select(F.col("id").alias("k"))


def test_hash_sample_rate_and_determinism(spark, ids):
    s1 = hash_sample(ids, "k", 0.3)
    n1 = s1.count()
    # uniform md5 gate: binomial(10000, 0.3) stays well within ±5 sigma
    assert abs(n1 - 3000) < 5 * (10000 * 0.3 * 0.7) ** 0.5
    # identical membership under a different partitioning (df.sample
    # would NOT survive this — per-partition RNG)
    s2 = hash_sample(ids.repartition(17, "k"), "k", 0.3)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0


def test_hash_sample_is_monotone_in_rate(spark, ids):
    # a grown rate only ADDS keys — incremental re-runs keep old members
    small = set(r.k for r in hash_sample(ids, "k", 0.1).collect())
    big = set(r.k for r in hash_sample(ids, "k", 0.3).collect())
    assert small <= big


def test_hash_sample_is_a_filter_not_a_shuffle(spark, ids):
    plan = hash_sample(ids, "k", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_gate_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        hash_gate(F.lit(1), 1.5)


def test_hash_gate_null_key_parity_with_sql_twin(spark):
    """NULL keys must gate identically in Spark and the DuckDB twin:
    both coalesce to the same sentinel, so NULL-key rows form one
    stable bucket (kept or dropped together, same verdict per engine)."""
    import duckdb

    from event_streaming_toy_example_spark.functions.curation import sql_hash_gate

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], ["id", "k"]
    )
    for rate in (0.0, 0.37, 0.82, 1.0):
        spark_kept = sorted(
            r.id for r in df.where(hash_gate(F.col("k"), rate)).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t(id INT, k VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            [(1, "a"), (2, None), (3, "b"), (4, None)],
        )
        duck_kept = sorted(
            r[0]
            for r in con.execute(
                f"SELECT id FROM t WHERE {sql_hash_gate('k', rate)}"
            ).fetchall()
        )
        assert spark_kept == duck_kept, (rate, spark_kept, duck_kept)
    # NULL-key rows travel together: both in or both out
    kept = set(r.id for r in df.where(hash_gate(F.col("k"), 0.5)).collect())
    assert (2 in kept) == (4 in kept)


def test_sql_gates_escape_quotes(spark):
    """Salt/stratum values containing single quotes must not produce
    malformed oracle SQL."""
    import duckdb

    from event_streaming_toy_example_spark.functions.curation import (
        sql_hash_gate,
        sql_stratified_gate,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, g VARCHAR)")
    con.execute("INSERT INTO t VALUES ('x', 'o''brien')")
    # must parse and run without error
    con.execute(f"SELECT * FROM t WHERE {sql_hash_gate('k', 0.5, salt=chr(39))}")
    con.execute(
        "SELECT * FROM t WHERE "
        + sql_stratified_gate("k", "g", {"o'brien": 1.0}, salt="s'alt")
    ).fetchall()


def test_scrub_pii_patterns(spark):
    rows = [
        ("reach me at jane.doe+x@corp.example.org thanks", 1),
        ("ssn is 123-45-6789 and backup 987-65-4321", 2),
        ("call +44 020-7946-0958 now", 1),
        ("clean text with no identifiers at all", 0),
        ("a@b.io or 111-22-3333 or +1 555-123-4567", 3),
    ]
    df = spark.createDataFrame(rows, ["text", "expected"])
    clean, n = scrub_pii(F.col("text"))
    out = df.select("expected", n.alias("n"), clean.alias("clean")).collect()
    for r in out:
        assert r.n == r.expected, r
    joined = " ".join(r.clean for r in out)
    assert "@" not in joined and "123-45-6789" not in joined


def test_mixture_weights_flatten_and_sum(spark):
    df = spark.createDataFrame(
        [("en",)] * 900 + [("is",)] * 100, ["lang"]
    )
    w = {r.lang: r.weight for r in mixture_weights(df, "lang", alpha=0.5).collect()}
    assert abs(sum(w.values()) - 1.0) < 1e-6
    # alpha=0.5 flattens: 9x the docs -> only 3x the weight
    assert w["en"] / w["is"] == pytest.approx(3.0, rel=1e-6)
    # alpha=1 is proportional
    w1 = {r.lang: r.weight for r in mixture_weights(df, "lang", alpha=1.0).collect()}
    assert w1["en"] / w1["is"] == pytest.approx(9.0, rel=1e-6)


def test_decontaminate_finds_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark plans"),
            (3, "quick brown fox appears here too somehow"),
        ],
        ["doc_id", "text"],
    )
    benchmark = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], ["doc_id", "text"]
    )
    hits = {
        r.doc_id: r.n_shared_shingles
        for r in decontaminate(corpus, benchmark, "doc_id", "text", k=3).collect()
    }
    # doc 1 shares 'the quick brown', 'quick brown fox', 'brown fox
    # jumps'; doc 3 shares 'quick brown fox'; doc 2 shares nothing
    assert hits == {1: 3, 3: 1}


def test_decontaminate_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    bench = spark.createDataFrame([(2, "b c d e")], ["doc_id", "text"])
    plan = (
        decontaminate(corpus, bench, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_is_filter_and_consistent(spark):
    from event_streaming_toy_example_spark.functions.curation import (
        hash_sample,
        stratified_hash_sample,
    )

    df = spark.range(0, 6000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("g"),
    )
    rates = {"s0": 0.1, "s1": 0.5, "s2": 1.0}
    out = stratified_hash_sample(df, "k", "g", rates)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    per = {r.g: r.n for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["s2"] == 2000            # rate 1.0 keeps everything
    assert abs(per["s0"] - 200) < 100   # ~10% of 2000
    assert abs(per["s1"] - 1000) < 150  # ~50% of 2000
    # a stratum at rate r keeps exactly the rows hash_sample(r) keeps:
    # the flat and stratified gates are the same deterministic family
    flat = set(r.k for r in hash_sample(df.where(F.col("g") == "s1"), "k", 0.5).collect())
    strat = set(r.k for r in out.where(F.col("g") == "s1").collect())
    assert flat == strat
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "k", "g", {"s0": 1.2})


def test_strip_boilerplate(spark):
    from event_streaming_toy_example_spark.functions.curation import (
        strip_boilerplate,
    )

    rows = [
        ("see <a href=x>link</a> at https://ex.org/p?q=1 end", 3),
        ("plain text, no markup at all", 0),
        ("<div><p>nested</p></div>", 4),
    ]
    df = spark.createDataFrame(rows, ["text", "expected"])
    stripped, n = strip_boilerplate(F.col("text"))
    out = df.select("expected", n.alias("n"), stripped.alias("s")).collect()
    for r in out:
        assert r.n == r.expected, r
        assert "<" not in r.s and "https://" not in r.s
    # token boundaries survive (spans replaced by a space, not deleted)
    assert "link" in out[0].s and "nested" in out[2].s
