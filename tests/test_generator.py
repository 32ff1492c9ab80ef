"""Generator (S1/S2/S4) behavior: determinism, schema, taxonomy parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.config import EVENT_TAXONOMY, realized_fields
from event_streaming_toy_example_spark.schemas import EVENT_SCHEMA
from event_streaming_toy_example_spark.sources import (
    generate_events,
    inject_duplicates,
)

N = 500


def test_schema_matches_fixture(spark):
    ev = generate_events(spark, N)
    # simpleString ignores nullability (literal-derived cols are non-null)
    assert ev.schema.simpleString() == EVENT_SCHEMA.simpleString()


def test_deterministic_for_seed(spark):
    a = generate_events(spark, 100, seed=7).collect()
    b = generate_events(spark, 100, seed=7).collect()
    assert a == b
    c = generate_events(spark, 100, seed=8).collect()
    assert a != c


def test_event_names_are_valid_taxonomy(spark):
    valid = {
        f"{t}:{s}" for t, subs in EVENT_TAXONOMY.items() for s in subs
    }
    names = {
        r["event_name"]
        for r in generate_events(spark, N).select("event_name").distinct().collect()
    }
    assert names <= valid
    # with 500 draws we expect to hit most of the 10 types
    types_seen = {n.split(":")[0] for n in names}
    assert len(types_seen) >= 8


def test_field_population_follows_taxonomy(spark):
    """Populated specifics keys per subtype == realised taxonomy keys."""
    ev = generate_events(spark, 2000).cache()
    for etype, subs in list(EVENT_TAXONOMY.items())[:4]:
        for sub, fields in subs.items():
            name = f"{etype}:{sub}"
            rows = ev.where(F.col("event_name") == name).limit(5).collect()
            if not rows:
                continue
            expected = set(realized_fields(fields))
            for r in rows:
                populated = {
                    k for k, v in r["event_specifics"].asDict().items() if v is not None
                }
                assert populated == expected, (name, populated ^ expected)
    ev.unpersist()


def test_created_at_window_and_fraction(spark):
    row = (
        generate_events(spark, N)
        .agg(
            F.min("created_at").alias("lo"),
            F.max("created_at").alias("hi"),
        )
        .collect()[0]
    )
    assert row["lo"] >= 1709251200.0
    assert row["hi"] < 1709251200.0 + 56 * 86400 + 1


def test_payment_triple_colon_event_names(spark):
    names = {
        r["event_name"]
        for r in generate_events(spark, 3000)
        .where(F.col("event_name").startswith("payment"))
        .select("event_name")
        .distinct()
        .collect()
    }
    assert names <= {"payment:order:completed", "payment:order:failed"}
    assert names  # payment events do occur


def test_inject_duplicates_appends_verbatim_copies(spark):
    ev = generate_events(spark, 1000)
    with_dups = inject_duplicates(ev, rate=0.05)
    n, nd = ev.count(), with_dups.count()
    assert nd > n
    # every surplus row is a verbatim copy of an existing one
    assert with_dups.distinct().count() == n
