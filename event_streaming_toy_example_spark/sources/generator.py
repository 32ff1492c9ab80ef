"""Seeded synthetic event source (SURVEY.md §2.1 S1/S2/S4).

The reference generates events one-at-a-time in Python with unseeded
``faker``/``random`` (reference ``producer.py:23-110``). Here the whole
generator is a single Spark plan over ``spark.range(n)`` built from pure
column expressions — JVM-side, whole-stage-codegen'd, seeded
(deterministic for tests), and embarrassingly parallel: generating 10^11
events on a 1000-executor cluster is the same plan with a bigger range.

Design: every random draw is ``xxhash64(seed_tag, id)`` reduced with
``pmod`` — a counter-based PRNG in Catalyst expressions. No Python runs
per row; no UDFs.

Semantics preserved from the reference:
- two-stage choice: uniform event *type*, then uniform subtype within
  the type (NOT uniform over all 36 subtypes) — ``producer.py:104-110``.
- per-subtype field sets from the taxonomy, unimplemented generator tags
  omitted (``config.py``, SURVEY.md §8.10).
- ``created_at`` is a fractional UNIX timestamp (double) in the
  2024-03-01 .. 2024-04-26 window (FIXTURES.md §1).
- duplicate injection appends verbatim copies of existing records
  (``producer.py:162-166``); here a deterministic ~`rate` fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from event_streaming_toy_example_spark.config import (
    CURRENCIES,
    DEVICES,
    DIFFICULTIES,
    EVENT_TAXONOMY,
    EVENT_TYPES,
    LANGUAGES,
    REGISTRATION_METHODS,
    realized_fields,
)
from event_streaming_toy_example_spark.schemas import EVENT_SPECIFICS_SCHEMA

# created_at window (FIXTURES.md §1): 2024-03-01 .. 2024-04-26 UTC
_TS_START = 1709251200
_TS_SPAN = 56 * 86400

_VOCAB = [
    "practice", "makes", "perfect", "learning", "language", "daily", "keeps",
    "vocab", "fresh", "grammar", "drills", "help", "retention", "lesson",
    "review", "improves", "fluency", "great", "progress", "today",
]

_CITIES = ["Berlin", "Madrid", "Paris", "Warsaw", "Lisbon", "Rome", "Ankara",
           "Moscow", "Beijing", "London", "Dublin", "Vienna"]
_COUNTRIES = ["Germany", "Spain", "France", "Poland", "Portugal", "Italy",
              "Turkey", "Russia", "China", "UK", "Ireland", "Austria"]


def _h(tag: str, seed: int, id_col: Column) -> Column:
    """Deterministic 64-bit draw for (tag, seed, row id)."""
    return F.xxhash64(F.lit(f"{tag}:{seed}"), id_col)


def _pick(tag: str, seed: int, id_col: Column, options: list[str]) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(_h(tag, seed, id_col), len(options)) + 1).cast("int"))


def _uuid(tag: str, seed: int, id_col: Column) -> Column:
    """UUID4-shaped deterministic id from an md5 digest (8-4-4-4-12)."""
    hx = F.md5(F.concat(F.lit(f"{tag}:{seed}:"), id_col.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )


def _int_between(tag: str, seed: int, id_col: Column, lo: int, hi: int) -> Column:
    return (F.pmod(_h(tag, seed, id_col), hi - lo + 1) + lo).cast("long")


def _iso_ts(tag: str, seed: int, id_col: Column) -> Column:
    secs = F.pmod(_h(tag, seed, id_col), _TS_SPAN) + F.lit(_TS_START)
    return F.date_format(F.timestamp_seconds(secs), "yyyy-MM-dd'T'HH:mm:ss")


def _sentence(tag: str, seed: int, id_col: Column) -> Column:
    n_words = F.pmod(_h(tag + ":len", seed, id_col), 5) + 4
    words = F.transform(
        F.sequence(F.lit(0), n_words.cast("int")),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in _VOCAB]),
            (F.pmod(F.xxhash64(F.lit(f"{tag}:{seed}"), id_col, i), len(_VOCAB)) + 1).cast("int"),
        ),
    )
    return F.concat(F.initcap(F.array_join(words, " ")), F.lit("."))


def _location(tag: str, seed: int, id_col: Column) -> Column:
    return F.concat(
        _pick(tag + ":city", seed, id_col, _CITIES),
        F.lit(", "),
        _pick(tag + ":country", seed, id_col, _COUNTRIES),
    )


def _field_value(field: str, tag: str, seed: int, id_col: Column) -> Column:
    """Generator-tag dispatch (parity with reference producer.py:39-85),
    as a column expression. Salted per field so e.g. ``session_id`` and
    ``account_id`` differ within one event."""
    t = f"{field}:{tag}"
    if tag in ("account_id", "session_id", "user_id", "exercise_id", "lesson_id"):
        return _uuid(t, seed, id_col)
    if tag == "currency":
        return _pick(t, seed, id_col, CURRENCIES)
    if tag == "device":
        return _pick(t, seed, id_col, DEVICES)
    if tag == "difficulty":
        return _pick(t, seed, id_col, DIFFICULTIES)
    if tag == "registration_method":
        return _pick(t, seed, id_col, REGISTRATION_METHODS)
    if tag == "number":
        return _int_between(t, seed, id_col, 1, 100)
    if tag == "number_1to10":
        return _int_between(t, seed, id_col, 1, 10)
    if tag == "duration":
        return _int_between(t, seed, id_col, 1, 120)
    if tag == "rating":
        return _int_between(t, seed, id_col, 1, 5)
    if tag == "score":
        return _int_between(t, seed, id_col, 0, 100)
    if tag == "amount":
        return _int_between(t, seed, id_col, 10, 99)
    if tag == "timestamp":
        return _iso_ts(t, seed, id_col)
    if tag == "language_id":
        return _pick(t, seed, id_col, LANGUAGES)
    if tag == "not_applicable":
        return F.lit("not_applicable")
    if tag == "email":
        return F.concat(
            F.lit("user"),
            F.pmod(_h(t, seed, id_col), 100000).cast("string"),
            F.lit("@example."),
            _pick(t + ":tld", seed, id_col, ["com", "org", "net", "io"]),
        )
    if tag == "sentence":
        return _sentence(t, seed, id_col)
    if tag == "location":
        return _location(t, seed, id_col)
    if tag == "campaign_id":
        return F.concat(F.lit("camp_"), _int_between(t, seed, id_col, 1000, 9999).cast("string"))
    raise ValueError(f"unsupported generator tag: {tag}")


def _event_name_column(seed: int, id_col: Column) -> Column:
    """Two-stage uniform choice: type, then subtype within type."""
    type_idx = F.pmod(_h("etype", seed, id_col), len(EVENT_TYPES))
    name = None
    for i, etype in enumerate(EVENT_TYPES):
        subs = list(EVENT_TAXONOMY[etype])
        names = F.array(*[F.lit(f"{etype}:{s}") for s in subs])
        sub_idx = (F.pmod(_h(f"esub:{etype}", seed, id_col), len(subs)) + 1).cast("int")
        branch = F.element_at(names, sub_idx)
        name = F.when(type_idx == i, branch) if name is None else name.when(type_idx == i, branch)
    return name


def _specifics_column(seed: int, id_col: Column, event_name: Column) -> Column:
    """The 30-field ``event_specifics`` struct: each field is populated
    only for subtypes whose taxonomy includes it, else NULL."""
    # field -> tag -> [event_name ...]
    field_tags: dict[str, dict[str, list[str]]] = {}
    for etype, subs in EVENT_TAXONOMY.items():
        for sub, fields in subs.items():
            full = f"{etype}:{sub}"
            for fname, tag in realized_fields(fields).items():
                field_tags.setdefault(fname, {}).setdefault(tag, []).append(full)

    members = []
    for sfield in EVENT_SPECIFICS_SCHEMA.fields:
        fname = sfield.name
        tags = field_tags.get(fname, {})
        branches = [
            F.when(event_name.isin(names), _field_value(fname, tag, seed, id_col))
            for tag, names in sorted(tags.items())
        ]
        if not branches:
            col = F.lit(None).cast(sfield.dataType)
        else:
            col = F.coalesce(*branches).cast(sfield.dataType)
        members.append(col.alias(fname))
    return F.struct(*members)


def generate_events(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """S1/S2: n synthetic events with the EVENT_SCHEMA columns.

    A single distributed plan: ``range(n)`` -> column expressions.
    Partition count follows ``spark.default.parallelism``; at cluster
    scale pass a larger ``n`` — no other change needed.
    """
    id_col = F.col("id")
    frac = F.pmod(_h("ts_frac", seed, id_col), 1000000) / F.lit(1000000.0)
    created_at = (
        F.pmod(_h("ts", seed, id_col), _TS_SPAN) + F.lit(_TS_START) + frac
    ).cast("double")
    return (
        spark.range(n)
        .withColumn("event_name", _event_name_column(seed, id_col))
        .select(
            created_at.alias("created_at"),
            F.col("event_name"),
            _specifics_column(seed, id_col, F.col("event_name")).alias("event_specifics"),
            _uuid("event_uuid", seed, id_col).alias("event_uuid"),
        )
    )


def inject_duplicates(df: DataFrame, rate: float = 0.05, key: str = "event_uuid",
                      seed: int = 42) -> DataFrame:
    """S4: fault injection for dedup testing — append verbatim copies of
    a deterministic ~``rate`` fraction of rows (reference
    ``producer.py:162-166`` re-appends 1-10 random records with p=0.05).
    """
    pct = int(rate * 10000)
    dups = df.where(
        F.pmod(F.xxhash64(F.lit(f"dupinj:{seed}"), F.col(key)), 10000) < pct
    )
    return df.unionAll(dups)
