"""Training-data curation operators: deterministic sampling, benchmark
decontamination, PII scrubbing, and mixture weighting.

These are the corpus-level operations a large-scale training-data
pipeline runs between raw ingest and tokenization (the reference has no
analogue — this is engine surface beyond
``/root/reference/producer.py``'s event generator). All four are pure
DataFrame compositions designed for the 100 TB path:

- ``hash_sample``: a FILTER, not a shuffle. ``df.sample()`` draws from
  a per-partition RNG, so its output changes whenever partitioning,
  task retries, or the seed's split differ between runs; hash-gating on
  a stable key is the idiom that survives backfills and incremental
  re-runs (the same row is always in or always out), pushes down to the
  scan, and costs zero network.
- ``decontaminate``: benchmark sets are tiny (thousands of docs) next
  to a corpus (billions), so the shingle membership set broadcasts; the
  corpus side is one explode + broadcast semi-join — no shuffle of
  corpus rows, no all-pairs anything.
- ``scrub_pii``: pure ``regexp_replace`` column expressions —
  JVM-side, codegen'd, zero Python.
- ``mixture_weights``: the classic temperature-scaled source weighting
  (w_s ∝ n_s^alpha, alpha<1 upweights rare sources) — one tiny
  aggregate over group counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from event_streaming_toy_example_spark.functions.hashkeys import (
    NULL_KEY as _NULL_KEY,
)

# ------------------------------------------------------------- sampling

#: hex digits of the md5 prefix used as the sampling gate; 4 digits =
#: 16^4 = 65536 buckets, so rates are representable to ~1.5e-5.
_GATE_DIGITS = 4



#: Sentinel hashed in place of a NULL key so the gate is engine-identical:
#: Spark's ``concat_ws`` silently skips NULLs (all NULL keys would hash as
#: ``md5(salt)``) while SQL ``||`` nulls the whole expression (all NULL
#: keys would be dropped). Coalescing to one printable sentinel on BOTH
#: sides makes NULL-key rows a single stable pseudo-random bucket.


def _sq(value: str) -> str:
    """Escape a value for interpolation into a single-quoted SQL string
    literal (the oracle twins build SQL by string formatting)."""
    return value.replace("'", "''")


def _gate_threshold(rate: float) -> str:
    """Threshold string for an md5-prefix gate. ``rate >= 1`` must keep
    everything: int(1.0 * 65536) formats to the 5-char '10000', which
    sorts BELOW most 4-char prefixes ('1' < 'f') — use 'g', which sorts
    above every hex digit, as the keep-all sentinel instead."""
    n = int(rate * 16**_GATE_DIGITS)
    if n >= 16**_GATE_DIGITS:
        return "g"
    return format(n, f"0{_GATE_DIGITS}x")


def hash_gate(key: Column, rate: float, salt: str = "smp") -> Column:
    """Deterministic membership predicate: True for ~``rate`` of keys.

    ``md5(salt || ':' || key)`` is uniform over fixed-width lowercase
    hex, so comparing its prefix lexicographically against the
    ``rate``-quantile threshold selects a stable pseudo-random subset —
    identically in any engine with ``md5`` (the DuckDB oracle runs the
    same expression verbatim).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = _gate_threshold(rate)
    prefix = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.coalesce(key.cast("string"), F.lit(_NULL_KEY)),
            )
        ),
        1,
        _GATE_DIGITS,
    )
    return prefix < F.lit(thr)


def sql_hash_gate(key_expr: str, rate: float, salt: str = "smp") -> str:
    """DuckDB twin of :func:`hash_gate` (same md5-prefix comparison,
    same NULL-key sentinel)."""
    thr = _gate_threshold(rate)
    return (
        f"substring(md5('{_sq(salt)}:' || "
        f"coalesce(CAST({key_expr} AS VARCHAR), '{_NULL_KEY}')), "
        f"1, {_GATE_DIGITS}) < '{thr}'"
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "smp"
) -> DataFrame:
    """Stable ``rate``-fraction sample keyed on ``key_col`` — a pure
    filter (no shuffle, no RNG state), so re-running over a grown
    corpus keeps every previously-sampled row."""
    return df.where(hash_gate(F.col(key_col), rate, salt))


# ------------------------------------------------- decontamination

def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark contamination report: for every corpus doc sharing at
    least one k-token shingle with any benchmark doc, the number of
    distinct shared shingles.

    Plan shape for 100 TB: the benchmark shingle set (tiny) is
    broadcast; the corpus side builds its shingles ROW-LOCALLY
    (``minhash.shingle_array`` — arrays_zip of shifted slices, no
    window, no repartition, no distinct exchange), explodes, and
    broadcast-joins. Corpus rows never shuffle — the only wide
    exchange is the final per-doc count aggregate. Survivor selection
    is then an anti-join of ids against this report.
    """
    from event_streaming_toy_example_spark.functions.minhash import shingle_array

    bench_sh = (
        benchmark.select(
            F.explode(shingle_array(F.col(text_col), k)).alias("shingle")
        )
        .distinct()
    )
    corp_sh = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_array(F.col(text_col), k)).alias("shingle"),
    )
    return (
        corp_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_shingles"))
    )


# ------------------------------------------------------------ PII scrub

#: Portable PII patterns — the subset of regex syntax Java
#: (Spark) and RE2 (DuckDB) treat identically: no backrefs, no
#: lookaround, explicit character classes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
    "phone": r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{4}",
}


def scrub_pii(text: Column) -> tuple[Column, Column]:
    """(scrubbed_text, total_redaction_count) — each PII pattern is
    replaced with ``<TYPE>``; counts are summed across patterns.
    Pure codegen'd column expressions (regexp_replace / regexp_count)."""
    scrubbed = text
    n = F.lit(0)
    for name, pat in PII_PATTERNS.items():
        n = n + F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return scrubbed, n.cast("long")


def sql_scrub_pii(text_expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`scrub_pii` (same patterns, same order)."""
    scrubbed = text_expr
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(f"len(regexp_extract_all({scrubbed}, '{pat}'))")
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '<{name.upper()}>', 'g')"
    return scrubbed, "CAST(" + " + ".join(counts) + " AS BIGINT)"


# ------------------------------------------------------- mixture weights

def mixture_weights(
    df: DataFrame, group_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled sampling weights per group: w_g =
    n_g^alpha / sum(n^alpha). ``alpha < 1`` flattens the mixture
    (upweights rare languages/sources), ``alpha = 1`` is proportional.
    One small aggregate + a broadcast-able scalar join; the heavy scan
    happens once."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    powered = counts.withColumn("n_pow", F.pow("n_docs", F.lit(alpha)))
    total = powered.agg(F.sum("n_pow").alias("z"))
    return (
        powered.crossJoin(F.broadcast(total))
        .select(
            group_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_pow") / F.col("z"), 9).alias("weight"),
        )
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "smp",
) -> DataFrame:
    """Per-stratum deterministic sampling — the consumer of
    :func:`mixture_weights`: each stratum (language, source) keeps its
    own ``rates[stratum]`` fraction, selected by the same md5 gate as
    :func:`hash_sample` so membership is stable under repartitioning,
    retries, and corpus growth.

    Still a pure FILTER: the per-row threshold is a CASE expression on
    the stratum column compared against the key's md5 prefix — no
    shuffle, no RNG state, no per-stratum pass over the data (contrast
    ``df.sampleBy``, which is per-partition RNG with all three
    problems).
    """
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thr = _gate_threshold
    threshold = F.lit(thr(default_rate))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(thr(rate))
        ).otherwise(threshold)
    prefix = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL_KEY)),
            )
        ),
        1,
        _GATE_DIGITS,
    )
    return df.where(prefix < threshold)


def sql_stratified_gate(
    key_expr: str,
    strata_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "smp",
) -> str:
    """DuckDB twin of :func:`stratified_hash_sample`'s predicate."""
    thr = _gate_threshold
    case = f"'{thr(default_rate)}'"
    for stratum, rate in sorted(rates.items()):
        case = (
            f"CASE WHEN {strata_expr} = '{_sq(stratum)}' THEN '{thr(rate)}' "
            f"ELSE {case} END"
        )
    return (
        f"substring(md5('{_sq(salt)}:' || "
        f"coalesce(CAST({key_expr} AS VARCHAR), '{_NULL_KEY}')), "
        f"1, {_GATE_DIGITS}) < {case}"
    )


# ------------------------------------------------------- boilerplate

#: Portable boilerplate patterns (same Java/RE2-safe subset as
#: PII_PATTERNS): URLs and HTML/XML tags — the first two strip passes
#: of any web-crawl curation pipeline.
BOILERPLATE_PATTERNS: dict[str, str] = {
    "url": r"https?://[A-Za-z0-9./_%+&#?=-]+",
    "tag": r"<[A-Za-z/][^<>]*>",
}


def strip_boilerplate(text: Column) -> tuple[Column, Column]:
    """(stripped_text, removal_count) — boilerplate spans are deleted
    (replaced with a single space so token boundaries survive), counts
    summed across patterns. Pure codegen'd column expressions, the
    structural twin of :func:`scrub_pii`."""
    stripped = text
    n = F.lit(0)
    for pat in BOILERPLATE_PATTERNS.values():
        n = n + F.regexp_count(stripped, F.lit(pat))
        stripped = F.regexp_replace(stripped, pat, " ")
    return stripped, n.cast("long")


def sql_strip_boilerplate(text_expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`strip_boilerplate`."""
    stripped = text_expr
    counts = []
    for pat in BOILERPLATE_PATTERNS.values():
        counts.append(f"len(regexp_extract_all({stripped}, '{pat}'))")
        stripped = f"regexp_replace({stripped}, '{pat}', ' ', 'g')"
    return stripped, "CAST(" + " + ".join(counts) + " AS BIGINT)"
