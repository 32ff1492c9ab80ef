"""Property-based tests (hypothesis): engine invariants that golden
tests can't sweep — codec round-trips and portable-hash models over
arbitrary inputs.

Spark jobs per example are expensive, so each property batches all
hypothesis examples into ONE DataFrame and runs ONE job.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from event_streaming_toy_example_spark.functions.text import (
    fingerprint_rolling,
    normalize_text,
)
from event_streaming_toy_example_spark.sources.kinesis import (
    decode_kinesis_records,
    wrap_kinesis_envelope,
)

# printable-but-adversarial text: unicode letters, punctuation,
# whitespace runs, empty-ish strings
TEXTS = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), exclude_characters="\x00"
    ),
    max_size=120,
)


def _collect_texts(data):
    # hypothesis gives us a list of strings; drop NUL (JSON/Parquet-safe)
    return [t.replace("\x00", "") for t in data]


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXTS, min_size=40, max_size=40))
def test_kinesis_codec_roundtrip_property(spark, texts):
    """encode(decode(x)) == x for arbitrary event field content: the
    envelope JSON + base64 codec must be lossless on any string that
    can live in a column (incl. quotes, newlines, unicode)."""
    rows = [
        (float(i), t if t else None, i)
        for i, t in enumerate(_collect_texts(texts))
    ]
    ev = spark.createDataFrame(
        rows, "created_at double, event_name string, event_uuid string"
    ).select(
        "created_at",
        "event_name",
        F.struct(F.col("event_name").alias("language_id")).alias(
            "event_specifics"
        ),
        F.col("event_uuid").cast("string").alias("event_uuid"),
    )
    back = decode_kinesis_records(wrap_kinesis_envelope(ev))
    orig = [
        (r["created_at"], r["event_name"], r["event_uuid"])
        for r in ev.select("created_at", "event_name", "event_uuid").collect()
    ]
    rt = [
        (r["created_at"], r["event_name"], r["event_uuid"])
        for r in back.select("created_at", "event_name", "event_uuid").collect()
    ]
    assert sorted(rt, key=str) == sorted(orig, key=str)


def _model_normalize(t: str) -> str:
    import re

    # Java regex \s is ASCII-only ([ \t\n\x0b\f\r]); Python's is
    # Unicode-aware — model the engine's (Java's) semantics explicitly.
    ws = " \t\n\x0b\f\r"
    t = re.sub(rf"[^a-z0-9{ws}]", "", t.lower())
    t = re.sub(rf"[{ws}]+", " ", t)
    return t.strip(ws)


def _model_rolling(t: str, base: int = 31, mod: int = (1 << 31) - 1) -> int:
    h = 0
    for ch in _model_normalize(t):
        h = (h * base + ord(ch)) % mod
    return h


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet=string.ascii_letters + string.digits + " .,!?-\t\n", max_size=80),
        min_size=40,
        max_size=40,
    )
)
def test_rolling_fingerprint_matches_model(spark, texts):
    """The Catalyst `aggregate`-expression rolling hash equals the
    classic Python Rabin-Karp loop on arbitrary ASCII text."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", fingerprint_rolling(F.col("text")).alias("fp")
        ).collect()
    }
    for i, t in rows:
        assert got[i] == _model_rolling(t), (t, got[i], _model_rolling(t))


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXTS, min_size=30, max_size=30))
def test_normalize_matches_model(spark, texts):
    """normalize_text == the documented lowercase/strip/collapse model
    for arbitrary unicode input (ASCII-range semantics)."""
    rows = [(i, t) for i, t in enumerate(_collect_texts(texts))]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text(F.col("text")).alias("n")).collect()
    }
    for i, t in rows:
        # Python str.lower() and Spark lower() agree on the BMP subset
        # used here; the regex model is byte-identical.
        assert got[i] == _model_normalize(t), repr((t, got[i], _model_normalize(t)))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**61), min_size=30, max_size=30),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hash_gate_model_property(spark, keys, rate):
    """hash_gate == the pure-Python md5-prefix model for arbitrary keys
    and rates — the property that makes the sample deterministic across
    engines, partitionings, and reruns."""
    import hashlib as _hl

    from event_streaming_toy_example_spark.functions.curation import (
        _GATE_DIGITS,
        _gate_threshold,
        hash_gate,
    )

    df = spark.createDataFrame([(k,) for k in set(keys)], "k long")
    got = {
        r.k
        for r in df.where(hash_gate(F.col("k"), rate)).collect()
    }
    thr = _gate_threshold(rate)
    want = {
        k
        for k in set(keys)
        if _hl.md5(f"smp:{k}".encode()).hexdigest()[:_GATE_DIGITS] < thr
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXTS, min_size=20, max_size=20))
def test_scrub_pii_idempotent_property(spark, texts):
    """Scrubbing is idempotent (scrub(scrub(x)) == scrub(x)) and the
    redaction count is non-negative — for arbitrary text, including
    strings that merely resemble PII."""
    from event_streaming_toy_example_spark.functions.curation import scrub_pii

    rows = [(t,) for t in _collect_texts(texts)]
    df = spark.createDataFrame(rows, "text string")
    once, n1 = scrub_pii(F.col("text"))
    out = df.select(once.alias("once"), n1.alias("n1"))
    twice, n2 = scrub_pii(F.col("once"))
    final = out.select("once", "n1", twice.alias("twice"), n2.alias("n2")).collect()
    for r in final:
        assert r.once == r.twice
        assert r.n1 >= 0 and r.n2 == 0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 50)),
        min_size=10,
        max_size=40,
    )
)
def test_incremental_dedup_invariants_property(spark, pairs):
    """For any snapshot (id, fingerprint-bucket) multiset and any prior
    subset: survivors carry distinct fingerprints, none appearing in
    the prior corpus, each with the minimal id of its fingerprint."""
    from event_streaming_toy_example_spark.operators.dedup import incremental_dedup

    rows = [(i, f"fp{b}") for i, b in pairs]
    snap = spark.createDataFrame(rows, "doc_id long, fingerprint string")
    prior = snap.where(F.col("doc_id") % 3 == 0).select("fingerprint")
    out = incremental_dedup(snap, prior).collect()
    prior_fps = {f"fp{b}" for i, b in pairs if i % 3 == 0}
    min_id = {}
    for i, b in pairs:
        fp = f"fp{b}"
        min_id[fp] = min(min_id.get(fp, i), i)
    fps = [r.fingerprint for r in out]
    assert len(fps) == len(set(fps))
    for r in out:
        assert r.fingerprint not in prior_fps
        assert r.doc_id == min_id[r.fingerprint]
    assert set(fps) == {fp for fp in min_id if fp not in prior_fps}


# word pool mirrors the synthetic corpus's style: lowercase words that
# survive normalize_text unchanged
_WORDS = ["key", "agg", "row", "scan", "slow", "fast", "table", "value"]


def _model_tokens(text: str) -> list[str]:
    import re

    t = re.sub(r"[^a-z0-9\s]", "", text.lower())
    return [w for w in re.split(r"\s+", t) if w]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=60),
        min_size=8,
        max_size=8,
    )
)
def test_chunk_windows_reconstruct_property(spark, docs):
    """For arbitrary token streams: chunks tile the doc on the stride
    (chunk i starts at token i*S), each chunk is <= W tokens, and
    dropping the first W-S overlap tokens of every chunk after the
    first reconstructs the original stream exactly."""
    from event_streaming_toy_example_spark.plans.queries_ext21 import (
        chunk_windows,
    )

    W, S = 7, 5  # small window/stride so properties bite on short docs
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_windows(df, w=W, s=S).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r
    for i, ws in enumerate(rows):
        toks = _model_tokens(rows[i][1])
        chunks = by_doc[i]
        # starts: 1, 1+S, ... <= n  ->  floor((n-1)/S)+1 chunks
        n_expected = (len(toks) - 1) // S + 1
        assert sorted(chunks) == list(range(n_expected))
        rebuilt = []
        for ci in range(n_expected):
            ctoks = chunks[ci].chunk_text.split(" ")
            assert chunks[ci].n_tokens == len(ctoks) <= W
            assert ctoks == toks[ci * S : ci * S + W]
            rebuilt.extend(ctoks if ci == 0 else ctoks[W - S :])
        assert rebuilt == toks


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=24),
        min_size=8,
        max_size=8,
    )
)
def test_segments_rebuild_model_property(spark, docs):
    """For arbitrary corpora: kept_text equals the in-order
    concatenation of exactly those segments present in fewer than K
    distinct docs (pure-Python model), and n_kept + dropped ==
    n_segments."""
    from event_streaming_toy_example_spark.plans.queries_ext21 import (
        segments_rebuild,
    )

    L, K = 3, 2
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in segments_rebuild(df, seg_len=L, k=K).collect()}

    # model: segment every doc, count distinct docs per segment text
    segs = {}
    per_doc = {}
    for i, _ in enumerate(rows):
        toks = _model_tokens(rows[i][1])
        parts = [
            " ".join(toks[j : j + L]) for j in range(0, max(len(toks), 1), L)
        ]
        per_doc[i] = parts
        for p in set(parts):
            segs.setdefault(p, set()).add(i)
    for i, parts in per_doc.items():
        hot = {p for p in parts if len(segs[p]) >= K}
        kept = [p for p in parts if p not in hot]
        r = out[i]
        assert r.n_segments == len(parts)
        assert r.n_kept == len(kept)
        assert r.kept_text == " ".join(kept)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_wav_decoder_total_on_garbage(payload):
    """The RIFF chunk walker must TOTALIZE: any byte string either
    decodes or raises ValueError/NotImplementedError — never an
    IndexError/struct.error/numpy crash, and never a silent misread
    that returns for a stream that is not RIFF/WAVE at all."""
    from event_streaming_toy_example_spark.functions import wav_codec

    try:
        samples, rate = wav_codec.decode_wav(payload)
    except (ValueError, NotImplementedError):
        return
    # decoded: must have been a genuine RIFF/WAVE header
    assert wav_codec.is_wav(payload)
    assert rate >= 1 and samples.ndim in (1, 2)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_wav_decoder_total_on_riff_shaped_garbage(body):
    """Same totality property on adversarial inputs that PASS the
    RIFF/WAVE magic check — the walker, fmt parser, and every format
    branch must validate their own fields."""
    import struct

    from event_streaming_toy_example_spark.functions import wav_codec

    payload = b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body
    try:
        samples, rate = wav_codec.decode_wav(payload)
    except (ValueError, NotImplementedError):
        return
    assert rate >= 1 and samples.ndim in (1, 2)


@given(
    st.lists(
        st.tuples(
            st.binary(min_size=4, max_size=4).filter(
                lambda cid: cid not in (b"fmt ", b"data")
            ),
            st.binary(min_size=0, max_size=31),
        ),
        max_size=4,
    ),
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_wav_metadata_chunks_are_transparent(chunks, n, seed):
    """Inserting arbitrary non-fmt/data chunks (any id, any body, odd
    or even sized) around the payload must not change the decode — the
    walker's skip path is content-transparent."""
    import struct

    import numpy as np

    from event_streaming_toy_example_spark.functions import wav_codec

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, n, dtype=np.int16)
    canonical = wav_codec.encode_wav(samples, 8000)
    out0, rate0 = wav_codec.decode_wav(canonical)
    assert rate0 == 8000 and np.array_equal(out0, samples)

    # rebuild with the random chunks interleaved before fmt, between
    # fmt and data, and after data
    fmt_body = canonical[20:36]
    data_body = canonical[44:]
    k = len(chunks)
    pre, mid, post = chunks[: k // 3], chunks[k // 3 : 2 * k // 3], chunks[2 * k // 3 :]

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    payload = b"".join(chunk(c, b) for c, b in pre)
    payload += chunk(b"fmt ", fmt_body)
    payload += b"".join(chunk(c, b) for c, b in mid)
    payload += chunk(b"data", data_body)
    payload += b"".join(chunk(c, b) for c, b in post)
    full = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload
    out, rate = wav_codec.decode_wav(full)
    assert rate == 8000 and np.array_equal(out, samples)
