"""Text analysis for LLM-data pipelines: tokenization, quality scoring,
language-ID heuristic, fingerprinting.

All hot-path functions are pure Catalyst column expressions (no UDFs):
token counting is a split+size, quality scoring is arithmetic over
regexp counts, langid is set-intersection scores against small marker
arrays, fingerprints are md5 / polynomial rolling hash. Each checked
operator has a portable ANSI-SQL twin used by the DuckDB oracle — the
constructions below deliberately avoid anything engine-specific.

Scale: everything is a narrow projection — no shuffle, fully
whole-stage-codegen, linear in bytes scanned. At 100 TB the cost is the
Parquet scan itself; these expressions ride it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Whitespace tokenizer pattern (trivial + portable across engines).
WS_PATTERN = r"\s+"
#: BPE-ish pretokenizer approximation: alpha runs, digit runs, or
#: single non-alnum symbols (GPT-2-style pretokenization shape).
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Small per-language marker vocabularies for the stopword/n-gram
#: language-ID heuristic (top function words, ASCII-folded).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "les", "des", "de", "et", "est", "une", "dans", "pour", "quoi"],
    "it": ["il", "di", "che", "per", "una", "del", "con", "non", "sono", "come"],
    "pt": ["o", "a", "do", "da", "em", "um", "para", "com", "nao", "uma"],
    "pl": ["i", "w", "na", "z", "do", "to", "jest", "nie", "sie", "co"],
    "ru": ["i", "v", "ne", "na", "chto", "eto", "po", "ona", "kak", "no"],
    "tr": ["bir", "bu", "ve", "da", "ne", "icin", "ben", "ama", "gibi", "var"],
    "zh": ["de", "shi", "bu", "le", "wo", "ni", "ta", "men", "zai", "you"],
}

#: English stopwords used by the quality score's stopword-ratio term.
STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column, pattern: str = WS_PATTERN) -> Column:
    """Tokenize; empty strings (leading/trailing separators) removed so
    the count is robust to padding."""
    return F.filter(F.split(text, pattern), lambda t: t != F.lit(""))


def token_count(text: Column, pattern: str = WS_PATTERN) -> Column:
    return F.size(tokens(text, pattern))


def bpeish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pretokenizer: count of alpha runs +
    digit runs + standalone symbols. Implemented by *removing* matches
    and measuring length delta-free via regexp_count-like construction:
    portable as length arithmetic in both engines."""
    # number of alpha runs: length(regexp_replace(x, '[A-Za-z]+', '#')) trick
    # is fragile; use split on the complement instead:
    alpha_runs = F.size(F.filter(F.split(text, r"[^A-Za-z]+"), lambda t: t != F.lit("")))
    digit_runs = F.size(F.filter(F.split(text, r"[^0-9]+"), lambda t: t != F.lit("")))
    symbols = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return alpha_runs + digit_runs + symbols


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punctuation /
    alpha / whitespace / stopword ratios, plus a single [0,1] score.

    The score formula is fixed and documented so downstream filters are
    reproducible:  q = 0.25*len_ok + 0.25*token_len_ok +
    0.25*(1 - punct_ratio) + 0.25*stopword_presence.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    alpha = F.length(t) - F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS])))

    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    avg_token_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    len_ok = F.when((n_chars >= 20) & (n_chars <= 100000), 1.0).otherwise(0.0)
    token_len_ok = F.when((avg_token_len >= 2) & (avg_token_len <= 12), 1.0).otherwise(0.0)
    stop_presence = F.when(stop_hits > 0, 1.0).otherwise(0.0)
    score = (
        0.25 * len_ok + 0.25 * token_len_ok + 0.25 * (1.0 - punct_ratio) + 0.25 * stop_presence
    )
    return df.select(
        "*",
        n_chars.cast("long").alias("q_n_chars"),
        n_tokens.cast("long").alias("q_n_tokens"),
        F.round(avg_token_len, 4).alias("q_avg_token_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(alpha_ratio, 4).alias("q_alpha_ratio"),
        stop_hits.cast("long").alias("q_stopword_hits"),
        F.round(score, 4).alias("q_score"),
    )


def langid_scores(text: Column) -> list[Column]:
    """Per-language marker-overlap scores (distinct-token ∩ markers)."""
    toks = F.array_distinct(tokens(F.lower(text)))
    return [
        F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in marks]))).alias(
            f"score_{lang}"
        )
        for lang, marks in LANG_MARKERS.items()
    ]


def predict_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: argmax of marker-overlap scores;
    ``und`` when every score is zero. Ties break by language-code order
    (deterministic, and portable to a CASE cascade in SQL)."""
    scored = df.select("*", *langid_scores(F.col(text_col)))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    # reversed so the FIRST language in order wins ties via last when()
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.withColumn("predicted_lang", pred)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, strip punctuation."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint: md5 over the normalized text (portable)."""
    return F.md5(normalize_text(text))


def fingerprint_rolling(text: Column, base: int = 31,
                        mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over the normalized text's code points:
    h = (h*base + code) mod m — the classic Rabin-Karp fingerprint, as a
    single Catalyst ``aggregate`` over the character array (no UDF).
    The 2^31-1 Mersenne modulus keeps ``acc*base`` far from 64-bit
    overflow (Spark 4 runs ANSI mode: overflow throws).
    """
    chars = F.split(normalize_text(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * base + F.ascii(ch), F.lit(mod)),
    )
