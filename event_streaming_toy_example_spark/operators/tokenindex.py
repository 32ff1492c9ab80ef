"""Per-file TOKEN Bloom indexes for text-predicate data skipping.

Value blooms (``operators/bloom.py``) prune ``col = v`` point lookups;
they cannot help the dominant text-corpus predicate — "documents
CONTAINING word w" — because membership there is over the column's
TOKEN SET, not its values.  This module closes that gap:

- ``tx_set_token_index(path, columns)`` declares the indexed text
  columns as a table property (``__token_bloom``), exactly like the
  value-bloom property;
- at every stats harvest (append / sink commit / compaction), each
  new file gets a Bloom filter over the DISTINCT TOKENS of its text
  column(s), riding inside the commit's per-file stats (``tbloom``)
  like every other stat — surviving checkpoints, reaching the planner
  through the same snapshot fold;
- the new predicate op ``("col", "has_token", "w")`` consults the
  filter at planning (:func:`txtable.prune_files` /
  ``read_table(where=...)``): a file whose filter provably lacks the
  token is never opened, and the surviving rows are re-filtered
  exactly, so the result is identical to a full scan — just cheaper.
  At 100 TB a rare-token search opens only the files that might hold
  the word, the inverted-index effect without building an index table.

Tokenization-consistency is the correctness crux: a file is SKIPPED
only if the build-side tokenizer produced no matching token, so the
build side and the row-filter side must tokenize IDENTICALLY or a
matching row could hide in a skipped file.  Both sides therefore use
the SAME Spark expression — ``regexp_extract_all(lower(col),
'(?U)\\w+')`` — the build runs it as a Spark job over the new files
(executor-side, shuffle bounded by distinct tokens per file) and the
row filter applies it per row; the Bloom probe uses the same python
string the row filter compares against.  False positives cost a scan;
false negatives are impossible by construction.

Boundaries: the build needs an ACTIVE SparkSession — harvests without
one (the streaming sink's sessionless commit worker) skip the token
filter for those files, which then simply scan until the next
compaction re-harvests them (the same backfill path value blooms
use).

The reference has no stats of any kind; the design follows the
public Delta/Iceberg bloom-index contract extended to token sets
(ElasticSearch-style term pruning re-expressed as per-file filters).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import txtable as tx
from .bloom import DEFAULT_FPP, build_bloom

#: the ONE tokenizer both the build job and the row filter use —
#: unicode word characters, lowercased (java regex with the UNICODE
#: flag; changing this invalidates every existing tbloom, so don't)
TOKEN_PATTERN = r"(?U)\w+"

#: token sets are bigger than value sets: default cap 64 KiB/col/file
DEFAULT_TOKEN_MAX_BYTES = 65536


def token_filter_expr(col, token: str):
    """The EXACT row predicate ``has_token`` applies: token membership
    in the column's lowercased ``(?U)\\w+`` token array.  Build and
    probe agree by construction because both run this expression's
    tokenizer.  Non-string probes are refused BY NAME: Spark would
    implicitly cast them inside ``array_contains`` while the Bloom's
    type-tagged canonical encoding would not — a silent false-skip
    hazard."""
    if not isinstance(token, str):
        raise TypeError(
            f"has_token value must be a string token, got "
            f"{type(token).__name__}: {token!r}"
        )
    return F.array_contains(
        F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0),
        token,
    )


def tx_set_token_index(
    path: str,
    columns: Sequence[str],
    fpp: float = DEFAULT_FPP,
    max_bytes: int = DEFAULT_TOKEN_MAX_BYTES,
) -> int:
    """Declare token Bloom indexing for ``columns`` (string columns
    only, refused BY NAME otherwise).  Files written afterwards carry
    token filters; existing files backfill on the next
    :func:`txtable.tx_compact` (stats re-harvest), like value
    blooms."""
    state = tx._fold_state(path)
    if state is None:
        raise ValueError(
            f"tx_set_token_index on a table with no commits: {path}"
        )
    fields = {
        f["name"]: f["type"]
        for f in json.loads(state.schema).get("fields", [])
    }
    for c in columns:
        if c not in fields:
            raise ValueError(
                f"tx_set_token_index: no column {c!r} in the table "
                f"schema at {path}"
            )
        if fields[c] != "string":
            raise ValueError(
                f"tx_set_token_index: column {c!r} has type "
                f"{fields[c]!r}; token filters index string columns"
            )
    if not 0 < fpp < 1:
        raise ValueError(
            f"tx_set_token_index: fpp must be in (0, 1), got {fpp}"
        )

    def _set(props: dict) -> dict:
        props["__token_bloom"] = {
            "columns": list(columns),
            "fpp": float(fpp),
            "max_bytes": int(max_bytes),
        }
        return props

    return tx._tx_update_properties(path, "tx_set_token_index", _set)


def compute_file_token_blooms(
    spark: SparkSession,
    table_path: str,
    files: Sequence[str],
    cols: Sequence[str],
    fpp: float = DEFAULT_FPP,
    max_bytes: int = DEFAULT_TOKEN_MAX_BYTES,
) -> dict[str, dict]:
    """``{table-relative file: {column: filter}}`` — one Spark job per
    indexed column: scan ONLY that column of the new files, tokenize
    with :data:`TOKEN_PATTERN`, per-file-distinct the tokens (shuffle
    bounded by distinct tokens, never raw text), and build each file's
    filter in an ``applyInPandas`` task.  Columns are the files'
    PHYSICAL names; a file lacking the column (pre-evolution) gets no
    filter and scans — conservative."""
    if not files or not cols or spark is None:
        return {}
    abs_map = {
        os.path.abspath(os.path.join(table_path, f)): f for f in files
    }
    try:
        df = spark.read.parquet(*abs_map)
    except Exception:  # pragma: no cover - unreadable staging: no index
        return {}
    out: dict[str, dict] = {}
    for c in cols:
        if c not in df.columns:
            continue
        toks = (
            df.select(
                F.input_file_name().alias("f"), F.col(c).alias("t")
            )
            .where(F.col("t").isNotNull())
            .select(
                "f",
                F.explode(
                    F.array_distinct(
                        F.regexp_extract_all(
                            F.lower(F.col("t")),
                            F.lit(TOKEN_PATTERN),
                            0,
                        )
                    )
                ).alias("tok"),
            )
            .distinct()
        )

        def _build(pdf):
            import pandas as pd

            bl = build_bloom(pdf["tok"].tolist(), fpp, max_bytes)
            return pd.DataFrame(
                [(pdf["f"].iloc[0], json.dumps(bl))],
                columns=["f", "bloom"],
            )

        rows = toks.groupBy("f").applyInPandas(
            _build, "f string, bloom string"
        ).collect()
        for r in rows:
            rel = abs_map.get(
                os.path.abspath(tx.strip_scheme(r["f"]))
            )
            bl = json.loads(r["bloom"])
            if rel is not None and bl is not None:
                out.setdefault(rel, {})[c] = bl
    return out


def attach_token_blooms(path: str, out: dict) -> dict:
    """Stats-harvest hook (called by ``txtable._footer_stats`` next to
    the value-bloom attach): adds ``tbloom`` to each indexed column's
    per-file stats entry when the ``__token_bloom`` property is set
    and a SparkSession is active."""
    v = tx.table_version(path)
    state = tx._fold_state_memo(path, v) if v else None
    cfg = (state.properties or {}).get("__token_bloom") if state else None
    if not cfg or not out:
        return out
    spark = SparkSession.getActiveSession()
    if spark is None:
        return out  # sessionless harvest (sink worker): scan-only
    pm = tx._phys_map(state.schema)
    phys_cols = [pm.get(c, c) for c in cfg.get("columns", ())]
    blooms = compute_file_token_blooms(
        spark,
        path,
        list(out),
        phys_cols,
        fpp=cfg.get("fpp", DEFAULT_FPP),
        max_bytes=cfg.get("max_bytes", DEFAULT_TOKEN_MAX_BYTES),
    )
    for f, per in blooms.items():
        for c, bl in per.items():
            if c in (out.get(f) or {}):
                out[f][c]["tbloom"] = bl
    return out


def tx_text_search(
    spark: SparkSession,
    path: str,
    col: str,
    tokens: str | Sequence[str],
    version: int | None = None,
) -> DataFrame:
    """Documents whose ``col`` contains EVERY given token (word-level
    AND search): token filters prune the file list, the exact
    predicate re-filters the surviving rows."""
    if isinstance(tokens, str):
        tokens = [tokens]
    where = [(col, "has_token", t.lower()) for t in tokens]
    df = tx.read_table(spark, path, version=version, where=where)
    if df is None:
        raise ValueError(f"tx_text_search on a table with no commits: {path}")
    return df
