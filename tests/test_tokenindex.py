"""Per-file token Bloom indexes (``operators/tokenindex.py``): the
``has_token`` predicate prunes files at planning through a Bloom over
each file's distinct token set, re-filters surviving rows with the
SAME tokenizer expression (no false negatives by construction), and
backfills through compaction like value blooms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_toy_example_spark.operators import (
    tokenindex as ti,
    txtable as tx,
)


def _docs(spark, n=100):
    return spark.createDataFrame(
        [(i, f"word{i % 5} common filler text") for i in range(n)],
        "doc_id long, body string",
    )


def _indexed(spark, tmp_path, n=100):
    p = str(tmp_path / "t")
    df = _docs(spark, n)
    tx.tx_append(df.limit(1), p)
    ti.tx_set_token_index(p, ["body"])
    for w in range(5):
        tx.tx_append(df.where(F.col("doc_id") % 5 == w).coalesce(1), p)
    return p, df


def test_set_token_index_validation(spark, tmp_path):
    p = str(tmp_path / "t")
    tx.tx_append(_docs(spark).limit(3), p)
    with pytest.raises(ValueError, match="'ghost'"):
        ti.tx_set_token_index(p, ["ghost"])
    with pytest.raises(ValueError, match="string columns"):
        ti.tx_set_token_index(p, ["doc_id"])
    with pytest.raises(ValueError, match="fpp"):
        ti.tx_set_token_index(p, ["body"], fpp=2.0)
    with pytest.raises(ValueError, match="no commits"):
        ti.tx_set_token_index(str(tmp_path / "none"), ["body"])


def test_token_pruning_skips_files_and_is_exact(spark, tmp_path):
    p, df = _indexed(spark, tmp_path)
    scan, skip = tx.prune_files(p, [("body", "has_token", "word3")])
    assert len(skip) >= 4, (scan, skip)
    got = sorted(
        r["doc_id"]
        for r in ti.tx_text_search(spark, p, "body", "word3").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in tx.read_table(spark, p)
        .where(ti.token_filter_expr(F.col("body"), "word3"))
        .collect()
    )
    assert got == want and len(got) == 20


def test_common_token_prunes_nothing_but_stays_exact(spark, tmp_path):
    p, _df = _indexed(spark, tmp_path)
    scan, skip = tx.prune_files(p, [("body", "has_token", "common")])
    assert not skip
    assert ti.tx_text_search(spark, p, "body", "common").count() == 101


def test_and_search_absent_token_and_case(spark, tmp_path):
    p, _df = _indexed(spark, tmp_path)
    assert (
        ti.tx_text_search(spark, p, "body", ["word3", "common"]).count()
        == 20
    )
    assert (
        ti.tx_text_search(spark, p, "body", ["word3", "word4"]).count()
        == 0
    )
    assert ti.tx_text_search(spark, p, "body", "absent").count() == 0
    # tx_text_search lowercases the probe; tokens are lowercased at
    # build, so the search is case-insensitive
    assert ti.tx_text_search(spark, p, "body", "WORD3").count() == 20


def test_substring_is_not_a_token_match(spark, tmp_path):
    """'word' is a SUBSTRING of every 'wordN' token but never a token
    itself — has_token must not match (word-level semantics, not
    LIKE)."""
    p, _df = _indexed(spark, tmp_path)
    assert ti.tx_text_search(spark, p, "body", "word").count() == 0


def test_compaction_backfills_token_filters(spark, tmp_path):
    """Files written BEFORE the property have no filters (they scan);
    compaction re-harvests stats, so its outputs carry them."""
    p = str(tmp_path / "t")
    df = _docs(spark)
    for w in range(5):
        tx.tx_append(df.where(F.col("doc_id") % 5 == w).coalesce(1), p)
    ti.tx_set_token_index(p, ["body"])
    scan, skip = tx.prune_files(p, [("body", "has_token", "word3")])
    assert not skip, "unindexed files must scan, never skip"
    assert tx.tx_compact(
        spark, p, small_file_bytes=1 << 40, order_col="doc_id"
    ) is not None
    # doc_id-ordered output interleaves word0..4 per file, so token
    # pruning may not skip — assert the filters EXIST and results hold
    snap = tx.snapshot(p)
    assert any(
        "tbloom" in (snap.stats.get(f, {}).get("body") or {})
        for f in snap.files
    )
    assert ti.tx_text_search(spark, p, "body", "word3").count() == 20


def test_token_search_after_column_rename(spark, tmp_path):
    p, _df = _indexed(spark, tmp_path)
    tx.tx_rename_column(p, "body", "content")
    scan, skip = tx.prune_files(p, [("content", "has_token", "word3")])
    assert len(skip) >= 4
    assert (
        ti.tx_text_search(spark, p, "content", "word3").count() == 20
    )


def test_token_search_respects_deletes(spark, tmp_path):
    p, _df = _indexed(spark, tmp_path)
    tx.tx_delete(
        spark, p, [("doc_id", "<", 50)], merge_on_read=True
    )
    got = sorted(
        r["doc_id"]
        for r in ti.tx_text_search(spark, p, "body", "word3").collect()
    )
    assert got == [i for i in range(50, 100) if i % 5 == 3]


def test_non_string_probe_refused_by_name(spark, tmp_path):
    """A non-string has_token probe would silently miss the
    type-tagged bloom while array_contains casts it (a false-skip
    hazard) — both the planner and the row expression refuse."""
    p, _df = _indexed(spark, tmp_path, n=20)
    with pytest.raises(ValueError, match="must be a string token"):
        tx.prune_files(p, [("body", "has_token", 5)])
    with pytest.raises(TypeError, match="must be a string token"):
        ti.token_filter_expr(F.col("body"), 5)


def test_delete_with_has_token_clause(spark, tmp_path):
    """has_token works as a DELETE predicate too: _clause_all_match
    never drops a whole file on a Bloom (rewrite path only)."""
    p, _df = _indexed(spark, tmp_path)
    tx.tx_delete(spark, p, [("body", "has_token", "word3")])
    assert ti.tx_text_search(spark, p, "body", "word3").count() == 0
    assert tx.read_table(spark, p).count() == 81


def test_has_token_from_sql_text(spark, tmp_path):
    """HAS_TOKEN(col, 'word') compiles through the DML clause
    compiler: DELETE FROM t WHERE HAS_TOKEN(...) routes onto the
    engine clause (case-insensitive probe), and a non-string column
    refuses compilation."""
    from event_streaming_toy_example_spark.operators import txsql

    p, _df = _indexed(spark, tmp_path)
    assert txsql._compile_clauses("HAS_TOKEN(body, 'Word3')") == [
        ("body", "has_token", "word3")
    ]
    txsql.tx_register(spark, p, "tok_docs")
    txsql.tx_sql(
        spark, "DELETE FROM tok_docs WHERE HAS_TOKEN(body, 'WORD3')"
    )
    assert ti.tx_text_search(spark, p, "body", "word3").count() == 0
    assert tx.read_table(spark, p).count() == 81
    # doc_id is not a string column: the typed gate rejects the
    # compiled path (and the raw path names the unknown function)
    assert not txsql._clauses_typed_ok(
        [("doc_id", "has_token", "x")], p
    )
