"""Round-4 additions (twentieth wave): the ``mapInArrow`` API surface.

``arrow_token_surface`` computes per-document character and word
counts with ``DataFrame.mapInArrow`` — the Arrow-NATIVE batch API one
level below ``mapInPandas``: the user function receives
``pyarrow.RecordBatch`` objects and answers with RecordBatches, no
pandas materialization at all.  The kernels are ``pyarrow.compute``
calls (``utf8_length``, ``count_substring``) — vectorized C++ on the
Arrow buffers, so the only Python cost is per BATCH, not per row or
even per column value.

When to use which (the repo's Arrow-boundary ladder, now complete):
built-in columns (``text_token_stats``) > ``mapInArrow`` + pyarrow
compute (this entry — when a kernel exists in Arrow but not in
Catalyst) > ``mapInPandas`` (the codec entries — when you genuinely
need numpy/pandas semantics) > ``applyInPandas`` per group (the
documented slow path).  This entry exists to pin the second rung.

The documents' text is single-space normalized at generation, so
``words = count_substring(text, " ") + 1`` is exact and the oracle
reproduces it with ``length`` + ``string_split``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from event_streaming_toy_example_spark.schemas import load_table

ARROW_TOKEN_SCHEMA = "doc_id long, n_chars long, n_words long"


def q_arrow_token_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-doc char/word counts via mapInArrow; see module docstring."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def op(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.add(pc.count_substring(text, " "), 1),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_chars", "n_words"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(op, ARROW_TOKEN_SCHEMA)


SQL_ARROW_TOKEN_SURFACE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
FROM documents
"""

# ------------------------------------------------------------ exports

EXT27_QUERIES = {
    "arrow_token_surface": q_arrow_token_surface,
}

EXT27_ORACLES = {
    "arrow_token_surface": SQL_ARROW_TOKEN_SURFACE,
}
