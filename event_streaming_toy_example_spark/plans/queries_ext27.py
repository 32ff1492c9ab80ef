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

def q_arrow_grouped_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The GROUPED Arrow rung — ``groupBy().applyInArrow``: the user
    function receives each group as one ``pyarrow.Table`` and answers
    with a Table, pandas-free like its mapInArrow sibling.  Per
    event_type: count, exact integer-cents min/max/sum of value,
    computed with pyarrow.compute aggregations."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql import functions as F

    def op(table: "pa.Table") -> "pa.Table":
        cc = table.column("value_cc")
        mm = pc.min_max(cc)
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n_events": pa.array([table.num_rows], pa.int64()),
                "min_cc": pa.array([mm["min"].as_py()], pa.int64()),
                "max_cc": pa.array([mm["max"].as_py()], pa.int64()),
                "sum_cc": pa.array(
                    [pc.sum(cc).as_py()], pa.int64()
                ),
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cc"),
    )
    return ev.groupBy("event_type").applyInArrow(
        op,
        "event_type string, n_events long, min_cc long, "
        "max_cc long, sum_cc long",
    )


SQL_ARROW_GROUPED_STATS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cc,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cc,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cc
FROM events GROUP BY event_type
"""

# ------------------------------------------------------------ exports

EXT27_QUERIES = {
    "arrow_token_surface": q_arrow_token_surface,
    "arrow_grouped_stats": q_arrow_grouped_stats,
}

EXT27_ORACLES = {
    "arrow_token_surface": SQL_ARROW_TOKEN_SURFACE,
    "arrow_grouped_stats": SQL_ARROW_GROUPED_STATS,
}
