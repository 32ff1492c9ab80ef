"""Function-registration surface: SQL UDFs (Spark 4) and Python UDTFs.

The reference registers no functions (its one ``explode`` import is
unused, reference ``toy_glue.py:5``); an engine replacing it must give
SQL users the same helpers its DataFrame API has. Two tiers:

- **SQL UDFs** (``CREATE FUNCTION ... RETURN <expr>``): the body is a
  SQL expression inlined into the calling plan at analysis time —
  codegen'd JVM execution, zero Python, indistinguishable from writing
  the expression inline. This is the ONLY UDF tier allowed in hot
  paths; register these once per session and every ``spark.sql`` query
  can use the engine's text/money vocabulary.
- **Python UDTFs** (``spark.udtf.register``): row-at-a-time Python —
  the table-function surface exists and is tested, but like
  ``zscore_grouped_map`` it is deliberately documented as the slow
  path; any set-returning logic that CAN be an ``explode`` of a
  codegen'd array expression (see ``minhash.shingle_array``) should be.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name -> (signature, body) — bodies are kept in lockstep with
#: functions/text.py expressions and the DuckDB oracle fragments.
SQL_UDFS: dict[str, tuple[str, str]] = {
    "eng_norm": (
        r"(s STRING) RETURNS STRING",
        r"trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9\\s]', ''),"
        r" '\\s+', ' '))",
    ),
    "eng_token_count": (
        "(s STRING) RETURNS BIGINT",
        "CAST(size(filter(split(eng_norm(s), ' '), x -> x != '')) AS BIGINT)",
    ),
    "eng_cents": (
        "(x DOUBLE) RETURNS BIGINT",
        "CAST(round(x * 100) AS BIGINT)",
    ),
}


def register_sql_udfs(spark: SparkSession) -> list[str]:
    """Register the engine's SQL-UDF vocabulary (idempotent); returns
    the registered names. Dependencies are declaration-ordered
    (``eng_token_count`` calls ``eng_norm``)."""
    for name, (sig, body) in SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}"
        )
    return list(SQL_UDFS)


def register_word_udtf(spark: SparkSession, name: str = "eng_words") -> str:
    """Register the word-exploding Python UDTF (surface tier — see
    module docstring for why hot paths use ``explode`` instead)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, word_len int")
    class _Words:
        def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
            for w in (text or "").split(" "):
                if w:
                    yield (w, len(w))

    spark.udtf.register(name, _Words)
    return name
