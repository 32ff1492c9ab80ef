"""Random-projection dimensionality reduction in exact integer
arithmetic (a Johnson-Lindenstrauss sketch with a ±1 sign matrix).

A training-data pipeline shrinks high-dim embeddings before clustering
/ indexing / near-dup search; the standard cheap projection is a
dense ±1 (Achlioptas) matrix.  Two engineering choices make this
verifiable and scale-correct:

- **Deterministic md5-derived sign matrix.**  ``sign[j][d]`` is the
  low bit of ``md5("rp:j:d")`` — no RNG, no state to ship; both the
  Spark expression and the DuckDB oracle inline the same literal
  matrix from the same generator, and any engine could regenerate it.
- **Quantize-then-project.**  Components are first quantized to
  integer micro-units (``round(x * 1e6)``); the projection is then a
  sum of ±integers — associative, so the result is identical under
  ANY partitioning or fold order.  Projecting floats first would make
  the output depend on summation order, which a distributed engine
  must never promise.

The whole operator is a narrow row-local projection: zero shuffles,
zero Python, O(in_dim * out_dim) multiply-adds per row riding the
Parquet scan — the 100 TB cost is the scan itself.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

SCALE = 1_000_000


def signed_projection_matrix(out_dim: int, in_dim: int) -> list[list[int]]:
    """``out_dim x in_dim`` matrix of ±1, derived from md5 so every
    engine (and the oracle) regenerates the identical matrix."""
    return [
        [
            1
            if hashlib.md5(f"rp:{j}:{d}".encode()).digest()[-1] & 1
            else -1
            for d in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def quantize_vec(vec: Column, scale: int = SCALE) -> Column:
    """float components -> exact integer micro-units."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def project_quantized(
    df: DataFrame,
    vec_col: str,
    *,
    out_dim: int,
    in_dim: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Project ``vec_col`` (``array<float>``, length ``in_dim``) to
    ``out_dim`` integer components ``p0..p{out_dim-1}``."""
    m = signed_projection_matrix(out_dim, in_dim)
    vq = quantize_vec(F.col(vec_col))
    cols = [
        F.aggregate(
            F.zip_with(
                vq,
                F.array(*[F.lit(s) for s in m[j]]),
                lambda x, s: x * s.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"p{j}")
        for j in range(out_dim)
    ]
    return df.select(F.col(id_col), *cols)


def sql_project_quantized(
    rel: str,
    vec_col: str,
    *,
    out_dim: int,
    in_dim: int,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin: identical matrix, identical quantization, a sum of
    ±``vq[i]`` terms per output component (1-based list indexing)."""
    m = signed_projection_matrix(out_dim, in_dim)
    terms = []
    for j in range(out_dim):
        expr = " ".join(
            ("+" if s > 0 else "-") + f" vq[{d + 1}]"
            for d, s in enumerate(m[j])
        ).lstrip("+ ")
        terms.append(f"CAST({expr} AS BIGINT) AS p{j}")
    sel = ",\n       ".join(terms)
    return f"""
WITH q AS (
  SELECT {id_col},
         list_transform({vec_col},
             x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS vq
  FROM {rel}
)
SELECT {id_col},
       {sel}
FROM q
"""
