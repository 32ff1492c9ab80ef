"""Single source of the cross-engine null-safe hash-key convention.

Spark's ``concat_ws`` SKIPS null arguments while SQL ``||`` nulls the
whole expression, so every md5-keyed construction (sampling gates,
sketch buckets, bloom positions) must coalesce the key to one shared
sentinel on BOTH engines before hashing.  Three modules used to
re-declare the sentinel independently; a drift in any one of them
would silently break engine parity for the others — hence this
module.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: sentinel a NULL key hashes as, identical in Spark and oracle SQL
NULL_KEY = "<NULL>"


def null_safe_key(key: Column) -> Column:
    """Spark side: string form of ``key`` with NULLs coalesced."""
    return F.coalesce(key.cast("string"), F.lit(NULL_KEY))


def sql_null_safe_key(key_expr: str) -> str:
    """DuckDB twin of :func:`null_safe_key`."""
    return f"coalesce(CAST({key_expr} AS VARCHAR), '{NULL_KEY}')"
