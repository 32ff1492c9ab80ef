"""Z-order (Morton-curve) clustering: multi-dimensional file skipping.

Parquet scans prune files and row groups with footer min/max stats —
but stats only help when the layout CLUSTERS the filtered columns.
Sorting by one column gives perfect pruning on that column and none on
any other; interleaving the bits of two columns (the Morton / Z-order
curve) gives *both* columns locality, so a query box selective in
either or both dimensions touches a small fraction of files.  This is
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here as
a plain operator over ordinary parquet, since the engine's stores are
plain parquet.

The interleave is pure codegen'd bit arithmetic (shift/mask spreading,
no UDF), computed once per row at write time; readers need no special
support — pruning happens in any engine that reads footer stats.

Scale shape: ``repartitionByRange`` on the z-value is one range
shuffle (sampled boundaries, balanced output files) and
``sortWithinPartitions`` is a task-local sort — the standard
write-amplification cost of any clustering rewrite, paid once to make
every subsequent selective scan cheap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: bits kept per dimension (values are rank-compressed into this range)
ZORDER_BITS = 16


def _spread_bits(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` so a bit lands at every even
    position (classic magic-number interleave, 64-bit safe)."""
    x = x.bitwiseAND(F.lit((1 << ZORDER_BITS) - 1))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(a: Column, b: Column) -> Column:
    """Morton code of two non-negative integral columns (low 16 bits
    each — rescale or rank first if the domain is wider)."""
    return _spread_bits(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits(b.cast("long")), 1)
    )


def zorder_bits_for(n: int) -> int:
    """Bits kept per dimension for an ``n``-column interleave: 16 (the
    2-D default) while the code fits a signed 64-bit long, narrower
    beyond — 4 columns get 15 bits each (60-bit code), 6 get 10.  The
    resolution loss is the standard Morton trade: more clustered
    dimensions, coarser quantiles per dimension."""
    if n < 2:
        raise ValueError(f"zorder interleave needs >= 2 columns, got {n}")
    return min(ZORDER_BITS, 62 // n)


def zorder_value_n(cols: "Sequence[Column]") -> Column:
    """Morton code of N non-negative integral columns (low
    :func:`zorder_bits_for` (n) bits each — rescale or rank first).
    The 2-column case routes to the magic-number fast path
    (:func:`zorder_value`); N >= 3 builds the interleave as a flat
    bit-gather expression — ``n * bits`` shift/mask/or terms, still
    pure codegen'd JVM arithmetic, no UDF."""
    cols = list(cols)
    n = len(cols)
    if n == 2:
        return zorder_value(cols[0], cols[1])
    bits = zorder_bits_for(n)
    out = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files clustered on the
    Z-order curve of ``(col_a, col_b)``.

    Range-partition on the z-value (balanced files along the curve),
    sort within each task (tight row-group stats), drop the helper
    column on write.  Footer min/max stats of BOTH columns then become
    selective in every file, which any stats-aware reader (this
    engine, DuckDB, Trino, ...) uses to skip."""
    z = zorder_value(F.col(col_a), F.col(col_b)).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
