"""Write-layout operators: Z-order (Morton) clustering for multi-column
data skipping — the Spark-side analog of Delta's OPTIMIZE ZORDER BY.

Parquet data skipping works off per-file column min/max ranges.  A sort
on one column gives perfect skipping on that column and none on the
second; interleaving the BITS of both columns' normalized ranks gives
every file a small bounding BOX in (a, b) space, so range predicates on
EITHER column prune most files.  At 100 TB the difference is scanning a
few hundred files vs every file for a two-dimensional slice query.

All arithmetic is integer-exact (scaling uses ``(v - min) * 2^bits //
(max - min + 1)`` true integer division, interleave uses div/mod), so
the code an independent SQL engine computes matches bit for bit — see
``_scale_to_bits`` for the exactness construction and magnitude bound
(column span < 2^(63 − bits)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Map an integer column into [0, 2^bits) by its position inside the
    global [min, max] range — exact integer arithmetic.

    ``floor(n/s)`` is computed as ``(n - n mod s) / s``: the numerator
    is an exact multiple of ``s``, so the double division's relative
    error (≤ quotient·2⁻⁵²; quotient < 2^bits) rounds away — unlike a
    bare ``floor(n/s)``, whose double rounding can be off by one once
    ``n`` exceeds 2⁵³.  Exactness bound: |col − vmin|·2^bits must fit
    int64, i.e. the column span < 2^(63−bits) (epoch MICROseconds at
    bits=8 fit with 4 bits to spare; epoch nanos need bits ≤ 2 or a
    pre-scale)."""
    span = vmax - vmin + F.lit(1)
    n = (col.cast("bigint") - vmin) * F.lit(1 << bits)
    return F.round((n - F.pmod(n, span)) / span, 0).cast("bigint")


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-bit integers: bit i of ``a`` lands
    at position 2i, bit i of ``b`` at 2i+1.  Pure div/mod arithmetic so
    any SQL engine reproduces it."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + (F.floor(a / F.lit(1 << i)) % 2).cast("bigint") * F.lit(1 << (2 * i))
        z = z + (F.floor(b / F.lit(1 << i)) % 2).cast("bigint") * F.lit(1 << (2 * i + 1))
    return z


def zorder_code(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
) -> DataFrame:
    """Attach ``zcode`` — the Morton code of (col_a, col_b) normalized
    to ``bits`` bits each against their global min/max.

    The min/max pass is one tiny aggregate broadcast back as a 1-row
    cross join (Catalyst plans it as a BroadcastNestedLoopJoin over a
    single row — constant cost); the code itself is row-local
    arithmetic.  Columns must be integer-valued (cast dates to epoch
    days first)."""
    mm = df.agg(
        F.min(F.col(col_a).cast("bigint")).alias("_amin"),
        F.max(F.col(col_a).cast("bigint")).alias("_amax"),
        F.min(F.col(col_b).cast("bigint")).alias("_bmin"),
        F.max(F.col(col_b).cast("bigint")).alias("_bmax"),
    )
    joined = df.crossJoin(F.broadcast(mm))
    sa = _scale_to_bits(F.col(col_a), F.col("_amin"), F.col("_amax"), bits)
    sb = _scale_to_bits(F.col(col_b), F.col("_bmin"), F.col("_bmax"), bits)
    return joined.withColumn("zcode", _interleave(sa, sb, bits)).drop(
        "_amin", "_amax", "_bmin", "_bmax"
    )


def zorder_repartition(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_partitions: int,
    bits: int = 8,
) -> DataFrame:
    """Cluster rows for writing: range-partition on the Morton code and
    sort within partitions, so each output file covers a compact
    bounding box in (col_a, col_b) space.  Follow with
    ``.write.parquet`` (or feed a materialization's writer) — parquet
    min/max stats then prune on BOTH columns."""
    coded = zorder_code(df, col_a, col_b, bits=bits)
    return coded.repartitionByRange(num_partitions, "zcode") \
        .sortWithinPartitions("zcode")
