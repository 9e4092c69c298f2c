"""Distinct-count sketching: K-Minimum-Values (KMV).

The brief's "novel sketch" slot.  Unlike HLL (whose register layouts
differ across engines, so results can't be oracle-verified), KMV is
**deterministic and engine-portable**: hash every value with md5, keep
the k smallest hashes per group, and estimate

    D ≈ (k - 1) / r_k        where r_k = kth smallest hash mapped to (0,1)

Standard error ≈ 1/√(k−2).  The plan is scale-shaped: one shuffle on
the group key, then a WindowGroupLimit top-k (partial top-k runs
map-side), so the sketch state per group is k × 16 bytes regardless of
cardinality.  Sketches also merge trivially (union the hash sets, keep
k smallest) — the property that makes them useful for rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_unit(col: Column) -> Column:
    """md5 → first 15 hex chars → integer → uniform (0, 1] double.

    15 hex chars (60 bits) fit a bigint exactly; conv() is engine-local
    but the arithmetic mirror in the oracle reproduces it digit by digit.
    """
    h = F.substring(F.md5(col.cast("string")), 1, 15)
    out = F.lit(0).cast("bigint")
    for i in range(15):
        ch = F.substring(h, i + 1, 1)
        out = out * 16 + (F.instr(F.lit("0123456789abcdef"), ch) - 1)
    return (out.cast("double") + 1.0) / float(16 ** 15)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per group via KMV.

    Returns group_cols + ``kmv_estimate`` (double) + ``n_hashes``
    (bigint; < k means the group had fewer than k distinct values and
    the estimate is exact).
    """
    group_cols = group_cols or []
    hashed = df.select(
        *group_cols, _hash_unit(F.col(value_col)).alias("_h")
    ).dropDuplicates([*group_cols, "_h"])
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = hashed.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.max("_h").alias("_rk_max"),
            F.count("*").cast("bigint").alias("n_hashes"),
        )
        .select(
            *group_cols,
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
            .otherwise((F.lit(k - 1) / F.col("_rk_max")))
            .alias("kmv_estimate"),
            "n_hashes",
        )
    )
