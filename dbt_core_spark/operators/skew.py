"""Skew mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
the *join* level; these helpers cover the two cases AQE cannot:
aggregations with a dominant key, and broadcast-ineligible joins against
a skewed build side.

Pattern (SURVEY scale notes: "skewed keys → salting or AQE skew-join"):

- ``salted_aggregate``: two-stage aggregation — stage 1 groups on
  (key, salt) spreading the hot key over N partitions, stage 2 merges
  the partials.  Works for any algebraic aggregate (sum/count/min/max);
  provide both the partial and merge expressions.
- ``salted_join``: replicate the small side N× (one copy per salt) and
  salt the large side's key, turning one hot partition into N.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``partial_aggs`` aggregate raw rows (aliased); ``merge_aggs``
    combine the partials (referencing the partial aliases).  Example::

        salted_aggregate(
            df, ["user_id"],
            partial_aggs=[F.count("*").alias("n"), F.sum("v").alias("s")],
            merge_aggs=[F.sum("n").alias("n"), F.sum("s").alias("s")],
        )
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed large side to a small (but not broadcastable) side:
    the small side is replicated once per salt, the large side's rows are
    scattered across salts, so one hot key occupies ``salts`` partitions
    instead of one."""
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * salts).cast("int")
    )
    return salted_large.join(exploded_small, on=[on, "_salt"], how=how).drop("_salt")


def skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Key-skew diagnostics — the measurement that decides whether a
    join/aggregate on ``key_col`` needs salting or AQE skew handling
    BEFORE it melts an executor at 100 TB.

    One groupBy(key) pass (map-side combined), then a k-bounded top-N
    (WindowGroupLimit shape via TakeOrdered).  Returns the ``top_n``
    hottest keys with rank, count, corpus share (e6 fixed point) and
    the skew factor count·distinct_keys/total (e4 fixed point; 1.0000
    = perfectly uniform) — integer outputs so the report is
    bit-reproducible."""
    counts = df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count("*").alias("cnt")
    ).localCheckpoint(eager=False)  # feeds totals AND the top-N pass
    totals = counts.agg(
        F.sum("cnt").alias("_total"),
        F.count("*").alias("_nkeys"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
    top = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.col(key_col),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.floor(F.col("cnt") * F.lit(1_000_000) / F.col("_total"))
            .cast("bigint").alias("share_e6"),
            F.floor(F.col("cnt") * F.col("_nkeys") * F.lit(10_000) / F.col("_total"))
            .cast("bigint").alias("skew_e4"),
        )
    )
