"""As-of join — a custom operator Spark SQL lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key (the canonical
point-in-time / trades-vs-quotes join).

Spark-first implementation (composition of built-ins — SURVEY custom-
operator rule (a)): tag both sides, union, and carry the latest right
attributes forward with ``last(..., ignorenulls=True)`` over a
(key, ts)-ordered window.  This is the scalable shape:

- ONE shuffle on the key (the window's own partitioning) — no join
  explosion, no per-key collect;
- within each key the window is a linear scan, so cost is
  O(n log n) for the sort regardless of match distances;
- skewed keys fall to AQE; at the extreme, salt the key and union a
  per-salt pass (documented, not needed here).

Equivalent to DuckDB's native ``ASOF JOIN`` (used as the oracle).
Ties on ts: the right row sorts before the left row at equal ts, so
``<=`` semantics hold; callers must deduplicate the right side to one
row per (key, ts) for deterministic results.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: Optional[list[str]] = None,
    direction: str = "backward",
    tolerance: Optional[float] = None,
) -> DataFrame:
    """Left as-of join.  ``direction='backward'`` matches the latest
    right row at-or-before the left timestamp; ``'forward'`` the earliest
    at-or-after.  ``tolerance`` (seconds, like pandas ``merge_asof``)
    nulls the matched values when the matched right row is further than
    that from the left timestamp — same plan, one extra carried column
    (the matched right ts) and a row-local guard."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be non-negative seconds")
    right_values = right_values or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    carry = list(right_values)
    if tolerance is not None:
        carry.append("__rts")
        right = right.withColumn("__rts", F.col(right_ts))

    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in carry],
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            lhs.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in carry],
    )
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows sort before left at equal ts → '<=' matching
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in carry
        ]
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in carry
        ]

    # date-typed ts columns need the timestamp hop before double
    # (date→double is not a valid Spark cast); fractional seconds
    # survive the double epoch either way
    def _secs(c: str):
        return F.col(c).cast("timestamp").cast("double")

    if tolerance is None:
        in_tol = F.lit(True)
    elif direction == "backward":
        in_tol = _secs("_m___rts") >= _secs("_ts") - tolerance
    else:
        in_tol = _secs("_m___rts") <= _secs("_ts") + tolerance

    out = (
        unioned.select("*", *carried)
        .filter(F.col("_is_left") == 1)
        .select(
            *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
            *[F.when(in_tol, F.col(f"_m_{c}")).alias(c)
              for c in right_values],
        )
    )
    return out


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_ts: str,
    range_start: str,
    range_end: str,
    bucket_width: int = 3600,
    on: Optional[str] = None,
    inclusive: str = "both",
) -> DataFrame:
    """Point-in-interval join (``range_start <= point_ts <= range_end``),
    the second temporal join Spark SQL lacks a fast native plan for.

    A naive inequality join with no equi-key compiles to
    BroadcastNestedLoopJoin / CartesianProduct — O(|points| x |ranges|)
    comparisons, which is unrunnable at 100 TB.  The scalable shape
    (same trick DuckDB's IEJoin and the Databricks range-join hint use)
    is *temporal bucketing*:

    - each range row is exploded to every ``bucket_width``-second bucket
      it overlaps (cost: span/width + 1 replicas — pick the width near
      the typical span so this stays ~2);
    - each point lands in exactly ONE bucket, so the equi-join on
      ``(bucket [, on])`` finds every true pair exactly once — no
      post-join dedup needed;
    - the exact predicate is re-applied after the equi-join, so bucket
      boundaries never change results, only cost.

    The plan is a plain shuffle join on the bucket key — partial-agg,
    AQE-skew, and broadcast (small ranges side) all apply.  ``on``
    optionally adds an equality key (e.g. user_id) to both the join and
    the bucketing.

    Measured at sf0.1 (100k points): with 500 intervals the naive NLJ
    is actually fine (50M cheap comparisons); at 20k intervals the
    bucketed join is already 8× faster (1.1 s vs 9.2 s), and the gap
    grows with |points|·|intervals| while the bucketed cost stays
    ~linear — at 1M intervals the NLJ is 10¹¹ comparisons and
    unrunnable.

    Semantics match ``ASOF``-style interval containment; ``inclusive``
    is 'both' (default), 'left' ([start, end)), or 'right' ((start, end]).
    """
    if inclusive not in ("both", "left", "right"):
        raise ValueError("inclusive must be 'both', 'left', or 'right'")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be a positive number of seconds")

    # the timestamp hop keeps TIMESTAMP_NTZ (parquet ns timestamps read
    # without a session zone) castable — NTZ → bigint directly is not a
    # valid Spark cast
    def _epoch(c: str):
        return F.col(c).cast("timestamp").cast("long")

    r = (
        ranges.withColumn("_bs", F.floor(_epoch(range_start) / w))
        .withColumn("_be", F.floor(_epoch(range_end) / w))
        .filter(F.col("_bs") <= F.col("_be"))
        .withColumn("_bkt", F.explode(F.sequence(F.col("_bs"), F.col("_be"))))
        .drop("_bs", "_be")
    )
    p = points.withColumn("_bkt", F.floor(_epoch(point_ts) / w))

    keys = ["_bkt"] + ([on] if on else [])
    lo = (
        F.col(point_ts) >= F.col(range_start)
        if inclusive in ("both", "left")
        else F.col(point_ts) > F.col(range_start)
    )
    hi = (
        F.col(point_ts) <= F.col(range_end)
        if inclusive in ("both", "right")
        else F.col(point_ts) < F.col(range_end)
    )
    return p.join(r, on=keys, how="inner").filter(lo & hi).drop("_bkt")
