"""Event-sequence analytics: funnel completion over per-user event
streams (the batch complement of streaming/stateful.py's sessionizer).

Funnel semantics (greedy earliest-completion, the standard product-
analytics definition): a user completes step i+1 with the EARLIEST
event of that type STRICTLY AFTER their step-i time; step 1 is the
earliest step-1 event.  Greedy-earliest is optimal (taking an earlier
step time never prevents a later completion), so the result equals the
nested ``min(ts) where ts > prev`` formulation the SQL oracle uses.

Scale shape: ONE shuffle (groupBy user collecting the sorted event
structs), then a row-local JVM fold over each user's array — no
k-step self-joins, no window cascade.  Per-user state is the event
array: bounded by events-per-user.  For pathological users (millions
of events) the k-pass nested-min form (k grouped min-aggregations,
fully map-side-combinable, O(1) per-user state) is used INSTEAD —
``funnel(strategy="auto")`` measures max events-per-user with one
cheap combinable count and switches automatically above
``fold_max_events_per_user``.  Greedy-earliest optimality makes the
two forms result-identical, so the switch is invisible to callers.
The probe is an eager job, so ``auto`` is opt-in; the lazy default
is ``fold`` (r5 ADVICE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
    strategy: str = "fold",
    fold_max_events_per_user: int = 100_000,
) -> DataFrame:
    """Per-user funnel over ``steps`` (ordered event types).

    Returns (user, steps_completed, step_ts): ``step_ts`` holds the
    greedy-earliest timestamp of each completed step (length =
    steps_completed); ``completed_at`` convenience column is the final
    step's time when the whole funnel completed, else NULL.  Ties in
    ``ts`` sort by ``tiebreak_col`` (recommended: a unique event id) so
    the fold order is deterministic; equal-timestamp consecutive steps
    do NOT chain (strictly-increasing times).

    ``strategy``: ``"fold"`` (default) = single-shuffle per-user array
    fold (per-user state = their event array); ``"kpass"`` = k grouped
    nested-min aggregations (k shuffles, O(1) per-user state, immune
    to pathological users); ``"auto"`` = one cheap map-side-combinable
    count of max events-per-user, then fold unless it exceeds
    ``fold_max_events_per_user``.  Greedy-earliest is optimal, so all
    strategies return identical rows.

    NOTE: ``"auto"`` runs a Spark JOB at call time (the probe is an
    eager aggregation over the input) — the constructor is no longer
    lazy, and plan-only inspection pays a full input pass.  The lazy
    default is therefore ``"fold"``; pass ``"auto"`` when events-per-
    user is unknown and may be pathological (millions per user), or
    ``"kpass"`` directly when you know it is.
    """
    if not steps:
        raise ValueError("steps must be a non-empty list of event types")
    if strategy not in ("auto", "fold", "kpass"):
        raise ValueError(f"unknown funnel strategy {strategy!r}")
    k = len(steps)
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    # NULL users are excluded, not pooled: groupBy would fold every
    # unattributable event into one pseudo-user (and the oracle's
    # equi-joins can never match NULL) — gate-fuzz finding; same
    # convention as interarrival_stats
    filtered = df.filter(
        F.col(type_col).isin(steps)
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    )
    if strategy == "auto":
        # one combinable aggregation: partial counts per partition,
        # then a max of ≤ |users| longs — cheap even at corpus scale
        mx = (
            filtered.groupBy(user_col).count()
            .agg(F.max("count").alias("mx")).collect()[0]["mx"]
        )
        strategy = (
            "kpass" if (mx or 0) > fold_max_events_per_user else "fold"
        )
    if strategy == "kpass":
        return _funnel_kpass(filtered, steps, user_col, ts_col, type_col)
    ev = filtered.select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            tb.alias("tb"),
            F.col(type_col).alias("et"),
        ).alias("e"),
    )
    grouped = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list("e")).alias("seq")
    )

    step_lit = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).cast("int").alias("n"),
        F.lit(None).cast("timestamp").alias("last"),
        F.array().cast("array<timestamp>").alias("times"),
    )

    def advance(acc: Column, e: Column) -> Column:
        cond = (
            (acc["n"] < F.lit(k))
            & (e["et"] == F.element_at(step_lit, acc["n"] + 1))
            & ((acc["n"] == 0) | (e["ts"] > acc["last"]))
        )
        return F.when(
            cond,
            F.struct(
                (acc["n"] + 1).cast("int").alias("n"),
                e["ts"].alias("last"),
                F.concat(acc["times"], F.array(e["ts"])).alias("times"),
            ),
        ).otherwise(acc)

    folded = grouped.select(
        F.col(user_col),
        F.aggregate("seq", init, advance).alias("_f"),
    )
    return folded.select(
        F.col(user_col),
        F.col("_f.n").alias("steps_completed"),
        F.col("_f.times").alias("step_ts"),
        F.when(F.col("_f.n") == k, F.element_at("_f.times", k))
        .alias("completed_at"),
    )


def _funnel_kpass(
    filtered: DataFrame,
    steps: list[str],
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """Nested-min funnel: t1 = min(ts | step1); t_{i+1} = min(ts |
    step_{i+1}, ts > t_i).  k grouped MIN aggregations, each fully
    map-side combinable with O(1) per-user state — the
    pathological-user-safe form (a million-event user contributes one
    long per partition per pass, never an in-memory array).  Result-
    identical to the fold form by greedy-earliest optimality.
    """
    k = len(steps)
    users = filtered.select(user_col).distinct()
    cur = (
        filtered.filter(F.col(type_col) == steps[0])
        .groupBy(user_col).agg(F.min(ts_col).alias("t1"))
    )
    acc = users.join(cur, user_col, "left")
    for i in range(1, k):
        prev, this = f"t{i}", f"t{i + 1}"
        nxt = (
            filtered.filter(F.col(type_col) == steps[i])
            .select(user_col, ts_col)
            .join(acc.filter(F.col(prev).isNotNull())
                     .select(user_col, prev), user_col)
            .filter(F.col(ts_col) > F.col(prev))
            .groupBy(user_col).agg(F.min(ts_col).alias(this))
        )
        acc = acc.join(nxt, user_col, "left")
    times = F.filter(
        F.array(*[F.col(f"t{i + 1}") for i in range(k)]),
        lambda x: x.isNotNull(),
    )
    return acc.select(
        F.col(user_col),
        F.size(times).cast("int").alias("steps_completed"),
        times.alias("step_ts"),
        F.col(f"t{k}").alias("completed_at"),
    )


def count_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    granularity: str = "hour",
    z: int = 2,
) -> DataFrame:
    """Volume-anomaly detection on time-bucketed event counts: flag
    buckets whose count deviates from the type's mean by more than
    ``z`` population standard deviations — computed ENTIRELY in integer
    arithmetic, so the flags are bit-reproducible on any engine.

    |cnt − s/n| > z·σ  ⟺  (cnt·n − s)² > z²·(ss·n − s²)

    where n, s = Σcnt, ss = Σcnt² per type are exact integer sums
    (DECIMAL(38,0) for the squared comparison so 1e12-scale counts
    cannot overflow).  Two shuffles, both over the bucket-rollup table
    (|types|·|buckets| rows), never the raw events beyond the first
    count.  Returns (type, bucket, cnt, is_anomaly)."""
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col),
            F.date_trunc(granularity, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(type_col)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = counts.select(
        type_col,
        "bucket",
        "cnt",
        F.count("*").over(w).alias("_n"),
        F.sum("cnt").over(w).alias("_s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("_ss"),
    )
    lhs = (d(F.col("cnt")) * d(F.col("_n")) - d(F.col("_s")))
    rhs = d(F.lit(z * z)) * (
        d(F.col("_ss")) * d(F.col("_n")) - d(F.col("_s")) * d(F.col("_s"))
    )
    return stats.select(
        type_col,
        "bucket",
        F.col("cnt").cast("bigint").alias("cnt"),
        (lhs * lhs > rhs).alias("is_anomaly"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period (the cohort); each cell counts the cohort's distinct users
    still active N periods later — the standard product-analytics
    retention triangle.

    Scale shape: one (user, period) distinct rollup (map-side partial
    agg), a min-period-per-user aggregate, a broadcast-eligible join of
    the per-user cohort back onto the rollup, and one (cohort, offset)
    count — every shuffle is keyed on users or on the tiny
    cohort×offset grid, never on raw events twice.  Period arithmetic
    uses date_trunc + integer day offsets divided by the period length,
    so offsets are exact integers on any engine.  Returns
    (cohort, offset, n_users)."""
    if granularity not in ("day", "week", "month"):
        raise ValueError("granularity must be day, week, or month")
    per = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("u"),
            F.date_trunc(granularity, F.col(ts_col)).cast("date").alias("p"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds cohorts AND the join back
    )
    cohorts = per.groupBy("u").agg(F.min("p").alias("cohort"))
    if granularity == "month":
        # exact calendar months: truncated periods differ by whole months
        off = (
            (F.year("p") * 12 + F.month("p"))
            - (F.year("cohort") * 12 + F.month("cohort"))
        )
    else:
        off = F.datediff(F.col("p"), F.col("cohort")) / (
            1 if granularity == "day" else 7
        )
    joined = per.join(cohorts, "u").select(
        "u", "cohort", off.cast("int").alias("offset")
    )
    return (
        joined.groupBy("cohort", "offset")
        .agg(F.countDistinct("u").cast("bigint").alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """User-journey transition matrix: for consecutive events of each
    user (ordered by time, deterministic tiebreak), count every
    (current → next) event-type pair and its share of the current
    type's outgoing transitions (e6 fixed point) — the input to sankey
    / markov-chain journey analysis.

    One window over (user, ts) — a single user-keyed shuffle — then a
    pair count and a broadcast-sized per-source total join.  Integer
    share arithmetic: share_e6 = floor(n·10⁶ / total)."""
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), tb.asc())
    nxt = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col),
            F.col(type_col).alias("cur"),
            F.lead(type_col).over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    counts = nxt.groupBy("cur", "nxt").agg(
        F.count("*").cast("bigint").alias("n")
    ).localCheckpoint(eager=False)  # feeds totals AND the share join
    totals = counts.groupBy("cur").agg(F.sum("n").alias("_tot"))
    return counts.join(F.broadcast(totals), "cur").select(
        "cur", "nxt", "n",
        F.floor(F.col("n") * F.lit(1_000_000) / F.col("_tot"))
        .cast("bigint").alias("share_e6"),
    )


def journey_paths(
    df: DataFrame,
    n: int = 3,
    top_n: int = 50,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top event-type n-gram paths across user journeys — the
    path-mining generalization of ``event_transitions`` (n=2): counts
    every length-``n`` run of consecutive events per user and ranks the
    most common paths.

    One user-keyed window produces the n−1 lead columns; counts are a
    wordcount-shaped shuffle over path strings; the ranking window sees
    only the path vocabulary.  Returns (path, npath, rank) with ``path``
    as '>'-joined event types."""
    if n < 2:
        raise ValueError("n must be >= 2")
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), tb.asc())
    cols = [F.col(type_col).alias("_e0")] + [
        F.lead(type_col, i).over(w).alias(f"_e{i}") for i in range(1, n)
    ]
    runs = (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col), *cols)
        .filter(F.col(f"_e{n - 1}").isNotNull())
    )
    counted = runs.groupBy(
        F.concat_ws(">", *[F.col(f"_e{i}") for i in range(n)]).alias("path")
    ).agg(F.count("*").cast("bigint").alias("npath"))
    rw = Window.orderBy(F.col("npath").desc(), F.col("path").asc())
    return (
        counted.withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= top_n)
    )


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch gap sessionization (islands-and-gaps): a new session starts
    whenever the inactivity gap exceeds ``gap_seconds`` — the batch
    twin of ``streaming/stateful.sessionize_stream`` and the library
    form of the engine's sessionize gate query.

    Two windows over ONE (user, ts) sort order — the new-session flag
    (lag) and its running sum share the same shuffle/sort, so the plan
    carries a single user-keyed exchange; the final per-session rollup
    is a second, smaller aggregation.  Returns (user, session_id,
    n_events, session_start, session_end).

    NULL ts (no timeline position) and NULL users (sessions of an
    unattributable pseudo-user; Spark/DuckDB also disagree on NULL
    placement in the window sort — gate-fuzz finding) are excluded,
    the funnel/interarrival convention."""
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), tb.asc())
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("timestamp").cast("double")
            - prev.cast("timestamp").cast("double")) > gap_seconds),
        1,
    ).otherwise(0)
    sess = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .withColumn("_new", is_new)
        .withColumn(
            "session_id",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("bigint"),
        )
    )
    return sess.groupBy(user_col, "session_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def interarrival_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user inter-event gap statistics in EXACT microsecond
    integers: gap count, floored mean, min/max, and the raw (Σgap,
    Σgap²) sums burstiness/variance derive from — no float crosses a
    row boundary (the count_anomalies discipline), so any engine
    reproduces every cell.

    One lag window on the (user, ts) sort + one per-user rollup —
    a single user-keyed exchange.  Σgap² is DECIMAL(38,0): a 30-day
    gap is ~2.6e12 µs, squared ~6.7e24 — past bigint, fine in
    128-bit.  Returns (user, n_gaps, mean_gap_us, min_gap_us,
    max_gap_us, sum_gap_us, sum_gap_sq)."""
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), tb.asc())
    gap = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp"))
    )
    gaps = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("_gap", gap)
        .filter(F.col("_gap").isNotNull())
    )
    d = F.col("_gap").cast("decimal(38,0)")
    return gaps.groupBy(user_col).agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.floor(F.sum("_gap") / F.count("*")).cast("bigint")
        .alias("mean_gap_us"),
        F.min("_gap").cast("bigint").alias("min_gap_us"),
        F.max("_gap").cast("bigint").alias("max_gap_us"),
        F.sum("_gap").cast("bigint").alias("sum_gap_us"),
        F.sum(d * d).cast("decimal(38,0)").cast("string").alias("sum_gap_sq"),
    )
