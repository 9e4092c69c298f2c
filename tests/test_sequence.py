"""Funnel operator semantics."""

import datetime as dt

from pyspark.sql import functions as F

from dbt_core_spark.operators.sequence import funnel


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_funnel_greedy_earliest_completion(spark):
    df = _ev(spark, [
        (1, 1, _t(1), "view"),
        (2, 1, _t(5), "click"),
        (3, 1, _t(9), "purchase"),
        (4, 2, _t(3), "view"),
        (5, 2, _t(2), "click"),       # click BEFORE view: doesn't count
        (6, 3, _t(1), "click"),       # no view at all
    ])
    got = {r["user_id"]: (r["steps_completed"], r["completed_at"])
           for r in funnel(df, ["view", "click", "purchase"],
                           tiebreak_col="event_id").collect()}
    assert got == {
        1: (3, _t(9)),
        2: (1, None),   # view found, no later click
        3: (0, None),   # has step-type events but none match step 1
    }


def test_funnel_strictly_increasing_ts(spark):
    df = _ev(spark, [
        (1, 1, _t(5), "view"),
        (2, 1, _t(5), "click"),  # same ts: must NOT chain
        (3, 2, _t(5), "view"),
        (4, 2, _t(6), "click"),
    ])
    got = {r["user_id"]: r["steps_completed"]
           for r in funnel(df, ["view", "click"],
                           tiebreak_col="event_id").collect()}
    assert got == {1: 1, 2: 2}


def test_funnel_earliest_not_latest_first_step(spark):
    """Greedy takes the EARLIEST view, maximizing later matches."""
    df = _ev(spark, [
        (1, 1, _t(1), "view"),
        (2, 1, _t(8), "view"),
        (3, 1, _t(4), "click"),
    ])
    out = funnel(df, ["view", "click"], tiebreak_col="event_id").collect()[0]
    assert out["steps_completed"] == 2
    assert out["step_ts"] == [_t(1), _t(4)]


def test_funnel_single_shuffle_plan(spark):
    df = _ev(spark, [(1, 1, _t(1), "view")])
    out = funnel(df, ["view", "click"], tiebreak_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the groupBy(user) — no joins, no windows
    assert plan.count("Exchange") == 1


def test_funnel_kpass_equals_fold(spark):
    """The nested-min k-pass strategy is result-identical to the fold
    (greedy-earliest optimality), including step_ts arrays."""
    rows, eid = [], 0
    import random
    rng = random.Random(7)
    for u in range(1, 40):
        for _ in range(rng.randint(1, 12)):
            rows.append((eid, u, _t(rng.randint(1, 50)),
                         rng.choice(["view", "click", "purchase", "other"])))
            eid += 1
    df = _ev(spark, rows)
    steps = ["view", "click", "purchase"]

    def key(res):
        return sorted(
            (r["user_id"], r["steps_completed"], tuple(r["step_ts"]),
             r["completed_at"]) for r in res.collect())

    assert key(funnel(df, steps, strategy="kpass")) == \
        key(funnel(df, steps, strategy="fold", tiebreak_col="event_id"))


def test_funnel_auto_switches_on_pathological_user(spark):
    """A user whose event count exceeds fold_max_events_per_user flips
    auto to the k-pass form; per-user state there is O(1) (grouped MIN),
    so the plan contains joins, not a collect_list of the giant array."""
    big = spark.range(200_000).select(
        F.col("id").alias("event_id"),
        F.lit(1).alias("user_id"),
        (F.lit(dt.datetime(2024, 1, 1)) +
         F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.when(F.col("id") % 3 == 0, "view")
         .when(F.col("id") % 3 == 1, "click")
         .otherwise("purchase").alias("event_type"),
    )
    small = _ev(spark, [(900001, 2, _t(1), "view"), (900002, 2, _t(2), "click")])
    df = big.unionByName(small)
    out = funnel(df, ["view", "click", "purchase"],
                 strategy="auto", fold_max_events_per_user=10_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan  # kpass path taken
    got = {r["user_id"]: r["steps_completed"] for r in out.collect()}
    assert got == {1: 3, 2: 2}


# ---------------- count_anomalies ----------------

def test_count_anomalies_flags_spike_only(spark):
    rows = []
    eid = 0
    # type "a": 10 calm hours of 5 events, one spike hour of 50
    for h in range(10):
        for j in range(5):
            rows.append((eid, 1, dt.datetime(2024, 1, 1, h, j), "a")); eid += 1
    for j in range(50):
        rows.append((eid, 1, dt.datetime(2024, 1, 1, 11, j % 60), "a")); eid += 1
    df = _ev(spark, rows)
    from dbt_core_spark.operators.sequence import count_anomalies

    got = {(r["event_type"], r["bucket"].hour): r["is_anomaly"]
           for r in count_anomalies(df, z=2).collect()}
    assert got[("a", 11)] is True
    assert all(v is False for k, v in got.items() if k[1] != 11)


def test_count_anomalies_integer_threshold_exact(spark):
    """Boundary check vs a python float reference on small numbers."""
    import statistics

    rows = []
    eid = 0
    counts = [4, 6, 5, 5, 9]  # mean 5.8, pstdev ~1.72 -> 9 is z~1.86 (not > 2)
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, 1, dt.datetime(2024, 1, 2, h, j), "b")); eid += 1
    df = _ev(spark, rows)
    from dbt_core_spark.operators.sequence import count_anomalies

    got = {r["bucket"].hour: r["is_anomaly"]
           for r in count_anomalies(df, z=2).collect()}
    mu = statistics.fmean(counts)
    sd = statistics.pstdev(counts)
    for h, c in enumerate(counts):
        assert got[h] == (abs(c - mu) > 2 * sd), (h, c)


# ---------------- cohort_retention ----------------

def test_cohort_retention_triangle(spark):
    from dbt_core_spark.operators.sequence import cohort_retention

    rows = [
        # user 1: active day 0 and day 7 (offset 1 week)
        (1, 1, dt.datetime(2024, 1, 1, 10), "view"),
        (2, 1, dt.datetime(2024, 1, 8, 9), "view"),
        # user 2: same cohort week, never returns
        (3, 2, dt.datetime(2024, 1, 3, 12), "click"),
        # user 3: cohort week 2, returns in week 4 (offset 2)
        (4, 3, dt.datetime(2024, 1, 10, 8), "view"),
        (5, 3, dt.datetime(2024, 1, 24, 8), "view"),
        # multiple events same week count once
        (6, 1, dt.datetime(2024, 1, 1, 23), "click"),
    ]
    df = _ev(spark, rows)
    got = {(str(r["cohort"]), r["offset"]): r["n_users"]
           for r in cohort_retention(df, granularity="week").collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1, 2
        ("2024-01-01", 1): 1,   # user 1 returned
        ("2024-01-08", 0): 1,   # user 3
        ("2024-01-08", 2): 1,   # user 3 back two weeks later
    }


def test_cohort_retention_offsets_are_exact_integers(spark):
    from dbt_core_spark.operators.sequence import cohort_retention

    rows = [(i, 1, dt.datetime(2024, 1, 1) + dt.timedelta(days=7 * i), "x")
            for i in range(5)]
    df = _ev(spark, rows)
    got = sorted(r["offset"] for r in
                 cohort_retention(df, granularity="week").collect())
    assert got == [0, 1, 2, 3, 4]


def test_cohort_retention_month_is_calendar_exact(spark):
    from dbt_core_spark.operators.sequence import cohort_retention

    rows = [
        (1, 1, dt.datetime(2024, 1, 31), "x"),
        (2, 1, dt.datetime(2024, 3, 1), "x"),   # Jan -> Mar = 2 months
    ]
    df = _ev(spark, rows)
    got = {(str(r["cohort"]), r["offset"]): r["n_users"]
           for r in cohort_retention(df, granularity="month").collect()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1}


# ---------------- event_transitions ----------------

def test_event_transitions_counts_and_shares(spark):
    from dbt_core_spark.operators.sequence import event_transitions

    rows = [
        (1, 1, _t(1), "view"), (2, 1, _t(2), "click"),
        (3, 1, _t(3), "view"), (4, 1, _t(4), "buy"),
        (5, 2, _t(1), "view"), (6, 2, _t(2), "click"),
    ]
    df = _ev(spark, rows)
    got = {(r["cur"], r["nxt"]): (r["n"], r["share_e6"])
           for r in event_transitions(df, tiebreak_col="event_id").collect()}
    # view ->: click x2, buy x1; click -> view x1
    assert got[("view", "click")] == (2, 666666)
    assert got[("view", "buy")] == (1, 333333)
    assert got[("click", "view")] == (1, 1000000)
    # no cross-user pair (2's click never chains to another user)
    assert ("click", "click") not in got


def test_event_transitions_tiebreak_determinism(spark):
    from dbt_core_spark.operators.sequence import event_transitions

    rows = [(1, 1, _t(5), "a"), (2, 1, _t(5), "b")]  # same ts
    df = _ev(spark, rows)
    got = {(r["cur"], r["nxt"]) for r in
           event_transitions(df, tiebreak_col="event_id").collect()}
    assert got == {("a", "b")}  # event_id order breaks the tie


# ---------------- journey_paths ----------------

def test_journey_paths_trigrams(spark):
    from dbt_core_spark.operators.sequence import journey_paths

    rows = [
        (1, 1, _t(1), "a"), (2, 1, _t(2), "b"), (3, 1, _t(3), "c"),
        (4, 1, _t(4), "a"), (5, 1, _t(5), "b"), (6, 1, _t(6), "c"),
        (7, 2, _t(1), "a"), (8, 2, _t(2), "b"), (9, 2, _t(3), "c"),
    ]
    df = _ev(spark, rows)
    got = {r["path"]: (r["npath"], r["rank"]) for r in
           journey_paths(df, n=3, tiebreak_col="event_id").collect()}
    # user1: abc, bca, cab, abc ; user2: abc -> abc x3
    assert got["a>b>c"] == (3, 1)
    assert got["b>c>a"] == (1, 2)
    assert got["c>a>b"] == (1, 3)
    assert len(got) == 3  # no cross-user runs


def test_journey_paths_bigram_equals_transitions(spark):
    from dbt_core_spark.operators.sequence import (
        event_transitions, journey_paths)

    rows = [(i, i % 3, _t(i), "xyz"[i % 3]) for i in range(30)]
    df = _ev(spark, rows)
    jp = {tuple(r["path"].split(">")): r["npath"] for r in
          journey_paths(df, n=2, top_n=100, tiebreak_col="event_id").collect()}
    tr = {(r["cur"], r["nxt"]): r["n"] for r in
          event_transitions(df, tiebreak_col="event_id").collect()}
    assert jp == tr


# ---------------- sessionize (batch) ----------------

def test_sessionize_islands_and_gaps(spark):
    from dbt_core_spark.operators.sequence import sessionize

    rows = [
        (1, 1, _t(0), "a"), (2, 1, _t(10), "a"),      # session 1
        (3, 1, dt.datetime(2024, 1, 1, 2, 0, 0), "a"),  # gap > 30min -> s2
        (4, 2, _t(5), "a"),                            # other user
    ]
    df = _ev(spark, rows)
    got = {(r["user_id"], r["session_id"]): (r["n_events"],
                                             r["session_start"].second)
           for r in sessionize(df, gap_seconds=1800,
                               tiebreak_col="event_id").collect()}
    assert got == {(1, 1): (2, 0), (1, 2): (1, 0), (2, 1): (1, 5)}


def test_sessionize_matches_gate_query_sql(spark):
    """The operator must reproduce the engine gate query's SQL islands
    logic exactly on shared data."""
    from dbt_core_spark.operators.sequence import sessionize

    rows = [(i, i % 5, _t(0) + dt.timedelta(minutes=7 * i), "x")
            for i in range(60)]
    df = _ev(spark, rows)
    df.createOrReplaceTempView("ev_sess_parity")
    sql = spark.sql("""
        with gaps as (
            select user_id, ts, event_id,
                   case when lag(ts) over w is null
                          or (cast(ts as double) - cast(lag(ts) over w as double)) > 1800
                        then 1 else 0 end as is_new
            from ev_sess_parity
            window w as (partition by user_id order by ts, event_id)
        ), sess as (
            select user_id, ts,
                   sum(is_new) over (partition by user_id order by ts, event_id
                                     rows between unbounded preceding and current row) as session_id
            from gaps
        )
        select user_id, cast(session_id as bigint) as session_id,
               cast(count(*) as bigint) as n_events
        from sess group by 1, 2
    """)
    a = sorted(map(tuple, sql.collect()))
    b = sorted(map(tuple, sessionize(df, tiebreak_col="event_id")
                   .select("user_id", "session_id", "n_events").collect()))
    assert a == b


def test_sessionize_single_exchange_plan(spark):
    from dbt_core_spark.operators.sequence import sessionize

    df = _ev(spark, [(1, 1, _t(0), "a")])
    plan = sessionize(df, tiebreak_col="event_id") \
        ._jdf.queryExecution().executedPlan().toString()
    # the two windows share one sort order; only the final rollup may
    # add a second (tiny) exchange
    assert plan.count("Exchange hashpartitioning") <= 2


# ---------------- interarrival_stats ----------------

def test_interarrival_stats_exact(spark):
    from dbt_core_spark.operators.sequence import interarrival_stats

    rows = [
        (1, 1, _t(0), "a"), (2, 1, _t(2), "a"), (3, 1, _t(5), "a"),
        (4, 2, _t(9), "a"),  # single event: no gaps -> absent
    ]
    df = _ev(spark, rows)
    got = {r["user_id"]: r for r in
           interarrival_stats(df, tiebreak_col="event_id").collect()}
    assert set(got) == {1}
    r = got[1]
    assert r["n_gaps"] == 2
    assert (r["min_gap_us"], r["max_gap_us"]) == (2_000_000, 3_000_000)
    assert r["sum_gap_us"] == 5_000_000
    assert r["mean_gap_us"] == 2_500_000
    assert int(r["sum_gap_sq"]) == 2_000_000**2 + 3_000_000**2
