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
