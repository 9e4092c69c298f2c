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
