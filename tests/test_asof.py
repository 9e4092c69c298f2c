"""As-of join operator semantics."""

import datetime as dt

from dbt_core_spark.operators.asof import asof_join


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_backward(spark):
    trades = _df(spark, [
        (1, dt.datetime(2024, 1, 1, 10, 0, 5), "t1"),
        (1, dt.datetime(2024, 1, 1, 10, 0, 20), "t2"),
        (2, dt.datetime(2024, 1, 1, 10, 0, 1), "t3"),
    ], ["sym", "ts", "trade"])
    quotes = _df(spark, [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), 100.0),
        (1, dt.datetime(2024, 1, 1, 10, 0, 10), 101.0),
        (2, dt.datetime(2024, 1, 1, 10, 0, 2), 50.0),
    ], ["sym", "qts", "price"])
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="qts",
                    right_values=["price"])
    got = {r["trade"]: r["price"] for r in out.collect()}
    assert got == {"t1": 100.0, "t2": 101.0, "t3": None}  # t3 precedes all quotes


def test_asof_equal_ts_matches(spark):
    left = _df(spark, [(1, dt.datetime(2024, 1, 1), "l")], ["k", "ts", "tag"])
    right = _df(spark, [(1, dt.datetime(2024, 1, 1), 9.0)], ["k", "rts", "v"])
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_values=["v"])
    assert out.collect()[0]["v"] == 9.0  # '<=' semantics


def test_asof_forward(spark):
    left = _df(spark, [(1, dt.datetime(2024, 1, 1, 0, 0, 5), "l")], ["k", "ts", "tag"])
    right = _df(spark, [
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 7), 2.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 9), 3.0),
    ], ["k", "rts", "v"])
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_values=["v"], direction="forward")
    assert out.collect()[0]["v"] == 2.0  # earliest at-or-after


def test_asof_no_cartesian_plan(spark):
    left = _df(spark, [(1, dt.datetime(2024, 1, 1), "l")], ["k", "ts", "tag"])
    right = _df(spark, [(1, dt.datetime(2024, 1, 1), 1.0)], ["k", "rts", "v"])
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # single key-shuffle window, not a join blowup
