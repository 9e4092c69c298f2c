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


# ---------------- range_join ----------------

from dbt_core_spark.operators.asof import range_join  # noqa: E402
from _slowmark import _mark_slow  # noqa: E402


def _range_fixtures(spark):
    base = dt.datetime(2024, 1, 1)
    pts = _df(spark, [
        (i, base + dt.timedelta(seconds=37 * i), i % 3) for i in range(200)
    ], ["pid", "ts", "k"])
    rng = _df(spark, [
        (j, base + dt.timedelta(seconds=600 * j),
         base + dt.timedelta(seconds=600 * j + 450), j % 3)
        for j in range(12)
    ], ["rid", "start", "end", "k"])
    return pts, rng


def _naive(pts, rng, on=None):
    # reference result via cross join + filter (aliased to dodge ambiguity)
    r2 = rng.select(rng.rid, rng.start, rng.end, rng.k.alias("rk"))
    out = pts.crossJoin(r2).filter(
        (pts.ts >= r2.start) & (pts.ts <= r2.end)
        & ((pts.k == r2.rk) if on else (r2.rid == r2.rid))
    )
    return sorted((r["pid"], r["rid"]) for r in out.collect())


@_mark_slow
def test_range_join_matches_naive(spark):
    pts, rng = _range_fixtures(spark)
    got = range_join(pts, rng.select("rid", "start", "end"),
                     "ts", "start", "end", bucket_width=300)
    assert sorted((r["pid"], r["rid"]) for r in got.collect()) == \
        _naive(pts, rng)


def test_range_join_keyed_matches_naive(spark):
    pts, rng = _range_fixtures(spark)
    got = range_join(pts, rng.select("rid", "start", "end", "k"),
                     "ts", "start", "end", bucket_width=200, on="k")
    assert sorted((r["pid"], r["rid"]) for r in got.collect()) == \
        _naive(pts, rng, on="k")


def test_range_join_bucket_width_is_cost_only(spark):
    pts, rng = _range_fixtures(spark)
    r3 = rng.select("rid", "start", "end")
    a = sorted(map(tuple, range_join(pts, r3, "ts", "start", "end",
                                     bucket_width=60).select("pid", "rid").collect()))
    b = sorted(map(tuple, range_join(pts, r3, "ts", "start", "end",
                                     bucket_width=7200).select("pid", "rid").collect()))
    assert a == b


def test_range_join_inclusive_bounds(spark):
    base = dt.datetime(2024, 1, 1)
    pts = _df(spark, [(1, base), (2, base + dt.timedelta(seconds=10))],
              ["pid", "ts"])
    rng = _df(spark, [(7, base, base + dt.timedelta(seconds=10))],
              ["rid", "start", "end"])
    both = range_join(pts, rng, "ts", "start", "end", bucket_width=5)
    left = range_join(pts, rng, "ts", "start", "end", bucket_width=5,
                      inclusive="left")
    right = range_join(pts, rng, "ts", "start", "end", bucket_width=5,
                       inclusive="right")
    assert {r["pid"] for r in both.collect()} == {1, 2}
    assert {r["pid"] for r in left.collect()} == {1}
    assert {r["pid"] for r in right.collect()} == {2}


def test_range_join_no_nested_loop_plan(spark):
    pts, rng = _range_fixtures(spark)
    got = range_join(pts, rng.select("rid", "start", "end"),
                     "ts", "start", "end", bucket_width=300)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_tolerance_nulls_stale_matches(spark):
    """merge_asof-style tolerance: matches further than the window are
    nulled, in both directions."""
    trades = _df(spark, [
        (1, dt.datetime(2024, 1, 1, 10, 0, 30), "t1"),   # quote 25s old
        (1, dt.datetime(2024, 1, 1, 10, 5, 0), "t2"),    # quote 295s old
    ], ["sym", "ts", "trade"])
    quotes = _df(spark, [
        (1, dt.datetime(2024, 1, 1, 10, 0, 5), 100.0),
    ], ["sym", "qts", "price"])
    within = {r["trade"]: r["price"] for r in asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        right_values=["price"], tolerance=60).collect()}
    assert within == {"t1": 100.0, "t2": None}
    loose = {r["trade"]: r["price"] for r in asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        right_values=["price"], tolerance=600).collect()}
    assert loose == {"t1": 100.0, "t2": 100.0}
    fwd = {r["trade"]: r["price"] for r in asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        right_values=["price"], direction="forward",
        tolerance=60).collect()}
    assert fwd == {"t1": None, "t2": None}  # quote precedes both


def test_asof_without_tolerance_unchanged(spark):
    trades = _df(spark, [(1, dt.datetime(2024, 1, 1, 12), "t")],
                 ["sym", "ts", "trade"])
    quotes = _df(spark, [(1, dt.datetime(2024, 1, 1, 0), 7.0)],
                 ["sym", "qts", "price"])
    out = asof_join(trades, quotes, on="sym", left_ts="ts",
                    right_ts="qts", right_values=["price"])
    assert out.collect()[0]["price"] == 7.0  # 12h-old match still carried
