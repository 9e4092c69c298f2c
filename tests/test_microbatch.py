"""Microbatch batch construction + end-to-end event-time runs
(ref: core/dbt/materializations/incremental/microbatch.py:12-181;
tests/functional/microbatch/test_microbatch.py)."""

import datetime as dt

from dbt_core_spark import Engine, ProjectDef
from dbt_core_spark.streaming.microbatch import (
    MicrobatchBuilder,
    offset_timestamp,
    truncate_timestamp,
)

UTC = dt.timezone.utc


def test_truncate_and_offset():
    ts = dt.datetime(2020, 5, 15, 13, 45, 12, tzinfo=UTC)
    assert truncate_timestamp(ts, "hour") == dt.datetime(2020, 5, 15, 13, tzinfo=UTC)
    assert truncate_timestamp(ts, "day") == dt.datetime(2020, 5, 15, tzinfo=UTC)
    assert truncate_timestamp(ts, "month") == dt.datetime(2020, 5, 1, tzinfo=UTC)
    assert truncate_timestamp(ts, "year") == dt.datetime(2020, 1, 1, tzinfo=UTC)
    assert offset_timestamp(ts, "day", 1) == dt.datetime(2020, 5, 16, tzinfo=UTC)
    assert offset_timestamp(ts, "month", -5) == dt.datetime(2019, 12, 1, tzinfo=UTC)
    assert offset_timestamp(ts, "year", 2) == dt.datetime(2022, 1, 1, tzinfo=UTC)


def test_initial_run_batches_from_begin():
    b = MicrobatchBuilder(
        batch_size="day",
        begin=dt.datetime(2020, 1, 1, tzinfo=UTC),
        now=dt.datetime(2020, 1, 3, 7, tzinfo=UTC),
    )
    batches = b.build_batches(is_incremental=False)
    assert [x.start.day for x in batches] == [1, 2, 3]
    assert batches[0].end == dt.datetime(2020, 1, 2, tzinfo=UTC)


def test_incremental_run_lookback():
    b = MicrobatchBuilder(
        batch_size="day",
        begin=dt.datetime(2020, 1, 1, tzinfo=UTC),
        lookback=1,
        now=dt.datetime(2020, 1, 5, 7, tzinfo=UTC),
    )
    batches = b.build_batches(is_incremental=True)
    assert [x.start.day for x in batches] == [4, 5]  # lookback 1 + current


def test_explicit_event_time_window():
    b = MicrobatchBuilder(
        batch_size="day",
        begin=dt.datetime(2020, 1, 1, tzinfo=UTC),
        event_time_start=dt.datetime(2020, 1, 2, tzinfo=UTC),
        event_time_end=dt.datetime(2020, 1, 3, tzinfo=UTC),
        now=dt.datetime(2020, 6, 1, tzinfo=UTC),
    )
    batches = b.build_batches(is_incremental=True)
    assert [x.start.day for x in batches] == [2, 3]


def test_microbatch_end_to_end(spark, schema):
    """Daily microbatch over a seeded event table: upstream reads are
    filtered per batch, late rows picked up on the next run."""
    p = ProjectDef(name="mb")
    p.seeds["raw_events"] = [
        {"id": 1, "event_time": "2020-01-01 01:00:00", "v": 1},
        {"id": 2, "event_time": "2020-01-02 01:00:00", "v": 2},
        {"id": 3, "event_time": "2020-01-03 01:00:00", "v": 3},
    ]
    p.seed_configs["raw_events"] = {
        "column_types": {"event_time": "timestamp"},
        "event_time": "event_time",  # enables upstream filter injection
    }
    p.models["daily"] = """
        {{ config(materialized='incremental', incremental_strategy='microbatch',
                  event_time='event_time', batch_size='day',
                  begin='2020-01-01', unique_key='id') }}
        select * from {{ ref('raw_events') }}
    """
    eng = Engine(spark, p, schema=schema)
    assert eng.seed().ok()
    r = eng.run(
        event_time_start=dt.datetime(2020, 1, 1, tzinfo=UTC),
        event_time_end=dt.datetime(2020, 1, 3, tzinfo=UTC),
    )
    assert r.ok(), [x.message for x in r.results]
    batches = r.results[0].batch_results
    assert len(batches) == 3 and all(b["status"] == "success" for b in batches)
    assert spark.table(f"{schema}.daily").count() == 3

    # late-arriving rows land in an already-processed window → re-run window
    p.seeds["raw_events"] = [
        {"id": 1, "event_time": "2020-01-01 01:00:00", "v": 1},
        {"id": 2, "event_time": "2020-01-02 01:00:00", "v": 2},
        {"id": 3, "event_time": "2020-01-03 01:00:00", "v": 3},
        {"id": 4, "event_time": "2020-01-02 09:00:00", "v": 9},
    ]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed()
    r2 = eng2.run(
        event_time_start=dt.datetime(2020, 1, 2, tzinfo=UTC),
        event_time_end=dt.datetime(2020, 1, 2, tzinfo=UTC),
    )
    assert r2.ok()
    df = spark.table(f"{schema}.daily")
    assert df.count() == 4  # late row added, window replace idempotent
    assert df.filter("id = 4").count() == 1


def test_microbatch_partitioned_dynamic_overwrite(spark, schema):
    """With partition_by, each batch is a dynamic partition overwrite —
    O(batch) writes, and late re-runs replace only their day partition."""
    p = ProjectDef(name="mbp")
    p.seeds["raw_events"] = [
        {"id": 1, "event_time": "2020-01-01 01:00:00", "day": "2020-01-01", "v": 1},
        {"id": 2, "event_time": "2020-01-02 01:00:00", "day": "2020-01-02", "v": 2},
        {"id": 3, "event_time": "2020-01-03 01:00:00", "day": "2020-01-03", "v": 3},
    ]
    p.seed_configs["raw_events"] = {
        "column_types": {"event_time": "timestamp"}, "event_time": "event_time"}
    p.models["daily"] = """
        {{ config(materialized='incremental', incremental_strategy='microbatch',
                  event_time='event_time', batch_size='day',
                  begin='2020-01-01', partition_by='day') }}
        select * from {{ ref('raw_events') }}
    """
    eng = Engine(spark, p, schema=schema)
    assert eng.seed().ok()
    r = eng.run(event_time_start=dt.datetime(2020, 1, 1, tzinfo=UTC),
                event_time_end=dt.datetime(2020, 1, 3, tzinfo=UTC))
    assert r.ok(), [x.message for x in r.results]
    assert spark.table(f"{schema}.daily").count() == 3
    # partitioned on disk
    assert spark.sql(f"show partitions {schema}.daily").count() == 3

    # late correction lands in an already-processed day: re-run that window
    p.seeds["raw_events"] = [
        {"id": 1, "event_time": "2020-01-01 01:00:00", "day": "2020-01-01", "v": 1},
        {"id": 2, "event_time": "2020-01-02 01:00:00", "day": "2020-01-02", "v": 99},
        {"id": 4, "event_time": "2020-01-02 09:00:00", "day": "2020-01-02", "v": 9},
        {"id": 3, "event_time": "2020-01-03 01:00:00", "day": "2020-01-03", "v": 3},
    ]
    eng2 = Engine(spark, p, schema=schema)
    eng2.seed()
    r2 = eng2.run(event_time_start=dt.datetime(2020, 1, 2, tzinfo=UTC),
                  event_time_end=dt.datetime(2020, 1, 2, tzinfo=UTC))
    assert r2.ok(), [x.message for x in r2.results]
    df = spark.table(f"{schema}.daily")
    assert df.count() == 4
    # only the Jan-2 partition was replaced; Jan-1/Jan-3 untouched
    assert {r["id"]: r["v"] for r in df.collect()} == {1: 1, 2: 99, 4: 9, 3: 3}


def test_retry_reruns_only_failed_batches(spark, schema, sf_dir, tmp_path):
    """dbt retry semantics for microbatch (ref: task/retry.py +
    task/run.py:492-511): a partial-success node re-runs ONLY its
    failed batches; the artifact round-trips through run_results.json."""
    import copy
    import os

    from dbt_core_spark import Engine, ProjectDef
    from dbt_core_spark.run.artifacts import load_run_results, write_run_results

    p = ProjectDef(name="mbr")
    p.seeds["src"] = [
        {"id": 1, "event_time": "2020-01-01 01:00:00", "v": 1},
        {"id": 2, "event_time": "2020-01-02 01:00:00", "v": 2},
        {"id": 3, "event_time": "2020-01-03 01:00:00", "v": 3},
    ]
    p.seed_configs["src"] = {
        "column_types": {"event_time": "timestamp"},
        "event_time": "event_time",
    }
    p.models["mb"] = (
        "{{ config(materialized='incremental', incremental_strategy='microbatch', "
        "event_time='event_time', batch_size='day', begin='2020-01-01') }}"
        "select * from {{ ref('src') }}"
    )
    eng = Engine(spark, p, schema=schema)
    assert eng.seed().ok()
    first = eng.run(
        event_time_start=dt.datetime(2020, 1, 1, tzinfo=UTC),
        event_time_end=dt.datetime(2020, 1, 4, tzinfo=UTC),
    )
    assert first.ok()
    assert spark.table(f"{schema}.mb").count() == 3

    # simulate one failed batch in the recorded artifact
    prev = copy.deepcopy(first)
    node_res = prev.by_id["model.mbr.mb"]
    node_res.status = "partial success"
    assert node_res.batch_results and node_res.batch_results[1]["start"]
    node_res.batch_results[1]["status"] = "error"
    node_res.batch_results[1]["message"] = "simulated"
    path = write_run_results(prev, os.path.join(str(tmp_path), "run_results.json"))
    loaded = load_run_results(str(tmp_path))
    assert loaded.by_id["model.mbr.mb"].status == "partial success"

    retried = eng.retry(path)
    # exactly one node execution — the failed day's window — and the
    # table still holds all three rows (idempotent partition rewrite)
    assert retried.ok()
    assert len(retried.results) == 1
    assert retried.results[0].batch_results is not None
    assert len(retried.results[0].batch_results) == 1
    assert retried.results[0].batch_results[0]["start"] == "2020-01-02 00:00:00"
    assert spark.table(f"{schema}.mb").count() == 3


def test_concurrent_batches_backfill(spark, schema, sf_dir, tmp_path):
    """concurrent_batches fans the backfill out over a thread pool;
    disjoint event-time windows write disjoint partitions, so results
    equal the serial run."""
    from dbt_core_spark import Engine, ProjectDef

    rows = [
        {"id": d * 10 + i, "event_time": f"2020-01-{d:02d} 0{i}:00:00", "v": d}
        for d in range(1, 9) for i in range(3)
    ]
    for schema_suffix, conc in (("ser", 1), ("par", 4)):
        p = ProjectDef(name=f"mbc{schema_suffix}")
        p.seeds["src"] = rows
        p.seed_configs["src"] = {
            "column_types": {"event_time": "timestamp"},
            "event_time": "event_time",
        }
        p.models["mb"] = (
            "{{ config(materialized='incremental', "
            "incremental_strategy='microbatch', event_time='event_time', "
            "batch_size='day', begin='2020-01-01', "
            "partition_by='event_date', concurrent_batches=%d) }}"
            "select *, cast(event_time as date) as event_date "
            "from {{ ref('src') }}" % conc
        )
        eng = Engine(spark, p, schema=f"{schema}_{schema_suffix}")
        assert eng.seed().ok()
        res = eng.run(
            event_time_start=dt.datetime(2020, 1, 1, tzinfo=UTC),
            event_time_end=dt.datetime(2020, 1, 8, tzinfo=UTC),
        )
        assert res.ok(), [r.message for r in res.results]
    ser = spark.table(f"{schema}_ser.mb").orderBy("id").collect()
    par = spark.table(f"{schema}_par.mb").orderBy("id").collect()
    assert [r.id for r in ser] == [r.id for r in par] and len(ser) == 24
    for sfx in ("ser", "par"):
        for db in (f"{schema}_{sfx}", f"{schema}_{sfx}__sources"):
            spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")
