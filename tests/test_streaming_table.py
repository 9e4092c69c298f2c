"""streaming_table materialization: models as checkpointed Structured
Streaming pipelines — exactly-once incremental appends across runs."""

import json
import os
import uuid

from dbt_core_spark import Engine, ProjectDef


def _write(src_dir, rows):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, f"{uuid.uuid4().hex}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_table_exactly_once_across_runs(spark, schema, tmp_path):
    src = str(tmp_path / "stream_src")
    _write(src, [
        {"event_id": 1, "ts": "2024-01-01T00:05:00.000Z", "kind": "a"},
        {"event_id": 2, "ts": "2024-01-01T00:25:00.000Z", "kind": "b"},
    ])
    # seed a parquet copy so the schema can be inferred... json infers from files
    p = ProjectDef(name="st")
    p.add_source("raw", "clicks", src, format="json", stream=True)
    p.models["clicks_clean"] = """
        {{ config(materialized='streaming_table') }}
        select event_id, cast(ts as timestamp) as ts, upper(kind) as kind
        from {{ source('raw', 'clicks') }}
    """
    eng = Engine(spark, p, schema=schema)
    r1 = eng.run()
    assert r1.ok(), [x.message for x in r1.results]
    assert spark.table(f"{schema}.clicks_clean").count() == 2

    # second run with NO new input → checkpoint prevents re-ingest
    r2 = eng.run()
    assert r2.ok()
    spark.sql(f"refresh table {schema}.clicks_clean")
    assert spark.table(f"{schema}.clicks_clean").count() == 2

    # new file arrives → only the delta is appended
    _write(src, [{"event_id": 3, "ts": "2024-01-01T01:00:00.000Z", "kind": "c"}])
    r3 = eng.run()
    assert r3.ok()
    spark.sql(f"refresh table {schema}.clicks_clean")
    df = spark.table(f"{schema}.clicks_clean")
    assert df.count() == 3
    assert {r["kind"] for r in df.collect()} == {"A", "B", "C"}
    # downstream batch models can ref() the streaming table
    p.models["kind_counts"] = (
        "select kind, count(*) as n from {{ ref('clicks_clean') }} group by kind")
    eng2 = Engine(spark, p, schema=schema)
    r4 = eng2.run(select="kind_counts")
    assert r4.ok(), [x.message for x in r4.results]
    assert spark.table(f"{schema}.kind_counts").count() == 3


def _clicks_project(src, schema_name, extra_config=""):
    p = ProjectDef(name="st")
    p.add_source("raw", "clicks", src, format="json", stream=True)
    p.models["clicks_clean"] = f"""
        {{{{ config(materialized='streaming_table'{extra_config}) }}}}
        select event_id, cast(ts as timestamp) as ts, upper(kind) as kind
        from {{{{ source('raw', 'clicks') }}}}
    """
    return p


def test_streaming_table_source_change_fails_with_clear_error(
    spark, schema, tmp_path
):
    """Repointing a stream:true source location must fail with an
    actionable dbt-style error, not Spark's opaque 'Wrong basePath'
    STREAM_FAILED (r8 verdict #2)."""
    src1 = str(tmp_path / "src_v1")
    src2 = str(tmp_path / "src_v2")
    _write(src1, [{"event_id": 1, "ts": "2024-01-01T00:00:00Z", "kind": "a"}])
    _write(src2, [{"event_id": 9, "ts": "2024-02-01T00:00:00Z", "kind": "z"}])
    r1 = Engine(spark, _clicks_project(src1, schema), schema=schema).run()
    assert r1.ok(), [x.message for x in r1.results]

    r2 = Engine(spark, _clicks_project(src2, schema), schema=schema).run()
    assert r2.results[0].status == "error"
    msg = r2.results[0].message
    assert "source location changed" in msg
    assert "on_source_change" in msg  # remediation is named


def test_streaming_table_source_change_reset_redrains(
    spark, schema, tmp_path
):
    """on_source_change: reset drops checkpoint + data and cleanly
    re-drains from the new location."""
    src1 = str(tmp_path / "src_v1")
    src2 = str(tmp_path / "src_v2")
    _write(src1, [{"event_id": 1, "ts": "2024-01-01T00:00:00Z", "kind": "a"}])
    _write(src2, [
        {"event_id": 8, "ts": "2024-02-01T00:00:00Z", "kind": "y"},
        {"event_id": 9, "ts": "2024-02-01T01:00:00Z", "kind": "z"},
    ])
    r1 = Engine(spark, _clicks_project(src1, schema), schema=schema).run()
    assert r1.ok(), [x.message for x in r1.results]

    p2 = _clicks_project(src2, schema, ", on_source_change='reset'")
    r2 = Engine(spark, p2, schema=schema).run()
    assert r2.ok(), [x.message for x in r2.results]
    spark.sql(f"refresh table {schema}.clicks_clean")
    rows = spark.table(f"{schema}.clicks_clean").collect()
    # old location's row is gone; only the new drain's rows remain
    assert sorted(r["event_id"] for r in rows) == [8, 9]


def test_streaming_table_unchanged_source_passes_guard(
    spark, schema, tmp_path
):
    """The guard must not fire on the normal re-run path (same
    location, relative/URI spelling differences normalized)."""
    src = str(tmp_path / "src")
    _write(src, [{"event_id": 1, "ts": "2024-01-01T00:00:00Z", "kind": "a"}])
    eng = Engine(spark, _clicks_project(src, schema), schema=schema)
    assert eng.run().ok()
    _write(src, [{"event_id": 2, "ts": "2024-01-02T00:00:00Z", "kind": "b"}])
    r2 = eng.run()
    assert r2.ok(), [x.message for x in r2.results]
    spark.sql(f"refresh table {schema}.clicks_clean")
    assert spark.table(f"{schema}.clicks_clean").count() == 2


def test_engine_streaming_table_gate_survives_stale_checkpoint(spark, sf_dir):
    """Cross-process repro of the r8 driver red: a checkpoint from a
    PRIOR session records that session's source part files; replaying
    it against this session's source copy dies with 'Wrong basePath'.
    The gate resets cross-session streaming state at entry, so it must
    stay green even when the surviving checkpoint references a source
    dir that no longer exists."""
    import __spark_entry__ as E

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "/tmp/spark-warehouse"
    ).removeprefix("file:")
    base = os.path.join(wh, "_streaming", "drv_stream__events_clean")

    n1 = E.engine_streaming_table(spark, sf_dir).count()
    assert n1 > 0
    # poison the committed source log exactly like a stale session's
    # checkpoint would: the recorded input-file root no longer exists
    src_log = os.path.join(base, "_checkpoint", "sources", "0", "0")
    assert os.path.exists(src_log)
    txt = open(src_log).read()
    poisoned = txt.replace("/tmp/events_us_", "/tmp/events_us_gone_")
    assert poisoned != txt
    with open(src_log, "w") as f:
        f.write(poisoned)

    n2 = E.engine_streaming_table(spark, sf_dir).count()
    assert n2 == n1


def test_streaming_table_requires_stream_source(spark, schema, sf_dir):
    p = ProjectDef(name="st2")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")  # not a stream
    p.models["bad"] = (
        "{{ config(materialized='streaming_table') }}"
        "select * from {{ source('tpch','orders') }}")
    eng = Engine(spark, p, schema=schema)
    r = eng.run()
    assert r.results[0].status == "error"
    assert "stream: true" in r.results[0].message
