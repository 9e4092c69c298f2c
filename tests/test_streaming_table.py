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
