"""Model contracts + constraints + persist_docs (ref: ContractConfig
v1/config.py:34-36; ColumnInfo components.py:59-70; constraints pinned
by tests/functional/adapter/constraints/; persist_docs v1/config.py:86).
"""

from dbt_core_spark import Engine, ProjectDef


def _proj(sf_dir):
    p = ProjectDef(name="cts")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    return p


def test_contract_via_schema_columns(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.models["m"] = (
        "{{ config(materialized='table', contract={'enforced': True}) }}"
        "select o_orderkey as id, o_orderstatus as status "
        "from {{ source('tpch','orders') }}"
    )
    p.model_columns["m"] = [
        {"name": "id", "data_type": "bigint"},
        {"name": "status", "data_type": "string"},
    ]
    eng = Engine(spark, p, schema=schema)
    res = eng.run()
    assert res.ok(), [r.message for r in res.results]


def test_contract_type_normalization(spark, schema, sf_dir):
    """'long' and 'BIGINT' both normalize to Spark's bigint."""
    p = _proj(sf_dir)
    p.models["m"] = (
        "{{ config(materialized='table', contract={'enforced': True}) }}"
        "select o_orderkey as id from {{ source('tpch','orders') }} limit 1"
    )
    p.model_columns["m"] = [{"name": "id", "data_type": "LONG"}]
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()


def test_contract_missing_and_extra_columns(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.models["m"] = (
        "{{ config(materialized='table', contract={'enforced': True}) }}"
        "select o_orderkey as id, o_orderstatus as surprise "
        "from {{ source('tpch','orders') }} limit 1"
    )
    p.model_columns["m"] = [
        {"name": "id", "data_type": "bigint"},
        {"name": "declared_only", "data_type": "string"},
    ]
    eng = Engine(spark, p, schema=schema)
    r = eng.run()
    assert not r.ok()
    msg = r.results[0].message
    assert "declared_only" in msg and "surprise" in msg


def test_contract_on_view_materialization(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.models["v"] = (
        "{{ config(materialized='view', contract={'enforced': True}) }}"
        "select o_orderkey as id from {{ source('tpch','orders') }}"
    )
    p.model_columns["v"] = [{"name": "id", "data_type": "int"}]  # wrong
    eng = Engine(spark, p, schema=schema)
    r = eng.run()
    assert not r.ok()
    assert "declared int, got bigint" in r.results[0].message


def test_not_null_and_check_constraints(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.models["ok"] = (
        "{{ config(materialized='table', contract={'enforced': True}) }}"
        "select o_orderkey as id, o_totalprice as price "
        "from {{ source('tpch','orders') }}"
    )
    p.model_columns["ok"] = [
        {"name": "id", "data_type": "bigint",
         "constraints": [{"type": "not_null"}]},
        {"name": "price", "data_type": "double",
         "constraints": [{"type": "check", "expression": "price >= 0"}]},
    ]
    p.models["bad"] = (
        "{{ config(materialized='table', contract={'enforced': True}) }}"
        "select cast(null as bigint) as id from {{ source('tpch','orders') }} limit 3"
    )
    p.model_columns["bad"] = [
        {"name": "id", "data_type": "bigint",
         "constraints": [{"type": "not_null"}]},
    ]
    eng = Engine(spark, p, schema=schema)
    res = eng.run()
    by_id = res.by_id
    assert by_id["model.cts.ok"].status == "success"
    bad = by_id["model.cts.bad"]
    assert bad.status == "error"
    assert "not_null(id): 3 violating rows" in bad.message


def test_contract_python_model(spark, schema, sf_dir):
    p = _proj(sf_dir)

    def mk(dbt, session):
        return dbt.source("tpch", "orders").selectExpr("o_orderkey as id")

    p.python_models["pym"] = mk
    p.model_configs["pym"] = {"contract": {"enforced": True}, "materialized": "table"}
    p.model_columns["pym"] = [{"name": "id", "data_type": "string"}]  # wrong
    eng = Engine(spark, p, schema=schema)
    r = eng.run()
    assert not r.ok()
    assert "declared string, got bigint" in r.results[0].message


def test_persist_docs_table_and_column_comments(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.models["doc_t"] = (
        "{{ config(materialized='table', persist_docs={'relation': True, 'columns': True}) }}"
        "select o_orderkey as id from {{ source('tpch','orders') }} limit 1"
    )
    p.model_descriptions["doc_t"] = "the documented table"
    p.model_columns["doc_t"] = [
        {"name": "id", "description": "primary key"},
    ]
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    detail = spark.sql(f"describe table extended {schema}.doc_t").collect()
    props = {r.col_name: r.data_type for r in detail}
    assert any("the documented table" in (v or "") for v in props.values())
    cols = spark.catalog.listColumns(f"{schema}.doc_t")
    assert any(c.name == "id" and (c.description or "") == "primary key" for c in cols)


def test_contract_enforced_on_microbatch(spark, schema, sf_dir):
    """contract: {enforced: true} applies per microbatch batch too."""
    import datetime as dt

    p = _proj(sf_dir)
    p.models["mb"] = (
        "{{ config(materialized='incremental', incremental_strategy='microbatch', "
        "event_time='o_orderdate', batch_size='year', "
        "begin='1996-01-01', contract={'enforced': True}) }}"
        "select o_orderkey as id, o_orderdate from {{ source('tpch','orders') }}"
    )
    p.model_columns["mb"] = [
        {"name": "id", "data_type": "int"},  # wrong: actual bigint
        {"name": "o_orderdate", "data_type": "timestamp_ntz"},
    ]
    eng = Engine(spark, p, schema=schema)
    r = eng.run(event_time_start=dt.datetime(1996, 1, 1),
                event_time_end=dt.datetime(1997, 1, 1))
    assert not r.ok()
    assert r.results[0].status == "error"  # every batch failed the contract
    assert "declared int, got bigint" in r.results[0].message
