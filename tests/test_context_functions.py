"""Jinja context function surface (§2.D) — one assertion per base/provider
context function (ref: core/dbt/context/base.py:187-722,
providers.py:873-1523)."""

import pytest

from dbt_core_spark import Engine, ProjectDef
from dbt_core_spark.exceptions import CompilationError


@pytest.fixture()
def eng(spark, schema, sf_dir):
    p = ProjectDef(name="ctx")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["stg"] = "select o_orderkey as id from {{ source('tpch','orders') }}"
    p.vars["env"] = "prod"
    e = Engine(spark, p, schema=schema)
    e.run()
    return e


def c(eng, template):
    return eng.compile_sql(f"select '{{{{ {template} }}}}' as v").split("'")[1]


def test_tojson_fromjson(eng):
    assert c(eng, 'tojson({"a": 1})') == '{"a": 1}'
    out = eng.compile_sql('select {{ fromjson(\'{"a": 42}\')["a"] }} as v')
    assert "42" in out


def test_toyaml_fromyaml(eng):
    out = eng.compile_sql("select '{{ toyaml({'k': 'v'}) | trim }}' as x")
    assert "k: v" in out
    out = eng.compile_sql("select {{ fromyaml('n: 7')['n'] }} as x")
    assert "7" in out


def test_set_and_zip(eng):
    out = eng.compile_sql("{% set s = set([1, 1, 2]) %}select {{ s | length }} as v")
    assert "2" in out
    out = eng.compile_sql(
        "{% set z = zip([1, 2], ['a', 'b']) %}select '{{ z[0][1] }}' as v")
    assert "'a'" in out


def test_run_started_at_invocation_id_thread_id(eng):
    out = eng.compile_sql(
        "select '{{ run_started_at.year }}|{{ invocation_id[:8] }}|{{ thread_id }}' as v")
    year, inv, thread = out.split("'")[1].split("|")
    assert int(year) >= 2026 and len(inv) == 8 and thread


def test_modules(eng):
    out = eng.compile_sql(
        "select '{{ modules.datetime.date(2020, 1, 31).isoformat() }}' as v")
    assert "2020-01-31" in out
    out = eng.compile_sql(
        "select '{{ modules.re.sub('[0-9]+', 'N', 'a1b22') }}' as v")
    assert "aNbN" in out
    out = eng.compile_sql(
        "select {{ modules.itertools.chain([1], [2]) | list | length }} as v")
    assert "2" in out


def test_local_md5_and_dbt_version(eng):
    out = eng.compile_sql("select '{{ local_md5('x') }}|{{ dbt_version }}' as v")
    md5x, ver = out.split("'")[1].split("|")
    assert md5x == "9dd4e461268c8034f5c8564e155c67a6"
    assert "spark" in ver


def test_env_var_and_var(eng, monkeypatch):
    monkeypatch.setenv("CTX_TEST_ENV", "hello")
    out = eng.compile_sql("select '{{ env_var('CTX_TEST_ENV', 'dflt') }}' as v")
    assert "hello" in out
    out = eng.compile_sql("select '{{ env_var('CTX_MISSING', 'dflt') }}' as v")
    assert "dflt" in out
    assert "prod" in eng.compile_sql("select '{{ var('env') }}' as v")
    with pytest.raises(CompilationError):
        eng.compile_sql("select '{{ var('no_such_var') }}' as v")


def test_diff_of_two_dicts(eng):
    out = eng.compile_sql(
        "select {{ diff_of_two_dicts({'a': [1, 2]}, {'a': [2]})['a'] | length }} as v")
    assert "1" in out


def test_exceptions_raise(eng):
    with pytest.raises(CompilationError, match="boom"):
        eng.compile_sql("{{ exceptions.raise_compiler_error('boom') }}")


def test_execute_flag_and_target(eng):
    out = eng.compile_sql(
        "select '{{ execute }}|{{ target.type }}|{{ target.name }}' as v")
    assert out.split("'")[1] == "True|spark|dev"


def test_graph_and_model_introspection(eng):
    out = eng.compile_sql(
        "select {{ graph.nodes.values() | selectattr('resource_type', 'equalto', 'model') | list | length }} as v")
    assert "1" in out
    out = eng.compile_sql("select '{{ model.unique_id }}' as v")
    assert "sql_operation.ctx.inline" in out


def test_run_query_and_store_result(eng):
    sql = (
        "{% set t = run_query('select 21 as half') %}"
        "{% do store_result('x', agate_table=t) %}"
        "{% set back = load_result('x') %}"
        "select {{ back.columns['half'][0] * 2 }} as v"
    )
    out = eng.compile_sql(sql)
    assert "42" in out


def test_adapter_shim(eng, schema):
    out = eng.compile_sql(
        "select '{{ adapter.get_columns_in_relation(ref('stg'))[0]['name'] }}' as v")
    assert "id" in out
    out = eng.compile_sql("select {{ adapter.quote('weird col') }} from {{ ref('stg') }} limit 0")
    assert "`weird col`" in out


def test_this_in_model_context(spark, schema, sf_dir):
    p = ProjectDef(name="ctx2")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["m"] = (
        "{{ config(materialized='incremental', incremental_strategy='append') }}"
        "select o_orderkey as id from {{ source('tpch','orders') }}"
        "{% if is_incremental() %} where o_orderkey > "
        "(select max(id) from {{ this }}) {% endif %}"
    )
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    n1 = spark.table(f"{schema}.m").count()
    assert eng.run().ok()  # incremental: {{ this }} resolves, no new rows
    assert spark.table(f"{schema}.m").count() == n1

def test_macro_return_value(eng):
    """{{ return(x) }} short-circuits a macro with a NON-STRING value
    (ref: BaseContext.return_ :347; dbt_utils relies on this)."""
    eng.manifest.macros["give_list"] = (
        "{% macro give_list() %}{{ return([1, 2, 3]) }}{% endmacro %}")
    out = eng.show("select {{ give_list() | length }} as n")
    assert out.collect()[0]["n"] == 3


def test_statement_call_block(eng):
    """{% call statement('q', fetch_result=True) %} runs the SQL and
    stores the result for load_result (ref: core statement macro;
    tests/functional/statements/)."""
    sql = (
        "{% call statement('probe', fetch_result=True) %}"
        "select 41 + 1 as answer"
        "{% endcall %}"
        "{% set r = load_result('probe') %}"
        "select {{ r.rows[0][0] }} as answer"
    )
    out = eng.show(sql)
    assert out.collect()[0]["answer"] == 42


def test_set_strict_and_zip_strict(eng):
    out = eng.show(
        "{% set s = set_strict([1, 2, 2]) %}"
        "{% set z = zip_strict([1, 2], ['a', 'b']) %}"
        "select {{ s | length }} as ns, {{ z | length }} as nz")
    row = out.collect()[0]
    assert row["ns"] == 2 and row["nz"] == 2
