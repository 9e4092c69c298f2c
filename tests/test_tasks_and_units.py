"""Unit-test harness, clone, retry, run-operation, state:modified,
materialized view, contracts, custom materializations, freshness,
on-run hooks (ref: tests/functional/unit_testing/, dbt_clone/,
materialized_view/, constraints/, adapter/hooks/)."""

import datetime as dt

from dbt_core_spark import Engine, ProjectDef
from dbt_core_spark.plans.nodes import ColumnInfo
from dbt_core_spark.sources.freshness import check_freshness
from _slowmark import _mark_slow  # noqa: E402


def base_project(sf_dir):
    p = ProjectDef(name="tk")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["stg"] = (
        "select o_orderkey as id, o_orderstatus as status, o_totalprice as price "
        "from {{ source('tpch','orders') }}"
    )
    return p


# -- unit tests -------------------------------------------------------------

@_mark_slow
def test_unit_test_pass_and_fail(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.models["summary"] = """
        select status, count(*) as n, sum(cast(price as bigint)) as total
        from {{ ref('stg') }} group by status
    """
    p.unit_tests["ut_summary_ok"] = {
        "model": "summary",
        "given": {"stg": [
            {"id": 1, "status": "O", "price": 10.0},
            {"id": 2, "status": "O", "price": 5.0},
            {"id": 3, "status": "F", "price": 1.0},
        ]},
        "expect": [
            {"status": "O", "n": 2, "total": 15},
            {"status": "F", "n": 1, "total": 1},
        ],
    }
    p.unit_tests["ut_summary_bad"] = {
        "model": "summary",
        "given": {"stg": [{"id": 1, "status": "O", "price": 10.0}]},
        "expect": [{"status": "O", "n": 99, "total": 10}],
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = {r.name: r for r in eng.unit_test()}
    assert res["ut_summary_ok"].status == "pass", res["ut_summary_ok"]
    assert res["ut_summary_bad"].status == "fail"
    assert res["ut_summary_bad"].missing_rows  # the n=99 row never appeared


def test_unit_test_mocks_source(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.unit_tests["ut_stg"] = {
        "model": "stg",
        "given": {"tpch.orders": [
            {"o_orderkey": 7, "o_orderstatus": "X", "o_totalprice": 1.5}]},
        "expect": [{"id": 7, "status": "X", "price": 1.5}],
    }
    eng = Engine(spark, p, schema=schema)
    eng.run()
    assert eng.unit_test()[0].status == "pass"


# -- clone ------------------------------------------------------------------

def test_clone_from_state_schema(spark, schema, sf_dir):
    state_schema = f"{schema}_state"
    p = base_project(sf_dir)
    p.model_configs["stg"] = {"materialized": "table"}
    eng_state = Engine(spark, p, schema=state_schema)
    assert eng_state.run().ok()
    eng = Engine(spark, p, schema=schema)
    cloned = eng.clone(state_schema)
    assert cloned == {"model.tk.stg": f"{schema}.stg"}
    assert spark.table(f"{schema}.stg").count() == spark.table(
        f"{state_schema}.stg").count()
    spark.sql(f"drop database if exists {state_schema} cascade")
    spark.sql(f"drop database if exists {state_schema}__sources cascade")


# -- retry ------------------------------------------------------------------

def test_retry_reruns_only_failures(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.models["bad"] = "select no_such_col from {{ ref('stg') }}"
    p.models["child"] = "select * from {{ ref('bad') }}"
    eng = Engine(spark, p, schema=schema)
    r1 = eng.run()
    assert not r1.ok()
    # fix the model, then retry — only bad+child run
    p.models["bad"] = "select id from {{ ref('stg') }}"
    eng2 = Engine(spark, p, schema=schema)
    r2 = eng2.retry(r1)
    assert {x.unique_id.split(".")[-1] for x in r2.results} == {"bad", "child"}
    assert r2.ok(), [x.message for x in r2.results]


# -- run-operation ----------------------------------------------------------

def test_run_operation_macro(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.macros["greet"] = "{% macro greet(name) %}hello {{ name }}{% endmacro %}"
    eng = Engine(spark, p, schema=schema)
    out = eng.run_operation("greet", {"name": "spark"})
    assert "hello spark" in out


# -- state:modified ---------------------------------------------------------

def test_state_modified_selection(spark, schema, sf_dir):
    p_old = base_project(sf_dir)
    p_old.models["mart"] = "select count(*) as n from {{ ref('stg') }}"
    old = Engine(spark, p_old, schema=schema)
    assert old.run().ok()

    p_new = base_project(sf_dir)
    p_new.models["mart"] = "select count(*) as n2 from {{ ref('stg') }}"  # changed
    new = Engine(spark, p_new, schema=schema)
    assert new.modified_vs(old) == {"model.tk.mart"}
    r = new.run_modified(old)
    assert {x.unique_id for x in r.results} == {"model.tk.mart"}
    assert "n2" in spark.table(f"{schema}.mart").columns


# -- materialized view emulation -------------------------------------------

def test_materialized_view_on_configuration_change(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.models["mv"] = (
        "{{ config(materialized='materialized_view', on_configuration_change='continue') }}"
        "select status, count(*) as n from {{ ref('stg') }} group by status"
    )
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    first = spark.table(f"{schema}.mv").count()
    r2 = eng.run()  # continue → not rebuilt, still fine
    assert r2.ok()
    assert spark.table(f"{schema}.mv").count() == first


# -- contracts --------------------------------------------------------------

def test_contract_enforced_pass_and_fail(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.models["contracted"] = (
        "{{ config(materialized='table') }}"
        "select cast(1 as bigint) as id, 'x' as name"
    )
    p.model_configs["contracted"] = {"contract": {"enforced": True}}
    eng = Engine(spark, p, schema=schema)
    node = eng.manifest.nodes["model.tk.contracted"]
    node.columns = {
        "id": ColumnInfo("id", data_type="bigint"),
        "name": ColumnInfo("name", data_type="string"),
    }
    assert eng.run(select="contracted").ok()
    # wrong declared type → ContractError
    node.columns["id"] = ColumnInfo("id", data_type="int")
    r = eng.run(select="contracted")
    assert r.results[0].status == "error"
    assert "contract" in r.results[0].message.lower()


# -- custom materialization -------------------------------------------------

def test_custom_materialization_registry(spark, schema, sf_dir):
    from dbt_core_spark.operators import relations as R
    from dbt_core_spark.operators.materializations import register_materialization

    def materialize_sample(spark_, node, rel, sql):
        df = spark_.sql(sql).limit(5)
        R.write_table(spark_, rel, df)
        return 5

    register_materialization("sample5", materialize_sample)
    p = base_project(sf_dir)
    p.models["sampled"] = (
        "{{ config(materialized='sample5') }} select * from {{ ref('stg') }}"
    )
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    assert spark.table(f"{schema}.sampled").count() == 5


# -- source freshness -------------------------------------------------------

def test_source_freshness_thresholds(spark, schema, sf_dir):
    p = ProjectDef(name="tk")
    p.add_source(
        "ev", "orders", f"{sf_dir}/orders.parquet",
        loaded_at_field="o_orderdate",
        freshness={"warn_after": {"count": 1, "period": "day"}},
    )
    eng = Engine(spark, p, schema=schema)
    res = eng.source_freshness()
    (r,) = res.values()
    assert r.status == "warn"  # 2001-era data is very stale
    assert r.max_loaded_at is not None
    # pinned "now" just after max(loaded_at) → pass
    node = list(eng.manifest.sources.values())[0]
    runner = eng._runner()
    runner._prepare(None, None)
    fresh = check_freshness(
        spark, node, runner.relations[node.unique_id],
        now=dt.datetime(2001, 8, 1, 12, tzinfo=dt.timezone.utc),
    )
    assert fresh.status == "pass"


# -- project-level hooks ----------------------------------------------------

def test_on_run_start_end_hooks(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.on_run_start = [
        f"create table if not exists {schema}.audit (phase string) using parquet",
        f"insert into {schema}.audit values ('start')",
    ]
    p.on_run_end = [f"insert into {schema}.audit values ('end')"]
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    phases = {r["phase"] for r in spark.table(f"{schema}.audit").collect()}
    assert phases == {"start", "end"}


# -- partial parsing / analyses / exposures ---------------------------------

def test_partial_parse_skips_unchanged(spark, schema, sf_dir):
    """ref: parser/partial.py — only changed nodes re-rendered."""
    p = base_project(sf_dir)
    for i in range(20):
        p.models[f"m{i}"] = f"select id + {i} as id from {{{{ ref('stg') }}}}"
    eng = Engine(spark, p, schema=schema)
    assert eng.manifest.reparse_count == 21  # stg + 20
    p.models["m3"] = "select id * 3 as id from {{ ref('stg') }}"
    assert eng.reparse() == 1  # only m3
    assert eng.manifest.nodes["model.tk.m3"].refs == ["stg"]
    # macro change forces full reparse (ref: partial.py special macro handling)
    p.macros["noop"] = "{% macro noop() %}{% endmacro %}"
    assert eng.reparse() == 21


def test_partial_parse_respects_config_change(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.models["m"] = "{{ config(unique_key='id') }} select id from {{ ref('stg') }}"
    eng = Engine(spark, p, schema=schema)
    p.model_configs["m"] = {"materialized": "incremental"}
    eng.project = p
    eng.reparse()
    node = eng.manifest.nodes["model.tk.m"]
    assert node.config["materialized"] == "incremental"  # fresh schema-yml cfg
    assert node.config["unique_key"] == "id"  # cached in-file cfg kept


def test_analyses_compile_only(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.analyses["order_share"] = (
        "select status, count(*) as n from {{ ref('stg') }} group by status")
    eng = Engine(spark, p, schema=schema)
    r = eng.run()
    assert r.ok()
    # analysis never materialized (ref: §1.1 — compile only)
    assert not spark.catalog.tableExists(f"{schema}.order_share")
    compiled = eng.compile_analyses()
    assert "order_share" in compiled
    assert f"{schema}.stg" in compiled["order_share"]
    assert spark.sql(compiled["order_share"]).count() > 0


def test_exposures_and_metrics_listed(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.exposures["weekly_dash"] = {"type": "dashboard", "depends_on": ["ref('stg')"]}
    p.metrics["order_count"] = {"model": "stg", "calculation": "count(*)"}
    eng = Engine(spark, p, schema=schema)
    assert "exposure.tk.weekly_dash" in eng.ls()
    assert eng.ls(resource_type="metric") == ["metric.tk.order_count"]


# -- artifacts --------------------------------------------------------------

def test_artifacts_written(spark, schema, sf_dir, tmp_path):
    import json

    from dbt_core_spark.run.artifacts import (
        write_catalog,
        write_manifest,
        write_run_results,
    )

    p = base_project(sf_dir)
    p.models["mart"] = "{{ config(materialized='table') }} select count(*) as n from {{ ref('stg') }}"
    eng = Engine(spark, p, schema=schema)
    res = eng.run()
    assert res.ok()

    rr = json.load(open(write_run_results(res, str(tmp_path / "run_results.json"))))
    assert {r["unique_id"] for r in rr["results"]} == {
        "model.tk.stg", "model.tk.mart"}
    assert all(r["status"] == "success" for r in rr["results"])

    mf = json.load(open(write_manifest(eng, str(tmp_path / "manifest.json"))))
    assert mf["nodes"]["model.tk.mart"]["depends_on"]["nodes"] == ["model.tk.stg"]
    assert mf["child_map"]["model.tk.stg"] == ["model.tk.mart"]
    assert mf["nodes"]["model.tk.mart"]["config"]["materialized"] == "table"

    cat = json.load(open(write_catalog(eng, str(tmp_path / "catalog.json"))))
    assert "n" in cat["nodes"]["model.tk.mart"]["columns"]


# -- bucketed tables --------------------------------------------------------

def test_bucketed_table_materialization(spark, schema, sf_dir):
    """bucket_by pre-shuffles on the join key: co-bucketed equi-joins
    skip the exchange (SURVEY §4 co-located joins)."""
    p = base_project(sf_dir)
    p.models["b1"] = (
        "{{ config(materialized='table', bucket_by='id', buckets=8) }}"
        "select id, status from {{ ref('stg') }}")
    p.models["b2"] = (
        "{{ config(materialized='table', bucket_by='id', buckets=8) }}"
        "select id, price from {{ ref('stg') }}")
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    desc = spark.sql(f"describe extended {schema}.b1").collect()
    txt = "\n".join(str(r) for r in desc)
    assert "8" in txt and "id" in txt  # Num Buckets: 8, Bucket Columns: [id]
    joined = spark.table(f"{schema}.b1").join(spark.table(f"{schema}.b2"), "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-bucketed join: SortMergeJoin with NO Exchange on either side
    assert "Exchange hashpartitioning" not in plan


# -- custom generic test macros + exclude -----------------------------------

def test_custom_generic_test_macro_block(spark, schema, sf_dir):
    """{% test %} blocks compile to test_<name> macros
    (ref: clients/jinja.py test-block handling)."""
    p = base_project(sf_dir)
    p.macros["my_tests"] = """
        {% test is_positive(model, column_name) %}
        select * from {{ model }} where {{ column_name }} <= 0
        {% endtest %}
    """
    p.tests["positive_price"] = {
        "type": "is_positive", "model": "stg", "column": "price"}
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = eng.test()
    assert res.results[0].status == "pass", res.results[0]


def test_exclude_flag(spark, schema, sf_dir):
    p = base_project(sf_dir)
    p.models["a"] = "select 1 as x from {{ ref('stg') }} limit 1"
    p.models["b"] = "select 2 as x from {{ ref('stg') }} limit 1"
    eng = Engine(spark, p, schema=schema)
    r = eng.run(exclude="b")
    names = {x.unique_id.split(".")[-1] for x in r.results}
    assert "b" not in names and {"stg", "a"} <= names


def test_unit_test_overrides(spark, schema, sf_dir):
    """overrides mock vars, env_vars, and macros for the test compile
    only (ref: UnitTestOverrides unit_test_definition.py:25-43)."""
    import os

    p = base_project(sf_dir)
    p.macros["lims"] = "{% macro hard_limit() %}99{% endmacro %}"
    p.models["ovr"] = (
        "select {{ var('factor', 1) }} as f, "
        "{{ hard_limit() }} as lim, "
        "'{{ env_var('UT_REGION', 'none') }}' as region "
        "from {{ ref('stg') }} limit 1"
    )
    p.unit_tests["ut_ovr"] = {
        "model": "ovr",
        "given": {"stg": [{"id": 1, "status": "O", "price": 1.0}]},
        "expect": [{"f": 7, "lim": 5, "region": "eu"}],
        "overrides": {
            "vars": {"factor": 7},
            "macros": {"hard_limit": 5},
            "env_vars": {"UT_REGION": "eu"},
        },
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = eng.unit_test("ut_ovr")
    assert len(res) == 1
    assert res[0].status == "pass", (res[0].message, res[0].missing_rows,
                                     res[0].unexpected_rows)
    # overrides must not leak out of the test
    assert "UT_REGION" not in os.environ
    assert "hard_limit" in p.macros["lims"]


def test_unit_test_macro_override_with_args(spark, schema, sf_dir):
    """Overriding a macro the model calls WITH arguments must still
    mock the value (stubs absorb any call arity)."""
    p = base_project(sf_dir)
    p.macros["calc"] = (
        "{% macro taxed(amount, rate=0.1) %}({{ amount }} * (1 + {{ rate }}))"
        "{% endmacro %}")
    p.models["ovr2"] = (
        "select {{ taxed('price', rate=0.2) }} as t from {{ ref('stg') }} limit 1")
    p.unit_tests["ut_args"] = {
        "model": "ovr2",
        "given": {"stg": [{"id": 1, "status": "O", "price": 4.0}]},
        "expect": [{"t": 42.0}],
        "overrides": {"macros": {"taxed": 42.0}},
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = eng.unit_test("ut_args")
    assert res[0].status == "pass", res[0].message


def test_unit_test_failure_renders_diff(spark, schema, sf_dir):
    """Failed unit tests report a daff-style aligned diff: '-' for
    expected-but-missing rows, '+' for unexpected rows
    (ref: task/test.py:264-282)."""
    from dbt_core_spark import Engine, ProjectDef

    p = ProjectDef(name="ud")
    p.models["m"] = "select 1 as a, 'x' as b union all select 2, 'y'"
    p.unit_tests["t_bad"] = {
        "model": "m",
        "given": {},
        "expect": [{"a": 1, "b": "x"}, {"a": 3, "b": "z"}],
    }
    eng = Engine(spark, p, schema=schema)
    res = eng.unit_test()
    r = next(x for x in res if x.name == "t_bad")
    assert r.status == "fail"
    lines = r.message.splitlines()
    assert lines[0].startswith("actual differs")
    assert any(l.startswith("| -") and "3" in l and "z" in l for l in lines)
    assert any(l.startswith("| +") and "2" in l and "y" in l for l in lines)
    # matched row appears unmarked
    assert any(l.startswith("|  ") and "x" in l for l in lines)


def test_exposure_graph_selection(spark, schema, sf_dir):
    """Exposures are graph terminals: exposure:<name> selects them,
    +exposure:<name> pulls their upstream models, and they never
    execute (ref: ExposureSelectorMethod)."""
    from dbt_core_spark import Engine, ProjectDef

    p = ProjectDef(name="exp")
    p.models["base"] = "select 1 as x"
    p.models["mart"] = "select * from {{ ref('base') }}"
    p.models["unrelated"] = "select 2 as y"
    p.exposures["dash"] = {"type": "dashboard", "depends_on": ["ref('mart')"]}
    eng = Engine(spark, p, schema=schema)
    assert eng.ls(select="exposure:dash") == ["exposure.exp.dash"]
    assert set(eng.ls(select="+exposure:dash")) == {
        "exposure.exp.dash", "model.exp.mart", "model.exp.base"}
    res = eng.run()  # exposures are not executable
    assert res.ok()
    assert {r.unique_id for r in res.results} == {
        "model.exp.base", "model.exp.mart", "model.exp.unrelated"}


@_mark_slow
def test_unit_tests_in_dag(spark, schema, sf_dir):
    """Unit tests are graph nodes (dbt 1.8 semantics): they run during
    test(), ride along with their model via indirect selection, and in
    build() a FAILING unit test blocks the model from building."""
    p = base_project(sf_dir)
    p.models["doubler"] = "select id * 2 as dbl from {{ ref('stg') }}"
    p.unit_tests["ut_doubler_ok"] = {
        "model": "doubler",
        "given": {"stg": [{"id": 2}, {"id": 5}]},
        "expect": [{"dbl": 4}, {"dbl": 10}],
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = eng.test()
    by_id = {r.unique_id: r for r in res.results}
    assert by_id["unit_test.tk.ut_doubler_ok"].status == "pass"
    # unit_test: selector + test_type:unit
    assert eng.ls(select="unit_test:ut_doubler_ok") == [
        "unit_test.tk.ut_doubler_ok"]
    assert "unit_test.tk.ut_doubler_ok" in eng.ls(select="test_type:unit")
    # indirect selection: selecting the model pulls its unit test
    res2 = eng.test(select="doubler")
    assert "unit_test.tk.ut_doubler_ok" in {r.unique_id for r in res2.results}

    # failing unit test blocks the model in build()
    p2 = base_project(sf_dir)
    p2.models["doubler"] = "select id * 2 as dbl from {{ ref('stg') }}"
    p2.unit_tests["ut_doubler_bad"] = {
        "model": "doubler",
        "given": {"stg": [{"id": 2}]},
        "expect": [{"dbl": 5}],  # wrong on purpose
    }
    eng2 = Engine(spark, p2, schema=schema + "_b")
    bres = eng2.build(select="doubler")
    assert not bres.ok()
    by_id2 = {r.unique_id: r for r in bres.results}
    assert by_id2["unit_test.tk.ut_doubler_bad"].status == "fail"
    assert by_id2["model.tk.doubler"].status == "skipped"


def test_materialized_view_config_change_modes(spark, schema, sf_dir):
    """on_configuration_change gates DEFINITION drift, not refresh
    (ref: OnConfigurationChange v1/config.py:110-112,
    tests/functional/adapter/materialized_view/): unchanged always
    refreshes; changed -> apply rebuilds / continue keeps / fail errors."""
    import pytest

    p = base_project(sf_dir)
    p.models["mv2"] = (
        "{{ config(materialized='materialized_view') }}"
        "select status, count(*) as n from {{ ref('stg') }} group by status"
    )
    eng = Engine(spark, p, schema=schema)
    assert eng.run(select="+mv2").ok()
    assert "n" in spark.table(f"{schema}.mv2").columns

    # changed definition + continue -> old definition kept
    p.models["mv2"] = (
        "{{ config(materialized='materialized_view', on_configuration_change='continue') }}"
        "select status, count(*) as n2 from {{ ref('stg') }} group by status"
    )
    eng2 = Engine(spark, p, schema=schema)
    assert eng2.run(select="+mv2").ok()
    assert "n" in spark.table(f"{schema}.mv2").columns  # NOT rebuilt

    # changed + fail -> error status
    p.models["mv2"] = p.models["mv2"].replace("'continue'", "'fail'")
    eng3 = Engine(spark, p, schema=schema)
    r = eng3.run(select="+mv2")
    mv_res = r.by_id["model.tk.mv2"]
    assert mv_res.status == "error"
    assert "on_configuration_change" in mv_res.message

    # changed + apply (default) -> rebuilt with the new definition
    p.models["mv2"] = (
        "{{ config(materialized='materialized_view') }}"
        "select status, count(*) as n2 from {{ ref('stg') }} group by status"
    )
    eng4 = Engine(spark, p, schema=schema)
    assert eng4.run(select="+mv2").ok()
    assert "n2" in spark.table(f"{schema}.mv2").columns
