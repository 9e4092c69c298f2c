"""SparkbtRunner.invoke — dbtRunner analog (ref: cli/main.py:41-97)."""

import os

from dbt_core_spark import ProjectDef, SparkbtRunner


def _proj(sf_dir):
    p = ProjectDef(name="cli")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["stg"] = (
        "select o_orderkey as id, o_orderstatus as status "
        "from {{ source('tpch','orders') }} limit {{ var('lim', 10) }}"
    )
    p.models["agg"] = (
        "{{ config(materialized='table') }}"
        "select status, count(*) as n from {{ ref('stg') }} group by status"
    )
    p.tests["not_null_agg_status"] = {
        "type": "not_null", "model": "agg", "column": "status"}
    return p


def test_invoke_run_test_ls(spark, schema, sf_dir):
    r = SparkbtRunner(spark=spark, project=_proj(sf_dir), schema=schema)
    res = r.invoke(["run"])
    assert res.success and res.result.ok()
    assert {x.unique_id for x in res.result.results} == {
        "model.cli.stg", "model.cli.agg"}
    assert r.invoke(["test"]).success
    ls = r.invoke(["ls", "--resource-type", "model"])
    assert ls.success and ls.result == ["model.cli.agg", "model.cli.stg"]


def test_invoke_select_vars_show(spark, schema, sf_dir):
    r = SparkbtRunner(spark=spark, project=_proj(sf_dir), schema=schema)
    res = r.invoke(["run", "-s", "stg", "--vars", '{"lim": 3}'])
    assert res.success
    assert [x.unique_id for x in res.result.results] == ["model.cli.stg"]
    assert spark.table(f"{schema}.stg").count() == 3
    shown = r.invoke(["show", "--inline",
                      "select count(*) as c from {{ ref('stg') }}"])
    assert shown.success and shown.result.collect()[0].c == 3


def test_invoke_errors_are_wrapped(spark, schema, sf_dir):
    r = SparkbtRunner(spark=spark, project=_proj(sf_dir), schema=schema)
    bad = r.invoke(["frobnicate"])
    assert not bad.success and isinstance(bad.exception, ValueError)
    res = r.invoke(["run-operation", "missing_macro"])
    assert not res.success and res.exception is not None


def test_invoke_parse_deps_docs(spark, schema, sf_dir):
    p = _proj(sf_dir)
    pkg = ProjectDef(name="pkg1")
    pkg.macros["m"] = "{% macro shout(x) %}{{ x }}!{% endmacro %}"
    p.add_package(pkg)
    r = SparkbtRunner(spark=spark, project=p, schema=schema)
    parsed = r.invoke(["parse"])
    assert parsed.success and parsed.result["nodes"] == 3
    deps = r.invoke(["deps"])
    assert deps.success and "pkg1" in deps.result
    assert r.invoke(["run"]).success
    docs = r.invoke(["docs", "generate"])
    assert docs.success and "nodes" in docs.result


def test_invoke_vars_do_not_leak(spark, schema, sf_dir):
    """--vars apply per invocation (the reference's flag scoping)."""
    r = SparkbtRunner(spark=spark, project=_proj(sf_dir), schema=schema)
    assert r.invoke(["run", "-s", "stg", "--vars", '{"lim": 3}']).success
    assert spark.table(f"{schema}.stg").count() == 3
    assert r.invoke(["run", "-s", "stg"]).success  # default lim=10 again
    assert spark.table(f"{schema}.stg").count() == 10
    bad = r.invoke(["run", "-s"])  # malformed argv stays in the envelope
    assert not bad.success and bad.exception is not None


def test_show_select_and_ls_outputs(spark, schema, sf_dir):
    """dbt show --select <model> previews the relation; ls --output
    name/path/json format variants (ref: ShowTask, task/list.py)."""
    r = SparkbtRunner(spark=spark, project=_proj(sf_dir), schema=schema)
    assert r.invoke(["run"]).success
    shown = r.invoke(["show", "--select", "agg", "--limit", "2"])
    assert shown.success and shown.result.count() <= 2
    names = r.invoke(["ls", "--output", "name", "--resource-type", "model"])
    assert names.success and names.result == ["agg", "stg"]
    js = r.invoke(["ls", "--output", "json", "--select", "agg"])
    assert js.success
    assert js.result[0]["unique_id"] == "model.cli.agg"
    assert js.result[0]["depends_on"]["nodes"] == ["model.cli.stg"]


def test_retry_verb(tmp_path, spark, schema, sf_dir):
    """`retry --state <dir>` re-runs only errored/skipped nodes
    (ref: task/retry.py)."""
    from dbt_core_spark import Engine, ProjectDef, SparkbtRunner
    from dbt_core_spark.run.artifacts import write_run_results

    p = ProjectDef(name="rt")
    p.models["good"] = "select 1 as x"
    p.models["bad"] = "select * from nonexistent_relation_xyz"
    eng = Engine(spark, p, schema=schema)
    res = eng.run()
    assert not res.ok()
    target = str(tmp_path / "target")
    write_run_results(res, target + "/run_results.json")

    # fix the model, retry from the artifact: only 'bad' re-runs
    p.models["bad"] = "select 2 as x"
    eng2 = Engine(spark, p, schema=schema)
    rr = SparkbtRunner(eng2).invoke(["retry", "--state", target])
    assert rr.success, rr.exception
    ran = {r.unique_id for r in rr.result.results if r.status == "success"}
    assert ran == {"model.rt.bad"}


def test_run_query_row_cap(spark, schema, sf_dir):
    """run_query() errors past the driver-collect cap instead of OOMing."""
    import pytest as _pytest

    from dbt_core_spark import Engine, ProjectDef
    from dbt_core_spark.exceptions import ExecutionError
    from dbt_core_spark.functions.context import RenderContext

    p = ProjectDef(name="cap")
    p.models["m"] = "select 1 as x"
    eng = Engine(spark, p, schema=schema)
    ctx = RenderContext(eng.manifest, eng.manifest.nodes["model.cap.m"],
                        mode="runtime", spark=spark)
    small = ctx.run_query("select id from range(10)")
    assert len(small.rows) == 10
    with _pytest.raises(ExecutionError, match="more than"):
        ctx.run_query("select id from range(20000)")


def test_cli_state_modified_defer(tmp_path, spark, schema, sf_dir):
    """Slim CI via CLI: run --select state:modified+ --state <dir> --defer
    (ref: cli/main.py state flags; selector_methods.py:610)."""
    from dbt_core_spark import Engine, ProjectDef, SparkbtRunner
    from dbt_core_spark.run.artifacts import write_manifest

    p = ProjectDef(name="ci")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["stg"] = "select o_orderkey as id from {{ source('tpch','orders') }} limit 5"
    p.models["mart"] = "select * from {{ ref('stg') }}"
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    target = str(tmp_path / "target")
    write_manifest(eng, os.path.join(target, "manifest.json"))

    p2 = ProjectDef(name="ci")
    p2.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p2.models["stg"] = p.models["stg"]
    p2.models["mart"] = "select id, id * 2 as id2 from {{ ref('stg') }}"  # changed
    eng2 = Engine(spark, p2, schema=schema)
    rr = SparkbtRunner(eng2).invoke(
        ["run", "--select", "state:modified", "--state", target, "--defer"])
    assert rr.success, rr.exception
    assert {r.unique_id for r in rr.result.results} == {"model.ci.mart"}
    assert "id2" in spark.table(f"{schema}.mart").columns


def test_clean_verb(tmp_path, spark, schema, sf_dir):
    """dbt clean removes target/ and dbt_packages/ under project_root."""
    import os

    from dbt_core_spark import Engine, ProjectDef
    from dbt_core_spark.run.cli import SparkbtRunner

    root = str(tmp_path / "cp")
    os.makedirs(os.path.join(root, "target"))
    os.makedirs(os.path.join(root, "dbt_packages"))
    p = ProjectDef(name="cp", project_root=root)
    p.models["m"] = "select 1 as x"
    eng = Engine(spark, p, schema=schema)
    r = SparkbtRunner(engine=eng).invoke(["clean"])
    assert r.success and len(r.result["removed"]) == 2
    assert not os.path.exists(os.path.join(root, "target"))
    assert not os.path.exists(os.path.join(root, "dbt_packages"))


def test_init_scaffolds_runnable_project(tmp_path, spark, schema):
    """`init` writes the starter layout (ref: task/init.py +
    include/starter_project/) and the result parses AND runs."""
    import pytest

    from dbt_core_spark import Engine, ProjectDef
    from dbt_core_spark.run.cli import SparkbtRunner

    root = str(tmp_path / "starter")
    eng0 = Engine(spark, ProjectDef(name="bootstrap"), schema=schema)
    r = SparkbtRunner(engine=eng0).invoke(
        ["init", "starter_proj", "--project-dir", root])
    assert r.success, r.exception
    assert set(r.result["files"]) >= {
        f"{root}/dbt_project.yml",
        f"{root}/models/example/my_first_dbt_model.sql",
        f"{root}/models/example/schema.yml",
    }
    eng = Engine(spark, ProjectDef.from_dir(root), schema=schema)
    res = eng.run()
    assert res.ok(), [x.message for x in res.results]
    assert eng.table("my_second_dbt_model").count() == 1
    # refuses to clobber an existing project
    r2 = SparkbtRunner(engine=eng0).invoke(
        ["init", "starter_proj", "--project-dir", root])
    assert not r2.success and isinstance(r2.exception, FileExistsError)


def test_debug_checks(spark, schema):
    from dbt_core_spark import Engine, ProjectDef
    from dbt_core_spark.run.cli import SparkbtRunner

    p = ProjectDef(name="dbg")
    p.models["m"] = "select 1 as x"
    r = SparkbtRunner(engine=Engine(spark, p, schema=schema)).invoke(["debug"])
    assert r.success
    assert r.result == {"connection_ok": True, "project_ok": True, "dag_ok": True}


def test_docs_serve_writes_static_artifacts(tmp_path, spark, schema):
    import json as _json
    import os

    from dbt_core_spark import Engine, ProjectDef
    from dbt_core_spark.run.cli import SparkbtRunner

    root = str(tmp_path / "dsrv")
    os.makedirs(os.path.join(root, "models"))
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write("name: dsrv\n")
    with open(os.path.join(root, "models", "m.sql"), "w") as f:
        f.write("select 1 as x")
    eng = Engine(spark, ProjectDef.from_dir(root), schema=schema)
    assert eng.run().ok()
    r = SparkbtRunner(engine=eng).invoke(["docs", "serve"])
    assert r.success
    cat = _json.load(open(os.path.join(r.result["path"], "catalog.json")))
    assert "nodes" in cat
    assert os.path.exists(os.path.join(r.result["path"], "manifest.json"))
    html = open(os.path.join(r.result["path"], "index.html")).read()
    assert "manifest.json" in html and "catalog.json" in html  # self-contained viewer
