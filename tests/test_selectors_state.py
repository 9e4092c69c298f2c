"""Named YAML selectors (ref: selectors.yml; graph/cli.py:27-151 set
ops; selector_spec dict form) and --state artifacts round-trip
(ref: state manifest loading, selector_methods.py:610-790).
"""

import os
import textwrap

import pytest

from dbt_core_spark import Engine, ProjectDef


def _proj(sf_dir):
    p = ProjectDef(name="sel")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["stg_a"] = "select o_orderkey as id from {{ source('tpch','orders') }} limit 5"
    p.models["stg_b"] = "select o_custkey as cid from {{ source('tpch','orders') }} limit 5"
    p.models["mart"] = "select * from {{ ref('stg_a') }}"
    p.model_configs["stg_a"] = {"tags": ["staging"]}
    p.model_configs["stg_b"] = {"tags": ["staging", "slow"]}
    return p


def test_selector_string_definition(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.selectors["staging_only"] = "tag:staging"
    eng = Engine(spark, p, schema=schema)
    uids = eng.resolve_selector("staging_only")
    assert uids == {"model.sel.stg_a", "model.sel.stg_b"}
    assert eng.ls(selector="staging_only") == sorted(uids)


def test_selector_union_intersection_exclude(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.selectors["picked"] = {
        "union": ["tag:staging", "mart", {"exclude": ["tag:slow"]}],
    }
    p.selectors["both_tags"] = {
        "intersection": ["tag:staging", "tag:slow"],
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.resolve_selector("picked") == {"model.sel.stg_a", "model.sel.mart"}
    assert eng.resolve_selector("both_tags") == {"model.sel.stg_b"}


def test_selector_method_dict_with_children(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.selectors["a_plus"] = {
        "method": "fqn", "value": "stg_a", "children": True,
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.resolve_selector("a_plus") == {"model.sel.stg_a", "model.sel.mart"}


def test_selector_drives_run(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.selectors["just_a"] = "stg_a"
    eng = Engine(spark, p, schema=schema)
    res = eng.run(selector="just_a")
    assert res.ok()
    assert {r.unique_id for r in res.results} == {"model.sel.stg_a"}


def test_selector_from_dir(tmp_path, spark, schema, sf_dir):
    root = str(tmp_path / "selproj")
    os.makedirs(os.path.join(root, "models"))
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write("name: selproj\n")
    with open(os.path.join(root, "selectors.yml"), "w") as f:
        f.write(textwrap.dedent("""
            selectors:
              - name: nightly
                definition:
                  union:
                    - m1
                    - m2
        """))
    with open(os.path.join(root, "models", "m1.sql"), "w") as f:
        f.write("select 1 as x")
    with open(os.path.join(root, "models", "m2.sql"), "w") as f:
        f.write("select 2 as x")
    p = ProjectDef.from_dir(root)
    assert "nightly" in p.selectors
    eng = Engine(spark, p, schema=schema)
    assert eng.resolve_selector("nightly") == {"model.selproj.m1", "model.selproj.m2"}


def test_unknown_selector_raises(spark, schema, sf_dir):
    eng = Engine(spark, _proj(sf_dir), schema=schema)
    with pytest.raises(KeyError, match="selector 'nope'"):
        eng.resolve_selector("nope")


def test_state_manifest_roundtrip(tmp_path, spark, schema, sf_dir):
    """write_manifest → load_state_manifest → modified_vs: unchanged
    project reports no modifications; an edited model + a config change
    are both detected; run_modified defers to existing relations."""
    from dbt_core_spark.run.artifacts import load_state_manifest, write_manifest

    p = _proj(sf_dir)
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    state_path = str(tmp_path / "target")
    write_manifest(eng, os.path.join(state_path, "manifest.json"))

    # unchanged → nothing modified
    eng2 = Engine(spark, _proj(sf_dir), schema=schema)
    assert eng2.modified_vs(state_path) == set()

    # body change + config change → detected from the on-disk state
    p3 = _proj(sf_dir)
    p3.models["stg_a"] = "select o_orderkey + 1 as id from {{ source('tpch','orders') }} limit 5"
    p3.model_configs["stg_b"] = {"tags": ["staging", "slow"], "materialized": "table"}
    eng3 = Engine(spark, p3, schema=schema)
    mods = eng3.modified_vs(state_path)
    assert mods == {"model.sel.stg_a", "model.sel.stg_b"}

    res = eng3.run_modified(state_path)
    assert res.ok()
    assert {r.unique_id for r in res.results} == mods
    loaded = load_state_manifest(state_path)
    assert loaded.nodes["model.sel.mart"].relation_name == f"{schema}.mart"


def test_selector_exclude_position_independent(spark, schema, sf_dir):
    """exclude entries subtract from the FINAL union, wherever they
    appear in the list (dbt set-op semantics)."""
    p = _proj(sf_dir)
    p.selectors["excl_first"] = {
        "union": [{"exclude": ["tag:slow"]}, "tag:staging", "mart"],
    }
    eng = Engine(spark, p, schema=schema)
    assert eng.resolve_selector("excl_first") == {
        "model.sel.stg_a", "model.sel.mart"}


def test_select_plus_selector_conflict(spark, schema, sf_dir):
    p = _proj(sf_dir)
    p.selectors["s1"] = "stg_a"
    eng = Engine(spark, p, schema=schema)
    with pytest.raises(ValueError, match="combine"):
        eng.run(select="stg_b", selector="s1")


def test_state_modified_submethods(tmp_path, spark, schema, sf_dir):
    """state:modified.body/.configs/.contract/.relation/.macros select
    exactly the nodes changed on THAT dimension across a manifest.json
    round-trip (ref: selector_methods.py:610-790)."""
    from dbt_core_spark.run.artifacts import write_manifest

    p = _proj(sf_dir)
    p.macros["greet"] = "{% macro greet() %}select 1{% endmacro %}"
    p.models["uses_macro"] = "{{ greet() }}"
    p.model_columns["mart"] = [{"name": "id", "data_type": "bigint"}]
    eng = Engine(spark, p, schema=schema)
    state_path = str(tmp_path / "target")
    write_manifest(eng, os.path.join(state_path, "manifest.json"))

    p2 = _proj(sf_dir)
    p2.macros["greet"] = "{% macro greet() %}select 2{% endmacro %}"   # macro changed
    p2.models["uses_macro"] = "{{ greet() }}"
    p2.models["stg_a"] = "select o_orderkey as id from {{ source('tpch','orders') }} limit 9"  # body
    p2.model_configs["stg_b"] = {"tags": ["staging", "slow"], "materialized": "table"}  # configs
    p2.model_configs["mart"] = {"alias": "mart_v2"}                    # relation... via alias
    p2.model_columns["mart"] = [{"name": "id", "data_type": "string"}] # contract
    eng2 = Engine(spark, p2, schema=schema).set_state(state_path)

    def sel(v):
        return {u.split(".")[-1] for u in eng2.ls(select=f"state:{v}")}

    assert sel("modified.body") == {"stg_a"}
    assert sel("modified.configs") >= {"stg_b", "mart"}  # alias config also differs
    assert sel("modified.contract") == {"mart"}
    assert sel("modified.macros") == {"uses_macro"}
    assert "mart" in sel("modified.relation")
    assert sel("modified") >= {"stg_a", "stg_b", "mart", "uses_macro"}
    assert sel("unmodified") == {"uses_macro", "stg_a", "stg_b", "mart"} - sel("modified")
    assert sel("new") == set()
    # state selector without set_state errors clearly
    eng3 = Engine(spark, _proj(sf_dir), schema=schema)
    with pytest.raises(ValueError, match="state"):
        eng3.ls(select="state:modified")


def test_result_selector(tmp_path, spark, schema, sf_dir):
    """result:<status> re-selects by previous run_results.json statuses
    (ref: ResultSelectorMethod selector_methods.py:811)."""
    from dbt_core_spark.run.artifacts import write_run_results

    p = _proj(sf_dir)
    p.models["bad"] = "select * from {{ source('tpch','orders') }} where no_such_col = 1"
    eng = Engine(spark, p, schema=schema)
    res = eng.run()
    assert not res.ok()
    rr_path = str(tmp_path / "run_results.json")
    write_run_results(res, rr_path)

    eng2 = Engine(spark, p, schema=schema).set_state(results=rr_path)
    errs = eng2.ls(select="result:error")
    assert errs == ["model.sel.bad"]
    ok = set(eng2.ls(select="result:success"))
    assert "model.sel.stg_a" in ok and "model.sel.bad" not in ok


def test_favor_state_defer(tmp_path, spark, schema, sf_dir):
    """--defer --favor-state: unselected upstream refs resolve to the
    STATE environment's relations even though a local relation exists
    (ref: providers.py:594)."""
    from dbt_core_spark.run.artifacts import write_manifest

    # "prod" build in a separate schema
    prod_schema = schema + "_prod"
    p = _proj(sf_dir)
    prod = Engine(spark, p, schema=prod_schema)
    assert prod.run().ok()
    state_path = str(tmp_path / "prod_target")
    write_manifest(prod, os.path.join(state_path, "manifest.json"))

    # dev: local build exists too, then mart changes; favor_state must
    # read stg_a from PROD, not the local schema
    dev = Engine(spark, p, schema=schema)
    assert dev.run().ok()
    # poison the local stg_a so reading it would be detectable
    spark.sql(f"drop view if exists {schema}.stg_a")
    spark.sql(f"create view {schema}.stg_a as select cast(-1 as bigint) as id")
    p3 = _proj(sf_dir)
    p3.models["mart"] = "select * from {{ ref('stg_a') }} where id >= 0"
    dev3 = Engine(spark, p3, schema=schema)
    res = dev3.run_modified(state_path, favor_state=True)
    assert res.ok(), [r.message for r in res.results]
    assert {r.unique_id for r in res.results} == {"model.sel.mart"}
    assert spark.table(f"{schema}.mart").count() == 5  # prod rows, not poisoned
    # without favor_state the poisoned local relation wins → 0 rows
    dev4 = Engine(spark, p3, schema=schema)
    res4 = dev4.run_modified(state_path, favor_state=False)
    assert res4.ok()
    assert spark.table(f"{schema}.mart").count() == 0
    spark.sql(f"DROP DATABASE IF EXISTS {prod_schema} CASCADE")
    spark.sql(f"DROP DATABASE IF EXISTS {prod_schema}__sources CASCADE")


def test_source_status_fresher(tmp_path, spark, schema, sf_dir):
    """source_status:fresher selects sources whose max_loaded_at advanced
    vs the previous sources.json (ref: selector_methods.py:823)."""
    from dbt_core_spark.run.artifacts import load_sources, write_sources

    p = ProjectDef(name="sel")
    p.add_source("ev", "orders", f"{sf_dir}/orders.parquet",
                 loaded_at_field="cast(o_orderdate as timestamp)")
    p.models["m"] = "select * from {{ source('ev','orders') }} limit 5"
    eng = Engine(spark, p, schema=schema)
    fresh = eng.source_freshness()
    uid = "source.sel.ev.orders"
    assert uid in fresh and fresh[uid].max_loaded_at is not None
    src_path = str(tmp_path / "sources.json")
    write_sources(fresh, src_path)

    # same data → nothing fresher
    eng2 = Engine(spark, p, schema=schema).set_state(sources=src_path)
    assert eng2.ls(select="source_status:fresher") == []

    # previous artifact older than current data → source + children selected
    stale = {uid: "2000-01-01T00:00:00"}
    eng3 = Engine(spark, p, schema=schema).set_state(sources=stale)
    assert eng3.ls(select="source_status:fresher") == [uid]
    assert set(eng3.ls(select="source_status:fresher+")) == {uid, "model.sel.m"}
    assert load_sources(src_path)[uid] == fresh[uid].max_loaded_at.isoformat()


def test_generic_config_selector(spark, schema, sf_dir):
    """config.<key>:<value> matches any config key; list values match on
    containment (ref: ConfigSelectorMethod)."""
    p = _proj(sf_dir)
    p.model_configs["stg_a"] = {"tags": ["staging"], "meta_owner": "core"}
    eng = Engine(spark, p, schema=schema)
    assert eng.ls(select="config.meta_owner:core") == ["model.sel.stg_a"]
    assert set(eng.ls(select="config.tags:staging")) == {
        "model.sel.stg_a", "model.sel.stg_b"}
    assert eng.ls(select="config.materialized:table") == []


# -- indirect test selection (ref: graph/selector.py expand_selection;
#    tests/functional/schema_tests/ indirect selection cases) ------------


def _ind_proj(sf_dir):
    p = ProjectDef(name="ind")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["base"] = (
        "select o_orderkey as id from {{ source('tpch','orders') }} limit 5")
    p.models["child"] = "select id from {{ ref('base') }}"
    p.model_columns["base"] = [{"name": "id", "tests": ["unique"]}]
    # two-parent test: child.id ⊆ base.id
    p.tests["rel_child_base"] = {
        "type": "relationships", "model": "child", "column": "id",
        "to": "ref('base')", "field": "id"}
    return p


def _test_names(res):
    return {r.unique_id.split(".")[-1] for r in res.results}


@pytest.mark.parametrize("mode,base_sel,expect", [
    # select base: unique_base rides along in every non-empty mode; the
    # two-parent relationship test needs child too (eager only)
    ("eager", "base", {"unique_base_id", "rel_child_base"}),
    ("cautious", "base", {"unique_base_id"}),
    ("empty", "base", set()),
    # select child: buildable accepts rel (base is an ancestor of child),
    # cautious still refuses
    ("cautious", "child", set()),
    # buildable: base is an ancestor of child, so BOTH tests' parents
    # fall inside selected ∪ ancestors(selected)
    ("buildable", "child", {"rel_child_base", "unique_base_id"}),
])
def test_indirect_selection_modes(spark, schema, sf_dir, mode, base_sel, expect):
    p = _ind_proj(sf_dir)
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = eng.test(select=base_sel, indirect_selection=mode)
    assert _test_names(res) == expect


def test_indirect_selection_direct_name_always_selected(spark, schema, sf_dir):
    """empty mode still runs a test selected BY NAME."""
    p = _ind_proj(sf_dir)
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = eng.test(select="rel_child_base", indirect_selection="empty")
    assert _test_names(res) == {"rel_child_base"}


def test_indirect_selection_cli_flag(spark, schema, sf_dir):
    from dbt_core_spark.run.cli import SparkbtRunner

    p = _ind_proj(sf_dir)
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    r = SparkbtRunner(engine=eng).invoke(
        ["test", "--select", "base", "--indirect-selection", "cautious"])
    assert r.success
    assert _test_names(r.result) == {"unique_base_id"}


def test_metric_nodes_and_selector(spark, schema, sf_dir):
    """Metrics join the graph as terminal nodes: metric: selects them,
    +metric:name walks to the models the metric reads (ref:
    MetricSelectorMethod; metric calculation stays external like the
    reference's semantic layer)."""
    p = _proj(sf_dir)
    p.metrics["total_orders"] = {
        "label": "Total orders", "calculation_method": "count",
        "model": "ref('mart')", "expression": "id"}
    eng = Engine(spark, p, schema=schema)
    uids = set(eng.ls(select="metric:total_orders"))
    assert uids == {"metric.sel.total_orders"}
    up = set(eng.ls(select="+metric:total_orders"))
    assert "model.sel.mart" in up and "model.sel.stg_a" in up
    # metric nodes are never executed
    assert eng.run().ok()
    assert all(not r.unique_id.startswith("metric.") for r in eng.run().results)


def test_semantic_model_and_saved_query_selectors(spark, schema, sf_dir):
    """Semantic-layer metadata nodes (ref: SemanticModelSelectorMethod
    selector_methods.py:380, SavedQuerySelectorMethod :405): a semantic
    model reads a model; a saved query packages metrics.  Both join the
    graph for selection and upstream walks; neither ever executes —
    calculation stays external (MetricFlow), like the reference."""
    p = _proj(sf_dir)
    p.metrics["total_orders"] = {
        "label": "Total orders", "calculation_method": "count",
        "model": "ref('mart')", "expression": "id"}
    p.semantic_models["orders_sm"] = {
        "model": "ref('mart')",
        "dimensions": [{"name": "segment", "type": "categorical"}]}
    p.saved_queries["weekly_orders"] = {
        "metrics": ["total_orders"],
        "group_by": ["segment"]}
    eng = Engine(spark, p, schema=schema)

    assert set(eng.ls(select="semantic_model:orders_sm")) == {
        "semantic_model.sel.orders_sm"}
    assert set(eng.ls(select="saved_query:weekly_orders")) == {
        "saved_query.sel.weekly_orders"}
    # upstream walks: semantic model -> its model; saved query ->
    # its metrics -> their models
    up = set(eng.ls(select="+semantic_model:orders_sm"))
    assert "model.sel.mart" in up and "model.sel.stg_a" in up
    upq = set(eng.ls(select="+saved_query:weekly_orders"))
    assert "metric.sel.total_orders" in upq and "model.sel.mart" in upq
    # never executed
    assert eng.run().ok()
    assert all(not r.unique_id.startswith(("semantic_model.", "saved_query."))
               for r in eng.run().results)
    # reparse keeps the metric-typed deps (no ref() syntax for metrics)
    eng.reparse()
    assert set(eng.ls(select="+saved_query:weekly_orders")) == upq
