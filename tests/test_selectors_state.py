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
