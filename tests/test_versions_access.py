"""Model versions (ref: nodes.py:490-491, tests/functional/model_versions/)
and groups + access enforcement (ref: tests/functional/access/)."""

import warnings

import pytest

from dbt_core_spark import Engine, ProjectDef
from dbt_core_spark.exceptions import ParsingError


def _vproj(sf_dir):
    p = ProjectDef(name="vp")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["base"] = "select o_orderkey as id, o_totalprice as amt from {{ source('tpch','orders') }} limit 10"
    p.models["fct"] = "select id, amt from {{ ref('base') }}"
    p.models["fct_v2"] = "select id, amt, amt * 2 as amt2 from {{ ref('base') }}"
    p.model_versions["fct"] = {
        "latest_version": 2,
        "versions": [{"v": 1}, {"v": 2}],
    }
    p.models["uses_latest"] = "select * from {{ ref('fct') }}"
    p.models["uses_v1"] = "select * from {{ ref('fct', v=1) }}"
    return p


def test_versioned_model_resolution(spark, schema, sf_dir):
    eng = Engine(spark, _vproj(sf_dir), schema=schema)
    m = eng.manifest
    assert "model.vp.fct.v1" in m.nodes and "model.vp.fct.v2" in m.nodes
    assert m.nodes["model.vp.fct.v1"].identifier == "fct_v1"
    assert m.nodes["model.vp.fct.v2"].identifier == "fct_v2"
    # unpinned ref resolves to latest (v2); pinned to v1
    assert m.nodes["model.vp.uses_latest"].depends_on == ["model.vp.fct.v2"]
    assert m.nodes["model.vp.uses_v1"].depends_on == ["model.vp.fct.v1"]
    res = eng.run()
    assert res.ok(), [r.message for r in res.results]
    # latest has the amt2 column, v1 does not
    assert "amt2" in spark.table(f"{schema}.uses_latest").columns
    assert "amt2" not in spark.table(f"{schema}.uses_v1").columns
    assert spark.table(f"{schema}.fct_v1").count() == 10


def test_version_selector(spark, schema, sf_dir):
    eng = Engine(spark, _vproj(sf_dir), schema=schema)
    assert eng.ls(select="version:latest") == ["model.vp.fct.v2"]
    assert eng.ls(select="version:old") == ["model.vp.fct.v1"]
    assert set(eng.ls(select="version:none")) == {
        "model.vp.base", "model.vp.uses_latest", "model.vp.uses_v1"}
    assert eng.ls(select="version:prerelease") == []


def test_prerelease_unpinned_warning(spark, schema, sf_dir):
    p = _vproj(sf_dir)
    p.models["fct_v3"] = "select id from {{ ref('base') }}"
    p.model_versions["fct"] = {
        "latest_version": 2,
        "versions": [{"v": 1}, {"v": 2}, {"v": 3}],  # v3 = prerelease
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng = Engine(spark, p, schema=schema)
        assert eng.ls(select="version:prerelease") == ["model.vp.fct.v3"]
        assert any("unpinned ref('fct')" in str(x.message) for x in w)
    # bare ref still resolves to latest (v2), not the prerelease
    assert eng.manifest.nodes["model.vp.uses_latest"].depends_on == ["model.vp.fct.v2"]


def test_group_access_enforcement(spark, schema, sf_dir):
    p = ProjectDef(name="gp")
    p.groups["finance"] = {"owner": {"name": "fin-team"}}
    p.models["core"] = "select 1 as x"
    p.model_configs["core"] = {"group": "finance", "access": "private"}
    p.models["same_group"] = "select * from {{ ref('core') }}"
    p.model_configs["same_group"] = {"group": "finance"}
    eng = Engine(spark, p, schema=schema)  # same-group ref OK
    assert eng.ls(select="group:finance") == ["model.gp.core", "model.gp.same_group"]
    assert eng.ls(select="access:private") == ["model.gp.core"]

    p.models["outsider"] = "select * from {{ ref('core') }}"
    with pytest.raises(ParsingError, match="private"):
        Engine(spark, p, schema=schema)

    # undefined group errors
    p2 = ProjectDef(name="gp")
    p2.groups["finance"] = {}
    p2.models["m"] = "select 1 as x"
    p2.model_configs["m"] = {"group": "nope"}
    p2.models["m2"] = "select * from {{ ref('m') }}"
    with pytest.raises(ParsingError, match="undefined group"):
        Engine(spark, p2, schema=schema)


def test_restricted_package_protected_ref(spark, schema, sf_dir):
    pkg = ProjectDef(name="innerpkg")
    pkg.models["secret"] = "select 1 as x"
    pkg.restrict_access = True
    p = ProjectDef(name="root")
    p.add_package(pkg)
    p.models["probe"] = "select * from {{ ref('secret') }}"
    with pytest.raises(ParsingError, match="restricted"):
        Engine(spark, p, schema=schema)
    # public access opts the model out of the restriction
    pkg.model_configs["secret"] = {"access": "public"}
    eng = Engine(spark, p, schema=schema)
    assert "model.root.probe" in eng.manifest.nodes
