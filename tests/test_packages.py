"""Dependency packages (ref: deps/ resolver.py, local.py; macro
candidate locality Core < Imported < Root manifest.py:563-664;
two-arg ref RefArgs components.py:38-55).

Only `local:` package sources are supported (registry/git/tarball need
network access); a package is a full project whose models/seeds/macros/
sources join the manifest under its own namespace.
"""

import os
import textwrap

import pytest

from dbt_core_spark import Engine, ProjectDef
from dbt_core_spark.exceptions import ParsingError


def _pkg_utils() -> ProjectDef:
    pkg = ProjectDef(name="utilpkg")
    pkg.macros["helpers"] = (
        "{% macro double_col(c) %}(({{ c }}) * 2){% endmacro %}"
        "{% macro whoami() %}utilpkg{% endmacro %}"
    )
    pkg.models["pkg_orders"] = """
        select o_orderkey, o_totalprice
        from {{ source('tpch', 'orders') }}
    """
    pkg.models["pkg_big"] = """
        select * from {{ ref('pkg_orders') }} where o_totalprice > 0
    """
    pkg.vars = {"pkg_threshold": 5, "shared_var": "from_pkg"}
    return pkg


def test_package_models_and_two_arg_ref(spark, schema, sf_dir):
    p = ProjectDef(name="rootp")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    pkg = _pkg_utils()
    # package sources: the package declares its own source too
    pkg.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.add_package(pkg)
    p.models["mart"] = """
        {{ config(materialized='table') }}
        select count(*) as n from {{ ref('utilpkg', 'pkg_big') }}
    """
    eng = Engine(spark, p, schema=schema)
    # package nodes live in the manifest under their own namespace
    assert "model.utilpkg.pkg_orders" in eng.manifest.nodes
    # two-arg ref resolved to the package node
    assert "model.utilpkg.pkg_big" in eng.manifest.nodes["model.rootp.mart"].depends_on
    res = eng.run()
    assert res.ok(), [r.message for r in res.results]
    assert eng.table("mart").collect()[0].n > 0


def test_package_macro_bare_and_qualified(spark, schema, sf_dir):
    p = ProjectDef(name="rootp")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.add_package(_pkg_utils())
    p.models["m"] = """
        {{ config(materialized='table') }}
        select {{ double_col('o_totalprice') }} as d,
               '{{ utilpkg.whoami() }}' as who
        from {{ source('tpch', 'orders') }} limit 5
    """
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    row = eng.table("m").collect()[0]
    assert row.who == "utilpkg"


def test_root_macro_wins_bare_name(spark, schema, sf_dir):
    """Locality: root's whoami shadows the package's for bare calls;
    the package-qualified call still reaches the package macro."""
    p = ProjectDef(name="rootp")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.macros["mine"] = "{% macro whoami() %}root{% endmacro %}"
    p.add_package(_pkg_utils())
    p.models["m"] = """
        {{ config(materialized='table') }}
        select '{{ whoami() }}' as bare, '{{ utilpkg.whoami() }}' as qualified
        from {{ source('tpch', 'orders') }} limit 1
    """
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    row = eng.table("m").collect()[0]
    assert row.bare == "root"
    assert row.qualified == "utilpkg"


def test_bare_ref_prefers_own_package(spark, schema, sf_dir):
    """A package model named like a root model: bare ref() inside the
    package resolves to the package's node; root's bare ref resolves to
    the root node."""
    p = ProjectDef(name="rootp")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    pkg = ProjectDef(name="dup")
    pkg.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    pkg.models["base"] = "select 1 as src from {{ source('tpch','orders') }} limit 1"
    pkg.models["consumer"] = "select * from {{ ref('base') }}"
    p.add_package(pkg)
    p.models["base"] = "select 2 as src from {{ source('tpch','orders') }} limit 1"
    p.models["root_consumer"] = "select * from {{ ref('base') }}"
    eng = Engine(spark, p, schema=schema)
    m = eng.manifest
    assert m.nodes["model.dup.consumer"].depends_on == ["model.dup.base"]
    assert m.nodes["model.rootp.root_consumer"].depends_on == ["model.rootp.base"]


def test_package_vars_and_root_override(spark, schema, sf_dir):
    p = ProjectDef(name="rootp")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.vars = {"shared_var": "from_root"}
    p.add_package(_pkg_utils())
    p.models["m"] = """
        select {{ var('pkg_threshold') }} as t, '{{ var('shared_var') }}' as s
        from {{ source('tpch', 'orders') }} limit 1
    """
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    row = eng.table("m").collect()[0]
    assert row.t == 5  # package var visible
    assert row.s == "from_root"  # root wins on collision


def test_root_config_tree_overrides_package_models(spark, schema, sf_dir):
    p = ProjectDef(name="rootp")
    pkg = _pkg_utils()
    pkg.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.add_package(pkg)
    p.package_defaults["utilpkg"] = {"+materialized": "table"}
    eng = Engine(spark, p, schema=schema)
    assert eng.manifest.nodes["model.utilpkg.pkg_orders"].config["materialized"] == "table"


def test_deps_report_and_ls(spark, schema, sf_dir):
    p = ProjectDef(name="rootp")
    pkg = _pkg_utils()
    pkg.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.add_package(pkg)
    eng = Engine(spark, p, schema=schema)
    deps = eng.deps()
    assert deps["utilpkg"]["source"] == "local"
    assert "pkg_orders" in deps["utilpkg"]["models"]
    # package: selector method reaches package nodes
    names = eng.ls(select="package:utilpkg")
    assert any("pkg_orders" in n for n in names)


def test_on_disk_local_package(tmp_path, spark, schema, sf_dir):
    root = str(tmp_path / "rootproj")
    pkgdir = str(tmp_path / "mypkg")

    def w(base, rel, content):
        path = os.path.join(base, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(textwrap.dedent(content))

    w(pkgdir, "dbt_project.yml", "name: mypkg\n")
    w(pkgdir, "models/pkg_model.sql",
      "select o_orderkey from {{ source('tpch', 'orders') }} limit 10")
    w(pkgdir, "models/schema.yml", f"""
        sources:
          - name: tpch
            tables:
              - name: orders
                meta:
                  location: {sf_dir}/orders.parquet
    """)
    w(pkgdir, "macros/util.sql", "{% macro pkg_tag() %}'tagged'{% endmacro %}")
    w(root, "dbt_project.yml", """
        name: rootproj
        models:
          mypkg:
            +materialized: table
    """)
    w(root, "packages.yml", "packages:\n  - local: ../mypkg\n")
    w(root, "models/top.sql",
      "select count(*) as n from {{ ref('mypkg', 'pkg_model') }}")

    p = ProjectDef.from_dir(root)
    assert "mypkg" in p.packages
    eng = Engine(spark, p, schema=schema)
    assert eng.manifest.nodes["model.mypkg.pkg_model"].config["materialized"] == "table"
    res = eng.run()
    assert res.ok(), [r.message for r in res.results]
    assert eng.table("top").collect()[0].n == 10


def test_uninstalled_package_source_raises(tmp_path):
    """Non-local specs must be installed via deps.install() before
    from_dir; a clear error points there (remote URLs error at install
    time — no network)."""
    root = str(tmp_path / "gitproj")
    os.makedirs(root)
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write("name: gitproj\n")
    with open(os.path.join(root, "packages.yml"), "w") as f:
        f.write("packages:\n  - git: https://example.com/repo.git\n")
    with pytest.raises(ParsingError, match="not installed"):
        ProjectDef.from_dir(root)
    from dbt_core_spark import deps

    with pytest.raises(ParsingError, match="network"):
        deps.install(root)


def test_root_source_wins_over_package_source(spark, schema, sf_dir, tmp_path):
    """A package re-declaring the root's source name/table must not
    redirect root models to the package's location."""
    alt = str(tmp_path / "alt_orders")
    spark.read.parquet(f"{sf_dir}/orders.parquet").limit(1).write.parquet(alt)
    p = ProjectDef(name="rootp")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    pkg = ProjectDef(name="shadow")
    pkg.add_source("tpch", "orders", alt)  # same names, different data
    p.add_package(pkg)
    p.models["m"] = (
        "select count(*) as n from {{ source('tpch','orders') }}"
    )
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    assert eng.table("m").collect()[0].n > 1  # root location, not the 1-row alt


def test_cyclic_local_packages_rejected(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for d, other in ((a, "../b"), (b, "../a")):
        os.makedirs(d)
        with open(os.path.join(d, "dbt_project.yml"), "w") as f:
            f.write(f"name: {os.path.basename(d)}\n")
        with open(os.path.join(d, "packages.yml"), "w") as f:
            f.write(f"packages:\n  - local: {other}\n")
    with pytest.raises(ParsingError, match="circular local package"):
        ProjectDef.from_dir(a)
