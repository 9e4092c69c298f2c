"""ProjectDef → Manifest.

Mirrors the reference's load pipeline (ref: core/dbt/parser/
manifest.py:265-486 — parse macros first, then model/seed/snapshot/test
parsers, then resolve refs/sources into depends_on).  Per-node parsing
renders Jinja once with *parse-time* resolvers that only record
refs/sources/config (ref: providers.py:516-523,664-668; the reference
uses the dbt-extractor static parser when possible, parser/models.py:379-434
— same observable result).
"""

from __future__ import annotations

import json
import re
import time
from typing import Any

from dbt_core_spark.exceptions import ParsingError
from dbt_core_spark.functions.context import RenderContext, render
from dbt_core_spark.plans.nodes import DEFAULT_CONFIG, Manifest, Node, NodeType
from dbt_core_spark.project import ProjectDef, SourceTableDef

# Generic built-in test types (ref: global project; pinned by
# tests/functional/schema_tests/test_schema_v2_tests.py)
GENERIC_TESTS = {"unique", "not_null", "accepted_values", "relationships"}


def parse_project(
    project: ProjectDef,
    cli_vars: dict[str, Any] | None = None,
    cache: Manifest | None = None,
) -> Manifest:
    """Build the Manifest.  ``cache`` enables partial parsing (ref:
    parser/partial.py:68-1090): nodes whose raw_code is byte-identical to
    the cached manifest's skip the Jinja parse-render and copy their
    recorded refs/sources/config.  A macro change invalidates the whole
    cache (the reference forces a full reparse too).

    Phase timings accumulate in ``manifest.perf_info`` mirroring the
    reference's ManifestLoaderInfo (parser/manifest.py:199-221):
    load_macros (macro/vars setup + cache validity), read_files (node
    collection from the project + metadata nodes), render (the
    parse-time Jinja pass), resolve (grants + depends_on resolution) —
    the CLI ``parse`` verb writes them to target/perf_info.json."""
    t_start = time.perf_counter()
    manifest = Manifest(project_name=project.name)
    # package vars are that package's defaults; the root project's vars
    # win globally (ref: Var resolution, context/base.py:139-184)
    for pkg in project.packages.values():
        manifest.vars.update(pkg.vars)
    manifest.vars.update(project.vars)
    manifest.macros = dict(project.macros)
    manifest.package_macros = {
        pname: dict(pkg.macros) for pname, pkg in project.packages.items()
    }
    if cache is not None and (
        cache.macros != manifest.macros
        or cache.package_macros != manifest.package_macros
        or json.dumps(cache.vars, sort_keys=True, default=str)
        != json.dumps(manifest.vars, sort_keys=True, default=str)
    ):
        cache = None  # macro or project-vars changes force full reparse
    if cache is not None:
        # cache-hit nodes skip rendering, so their env_var() reads are
        # not re-observed this parse — carry the recorded values forward
        # or the next write would drop the invalidation inputs
        manifest.used_env_vars.update(cache.used_env_vars)
    manifest.reparse_count = 0
    t_macros = time.perf_counter()

    # root project resources parse first so bare-name ref() collisions
    # resolve to the root node (ref: RefableLookup search order); then
    # each installed package contributes its own namespaced resources
    # (ref: deps/local.py — a package is just another project)
    for owner, defaults_override in [(project, None)] + [
        (pkg, project.package_defaults.get(pname))
        for pname, pkg in project.packages.items()
    ]:
        _parse_package(manifest, owner, defaults_override)

    # -- exposures / metrics (ref: nodes.py:1334,1404) -----------------------
    # exposures and metrics join the GRAPH as terminal nodes (never
    # executed) so `exposure:`/`metric:` and `+exposure:name` selection
    # work like the reference (ExposureSelectorMethod,
    # MetricSelectorMethod; graph_selection tests); metric CALCULATION
    # stays out of scope like the reference's semantic layer (metadata
    # consumed by external tooling).
    manifest.exposures = dict(project.exposures)
    manifest.metrics = dict(project.metrics)
    for mname, mdef in project.metrics.items():
        mnode = Node(
            unique_id=f"metric.{project.name}.{mname}",
            name=mname,
            package=project.name,
            resource_type=NodeType.Metric,
            config={"enabled": True},
        )
        deps = list(mdef.get("depends_on", []) or [])
        if mdef.get("model"):
            deps.append(mdef["model"])
        for dep in deps:
            m = re.match(r"ref\(\s*'([^']+)'\s*\)", str(dep))
            mnode.refs.append(m.group(1) if m else str(dep))
        manifest.add_node(mnode)
    for ename, edef in project.exposures.items():
        enode = Node(
            unique_id=f"exposure.{project.name}.{ename}",
            name=ename,
            package=project.name,
            resource_type=NodeType.Exposure,
            config={"enabled": True},
        )
        for dep in edef.get("depends_on", []) or []:
            m = re.match(r"ref\(\s*'([^']+)'\s*\)", str(dep))
            ms = re.match(r"source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)", str(dep))
            if ms:
                enode.sources.append((ms.group(1), ms.group(2)))
            else:
                enode.refs.append(m.group(1) if m else str(dep))
        manifest.add_node(enode)

    # -- semantic models / saved queries (ref: nodes.py:1490,1556) ----------
    # metadata-only like the reference (MetricFlow computes them
    # externally); they join the graph so semantic_model:/saved_query:
    # selection and `+semantic_model:name` upstream walks work
    # (SemanticModelSelectorMethod, SavedQuerySelectorMethod
    # selector_methods.py:380,405)
    manifest.semantic_models = dict(project.semantic_models)
    manifest.saved_queries = dict(project.saved_queries)
    for sname, sdef in project.semantic_models.items():
        snode = Node(
            unique_id=f"semantic_model.{project.name}.{sname}",
            name=sname,
            package=project.name,
            resource_type=NodeType.SemanticModel,
            config={"enabled": True},
        )
        if sdef.get("model"):
            m = re.match(r"ref\(\s*'([^']+)'\s*\)", str(sdef["model"]))
            snode.refs.append(m.group(1) if m else str(sdef["model"]))
        manifest.add_node(snode)
    for qname, qdef in project.saved_queries.items():
        qnode = Node(
            unique_id=f"saved_query.{project.name}.{qname}",
            name=qname,
            package=project.name,
            resource_type=NodeType.SavedQuery,
            config={"enabled": True, **(qdef.get("config") or {})},
        )
        # saved queries depend on METRIC nodes (no ref() syntax for
        # metrics) — recorded directly as unique_ids; the resolver below
        # preserves metric-typed deps
        for mref in qdef.get("metrics", []) or []:
            qnode.depends_on.append(f"metric.{project.name}.{mref}")
        manifest.add_node(qnode)
    # groups accumulate in _parse_package (root first, then packages)

    t_read = time.perf_counter()

    # -- parse-time render: capture refs/sources/config ----------------------
    for node in list(manifest.nodes.values()):
        if node.raw_code and node.language == "sql":
            old = cache.nodes.get(node.unique_id) if cache else None
            if old is not None and old.raw_code == node.raw_code:
                # partial parse hit: reuse recorded deps + in-file config,
                # but keep the freshly merged project/schema-yml config
                # (it may have changed independently of the SQL)
                node.refs = list(old.refs)
                node.sources = list(old.sources)
                node.captured_config = dict(old.captured_config)
                _apply_captured_config(node, old.captured_config)
                continue
            manifest.reparse_count += 1
            ctx = RenderContext(manifest, node, mode="parse", cli_vars=cli_vars)
            try:
                render(node.raw_code, ctx)
            except Exception as e:
                raise ParsingError(f"parse error in {node.unique_id}: {e}") from e
            # in-file config() wins over schema-yml & project defaults
            # (ref: context_config.py precedence)
            node.captured_config = dict(ctx.captured_config)
            _apply_captured_config(node, ctx.captured_config)

    t_render = time.perf_counter()

    # grants finalize to {privilege: [grantees]} once all layers merged
    # (append markers are a merge-time notation, not config state)
    from dbt_core_spark.operators.grants import normalize_grants

    for node in manifest.nodes.values():
        if node.config.get("grants") is not None:
            node.config["grants"] = normalize_grants(node.config["grants"])

    # -- resolve depends_on (ref: manifest.py process_refs/process_sources) --
    for node in manifest.nodes.values():
        # metric-typed deps (saved queries) survive re-resolution: they
        # are direct unique_ids, not ref()s
        deps: list[str] = [
            d for d in node.depends_on
            if d.split(".", 1)[0] in ("metric", "semantic_model")
        ]
        for ref_entry in node.refs:
            if isinstance(ref_entry, (tuple, list)):  # ref('pkg', 'name')
                pkg, ref_name = ref_entry
                target = manifest.resolve_ref(ref_name, package=pkg)
            else:
                ref_name = ref_entry
                target = manifest.resolve_ref(ref_name, current=node.package)
            if target is None:
                raise ParsingError(
                    f"{node.unique_id} depends on undefined ref '{ref_name}'"
                )
            _check_access(manifest, node, target)
            deps.append(target.unique_id)
        for source_name, table_name in node.sources:
            target = manifest.resolve_source(source_name, table_name)
            if target is None:
                raise ParsingError(
                    f"{node.unique_id} uses undefined source "
                    f"'{source_name}.{table_name}'"
                )
            deps.append(target.unique_id)
        # seeds may not depend on anything (ref: nodes.py:891-929)
        if node.resource_type is NodeType.Seed and deps:
            raise ParsingError(f"seed {node.name} cannot have dependencies")
        node.depends_on = sorted(set(deps))

    t_end = time.perf_counter()
    manifest.perf_info = {
        "phases": {
            "load_macros": t_macros - t_start,
            "read_files": t_read - t_macros,
            "render": t_render - t_read,
            "resolve": t_end - t_render,
        },
        "elapsed": t_end - t_start,
        "node_count": len(manifest.nodes),
        "parsed_node_count": manifest.reparse_count,
        "is_partial_parse": cache is not None,
    }
    return manifest


def _parse_package(
    manifest: Manifest,
    project: ProjectDef,
    defaults_override: dict | None = None,
) -> None:
    """Add one project's resources (root or installed package) to the
    manifest under its own namespace.  ``defaults_override`` is the root
    project's config subtree for this package (root config wins over the
    package's own defaults, ref: context_config.py precedence)."""

    if getattr(project, "restrict_access", False):
        manifest.restricted_packages.add(project.name)
    for gname, gdef in (project.groups or {}).items():
        manifest.groups.setdefault(gname, gdef)

    # -- sources (ref: parser/sources.py patch_sources) ----------------------
    for source_name, tables in project.sources.items():
        for table_name, tdef in tables.items():
            _add_source(manifest, project.name, source_name, table_name, tdef)

    # -- seeds: DAG roots, never compiled (ref: nodes.py:846-946) ------------
    for seed_name, seed_src in project.seeds.items():
        cfg = _merged_config(project, seed_name,
                             project.seed_configs.get(seed_name), defaults_override)
        cfg["materialized"] = "seed"
        node = Node(
            unique_id=f"seed.{project.name}.{seed_name}",
            name=seed_name,
            package=project.name,
            resource_type=NodeType.Seed,
            config=cfg,
        )
        if isinstance(seed_src, str):
            node.seed_path = seed_src
        else:
            node.seed_rows = list(seed_src)
        manifest.add_node(node)

    # -- models --------------------------------------------------------------
    # versioned models first: their defined_in files are claimed and must
    # not also parse as standalone models (ref: schema-yml versions:,
    # nodes.py:490-491, tests/functional/model_versions/)
    claimed: set[str] = set()
    for base_name, vdef in project.model_versions.items():
        versions = vdef.get("versions") or []
        latest = vdef.get("latest_version")
        if latest is None and versions:
            latest = max(int(v["v"]) for v in versions)
        for v in versions:
            vnum = int(v["v"])
            src_key = v.get("defined_in") or (
                f"{base_name}_v{vnum}"
                if f"{base_name}_v{vnum}" in project.models
                else base_name
            )
            claimed.add(src_key)
            cfg = _merged_config(project, base_name,
                                 project.model_configs.get(base_name),
                                 defaults_override)
            cfg.update(v.get("config") or {})
            node = Node(
                unique_id=f"model.{project.name}.{base_name}.v{vnum}",
                name=base_name,
                package=project.name,
                resource_type=NodeType.Model,
                raw_code=project.models.get(src_key, ""),
                config=cfg,
                version=vnum,
                latest_version=int(latest),
            )
            _attach_columns(project, node)
            manifest.add_node(node)

    for model_name, sql in project.models.items():
        if model_name in claimed or model_name in project.model_versions:
            continue
        node = Node(
            unique_id=f"model.{project.name}.{model_name}",
            name=model_name,
            package=project.name,
            resource_type=NodeType.Model,
            raw_code=sql,
            path=project.model_paths.get(model_name, ""),
            config=_merged_config(project, model_name,
                                  project.model_configs.get(model_name),
                                  defaults_override),
        )
        _attach_columns(project, node)
        manifest.add_node(node)

    # -- python models (ref: ModelLanguage types.py:54-57; ADR-004) ----------
    for model_name, fn in project.python_models.items():
        node = Node(
            unique_id=f"model.{project.name}.{model_name}",
            name=model_name,
            package=project.name,
            resource_type=NodeType.Model,
            language="python",
            config=_merged_config(project, model_name,
                                  project.model_configs.get(model_name),
                                  defaults_override),
        )
        node.python_fn = fn  # type: ignore[attr-defined]
        cfg_refs = node.config.get("depends_on") or node.config.get("refs") or []
        node.refs.extend(cfg_refs)
        _attach_columns(project, node)
        manifest.add_node(node)

    # -- snapshots (ref: SnapshotConfig v1/snapshot.py:19-76) ----------------
    for snap_name, sdef in project.snapshots.items():
        cfg = dict(DEFAULT_CONFIG)
        cfg.update({k: v for k, v in sdef.items() if k != "sql"})
        cfg["materialized"] = "snapshot"
        node = Node(
            unique_id=f"snapshot.{project.name}.{snap_name}",
            name=snap_name,
            package=project.name,
            resource_type=NodeType.Snapshot,
            raw_code=sdef["sql"],
            config=cfg,
        )
        manifest.add_node(node)

    # -- analyses: compiled but never run (ref: NodeType.Analysis) -----------
    for a_name, a_sql in project.analyses.items():
        manifest.add_node(Node(
            unique_id=f"analysis.{project.name}.{a_name}",
            name=a_name, package=project.name,
            resource_type=NodeType.Analysis, raw_code=a_sql,
            config=_merged_config(project, a_name, None, defaults_override),
        ))

    # -- tests ---------------------------------------------------------------
    for test_name, tdef in project.tests.items():
        manifest.add_node(_build_test_node(project, test_name, tdef))
    # column-level `tests:` lists in schema yml — dbt's most common test
    # declaration form — expand to generic test nodes named
    # `<test>_<model>_<column>` (ref: TestBuilder.get_synthetic_test_names
    # parser/generic_test_builders.py; schemas.py SchemaYamlParser)
    for model_name, cols in project.model_columns.items():
        for c in cols:
            for t in c.get("tests", []) or []:
                if isinstance(t, str):
                    ttype, targs = t, {}
                else:  # {"accepted_values": {"values": [...], ...}}
                    ttype, targs = next(iter(t.items()))
                    targs = dict(targs or {})
                tdef = {"type": ttype, "model": model_name,
                        "column": c["name"], **targs}
                test_name = f"{ttype}_{model_name}_{c['name']}"
                if test_name not in project.tests:
                    manifest.add_node(
                        _build_test_node(project, test_name, tdef))
    # unit tests join the graph as first-class nodes (ref: dbt 1.8
    # UnitTestDefinition nodes; run during `test`, and before their
    # model during `build` via add_test_edges) — the standalone
    # api.unit_test() path remains for direct invocation
    for utname, utdef in project.unit_tests.items():
        utnode = Node(
            unique_id=f"unit_test.{project.name}.{utname}",
            name=utname,
            package=project.name,
            resource_type=NodeType.UnitTest,
            config={"enabled": True, "materialized": "unit"},
        )
        utnode.attached_node = utdef.get("model")
        utnode.test_metadata = {"kind": "unit", "def": dict(utdef)}
        manifest.add_node(utnode)
    # source-table column tests → generic test nodes against
    # `source(...)`, named source_<test>_<source>_<table>_<column>
    # (ref: sources schema yml; tests/functional/sources/)
    for sname, tables in project.sources.items():
        for tname, sdef in tables.items():
            for c in getattr(sdef, "columns", []) or []:
                for t in c.get("tests", []) or []:
                    if isinstance(t, str):
                        ttype, targs = t, {}
                    else:
                        ttype, targs = next(iter(t.items()))
                        targs = dict(targs or {})
                    tdef = {"type": ttype, "source": [sname, tname],
                            "column": c["name"], **targs}
                    test_name = f"source_{ttype}_{sname}_{tname}_{c['name']}"
                    if test_name not in project.tests:
                        manifest.add_node(
                            _build_test_node(project, test_name, tdef))


def _check_access(manifest: Manifest, node: Node, target: Node) -> None:
    """Group/access enforcement at ref-resolution time (ref:
    DbtReferenceError manifest.py; AccessType nodes.py; pinned by
    tests/functional/access/):

    - ``private``: only nodes in the SAME group may ref it;
    - ``protected`` (default): only nodes in the same package/project;
    - ``public``: anyone.
    A configured ``group`` must be declared in groups.yml."""
    grp = target.config.get("group")
    if grp and manifest.groups and grp not in manifest.groups:
        raise ParsingError(
            f"{target.unique_id}: undefined group '{grp}'"
        )
    access = target.config.get("access") or "protected"
    if access == "public":
        return
    if access == "private":
        if (node.config.get("group") or None) != (grp or None):
            raise ParsingError(
                f"{node.unique_id} cannot ref private model "
                f"'{target.name}' (group '{grp}')"
            )
        return
    # protected (default): cross-package refs are blocked only when the
    # owning package opts in via `restrict-access: true`
    # (ref: dbt_project.yml restrict-access; ManifestLoader.check_valid_access)
    if (
        node.package != target.package
        and target.package in manifest.restricted_packages
    ):
        raise ParsingError(
            f"{node.unique_id} (package '{node.package}') cannot ref "
            f"protected model '{target.name}' of restricted package "
            f"'{target.package}'"
        )


def _attach_columns(project: ProjectDef, node: Node) -> None:
    """Declared columns + model description from schema-yml
    (ref: ColumnInfo components.py:59-70)."""
    from dbt_core_spark.plans.nodes import ColumnInfo

    node.description = project.model_descriptions.get(node.name, "")
    for c in project.model_columns.get(node.name, []):
        node.columns[c["name"]] = ColumnInfo(
            name=c["name"],
            description=c.get("description", ""),
            data_type=c.get("data_type"),
            constraints=list(c.get("constraints", [])),
        )


def _add_source(
    manifest: Manifest,
    package: str,
    source_name: str,
    table_name: str,
    tdef: SourceTableDef,
) -> None:
    node = Node(
        unique_id=f"source.{package}.{source_name}.{table_name}",
        name=table_name,
        package=package,
        resource_type=NodeType.Source,
        source_name=source_name,
        external_location=tdef.location,
        external_format=tdef.format,
        loaded_at_field=tdef.loaded_at_field,
        freshness=tdef.freshness,
        config=dict(DEFAULT_CONFIG),
    )
    node.config["stream"] = tdef.stream
    node.config["watermark"] = tdef.watermark
    manifest.add_node(node)


def _apply_captured_config(node: Node, captured: dict) -> None:
    """Merge in-file ``config()`` keys onto the node config; ``grants``
    follow DictKeyAppend semantics instead of clobbering (ref:
    v1/config.py:113, tests/functional/configs/test_grant_configs.py)."""
    from dbt_core_spark.operators.grants import merge_grant_layers

    for k, v in captured.items():
        if k == "grants":
            node.config["grants"] = merge_grant_layers(node.config.get("grants"), v)
        else:
            node.config[k] = v


def _merged_config(
    project: ProjectDef,
    name: str,
    explicit: dict | None,
    defaults_override: dict | None = None,
) -> dict[str, Any]:
    """Project-tree defaults < root's per-package tree < schema-yml/
    explicit config; in-file config() is merged later at parse-render
    (ref: context_config.py MergeBehavior)."""
    from dbt_core_spark.operators.grants import merge_grant_layers

    cfg = dict(DEFAULT_CONFIG)
    for k, v in project.model_defaults.items():
        cfg[k.lstrip("+")] = v
    for k, v in (defaults_override or {}).items():
        if not isinstance(v, dict):
            cfg[k.lstrip("+")] = v
    if explicit:
        for k, v in explicit.items():
            # grants use DictKeyAppend semantics across layers (ref:
            # v1/config.py:113, test_grant_configs.py): '+priv' appends
            # to the inherited grantee list, bare 'priv' clobbers
            if k == "grants":
                cfg["grants"] = merge_grant_layers(cfg.get("grants"), v)
            else:
                cfg[k] = v
    return cfg


def _build_test_node(project: ProjectDef, test_name: str, tdef: dict) -> Node:
    """Generic + singular test nodes.

    Generic tests compile to SELECTs returning *failing rows* (ref:
    TestBuilder parser/generic_test_builders.py:318-378 builds
    ``{{ test_<name>(...) }}`` against ``get_where_subquery(ref(...))``);
    singular tests are raw SQL files (ref: nodes.py:973-987).
    """
    cfg = dict(DEFAULT_CONFIG)
    cfg["materialized"] = "test"
    # test config knobs (ref: TestConfig v1/config.py:164-229)
    for k in ("severity", "where", "limit", "fail_calc", "warn_if", "error_if",
              "store_failures", "store_failures_as"):
        if k in tdef:
            cfg[k] = tdef[k]
    node = Node(
        unique_id=f"test.{project.name}.{test_name}",
        name=test_name,
        package=project.name,
        resource_type=NodeType.Test,
        config=cfg,
    )
    if "sql" in tdef:  # singular test
        node.raw_code = tdef["sql"]
        node.test_metadata = {"kind": "singular"}
        return node

    ttype = tdef["type"]
    column = tdef.get("column")
    if "source" in tdef:  # test attached to a source table
        sname, tname = tdef["source"]
        node.attached_node = f"source.{project.name}.{sname}.{tname}"
        base = f"{{{{ source('{sname}', '{tname}') }}}}"
    else:
        model = tdef["model"]
        node.attached_node = model
        base = f"{{{{ ref('{model}') }}}}"
    node.column_name = column
    node.test_metadata = {"kind": "generic", "name": ttype, "kwargs": dict(tdef)}
    where = tdef.get("where")
    subq = f"(select * from {base} where {where})" if where else base

    if ttype == "unique":
        node.raw_code = (
            f"select {column} as unique_field, count(*) as n_records "
            f"from {subq} where {column} is not null "
            f"group by {column} having count(*) > 1"
        )
    elif ttype == "not_null":
        node.raw_code = f"select {column} from {subq} where {column} is null"
    elif ttype == "accepted_values":
        vals = tdef["values"]
        quote = tdef.get("quote", True)
        lits = ", ".join(f"'{v}'" if quote else str(v) for v in vals)
        node.raw_code = (
            f"with all_values as (select {column} as value_field, count(*) as n_records "
            f"from {subq} group by {column}) "
            f"select * from all_values where value_field not in ({lits})"
        )
    elif ttype == "relationships":
        to = tdef["to"]  # jinja like "ref('customers')"
        to_field = tdef["field"]
        node.raw_code = (
            f"with child as (select {column} as from_field from {subq} "
            f"where {column} is not null), "
            f"parent as (select {to_field} as to_field from {{{{ {to} }}}}) "
            f"select from_field from child "
            f"left join parent on child.from_field = parent.to_field "
            f"where parent.to_field is null"
        )
    else:
        macro_name = _find_test_macro(project, ttype)
        if macro_name is None:
            raise ParsingError(f"unknown generic test type '{ttype}'")
        # custom generic test: {% test <name>(model, column_name) %} or a
        # plain macro; call with the model relation + column
        # (ref: TestBuilder macro_name generic_test_builders.py:318-322)
        extra = "".join(
            f", {k}={v!r}" for k, v in tdef.items()
            if k not in ("type", "model", "source", "column", "severity", "where",
                         "limit", "fail_calc", "warn_if", "error_if",
                         "store_failures", "store_failures_as")
        )
        # the model arg is the bare ref()/source() expression (evaluated
        # inside the jinja call), not the braced form used in SQL-text
        # templates
        if "source" in tdef:
            model_expr = f"source('{tdef['source'][0]}', '{tdef['source'][1]}')"
        else:
            model_expr = f"ref('{model}')"
        node.raw_code = f"{{{{ {macro_name}({model_expr}, '{column}'{extra}) }}}}"
    return node


import re as _re_mod  # noqa: E402


def _find_test_macro(project: ProjectDef, ttype: str) -> str | None:
    """Locate a custom generic test across macro sources: a
    ``{% test <name> %}`` block (compiled to test_<name>) or a macro
    named test_<name> / <name>."""
    esc = _re_mod.escape(ttype)
    test_block = _re_mod.compile(r"{%-?\s*test\s+" + esc + r"\s*\(", _re_mod.IGNORECASE)
    macro_pref = _re_mod.compile(r"{%-?\s*macro\s+test_" + esc + r"\s*\(", _re_mod.IGNORECASE)
    macro_plain = _re_mod.compile(r"{%-?\s*macro\s+" + esc + r"\s*\(", _re_mod.IGNORECASE)
    for src in project.macros.values():
        if test_block.search(src) or macro_pref.search(src):
            return f"test_{ttype}"
        if macro_plain.search(src):
            return ttype
    # imported packages (macro candidate locality, ref: manifest.py:563-664);
    # package-qualified so a root macro with the same name cannot shadow it
    for pname, pkg in project.packages.items():
        for src in pkg.macros.values():
            if test_block.search(src) or macro_pref.search(src):
                return f"{pname}.test_{ttype}"
            if macro_plain.search(src):
                return f"{pname}.{ttype}"
    return None
