"""Project definition & config model.

The reference loads dbt_project.yml → Project (ref: core/dbt/config/
project.py:596-640 — model_paths, seed_paths, vars, per-resource config
trees) and merges node config by precedence project-tree < schema-yml <
in-file ``{{ config(...) }}`` (ref: core/dbt/context/context_config.py).

This engine supports two equivalent declaration styles:

1. **In-code** (`ProjectDef(...)` with dicts) — used by tests and the
   driver-facing queries, zero filesystem churn.
2. **On-disk** (`ProjectDef.from_dir(path)`) — a dbt-compatible layout:
   ``dbt_project.yml``, ``models/*.sql`` (+ ``schema.yml``),
   ``seeds/*.csv``, ``snapshots/*.sql``, ``tests/*.sql``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from dbt_core_spark.exceptions import ParsingError

try:  # PyYAML ships with pyspark deps in most distros; gate anyway
    import yaml

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


@dataclass
class SourceTableDef:
    """One declared external table (ref: SourceDefinition nodes.py:1217).

    ``location`` may be a parquet/csv/json path or an existing catalog
    table name (``catalog:db.table``).
    """

    name: str
    location: str
    format: str = "parquet"
    loaded_at_field: Optional[str] = None
    freshness: Optional[dict] = None  # {"warn_after": {"count": 1, "period": "day"}, ...}
    description: str = ""
    stream: bool = False  # consumable as a readStream by streaming_table models
    watermark: Optional[dict] = None  # {"column": ..., "delay": "10 minutes"}
    # declared columns, each optionally carrying a `tests:` list — these
    # expand to generic test nodes against the source (ref: source
    # table columns in schema yml; tests/functional/sources/)
    columns: list = field(default_factory=list)


@dataclass
class ProjectDef:
    """A whole project: models, seeds, snapshots, sources, tests, config."""

    name: str = "project"
    models: dict[str, str] = field(default_factory=dict)  # name -> jinja-SQL
    model_configs: dict[str, dict] = field(default_factory=dict)  # name -> config dict
    # name -> ordered column declarations [{name, data_type, description,
    # constraints}] (ref: ColumnInfo components.py:59-70; contracts §1.2)
    model_columns: dict[str, list[dict]] = field(default_factory=dict)
    model_descriptions: dict[str, str] = field(default_factory=dict)
    # name -> project-relative source file path (dir-loaded projects;
    # backs the path:/file: selector methods)
    model_paths: dict[str, str] = field(default_factory=dict)
    # versioned models (ref: schema-yml `versions:` + latest_version,
    # nodes.py:490-491; tests/functional/model_versions/):
    # name -> {"latest_version": N, "versions": [{"v": N,
    #          "defined_in": other_model_key?, "config": {...}?}, ...]}
    model_versions: dict[str, dict] = field(default_factory=dict)
    # groups (ref: groups.yml; tests/functional/access/): name -> {owner: ...}
    groups: dict[str, dict] = field(default_factory=dict)
    # restrict-access: when true, this package's protected models cannot
    # be ref'd from other packages (ref: dbt_project.yml restrict-access)
    restrict_access: bool = False
    # set by from_dir; enables target/partial_parse.json persistence
    project_root: Optional[str] = None
    # profile name from dbt_project.yml (ref: config/profile.py)
    profile: Optional[str] = None
    python_models: dict[str, Any] = field(default_factory=dict)  # name -> callable(dbt, session)
    seeds: dict[str, Any] = field(default_factory=dict)  # name -> csv path | list[dict]
    seed_configs: dict[str, dict] = field(default_factory=dict)
    snapshots: dict[str, dict] = field(default_factory=dict)  # name -> {"sql":..., **config}
    sources: dict[str, dict[str, SourceTableDef]] = field(default_factory=dict)
    tests: dict[str, dict] = field(default_factory=dict)  # name -> test def (see parser)
    analyses: dict[str, str] = field(default_factory=dict)  # compile-only SQL
    exposures: dict[str, dict] = field(default_factory=dict)  # metadata-only
    metrics: dict[str, dict] = field(default_factory=dict)  # metadata-only
    # semantic-layer metadata (ref: schema-yml semantic_models: /
    # saved_queries:, contracts/graph/nodes.py:1490,1556):
    # name -> {"model": "ref('m')", ...} / name -> {"metrics": [...], ...}
    semantic_models: dict[str, dict] = field(default_factory=dict)
    saved_queries: dict[str, dict] = field(default_factory=dict)
    unit_tests: dict[str, dict] = field(default_factory=dict)
    macros: dict[str, str] = field(default_factory=dict)  # name -> jinja macro source
    vars: dict[str, Any] = field(default_factory=dict)
    on_run_start: list[str] = field(default_factory=list)
    on_run_end: list[str] = field(default_factory=list)
    # project-tree default configs, lowest precedence (ref: context_config.py)
    model_defaults: dict[str, Any] = field(default_factory=dict)
    # installed dependency packages, keyed by package name (ref: deps/
    # resolver.py; only `local:` installs are supported here — registry/
    # git/tarball need network access, documented gap).  The root
    # project's dbt_project.yml `models:` tree may carry per-package
    # config subtrees, stored in package_defaults (ref: fqn_search).
    packages: dict[str, "ProjectDef"] = field(default_factory=dict)
    package_defaults: dict[str, dict] = field(default_factory=dict)
    # named YAML selectors: name -> definition (string or dict tree)
    # (ref: selectors.yml; selector_spec + graph/cli.py set ops)
    selectors: dict[str, Any] = field(default_factory=dict)

    def add_package(self, pkg: "ProjectDef") -> None:
        """Install a dependency package (ref: deps/local.py — a local
        package is just another project whose resources join the
        manifest under its own namespace)."""
        self.packages[pkg.name] = pkg

    def add_source(
        self,
        source_name: str,
        table_name: str,
        location: str,
        format: str = "parquet",
        **kwargs: Any,
    ) -> None:
        self.sources.setdefault(source_name, {})[table_name] = SourceTableDef(
            name=table_name, location=location, format=format, **kwargs
        )

    @classmethod
    def from_dir(cls, path: str, _seen: Optional[frozenset] = None) -> "ProjectDef":
        """Load a dbt-style project directory
        (ref: config/project.py model_paths/seed_paths/... defaults).
        ``_seen`` guards against cyclic local-package references."""
        if not _HAVE_YAML:  # pragma: no cover
            raise ParsingError("PyYAML required for on-disk projects")
        real = os.path.realpath(path)
        seen = _seen or frozenset()
        if real in seen:
            raise ParsingError(
                f"circular local package dependency at {path!r}"
            )
        seen = seen | {real}
        proj_file = os.path.join(path, "dbt_project.yml")
        cfg: dict[str, Any] = {}
        if os.path.exists(proj_file):
            with open(proj_file) as f:
                cfg = yaml.safe_load(f) or {}
        p = cls(name=cfg.get("name", os.path.basename(path.rstrip("/"))))
        p.project_root = real  # enables on-disk partial parsing
        p.restrict_access = bool(cfg.get("restrict-access"))
        p.profile = cfg.get("profile")
        p.vars = cfg.get("vars", {}) or {}
        for pkg_name, tree in (cfg.get("models", {}) or {}).items():
            if pkg_name != p.name and isinstance(tree, dict):
                p.package_defaults[pkg_name] = tree
        p.on_run_start = _as_list(cfg.get("on-run-start"))
        p.on_run_end = _as_list(cfg.get("on-run-end"))
        p.model_defaults = (cfg.get("models", {}) or {}).get(p.name, {}) or {}

        for d in cfg.get("model-paths", ["models"]):
            _load_sql_dir(os.path.join(path, d), p.models,
                          paths=p.model_paths, project_root=path)
            _load_schema_yml(os.path.join(path, d), p)
        for d in cfg.get("seed-paths", ["seeds"]):
            seed_dir = os.path.join(path, d)
            if os.path.isdir(seed_dir):
                for fn in sorted(os.listdir(seed_dir)):
                    if fn.endswith(".csv"):
                        p.seeds[fn[:-4]] = os.path.join(seed_dir, fn)
        for d in cfg.get("snapshot-paths", ["snapshots"]):
            snap_dir = os.path.join(path, d)
            if os.path.isdir(snap_dir):
                for fn in sorted(os.listdir(snap_dir)):
                    if fn.endswith(".sql"):
                        with open(os.path.join(snap_dir, fn)) as f:
                            _parse_snapshot_blocks(f.read(), p)
        for d in cfg.get("analysis-paths", ["analyses"]):
            _load_sql_dir(os.path.join(path, d), p.analyses)
        for d in cfg.get("test-paths", ["tests"]):
            _load_sql_dir(os.path.join(path, d), dest := {})
            for name, sql in dest.items():
                p.tests[name] = {"sql": sql}
        for d in cfg.get("macro-paths", ["macros"]):
            macro_dir = os.path.join(path, d)
            if os.path.isdir(macro_dir):
                for fn in sorted(os.listdir(macro_dir)):
                    if fn.endswith(".sql"):
                        with open(os.path.join(macro_dir, fn)) as f:
                            p.macros[fn[:-4]] = f.read()
        sel_file = os.path.join(path, "selectors.yml")
        if os.path.exists(sel_file):
            with open(sel_file) as f:
                sel_doc = yaml.safe_load(f) or {}
            for s in sel_doc.get("selectors") or []:
                if isinstance(s, dict) and "name" in s:
                    p.selectors[s["name"]] = s.get("definition")
        for spec in _read_packages_yml(path):
            if "local" in spec:
                pkg_path = os.path.join(path, spec["local"])
                if not os.path.isdir(pkg_path):
                    raise ParsingError(f"local package not found: {pkg_path}")
                p.add_package(cls.from_dir(pkg_path, _seen=seen))
            else:
                # tarball/git/registry specs are installed by
                # dbt_core_spark.deps.install() (offline sources only);
                # from_dir just checks the install happened — the
                # pre-installed scan below loads the extracted package
                from dbt_core_spark import deps as _deps

                lock = _deps.read_lock(path) or {}
                key = spec.get("tarball") or spec.get("git") or spec.get("package")
                entry = next(
                    (e for e in lock.get("packages") or []
                     if key in (e.get("tarball"), e.get("git"), e.get("package"))),
                    None,
                )
                if entry is None or not os.path.isdir(os.path.join(
                    path, cfg.get("packages-install-path", "dbt_packages"),
                    entry.get("name") or "",
                )):
                    kind = next(iter(spec), "?")
                    raise ParsingError(
                        f"package {key!r} ({kind}) is not installed — run "
                        f"dbt_core_spark.deps.install({path!r}) first"
                    )
        # pre-installed packages (the reference's packages-install-path,
        # default dbt_packages/): each subdir with a dbt_project.yml
        install_dir = os.path.join(
            path, cfg.get("packages-install-path", "dbt_packages")
        )
        if os.path.isdir(install_dir):
            for sub in sorted(os.listdir(install_dir)):
                sub_path = os.path.join(install_dir, sub)
                if os.path.exists(os.path.join(sub_path, "dbt_project.yml")):
                    pkg = cls.from_dir(sub_path, _seen=seen)
                    p.packages.setdefault(pkg.name, pkg)
        return p


def _read_packages_yml(path: str) -> list[dict]:
    """packages.yml / dependencies.yml package specs (ref: deps/resolver.py)."""
    for fn in ("packages.yml", "dependencies.yml"):
        f = os.path.join(path, fn)
        if os.path.exists(f):
            with open(f) as fh:
                doc = yaml.safe_load(fh) or {}
            return [s for s in (doc.get("packages") or []) if isinstance(s, dict)]
    return []


def _as_list(v: Any) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _load_sql_dir(
    d: str,
    dest: dict[str, str],
    paths: Optional[dict[str, str]] = None,
    project_root: Optional[str] = None,
) -> None:
    if not os.path.isdir(d):
        return
    for root, _dirs, files in os.walk(d):
        for fn in sorted(files):
            if fn.endswith(".sql"):
                with open(os.path.join(root, fn)) as f:
                    dest[fn[:-4]] = f.read()
                if paths is not None:
                    full = os.path.join(root, fn)
                    paths[fn[:-4]] = (
                        os.path.relpath(full, project_root)
                        if project_root else full
                    )


_SNAPSHOT_BLOCK = re.compile(
    r"{%\s*snapshot\s+(\w+)\s*%}(.*?){%\s*endsnapshot\s*%}", re.DOTALL | re.IGNORECASE
)


def _parse_snapshot_blocks(text: str, p: "ProjectDef") -> None:
    """Extract ``{% snapshot name %} ... {% endsnapshot %}`` blocks
    (ref: snapshot block parsing, core/dbt/parser/snapshots.py)."""
    for m in _SNAPSHOT_BLOCK.finditer(text):
        p.snapshots[m.group(1)] = {"sql": m.group(2).strip()}


def _load_schema_yml(d: str, p: "ProjectDef") -> None:
    """Parse schema.yml files: per-model configs + generic tests + sources
    (ref: core/dbt/parser/schemas.py, schema_generic_tests.py)."""
    if not os.path.isdir(d):
        return
    for root, _dirs, files in os.walk(d):
        for fn in sorted(files):
            if not (fn.endswith(".yml") or fn.endswith(".yaml")):
                continue
            with open(os.path.join(root, fn)) as f:
                doc = yaml.safe_load(f) or {}
            for m in doc.get("models", []) or []:
                mname = m["name"]
                if m.get("config"):
                    p.model_configs.setdefault(mname, {}).update(m["config"])
                if m.get("description"):
                    p.model_descriptions[mname] = m["description"]
                for col in m.get("columns", []) or []:
                    if col.get("data_type") or col.get("description") or col.get("constraints"):
                        p.model_columns.setdefault(mname, []).append({
                            "name": col["name"],
                            "data_type": col.get("data_type"),
                            "description": col.get("description", ""),
                            "constraints": col.get("constraints", []) or [],
                        })
                    for t in col.get("tests", col.get("data_tests", [])) or []:
                        _add_generic_test(p, mname, col["name"], t)
                for t in m.get("tests", m.get("data_tests", [])) or []:
                    _add_generic_test(p, mname, None, t)
            for s in doc.get("sources", []) or []:
                sname = s["name"]
                for t in s.get("tables", []) or []:
                    loc = (t.get("meta") or {}).get("location") or (
                        (t.get("external") or {}).get("location")
                    )
                    if loc:
                        cols = [
                            {"name": c["name"],
                             "tests": c.get("tests",
                                            c.get("data_tests", [])) or []}
                            for c in t.get("columns", []) or []
                        ]
                        p.add_source(
                            sname, t["name"], loc,
                            (t.get("meta") or {}).get("format", "parquet"),
                            loaded_at_field=t.get("loaded_at_field"),
                            freshness=t.get("freshness") or s.get("freshness"),
                            columns=cols,
                        )
            # exposures / metrics / unit tests from schema yml
            # (ref: parser/schemas.py ExposureParser, MetricParser;
            # parser/unit_tests.py)
            for e in doc.get("exposures", []) or []:
                p.exposures[e["name"]] = {k: v for k, v in e.items()
                                          if k != "name"}
            for mt in doc.get("metrics", []) or []:
                p.metrics[mt["name"]] = {k: v for k, v in mt.items()
                                         if k != "name"}
            for sm in doc.get("semantic_models", []) or []:
                p.semantic_models[sm["name"]] = {k: v for k, v in sm.items()
                                                 if k != "name"}
            for sq in doc.get("saved_queries", []) or []:
                p.saved_queries[sq["name"]] = {k: v for k, v in sq.items()
                                               if k != "name"}
            for ut in doc.get("unit_tests", []) or []:
                p.unit_tests[ut["name"]] = {k: v for k, v in ut.items()
                                            if k != "name"}


def _add_generic_test(p: ProjectDef, model: str, column: Optional[str], t: Any) -> None:
    """YAML test entry → test def (ref: parser/generic_test_builders.py:69-378)."""
    if isinstance(t, str):
        ttype, kwargs = t, {}
    elif isinstance(t, dict):
        ttype = next(iter(t))
        kwargs = dict(t[ttype] or {})
    else:
        return
    name = f"{ttype}_{model}" + (f"_{column}" if column else "")
    p.tests[name] = {"type": ttype, "model": model, "column": column, **kwargs}
