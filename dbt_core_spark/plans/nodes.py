"""Node & Manifest model.

Re-expresses the reference's typed resource graph
(ref: core/dbt/artifacts/resources/types.py:18-37 NodeType enum;
core/dbt/contracts/graph/nodes.py BaseNode→ParsedNode→CompiledNode;
core/dbt/contracts/graph/manifest.py:860 Manifest) as plain dataclasses.
The warehouse-side data is Spark's; these nodes are the orchestration IR.

unique_id format matches the reference: ``"<type>.<package>.<name>"``
(e.g. tests/functional/basic/test_jaffle_shop.py:15).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional


class NodeType(str, Enum):
    """Executable resource taxonomy (ref: artifacts/resources/types.py:18-37)."""

    Model = "model"
    Seed = "seed"
    Snapshot = "snapshot"
    Test = "test"
    UnitTest = "unit_test"
    Source = "source"
    Operation = "operation"
    Analysis = "analysis"
    SqlOperation = "sql_operation"
    Exposure = "exposure"
    Metric = "metric"
    # semantic-layer metadata nodes (ref: contracts/graph/nodes.py:1490
    # SemanticModel, :1556 SavedQuery) — graph members for selection and
    # lineage; CALCULATION stays external like the reference (MetricFlow)
    SemanticModel = "semantic_model"
    SavedQuery = "saved_query"


# Default per-type config (ref: artifacts/resources/v1/config.py:78-128 —
# materialized default is "view" at :81; on_schema_change default "ignore" :109)
DEFAULT_CONFIG: dict[str, Any] = {
    "enabled": True,
    "materialized": "view",
    "incremental_strategy": None,  # append | merge | delete+insert | insert_overwrite | microbatch
    "unique_key": None,
    "on_schema_change": "ignore",
    "full_refresh": None,
    "pre_hook": [],
    "post_hook": [],
    "tags": [],
    "meta": {},
    "persist_docs": {},
    "partition_by": None,  # engine extension: partition columns for table writes
    "event_time": None,  # microbatch (ref: v1/config.py:128)
    "batch_size": None,  # hour|day|month|year (ref: types.py:73-77)
    "lookback": 1,
    "begin": None,
    "merge_exclude_columns": [],
    "incremental_predicates": [],
}


@dataclass
class ColumnInfo:
    """Per-column docs/contract info (ref: components.py:59-70)."""

    name: str
    description: str = ""
    data_type: Optional[str] = None
    constraints: list[dict] = field(default_factory=list)


@dataclass
class Node:
    """A parsed (and later compiled) resource node.

    Mirrors ParsedResource fields alias/checksum/config/tags/raw_code
    (ref: artifacts/resources/v1/components.py:174-199) and
    CompiledResource's refs/sources/depends_on/compiled_code/extra_ctes
    (ref: components.py:210-240).
    """

    unique_id: str
    name: str
    package: str
    resource_type: NodeType
    raw_code: str = ""
    language: str = "sql"  # sql | python (ref: types.py:54-57 ModelLanguage)
    path: str = ""
    alias: Optional[str] = None
    config: dict[str, Any] = field(default_factory=dict)
    columns: dict[str, ColumnInfo] = field(default_factory=dict)
    description: str = ""

    # dependency info filled by the parser (parse-time Jinja render)
    refs: list[str] = field(default_factory=list)
    sources: list[tuple[str, str]] = field(default_factory=list)
    depends_on: list[str] = field(default_factory=list)

    # in-file {{ config(...) }} kwargs captured at parse-render — kept
    # separate from the merged config so partial parsing can re-merge
    # against fresh schema-yml/project configs
    captured_config: dict[str, Any] = field(default_factory=dict)

    # compilation artifacts (runtime Jinja render)
    compiled: bool = False
    compiled_code: Optional[str] = None
    extra_ctes: list[tuple[str, str]] = field(default_factory=list)  # (cte_name, sql)
    relation_name: Optional[str] = None

    # test-specific (ref: parser/generic_test_builders.py:69-378)
    test_metadata: dict[str, Any] = field(default_factory=dict)
    attached_node: Optional[str] = None
    column_name: Optional[str] = None

    # model versions (ref: nodes.py:490-491 ModelNode.version/latest_version;
    # tests/functional/model_versions/)
    version: Optional[int] = None
    latest_version: Optional[int] = None

    # group / access (ref: nodes.py group + access fields;
    # tests/functional/access/)

    # seed-specific
    seed_rows: Optional[list[dict]] = None
    seed_path: Optional[str] = None

    # source-specific (ref: contracts/graph/nodes.py:1217 SourceDefinition)
    source_name: Optional[str] = None
    loaded_at_field: Optional[str] = None
    freshness: Optional[dict] = None
    external_location: Optional[str] = None
    external_format: str = "parquet"

    @property
    def identifier(self) -> str:
        # alias may arrive as a direct field (state round-trip) or via
        # config (schema-yml / {{ config(alias=...) }}), like the
        # reference's alias resolution (components.py:174-199).
        # Versioned models default to ``<name>_v<version>``
        # (ref: ModelNode.search_name / fixed_version alias).
        explicit = self.alias or self.config.get("alias")
        if explicit:
            return explicit
        if self.version is not None:
            return f"{self.name}_v{self.version}"
        return self.name

    @property
    def is_latest_version(self) -> bool:
        return self.version is not None and self.version == self.latest_version

    @property
    def checksum(self) -> str:
        return hashlib.md5(self.raw_code.encode()).hexdigest()

    @property
    def is_ephemeral(self) -> bool:
        return self.config.get("materialized") == "ephemeral"

    @property
    def is_refable(self) -> bool:
        return self.resource_type in (NodeType.Model, NodeType.Seed, NodeType.Snapshot)

    def cte_name(self) -> str:
        """CTE alias used when this (ephemeral) node is inlined into a consumer
        (ref: core/dbt/compilation.py:306-396 — ``__dbt__cte__<name>``)."""
        return f"__dbt__cte__{self.name}"


@dataclass
class Manifest:
    """Whole-project IR (ref: contracts/graph/manifest.py:860).

    ``nodes`` holds models/seeds/snapshots/tests keyed by unique_id;
    ``sources`` separately, like the reference's dict split.
    """

    nodes: dict[str, Node] = field(default_factory=dict)
    sources: dict[str, Node] = field(default_factory=dict)
    macros: dict[str, str] = field(default_factory=dict)  # name -> jinja source
    # dependency-package macros, keyed by package then macro-file name;
    # bare-name lookup loses to root macros (locality Core<Imported<Root,
    # ref: manifest.py:563-664), package-qualified access always works
    package_macros: dict[str, dict[str, str]] = field(default_factory=dict)
    project_name: str = "project"
    vars: dict[str, Any] = field(default_factory=dict)
    # env vars observed via env_var() during parse rendering, with the
    # values seen — the partial-parse cache invalidates when any of
    # these changes (ref: manifest env_vars validity checks,
    # parser/manifest.py)
    used_env_vars: dict[str, Any] = field(default_factory=dict)

    exposures: dict[str, dict] = field(default_factory=dict)
    metrics: dict[str, dict] = field(default_factory=dict)
    semantic_models: dict[str, dict] = field(default_factory=dict)
    saved_queries: dict[str, dict] = field(default_factory=dict)
    groups: dict[str, dict] = field(default_factory=dict)  # name -> {owner: ...}
    restricted_packages: set[str] = field(default_factory=set)  # restrict-access
    reparse_count: int = 0
    # per-phase parse timings (ref: ManifestLoaderInfo,
    # parser/manifest.py:199-221) — written to target/perf_info.json
    # by the `parse` verb
    perf_info: dict[str, Any] = field(default_factory=dict)

    # --state / result / source_status selector inputs, attached by
    # Engine.set_state (ref: previous-state loading task/base.py +
    # selector_methods.py:610-830).  macro_checksums carries the state
    # manifest's {macro_name: md5} when loaded from manifest.json.
    state_manifest: Optional["Manifest"] = None
    previous_results: dict[str, str] = field(default_factory=dict)  # uid -> status
    previous_source_status: dict[str, str] = field(default_factory=dict)  # uid -> iso ts
    current_source_status: dict[str, str] = field(default_factory=dict)
    macro_checksums: dict[str, str] = field(default_factory=dict)
    # resolved profile output for the Jinja `target` variable
    # (ref: TargetContext context/base.py; config/profile.py)
    target_context: Optional[dict] = None
    # unique_ids selected by the current invocation (ref:
    # selected_resources providers.py:1503)
    selected_resources: list[str] = field(default_factory=list)

    # lookup indexes (ref: manifest.py RefableLookup:174, SourceLookup:141)
    _ref_index: dict[str, str] = field(default_factory=dict)
    _ref_index_pkg: dict[tuple[str, str], str] = field(default_factory=dict)
    _source_index: dict[tuple[str, str], str] = field(default_factory=dict)

    def add_node(self, node: Node) -> None:
        if node.resource_type is NodeType.Source:
            self.sources[node.unique_id] = node
            key = (node.source_name or "", node.name)
            # like _ref_index below: the root project's declaration wins —
            # a package re-declaring the same source name/table must not
            # silently redirect root models to its location
            if key not in self._source_index or node.package == self.project_name:
                self._source_index[key] = node.unique_id
        else:
            self.nodes[node.unique_id] = node
            if node.is_refable:
                if node.version is not None:
                    # versioned model: pinned lookups use 'name.vN'; the
                    # bare name resolves to latest_version only
                    # (ref: RefableLookup + ModelNode.search_name)
                    vkey = f"{node.name}.v{node.version}"
                    self._ref_index_pkg[(node.package, vkey)] = node.unique_id
                    if vkey not in self._ref_index or node.package == self.project_name:
                        self._ref_index[vkey] = node.unique_id
                    if not node.is_latest_version:
                        return
                self._ref_index_pkg[(node.package, node.name)] = node.unique_id
                # bare-name lookup: the root project's node wins on
                # collision (target-search order, ref: RefableLookup)
                if node.name not in self._ref_index or node.package == self.project_name:
                    self._ref_index[node.name] = node.unique_id

    def resolve_ref(
        self,
        name: str,
        package: Optional[str] = None,
        current: Optional[str] = None,
        version: Optional[int] = None,
    ) -> Optional[Node]:
        """Two-arg ``ref('pkg', 'name')`` resolves within the named
        package only; one-arg search prefers the calling node's own
        package, then the global index (ref: RefArgs components.py:38-55;
        RefableLookup search order).  ``version`` pins a versioned model
        (ref: ref('m', v=N), nodes.py:490-491)."""
        if version is not None:
            name = f"{name}.v{version}"
        if package is not None:
            uid = self._ref_index_pkg.get((package, name))
            return self.nodes.get(uid) if uid else None
        if current is not None:
            uid = self._ref_index_pkg.get((current, name))
            if uid:
                return self.nodes[uid]
        uid = self._ref_index.get(name)
        return self.nodes.get(uid) if uid else None

    def resolve_source(self, source_name: str, table_name: str) -> Optional[Node]:
        uid = self._source_index.get((source_name, table_name))
        return self.sources.get(uid) if uid else None

    def all_nodes(self) -> dict[str, Node]:
        out = dict(self.nodes)
        out.update(self.sources)
        return out

    def executable_nodes(self) -> list[Node]:
        return [n for n in self.nodes.values() if n.config.get("enabled", True)]
