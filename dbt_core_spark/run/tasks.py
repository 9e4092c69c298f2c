"""Secondary task verbs: clone, retry, run-operation, state comparison.

- clone (ref: task/clone.py:19-165): copy relations from another schema
  (the "state" build) into the target schema — zero-copy clone where the
  format supports it (Delta SHALLOW CLONE); CTAS fallback here.
- retry (ref: task/retry.py:1-174): re-run only errored/skipped nodes of
  a previous RunResults.
- run-operation (ref: task/run_operation.py): invoke a named macro.
- state:modified (ref: StateSelectorMethod selector_methods.py:610-790):
  select nodes whose raw_code/config changed vs a previous manifest.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

from dbt_core_spark.functions.context import RenderContext, render
from dbt_core_spark.plans.nodes import Manifest, Node, NodeType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

    from dbt_core_spark.run.runner import RunResults


def clone_relations(
    spark: "SparkSession",
    manifest: Manifest,
    state_schema: str,
    target_schema: str,
    select_names: Optional[set[str]] = None,
) -> dict[str, str]:
    """Clone each refable node's relation from state_schema into
    target_schema (CTAS; swap for `CREATE TABLE ... SHALLOW CLONE` on
    Delta).  Views are re-pointed, not copied."""
    from dbt_core_spark.operators import relations as R

    R.ensure_database(spark, target_schema)
    cloned: dict[str, str] = {}
    for node in manifest.nodes.values():
        if not node.is_refable or node.is_ephemeral:
            continue
        if select_names is not None and node.name not in select_names:
            continue
        src = f"{state_schema}.{node.identifier}"
        dst = f"{target_schema}.{node.identifier}"
        if not spark.catalog.tableExists(src):
            continue
        if R.relation_type(spark, src) == "view":
            R.create_view(spark, dst, f"select * from {src}")
        else:
            R.drop_relation(spark, dst)
            spark.sql(f"create table {dst} using parquet as select * from {src}")
        cloned[node.unique_id] = dst
    return cloned


def run_operation(
    spark: "SparkSession",
    manifest: Manifest,
    macro_name: str,
    args: Optional[dict] = None,
) -> object:
    """Invoke a project macro by name with kwargs; returns its output
    (ref: task/run_operation.py)."""
    node = Node(
        unique_id=f"operation.{manifest.project_name}.{macro_name}",
        name=macro_name, package=manifest.project_name,
        resource_type=NodeType.Operation,
    )
    args_sql = ", ".join(f"{k}={v!r}" for k, v in (args or {}).items())
    template = f"{{{{ {macro_name}({args_sql}) }}}}"
    ctx = RenderContext(manifest, node, mode="runtime", spark=spark)
    return render(template, ctx)


def modified_nodes(current: Manifest, state: Manifest) -> set[str]:
    """unique_ids in `current` that are new or changed vs `state`
    (ref: state:modified — body via checksum, configs via dict compare;
    nodes.py:577-650 same_contents).

    Config compare drops empty values on both sides: a state manifest
    round-tripped through manifest.json omits them (write_manifest
    filters None/[]/{}), and they are not semantic changes."""

    def _cfg(n):
        return {
            k: v for k, v in n.config.items()
            if k != "enabled" and v not in (None, [], {})
        }

    out: set[str] = set()
    for uid, node in current.nodes.items():
        old = state.nodes.get(uid)
        if old is None:
            out.add(uid)  # state:new
            continue
        if node.checksum != old.checksum:
            out.add(uid)
            continue
        if _cfg(node) != _cfg(old):
            out.add(uid)
    return out


def retry_selection(previous: "RunResults") -> set[str]:
    """unique_ids that errored/failed/skipped last run (ref: task/retry.py)."""
    return {
        r.unique_id
        for r in previous.results
        if r.status in ("error", "fail", "skipped")
    }
