"""Runtime compilation: Jinja render with real relations + ephemeral CTE
injection.

Re-expresses Compiler._compile_code / _recursively_prepend_ctes /
inject_ctes_into_sql (ref: core/dbt/compilation.py:306-452,574-642).
Rendering happens **at execution time**, per node, exactly like the
reference (compilation.py:541-571) — so ``ref()`` resolves to relations
that exist mid-run and ``is_incremental()`` reflects current state.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Optional

from dbt_core_spark.functions.context import RenderContext, render
from dbt_core_spark.plans.nodes import Manifest, Node

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


_WITH_RE = re.compile(
    r"^\s*(--.*?\n|/\*.*?\*/\s*)*\s*with\b(\s+recursive\b)?",
    re.IGNORECASE | re.DOTALL,
)


def compile_node(
    manifest: Manifest,
    node: Node,
    spark: Optional["SparkSession"],
    relations: dict[str, str],
    cli_vars: Optional[dict] = None,
    is_incremental: bool = False,
    event_time_filter: Optional[tuple[str, str, str]] = None,
    resolve_limit: Optional[int] = None,
) -> str:
    """Render a node's Jinja → SQL, then prepend ephemeral CTEs.

    CTE accumulation is context-local (ctx.extra_ctes), never on the
    shared Node — compile_node is called concurrently by worker threads
    and per-batch microbatch runs for nodes sharing ephemeral upstreams.
    """
    ctx = RenderContext(
        manifest,
        node,
        mode="runtime",
        spark=spark,
        relations=relations,
        cli_vars=cli_vars,
        is_incremental=is_incremental,
        event_time_filter=event_time_filter,
        resolve_limit=resolve_limit,
    )
    sql = render(node.raw_code, ctx).strip().rstrip(";")
    ctes = _gather_ctes(
        manifest, ctx.extra_ctes, spark, relations, cli_vars, event_time_filter
    )
    if ctes:
        sql = inject_ctes_into_sql(sql, ctes)
    node.extra_ctes = list(ctx.extra_ctes)  # for inspection only
    node.compiled = True
    node.compiled_code = sql
    return sql


def _gather_ctes(
    manifest: Manifest,
    root_ctes: list[tuple[str, str]],
    spark: Optional["SparkSession"],
    relations: dict[str, str],
    cli_vars: Optional[dict],
    event_time_filter: Optional[tuple[str, str, str]],
) -> list[tuple[str, str]]:
    """Recursively collect ephemeral upstream CTEs in dependency order,
    deduplicated (ref: _recursively_prepend_ctes compilation.py:306-396).
    Each upstream render gets its own context; nothing is written to the
    shared Node objects (thread-safe under the runner's worker pool)."""
    ordered: list[tuple[str, str]] = []
    seen: set[str] = set()

    def visit(entries: list[tuple[str, str]]) -> None:
        for uid, cte_name in entries:
            if uid in seen:
                continue
            seen.add(uid)
            upstream = manifest.nodes[uid]
            ctx = RenderContext(
                manifest, upstream, mode="runtime", spark=spark,
                relations=relations, cli_vars=cli_vars,
                event_time_filter=event_time_filter,
            )
            up_sql = render(upstream.raw_code, ctx).strip().rstrip(";")
            visit(ctx.extra_ctes)  # ephemeral-on-ephemeral chains first
            ordered.append((cte_name, up_sql))

    visit(root_ctes)
    return ordered


def inject_ctes_into_sql(sql: str, ctes: list[tuple[str, str]]) -> str:
    """Prepend ``WITH name AS (...)`` clauses, merging with an existing
    leading WITH (ref: inject_ctes_into_sql compilation.py:574-642)."""
    if not ctes:
        return sql
    cte_sql = ", ".join(f"{name} as ({body})" for name, body in ctes)
    m = _WITH_RE.match(sql)
    if m:
        # "with a as (...) select" → "with <ours>, a as (...) select"
        idx = m.end()  # position right after the 'with' keyword
        return sql[: idx] + " " + cte_sql + "," + sql[idx:]
    return f"with {cte_sql} {sql}"
