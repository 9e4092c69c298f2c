"""On-disk partial parsing: persist parse results across processes.

The reference serializes the whole msgpack manifest
(``target/partial_parse.msgpack``, ref: parser/partial.py:68-1090;
read_manifest/write_manifest parser/manifest.py) so a cold ``dbt parse``
skips re-rendering unchanged files — parsing is the reference's ONLY
published benchmark.  Here the cache is the minimal slice the in-memory
partial parser (plans/parser.py) consults: per-node raw_code +
recorded refs/sources/captured_config, plus macro sources (a macro
change invalidates everything, same as the reference).

JSON on disk: the payload is small (raw SQL + dep lists), and JSON
avoids pickle's code-execution surface for a file that may come from a
shared target/ directory.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from dbt_core_spark.plans.nodes import Manifest, Node, NodeType

PARTIAL_PARSE_FILE = os.path.join("target", "partial_parse.json")
_FORMAT_VERSION = 1


def partial_parse_path(project_root: str) -> str:
    return os.path.join(project_root, PARTIAL_PARSE_FILE)


def write_partial_parse(
    manifest: Manifest, project_root: str, cli_vars: dict | None = None
) -> str:
    doc = {
        "version": _FORMAT_VERSION,
        # invalidation inputs beyond raw_code/macros (ref: the
        # reference's partial-parse validity checks re-parse on
        # vars/env/profile changes, parser/manifest.py): project vars
        # compare in parse_project; cli_vars + observed env values
        # compare at load time
        "vars": manifest.vars,
        "cli_vars": cli_vars or {},
        "env_vars": manifest.used_env_vars,
        "macros": manifest.macros,
        "package_macros": manifest.package_macros,
        "nodes": {
            uid: {
                "name": n.name,
                "package": n.package,
                "resource_type": n.resource_type.value,
                "raw_code": n.raw_code,
                "refs": [list(r) if isinstance(r, (tuple, list)) else r
                         for r in n.refs],
                "sources": [list(s) for s in n.sources],
                "captured_config": n.captured_config,
            }
            for uid, n in manifest.nodes.items()
            if n.raw_code and n.language == "sql"
        },
    }
    path = partial_parse_path(project_root)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, default=str)
    os.replace(tmp, path)  # atomic: a concurrent reader never sees a torn file
    return path


def _fingerprint(d: dict) -> str:
    return json.dumps(d or {}, sort_keys=True, default=str)


def load_partial_parse(
    project_root: str, cli_vars: dict | None = None
) -> Optional[Manifest]:
    """Rebuild a cache-manifest from disk; None when absent/unreadable/
    version-mismatched (a bad cache must never break parsing — the
    reference falls back to a full parse the same way).  Also None when
    ``cli_vars`` or any env var observed by the cached parse differs
    from the current invocation — a render that depends on var()/
    env_var() must not silently reuse stale refs/config."""
    path = partial_parse_path(project_root)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            doc = json.load(f)
        if doc.get("version") != _FORMAT_VERSION:
            return None
        if cli_vars is not None and _fingerprint(
            doc.get("cli_vars") or {}
        ) != _fingerprint(cli_vars):
            return None
        for k, v in (doc.get("env_vars") or {}).items():
            if os.environ.get(k) != v:  # v is null when unset at parse time
                return None
        m = Manifest(project_name="partial_parse_cache")
        m.vars = dict(doc.get("vars") or {})
        m.used_env_vars = dict(doc.get("env_vars") or {})
        m.macros = dict(doc.get("macros") or {})
        m.package_macros = {
            k: dict(v) for k, v in (doc.get("package_macros") or {}).items()
        }
        for uid, nd in (doc.get("nodes") or {}).items():
            node = Node(
                unique_id=uid,
                name=nd["name"],
                package=nd["package"],
                resource_type=NodeType(nd["resource_type"]),
                raw_code=nd.get("raw_code") or "",
            )
            node.refs = [
                tuple(r) if isinstance(r, list) else r
                for r in nd.get("refs") or []
            ]
            node.sources = [tuple(s) for s in nd.get("sources") or []]
            node.captured_config = dict(nd.get("captured_config") or {})
            # bypass add_node: cache nodes must not run index/versioning
            # logic — they exist only for raw_code comparison
            m.nodes[uid] = node
        return m
    except Exception:
        return None
