"""Delta Lake compatibility layer.

This container has no Delta/Iceberg, so merge/snapshot materializations
use the parquet anti-join + atomic-rename fallback
(operators/relations.py).  On a cluster with delta-spark installed, the
same call sites upgrade to true ACID MERGE — this module is the seam.

Usage: set ``file_format: delta`` in a model's config; if Delta is
importable the incremental merge path issues ``MERGE INTO`` and table
writes use the delta format (schema evolution via mergeSchema replaces
the ALTER TABLE path).  Without Delta the config falls back to parquet
with a warning, keeping behavior identical.
"""

from __future__ import annotations

import logging
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

_warned_fallback: set[str] = set()


def have_delta() -> bool:
    """True when delta-spark is importable in this environment."""
    try:  # pragma: no cover — not installed in the test container
        import delta  # noqa: F401

        return True
    except Exception:
        return False


def effective_format(requested: str | None, rel: str = "") -> str:
    """Resolve a model's ``file_format`` config against the runtime.

    ``delta`` stays ``delta`` when delta-spark is importable; otherwise
    it degrades to ``parquet`` with one warning per relation (the
    anti-join + atomic-rename fallback has identical merge semantics —
    pinned by the parametrized two-path test in tests/test_delta_seam.py
    — but loses ACID concurrent-writer safety and file-level rewrite)."""
    fmt = requested or "parquet"
    if fmt == "delta" and not have_delta():
        if rel not in _warned_fallback:
            _warned_fallback.add(rel)
            logger.warning(
                "file_format=delta requested for %s but delta-spark is "
                "not installed: falling back to parquet (same merge "
                "results, no ACID/file-level MERGE)", rel or "<model>",
            )
        return "parquet"
    return fmt


def merge_build_sql(
    target_rel: str,
    source_view: str,
    keys: list[str],
    update_cols: list[str],
    insert_cols: list[str],
    extra_conditions: list[str] | None = None,
) -> str:
    """Build the ``MERGE INTO`` statement (split from execution so the
    SQL shape is unit-testable without a Delta runtime).

    ``extra_conditions`` carries ``incremental_predicates`` (raw SQL
    against the ``DBT_INTERNAL_DEST``/``DBT_INTERNAL_SOURCE`` aliases
    per the reference contract, v1/config.py incremental_predicates,
    rewritten to the local ``t``/``s`` aliases) ANDed into the match
    condition — at 100 TB these prune the target-side file scan before
    the join.

    When every non-key column is excluded (``update_cols`` empty) the
    WHEN MATCHED clause is omitted entirely, matching the reference's
    merge macro (an empty UPDATE SET list is invalid SQL)."""
    # PLAIN equality, matching dbt-spark's merge macro
    # (`DBT_INTERNAL_SOURCE.key = DBT_INTERNAL_DEST.key`) and the
    # parquet fallback's pinned NULL contract: a NULL key never
    # matches, so NULL-key source rows insert verbatim.  (`<=>` was
    # used through r5 — it silently upserted NULL-key rows onto each
    # other, diverging from the fallback; merge-kernel fuzz finding.)
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    for p in extra_conditions or []:
        rewritten = (
            p.replace("DBT_INTERNAL_DEST", "t")
            .replace("DBT_INTERNAL_SOURCE", "s")
        )
        cond += f" AND ({rewritten})"
    ins_cols = ", ".join(insert_cols)
    ins_vals = ", ".join(f"s.{c}" for c in insert_cols)
    matched = ""
    if update_cols:
        sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets} "
    return (
        f"MERGE INTO {target_rel} t USING {source_view} s ON {cond} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def merge_into(
    spark: "SparkSession",
    target_rel: str,
    source_view: str,
    keys: list[str],
    update_cols: list[str],
    insert_cols: list[str],
    extra_conditions: list[str] | None = None,
) -> None:  # pragma: no cover — requires Delta runtime
    """ACID upsert via Delta ``MERGE INTO`` (the production path for the
    parquet `_merge_frames` fallback; semantics pinned by the same
    reference tests — tests/functional/adapter/incremental/)."""
    if not have_delta():
        raise RuntimeError("delta-spark not available; use the parquet fallback")
    spark.sql(merge_build_sql(
        target_rel, source_view, keys, update_cols, insert_cols,
        extra_conditions,
    ))
