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

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


def have_delta() -> bool:
    """True when delta-spark is importable in this environment."""
    try:  # pragma: no cover — not installed in the test container
        import delta  # noqa: F401

        return True
    except Exception:
        return False


def merge_into(
    spark: "SparkSession",
    target_rel: str,
    source_view: str,
    keys: list[str],
    update_cols: list[str],
    insert_cols: list[str],
) -> None:  # pragma: no cover — requires Delta runtime
    """ACID upsert via Delta ``MERGE INTO`` (the production path for the
    parquet `_merge_frames` fallback; semantics pinned by the same
    reference tests — tests/functional/adapter/incremental/)."""
    if not have_delta():
        raise RuntimeError("delta-spark not available; use the parquet fallback")
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    ins_cols = ", ".join(insert_cols)
    ins_vals = ", ".join(f"s.{c}" for c in insert_cols)
    spark.sql(
        f"MERGE INTO {target_rel} t USING {source_view} s ON {cond} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )
