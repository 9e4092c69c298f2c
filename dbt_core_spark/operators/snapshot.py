"""Snapshot (SCD Type-2) materialization.

Semantics from the reference (ref: SnapshotConfig
artifacts/resources/v1/snapshot.py:19-76; runner task/snapshot.py:16-56;
pinned by tests/functional/snapshots/ — test_basic_snapshot.py,
test_check_cols_snapshot.py, test_hard_delete_snapshot.py,
test_snapshot_column_names.py):

- ``timestamp`` strategy: a row changed iff source ``updated_at`` is
  newer than the tracked version's.
- ``check`` strategy: changed iff any of ``check_cols`` (or ``'all'``)
  differ; version timestamps use the snapshot run time.
- meta columns ``dbt_scd_id / dbt_valid_from / dbt_valid_to /
  dbt_updated_at`` (renamable via ``snapshot_meta_column_names``);
  optional ``dbt_valid_to_current`` sentinel instead of NULL.
- ``hard_deletes``: ignore | invalidate | new_record.

Spark plan: one key-shuffle join of current-rows × source; historical
rows are unioned back untouched (at 100 TB: partition the snapshot table
so current rows cluster, and use Delta MERGE instead of the rebuild).
The engine accepts ``snapshot_at`` config to pin "now" for deterministic
tests (the reference uses wall-clock now()).
"""

from __future__ import annotations

import datetime as _dt
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dbt_core_spark.exceptions import ExecutionError
from dbt_core_spark.operators import delta_compat
from dbt_core_spark.operators import relations as R
from dbt_core_spark.plans.nodes import Node


def _meta_names(node: Node) -> dict[str, str]:
    names = {
        "dbt_scd_id": "dbt_scd_id",
        "dbt_valid_from": "dbt_valid_from",
        "dbt_valid_to": "dbt_valid_to",
        "dbt_updated_at": "dbt_updated_at",
        "dbt_is_deleted": "dbt_is_deleted",
    }
    names.update(node.config.get("snapshot_meta_column_names") or {})
    return names


def _scd_id(key_cols: list[str], ts_col) -> "F.Column":
    """``dbt_scd_id = md5(key | updated_at)`` (reference formula:
    global-project snapshot_hash_arguments)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols]
    parts.append(F.coalesce(ts_col.cast("string"), F.lit("")))
    return F.md5(F.concat_ws("|", *parts))


def materialize_snapshot(
    spark: SparkSession, node: Node, rel: str, sql: str
) -> int:
    cfg = node.config
    strategy = cfg.get("strategy", "timestamp")
    keys = cfg.get("unique_key")
    if not keys:
        raise ExecutionError(f"snapshot {node.name}: unique_key required")
    keys = keys if isinstance(keys, list) else [keys]
    meta = _meta_names(node)
    scd, vfrom, vto, vupd = (
        meta["dbt_scd_id"], meta["dbt_valid_from"], meta["dbt_valid_to"],
        meta["dbt_updated_at"],
    )
    hard_deletes = cfg.get("hard_deletes") or (
        "invalidate" if cfg.get("invalidate_hard_deletes") else "ignore"
    )
    snapshot_at = cfg.get("snapshot_at")
    now = (
        F.lit(snapshot_at).cast("timestamp")
        if snapshot_at
        else F.lit(_dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    )

    src = spark.sql(sql)
    if strategy == "timestamp":
        updated_at = cfg.get("updated_at")
        if not updated_at:
            raise ExecutionError(f"snapshot {node.name}: updated_at required")
        src_version_ts = F.col(updated_at)
    elif strategy == "check":
        check_cols = cfg.get("check_cols", "all")
        if check_cols == "all":
            check_cols = [c for c in src.columns]
        src_version_ts = now
    else:
        raise ExecutionError(f"unknown snapshot strategy '{strategy}'")

    # dbt_valid_to_current: optional sentinel (e.g. '9999-12-31') stored
    # instead of NULL for open rows (ref: SnapshotConfig v1/snapshot.py,
    # tests/functional/snapshots/ test_snapshot_column_names.py family)
    vto_current = cfg.get("dbt_valid_to_current")
    open_vto = (
        F.lit(vto_current).cast("timestamp") if vto_current
        else F.lit(None).cast("timestamp")
    )

    src = src.withColumn(vupd, src_version_ts).withColumn(
        scd, _scd_id(keys, src_version_ts)
    ).withColumn(vfrom, src_version_ts).withColumn(vto, open_vto)

    is_del = meta["dbt_is_deleted"]
    if not R.relation_exists(spark, rel):
        if hard_deletes == "new_record":
            # reference writes 'False' on every inserted record so the
            # flag is total (filters like dbt_is_deleted = 'False' work)
            src = src.withColumn(is_del, F.lit("False"))
        R.write_table(
            spark, rel, src, mode="overwrite",
            file_format=delta_compat.effective_format(
                cfg.get("file_format"), rel),
        )
        return -1

    target = spark.table(rel)
    is_open = (
        F.col(vto).eqNullSafe(F.lit(vto_current).cast("timestamp"))
        if vto_current else F.col(vto).isNull()
    )
    current = target.filter(is_open)
    history = target.filter(~is_open)

    s = src.alias("s")
    c = current.alias("c")
    key_cond = [F.col(f"s.{k}").eqNullSafe(F.col(f"c.{k}")) for k in keys]
    joined = c.join(s, key_cond, "full_outer")

    src_cols = src.columns  # includes meta
    tgt_cols = target.columns

    if strategy == "timestamp":
        # NULL source updated_at must read as "unchanged", not NULL —
        # a NULL predicate would drop the key's current row entirely
        # (reference MERGE leaves unmatched target rows untouched).
        changed = F.coalesce(
            F.col(f"s.{vupd}") > F.col(f"c.{vupd}"), F.lit(False)
        )
    else:
        changed = (
            F.concat_ws(
                "|", *[F.coalesce(F.col(f"s.{cc}").cast("string"), F.lit("␀")) for cc in check_cols]
            )
            != F.concat_ws(
                "|", *[F.coalesce(F.col(f"c.{cc}").cast("string"), F.lit("␀")) for cc in check_cols]
            )
        )

    in_src = F.col(f"s.{scd}").isNotNull()
    in_cur = F.col(f"c.{scd}").isNotNull()

    # 1) kept current rows (unchanged, or changed-handling keeps a closed copy)
    kept = joined.filter(in_cur & in_src & ~changed).select(
        *[F.col(f"c.{cc}").alias(cc) for cc in tgt_cols]
    )
    # 2) closed-out versions of changed rows: valid_to = new version ts
    closed = joined.filter(in_cur & in_src & changed).select(
        *[
            (F.col(f"s.{vfrom}") if cc == vto else F.col(f"c.{cc}")).alias(cc)
            for cc in tgt_cols
        ]
    )
    # 3) new versions of changed rows + brand-new keys
    inserts = joined.filter(in_src & (~in_cur | changed)).select(
        *[F.col(f"s.{cc}").alias(cc) for cc in src_cols]
    )
    # 4) hard deletes: keys present in current but missing from source
    deleted_cur = joined.filter(in_cur & ~in_src)
    if hard_deletes == "invalidate":
        deleted = deleted_cur.select(
            *[(now if cc == vto else F.col(f"c.{cc}")).alias(cc) for cc in tgt_cols]
        )
        extra_new = None
    elif hard_deletes == "new_record":
        deleted = deleted_cur.select(
            *[(now if cc == vto else F.col(f"c.{cc}")).alias(cc) for cc in tgt_cols]
        )
        extra_new = deleted_cur.select(
            *[
                (
                    now
                    if cc in (vfrom, vupd)
                    else open_vto
                    if cc == vto
                    else F.col(f"c.{cc}")
                )
                .alias(cc)
                for cc in tgt_cols
            ]
        ).withColumn(is_del, F.lit("True"))
    else:  # ignore
        deleted = deleted_cur.select(*[F.col(f"c.{cc}").alias(cc) for cc in tgt_cols])
        extra_new = None

    out = history.unionByName(kept).unionByName(closed).unionByName(
        inserts, allowMissingColumns=True
    ).unionByName(deleted, allowMissingColumns=True)
    if extra_new is not None:
        out = out.unionByName(extra_new, allowMissingColumns=True)
    if hard_deletes == "new_record":
        # make the flag total: rows that predate the column (or arrive
        # via allowMissingColumns) read 'False', deletion records 'True'
        if is_del in out.columns:
            out = out.withColumn(
                is_del, F.coalesce(F.col(is_del), F.lit("False"))
            )
        else:
            out = out.withColumn(is_del, F.lit("False"))

    R.rebuild_table(
        spark, rel, out,
        file_format=delta_compat.effective_format(cfg.get("file_format"), rel),
    )
    return -1
