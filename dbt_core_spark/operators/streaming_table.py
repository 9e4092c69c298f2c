"""``streaming_table`` materialization: a model executed as a
Structured Streaming pipeline with a per-relation checkpoint.

The Spark-native upgrade over watermark-column incremental models
(SURVEY §2.A microbatch note): instead of compiling ``is_incremental()``
filters, the model's SQL runs against **streaming** views of its
sources; each ``dbt run`` triggers an AvailableNow drain that appends
exactly the new input files — exactly-once, enforced by the checkpoint,
with zero bookkeeping in the model.

Config:
- sources consumed as streams are declared ``stream: true``; optional
  ``watermark: {column, delay}`` enables windowed aggregations in the
  model SQL (``group by window(ts, '1 hour')``).
- model config: ``output_mode`` (default append), ``partition_by``.

Scale notes: state lives in the checkpoint (RocksDB on a cluster);
file-source listing is incremental; output files append per batch —
pair with partition_by on event-time date for pruned reads downstream.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from dbt_core_spark.exceptions import ExecutionError
from dbt_core_spark.operators import relations as R

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

    from dbt_core_spark.plans.nodes import Node


def _warehouse_dir(spark: "SparkSession") -> str:
    d = spark.conf.get("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    return d.removeprefix("file:")


def _norm_path(p: str) -> str:
    """Normalize a file URI / local path to a single-leading-slash local
    path for comparison (Spark records ``file:///x`` or ``file:/x``)."""
    import re

    p = p.removeprefix("file:")
    return re.sub(r"^/+", "/", p).rstrip("/")


def _checkpoint_recorded_roots(ckpt: str) -> set:
    """Parent directories of the input files a FileStreamSource
    checkpoint has already committed (``<ckpt>/sources/<i>/<batch>``
    compact logs: a version header line, then one JSON entry per file).
    Only the earliest few batches per source are read — the root never
    changes within one checkpoint."""
    import json

    roots: set = set()
    src_dir = os.path.join(ckpt, "sources")
    if not os.path.isdir(src_dir):
        return roots
    for sub in sorted(os.listdir(src_dir)):
        d = os.path.join(src_dir, sub)
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d))[:3]:
            try:
                with open(os.path.join(d, fname)) as fh:
                    for line in fh:
                        line = line.strip()
                        if not line.startswith("{"):
                            continue
                        p = json.loads(line).get("path")
                        if p:
                            roots.add(_norm_path(os.path.dirname(p)))
            except (OSError, ValueError):
                continue
    return roots


def _check_source_locations(
    spark: "SparkSession",
    node: "Node",
    base: str,
    ckpt: str,
    source_locations,
) -> None:
    """Fail fast (or reset, per config) when the checkpoint was built
    against different source locations than the model now declares.

    Without this, a user who repoints a ``stream: true`` source (or
    whose location is environment-templated) gets Spark's opaque
    ``Wrong basePath`` STREAM_FAILED on the next run — or, worse,
    silent duplicate ingestion if the new location reuses the old
    basePath with renamed part files.  dbt's posture is a clear,
    actionable error (reference: on_schema_change-style config
    surface).  Config ``on_source_change``: ``fail`` (default) |
    ``reset`` (drop checkpoint + data and re-drain from scratch)."""
    import shutil

    if not source_locations:
        return
    recorded = _checkpoint_recorded_roots(ckpt)
    if not recorded:
        return
    current = {_norm_path(loc) for loc in source_locations if loc}
    # a recorded root is "covered" if it IS a current location or sits
    # under one (partitioned/nested layouts record leaf dirs)
    stale = {
        r for r in recorded
        if not any(r == c or r.startswith(c + "/") for c in current)
    }
    if not stale:
        return
    mode = (node.config or {}).get("on_source_change", "fail")
    if mode == "reset":
        shutil.rmtree(base, ignore_errors=True)
        return
    raise ExecutionError(
        f"{node.name}: stream source location changed — the checkpoint "
        f"at {ckpt} was built from {sorted(stale)} but the model now "
        f"reads {sorted(current)}. Reset the checkpoint directory "
        f"(delete {base}) or set on_source_change: reset on the model "
        f"to re-drain from scratch."
    )


def materialize_streaming_table(
    spark: "SparkSession",
    node: "Node",
    rel: str,
    sql: str,
    source_locations=None,
) -> int:
    """Run the compiled (streaming) SQL with Trigger.AvailableNow into a
    parquet location + checkpoint derived from the relation name, then
    ensure the catalog table points at it."""
    base = os.path.join(_warehouse_dir(spark), "_streaming", rel.replace(".", "__"))
    out_path = os.path.join(base, "data")
    ckpt = os.path.join(base, "_checkpoint")
    _check_source_locations(spark, node, base, ckpt, source_locations)

    df = spark.sql(sql)
    if not df.isStreaming:
        raise ExecutionError(
            f"{node.name}: streaming_table model must read at least one "
            f"stream: true source"
        )
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode(node.config.get("output_mode", "append"))
        .trigger(availableNow=True)
    )
    partition_by = node.config.get("partition_by")
    if partition_by:
        cols = partition_by if isinstance(partition_by, list) else [partition_by]
        writer = writer.partitionBy(*cols)
    q = writer.start()
    q.awaitTermination()

    if not spark.catalog.tableExists(rel):
        R.ensure_database(spark, rel.rsplit(".", 1)[0])
        spark.sql(f"CREATE TABLE {rel} USING parquet LOCATION '{out_path}'")
    else:
        spark.sql(f"REFRESH TABLE {rel}")
    return -1


def streaming_view_for_source(spark: "SparkSession", source_node: "Node",
                              view_name: str) -> str:
    """Register a streaming temp view over a stream:true source's files.
    Schema comes from a batch read (streaming sources cannot infer)."""
    loc = source_node.external_location or ""
    fmt = (source_node.external_format or "parquet").lower()
    schema = spark.read.format(fmt).option("header", "true").load(loc).schema
    stream = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        stream = stream.option("header", "true")
    df = stream.load(loc)
    wm = source_node.config.get("watermark") if source_node.config else None
    if wm:
        from pyspark.sql import functions as F

        # json/csv sources infer event-time columns as strings; the
        # watermark column must be a timestamp, so cast it here
        col = wm["column"]
        if dict(df.dtypes).get(col) not in ("timestamp", "timestamp_ntz"):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        df = df.withWatermark(col, wm["delay"])
    df.createOrReplaceTempView(view_name)
    return view_name
