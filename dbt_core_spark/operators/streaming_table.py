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


def materialize_streaming_table(
    spark: "SparkSession",
    node: "Node",
    rel: str,
    sql: str,
) -> int:
    """Run the compiled (streaming) SQL with Trigger.AvailableNow into a
    parquet location + checkpoint derived from the relation name, then
    ensure the catalog table points at it."""
    base = os.path.join(_warehouse_dir(spark), "_streaming", rel.replace(".", "__"))
    out_path = os.path.join(base, "data")
    ckpt = os.path.join(base, "_checkpoint")

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
