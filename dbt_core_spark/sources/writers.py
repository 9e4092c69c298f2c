"""Training-data sinks: deterministic sharded output.

The last stage of a corpus pipeline writes a training-ready dataset as
a FIXED number of shards with stable doc→shard assignment — data
loaders address shards by index, resuming training needs byte-stable
files, and shard counts must not drift with cluster size or AQE
decisions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    shard_key: str = "doc_id",
    sort_by: Optional[list[str]] = None,
    file_format: str = "parquet",
    partition_by: Optional[list[str]] = None,
) -> None:
    """Write exactly ``n_shards`` files (per partition dir if
    ``partition_by`` is set), sharded by ``pmod(xxhash64(key), n)`` —
    the assignment is a pure function of the key, so reruns, different
    cluster sizes, and different input partitionings produce identical
    shard membership.

    Layout: ``path/shard=K/part-*`` with exactly ONE file per shard
    directory.  Each row's shard value lives in exactly one task
    partition (clustered on the shard column), so every ``shard=K`` dir
    receives a single file even when the murmur task-mapping co-locates
    two shard values in one task.  ``sort_by`` orders rows inside each
    shard file (stable reader order + parquet row-group stats).
    ``partition_by`` adds user partition dirs ABOVE the shard level."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    spark = df.sparkSession
    out = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(shard_key)), F.lit(n_shards))
    )
    cluster = [*(partition_by or []), "shard"]
    out = out.repartition(n_shards, *[F.col(c) for c in cluster])
    order = [F.col(c) for c in cluster] + [F.col(c) for c in (sort_by or [shard_key])]
    out = out.sortWithinPartitions(*order)
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        out.write.format(file_format).mode("overwrite").partitionBy(
            *(partition_by or []), "shard"
        ).save(path)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
