"""Small-file compaction (OPTIMIZE analog)."""

import uuid

from pyspark.sql import functions as F

from dbt_core_spark.operators.relations import compact_table


def _fragmented_table(spark, schema, n_rows=2000, n_files=32):
    rel = f"{schema}.frag_{uuid.uuid4().hex[:6]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema.split('.')[0]}")
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 50).alias("a"),
        (F.col("id") % 37).alias("b"))
    df.repartition(n_files).write.saveAsTable(rel)
    return rel


def test_compact_reduces_file_count_preserves_rows(spark, schema):
    rel = _fragmented_table(spark, schema)
    before_files = len(spark.table(rel).inputFiles())
    assert before_files >= 16  # genuinely fragmented
    before = spark.table(rel).orderBy("id").collect()
    rpt = compact_table(spark, rel, target_file_mb=128)
    assert rpt["files_before"] == before_files
    assert rpt["rows"] == 2000
    after_files = len(spark.table(rel).inputFiles())
    assert after_files <= rpt["target_files"] < before_files
    assert spark.table(rel).orderBy("id").collect() == before


def test_compact_with_zorder_clusters_files(spark, schema):
    rel = _fragmented_table(spark, schema, n_rows=4000)
    compact_table(spark, rel, target_file_mb=1, zorder_by=["a", "b"])
    t = spark.table(rel)
    assert t.count() == 4000
    assert "zcode" not in t.columns  # helper column dropped
    # clustered layout: within each file, the 'a' range is a subset
    stats = (
        t.withColumn("f", F.input_file_name())
        .groupBy("f").agg((F.max("a") - F.min("a")).alias("spread"))
        .collect()
    )
    if len(stats) > 1:  # tiny tables may compact to one file
        assert min(r["spread"] for r in stats) < 49  # not all full-range


def test_engine_optimize_verb(spark, schema, sf_dir):
    """eng.optimize(model) compacts a built table model in place."""
    import pytest as _pytest

    from dbt_core_spark import Engine, ProjectDef

    p = ProjectDef(name="opt")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["wide_orders"] = """
        {{ config(materialized='table') }}
        select o_orderkey, o_custkey, o_totalprice
        from {{ source('tpch','orders') }}
        distribute by o_orderkey % 24
    """
    p.models["v"] = "select 1 as one"
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    before = eng.table("wide_orders").orderBy("o_orderkey").collect()
    rpt = eng.optimize("wide_orders", target_file_mb=256)
    assert rpt["rows"] == len(before)
    assert len(eng.table("wide_orders").inputFiles()) <= rpt["target_files"]
    assert eng.table("wide_orders").orderBy("o_orderkey").collect() == before
    with _pytest.raises(ValueError):
        eng.optimize("v")  # views have nothing to compact


def test_cli_optimize_verb(spark, schema, sf_dir):
    from dbt_core_spark.run.cli import SparkbtRunner

    from dbt_core_spark import Engine, ProjectDef

    p = ProjectDef(name="opt2")
    p.add_source("tpch", "orders", f"{sf_dir}/orders.parquet")
    p.models["t"] = ("{{ config(materialized='table') }} "
                     "select * from {{ source('tpch','orders') }} "
                     "distribute by o_orderkey % 16")
    eng = Engine(spark, p, schema=schema)
    assert eng.run().ok()
    res = SparkbtRunner(engine=eng).invoke(
        ["optimize", "t", "--target-file-mb", "256"])
    assert res.success and res.result["rows"] > 0


def test_compact_preserves_partition_layout(spark, schema):
    """Compacting a hive-partitioned table must keep the partition
    scheme (the pruning lever), only merging files WITHIN partitions."""
    rel = f"{schema}.part_frag"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema.split('.')[0]}")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("day"))
    df.repartition(16).write.partitionBy("day").saveAsTable(rel)
    before = spark.table(rel).orderBy("id").collect()
    compact_table(spark, rel, target_file_mb=128)
    after_cols = {c.name for c in spark.catalog.listColumns(rel)
                  if c.isPartition}
    assert after_cols == {"day"}  # layout survived
    assert spark.table(rel).orderBy("id").collect() == before
    # partition pruning still works on the compacted table
    plan = spark.table(rel).filter("day = '2'") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan


def test_fresh_engine_schema_clears_orphan_warehouse_dir(spark):
    """Driver r7 repro (engine_compaction LOCATION_ALREADY_EXISTS): a
    warehouse directory left behind by a PREVIOUS process — the fresh
    metastore knows nothing about it, so ``DROP DATABASE`` is a no-op
    on disk — must not break gates that ``saveAsTable``.
    _fresh_engine_schema physically removes the on-disk location after
    the catalog drop."""
    import os
    from urllib.parse import urlparse

    import __spark_entry__ as entry

    db = "t_orphan_gate"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, f"{db}.db", "orders_frag")
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "part-00000.parquet"), "wb") as f:
        f.write(b"stale bytes from a dead session")
    # the catalog has never heard of this db: catalog-only drop can't help
    assert not spark.catalog.databaseExists(db)

    entry._fresh_engine_schema(spark, db)
    assert not os.path.exists(os.path.join(wh, f"{db}.db"))

    # and the gate's write pattern now succeeds where the driver failed
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    spark.range(5).write.mode("overwrite").saveAsTable(f"{db}.orders_frag")
    assert spark.table(f"{db}.orders_frag").count() == 5
    entry._fresh_engine_schema(spark, db)
