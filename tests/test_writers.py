"""Deterministic sharded training-data sink."""

import glob
import os


def test_write_training_shards_fixed_count_and_deterministic(spark, sf_dir, tmp_path):
    import __spark_entry__ as em
    from dbt_core_spark.sources.writers import write_training_shards

    docs = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    p1 = str(tmp_path / "shards1")
    p2 = str(tmp_path / "shards2")
    write_training_shards(docs, p1, n_shards=8, shard_key="doc_id",
                          sort_by=["doc_id"])
    # different input partitioning, same assignment
    write_training_shards(docs.repartition(3), p2, n_shards=8,
                          shard_key="doc_id", sort_by=["doc_id"])
    d1 = sorted(glob.glob(os.path.join(p1, "shard=*")))
    d2 = sorted(glob.glob(os.path.join(p2, "shard=*")))
    assert len(d1) == 8 and len(d2) == 8
    for d in d1 + d2:  # exactly one data file per shard dir
        assert len(glob.glob(os.path.join(d, "part-*"))) == 1
    # shard membership is a pure function of the key: matching dirs
    # hold the same doc_ids in the same order regardless of input layout
    for a, b in zip(d1, d2):
        ids_a = [r["doc_id"] for r in spark.read.parquet(a).collect()]
        ids_b = [r["doc_id"] for r in spark.read.parquet(b).collect()]
        assert ids_a == ids_b and ids_a == sorted(ids_a)
    total = sum(spark.read.parquet(d).count() for d in d1)
    assert total == docs.count()
