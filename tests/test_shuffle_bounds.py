"""Measured shuffle-traffic bounds — regression tests on the scale
contract.  Unlike tests/test_plans.py (which pins plan SHAPES), these
pin actual exchange metrics from executed plans: partial aggregation,
group-limit top-k, and broadcast joins must keep shuffled record
counts near their theoretical minimum, not near the input size.
Bounds are loose (2× the structural bound) so data growth in the
fixtures never flakes them, but a lost partial-agg or a broadcast
regressing to a shuffle join blows straight through."""

from pyspark.sql import functions as F

import __spark_entry__ as em
from dbt_core_spark.audit import exchange_stats


def _run(df):
    df.collect()
    return exchange_stats(df)


def test_q1_shuffles_group_rows_only(spark, sf_dir):
    """Q1 aggregates the whole lineitem table into ~4 groups; with
    map-side partial aggregation the single shuffle carries at most
    groups x input-partitions records, never the raw rows."""
    stats = _run(em.q1_pricing_summary(spark, sf_dir))
    assert stats["exchanges"] >= 1
    parts = spark.sparkContext.defaultParallelism
    assert stats["shuffle_records"] <= 2 * 4 * max(parts, 1)


def test_q5_dimensions_broadcast_not_shuffled(spark, sf_dir):
    """Q5's five dimension joins must all broadcast: the only shuffle
    left is the final tiny group-by (rows = nations x partitions at
    most), not a join repartition of lineitem/orders."""
    stats = _run(em.q5_local_supplier_volume(spark, sf_dir))
    assert stats["broadcasts"] >= 4
    parts = spark.sparkContext.defaultParallelism
    assert stats["shuffle_records"] <= 2 * 25 * max(parts, 1)


def test_window_topk_group_limit_bounds_shuffle(spark, sf_dir):
    """Top-3-per-customer: WindowGroupLimit prunes to at most k rows
    per group per map partition BEFORE the exchange, so shuffled
    records stay within ~2x of the final output, never the full
    orders table."""
    df = em.window_top3_orders_per_customer(spark, sf_dir)
    rows = df.collect()
    stats = exchange_stats(df)
    assert stats["shuffle_records"] <= 2 * max(len(rows), 1)


def test_hll_sketch_shuffles_registers_not_rows(spark, sf_dir):
    """The HLL sketch alone (p=8 -> 256 registers): partial max per
    (group, bucket) bounds the shuffle by groups x m x partitions —
    independent of input cardinality.  (The gate query's exact-verify
    branch intentionally shuffles more; this pins the sketch.)"""
    from dbt_core_spark.operators.sketches import hll_distinct

    ev = em._t(spark, sf_dir, "events")
    df = hll_distinct(ev, "event_id", ["event_type"], p=8)
    df.collect()
    stats = exchange_stats(df)
    n_groups = ev.select("event_type").distinct().count()
    parts = spark.sparkContext.defaultParallelism
    bound = 2 * (n_groups * 256 * max(parts, 1) + n_groups * max(parts, 1))
    assert 0 < stats["shuffle_records"] <= bound


def test_contrastive_fallback_is_broadcast_shaped(spark, sf_dir):
    """The singleton-bucket negative fallback must join its per-index
    candidate table (one row per distinct chunk index) as a BROADCAST —
    a sort-merge/shuffle join there would re-key the anchor corpus on
    chunk_idx, which is skew city at scale (most docs share low
    indexes)."""
    from dbt_core_spark.operators.textstats import (
        chunk_documents, contrastive_pairs)

    docs = em._t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_words=40, overlap=10)
    out = contrastive_pairs(chunks)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the fallback's fb join and its c1 feeder must both broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
