"""Salting operators: results must equal the unsalted plan."""

from pyspark.sql import functions as F

from dbt_core_spark.operators.skew import salted_aggregate, salted_join
from _slowmark import _mark_slow  # noqa: E402


def test_salted_aggregate_matches_plain(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["n"], r["q"])
        for r in df.groupBy("l_returnflag").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
        ).collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["q"])
        for r in salted_aggregate(
            df, ["l_returnflag"],
            partial_aggs=[
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
            ],
            merge_aggs=[F.sum("n").alias("n"), F.sum("q").alias("q")],
            salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("k"))
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_mktsegment")
    plain = orders.join(dim, "k").count()
    salted = salted_join(orders, dim, on="k", salts=8).count()
    assert salted == plain


def test_delta_compat_absent():
    from dbt_core_spark.operators.delta_compat import have_delta

    assert have_delta() is False  # this container has no delta-spark


def test_kmv_sketch_accuracy(spark):
    """KMV estimate within ~4/sqrt(k-2) of truth; exact below k."""
    from pyspark.sql import functions as F

    from dbt_core_spark.operators.sketches import kmv_distinct

    # floor(id/4) % 5000 covers 0..4999 fully within each id%4 group
    # (plain id % 5000 would alias with the group: gcd(4,5000)=4)
    df = spark.range(0, 100000).select(
        (F.col("id") % 4).alias("g"),
        (F.floor(F.col("id") / 4) % 5000).alias("v"))
    out = {r["g"]: r for r in kmv_distinct(df, "v", ["g"], k=128).collect()}
    for g, r in out.items():
        assert abs(r["kmv_estimate"] - 5000) / 5000 < 4 / (126 ** 0.5), r
    # small group → exact
    small = spark.range(0, 10).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    r = kmv_distinct(small, "v", ["g"], k=64).collect()[0]
    assert r["kmv_estimate"] == 10.0 and r["n_hashes"] == 10


@_mark_slow
def test_ivf_blas_hot_cell_resplit_exact(spark):
    """Adversarially skewed corpus (≈90% of vectors cluster into one IVF
    cell): with a tiny max_cell_rows the hot cell re-splits into
    subcells, every pandas frame stays bounded, and results are identical to
    the uncapped run (the re-split is exact, not approximate)."""
    import math

    from dbt_core_spark.operators.similarity import ivf_topk_blas

    # 200 vectors in a tight cluster around e0, 20 spread elsewhere
    rows = []
    for i in range(200):
        rows.append((i, [10.0, math.sin(i * 0.01), math.cos(i * 0.013), 0.1]))
    for i in range(200, 220):
        rows.append((i, [math.sin(i), math.cos(i), 5.0 + (i % 7), 1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(k=3, n_cells=4, n_probe=2, kmeans_iters=0)
    capped = ivf_topk_blas(df, "embedding", "vec_id", max_cell_rows=16, **kw)
    uncapped = ivf_topk_blas(df, "embedding", "vec_id", max_cell_rows=10**9, **kw)
    a = sorted(map(tuple, capped.collect()))
    b = sorted(map(tuple, uncapped.collect()))
    assert a == b
    assert len(a) == 220 * 3


def test_blas_kernels_seal_assign_pass(spark):
    """The mapInPandas assignment pass must execute ONCE: after _seal
    (localCheckpoint) the final plan scans the materialized RDD and
    contains no MapInPandas — without the seal it appeared 3× (counts +
    member side + probe side), tripling the most expensive stage."""
    import math

    from dbt_core_spark.operators.similarity import (
        ivf_topk_blas,
        semantic_dedup_blas,
    )

    rows = [(i, [math.sin(i * 0.3 + d) for d in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for out in (
        ivf_topk_blas(df, k=2, n_cells=4, n_probe=2, kmeans_iters=0),
        semantic_dedup_blas(df, tau=0.99, n_cells=4, kmeans_iters=0),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan, plan
        assert "FlatMapGroupsInPandas" in plan  # the scoring kernel remains
        assert "Scan ExistingRDD" in plan  # the sealed assign output


@_mark_slow
def test_blas_chunked_matmul_exact(spark, monkeypatch):
    """Shrinking _MATMUL_BUDGET to force many probe chunks must not
    change any result (chunking only bounds peak matrix memory)."""
    import math

    import dbt_core_spark.operators.similarity as sim

    rows = [(i, [math.sin(i * 0.3 + d) for d in range(4)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(k=3, n_cells=4, n_probe=2, kmeans_iters=0)
    whole = sorted(map(tuple, sim.ivf_topk_blas(df, **kw).collect()))
    sd_whole = sorted(map(tuple, sim.semantic_dedup_blas(
        df, tau=0.99, n_cells=4, kmeans_iters=0).collect()))

    monkeypatch.setattr(sim, "_MATMUL_BUDGET", 8)  # ~2-row chunks
    chunked = sorted(map(tuple, sim.ivf_topk_blas(df, **kw).collect()))
    sd_chunked = sorted(map(tuple, sim.semantic_dedup_blas(
        df, tau=0.99, n_cells=4, kmeans_iters=0).collect()))

    assert chunked == whole
    assert sd_chunked == sd_whole
