"""Salting operators: results must equal the unsalted plan."""

from pyspark.sql import functions as F

from dbt_core_spark.operators.skew import salted_aggregate, salted_join


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
