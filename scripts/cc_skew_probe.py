"""Connected-components SKEW probe (r10 verdict item 5): a power-law
duplicate cluster — one template document with S near-identical clones
— concentrates one label's edges on one propagation-join key.  This
probe builds decades of a deliberately skewed graph (one S-member STAR
— the minhash-dedup representative-pair shape — plus S uniform 2-node
components as background) and the UNIFORM control graph with the same
edge count, runs connected_components on both, and reports wall time,
rounds, and the skew.py:skew_report diagnostic on the propagation-join
key (edge src) so the skew is measured, not assumed.

A straggler shows as skewed-wall ≫ uniform-wall at equal edge counts;
AQE's OptimizeSkewedJoin (enabled in session.py) splits the hot SMJ
partition, and min-label aggregation is map-side partial — the probe
verifies those defenses actually hold through the ×100 decade.

Usage: PYTHONPATH=/root/repo python3 scripts/cc_skew_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_core_spark.operators.dedup import connected_components  # noqa: E402
from dbt_core_spark.operators.skew import skew_report  # noqa: E402
from dbt_core_spark.session import get_spark  # noqa: E402

SCALES = {1: 2_000, 10: 20_000, 100: 200_000}


def star_plus_background(spark, s: int):
    """One s-member star component (hub id 0) + s background 2-node
    components — 2s edges total, half of them on ONE src key."""
    star = spark.range(1, s + 1).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b"))
    bg = spark.range(s).select(
        (F.col("id") * 2 + 1_000_000_000).alias("id_a"),
        (F.col("id") * 2 + 1_000_000_001).alias("id_b"))
    return star.unionByName(bg)


def uniform(spark, s: int):
    """2s uniform 2-node components — the equal-edge-count control."""
    return spark.range(2 * s).select(
        (F.col("id") * 2 + 2_000_000_000).alias("id_a"),
        (F.col("id") * 2 + 2_000_000_001).alias("id_b"))


def run_cc(pairs):
    t0 = time.time()
    out = connected_components(pairs)
    n_comp = out.select("component").distinct().count()
    return time.time() - t0, n_comp


def main() -> None:
    spark = get_spark(
        app_name="cc_skew_probe",
        extra_conf={"spark.sql.warehouse.dir": "/tmp/cc_skew_wh"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    for factor, s in SCALES.items():
        sk = star_plus_background(spark, s).localCheckpoint(eager=True)
        un = uniform(spark, s).localCheckpoint(eager=True)
        # the diagnostic a pipeline would run BEFORE committing to the
        # join strategy: hot-key share of the propagation-join key
        top = skew_report(
            sk.select(F.col("id_a").alias("src")).unionByName(
                sk.select(F.col("id_b").alias("src"))),
            "src", top_n=1).collect()[0]
        wall_sk, comp_sk = run_cc(sk)
        wall_un, comp_un = run_cc(un)
        print(
            f"x{factor}: edges={2 * s} star={s} "
            f"hot_key_share_e6={top['share_e6']} skew_e4={top['skew_e4']} "
            f"| skewed: wall={wall_sk:.2f}s comps={comp_sk} "
            f"| uniform: wall={wall_un:.2f}s comps={comp_un} "
            f"| ratio={wall_sk / wall_un:.2f}"
        )
        assert comp_sk == s + 1 and comp_un == 2 * s


if __name__ == "__main__":
    main()
