"""PageRank in-degree skew stress (the cc_skew_probe companion).

The pagerank docstring claims skewed IN-degree is absorbed by
map-side partial aggregation (one hot group costs ≈ partitions
rows), while skewed OUT-degree rides the same AQE skew-join knobs as
any hot equi-join.  This probe measures the in-degree claim: an
S-leaf STAR (every leaf → one hub: the hub receives S edges — the
viral-document shape) vs a UNIFORM out-degree-1 ring at equal edge
counts, across ×1/×10/×100, with skew_report as the pre-run
diagnostic.  No straggler ⇒ wall ratio stays ~flat across decades.

Usage: PYTHONPATH=/root/repo python3 scripts/pagerank_skew_probe.py
Prints one line per decade; results recorded in COVERAGE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbt_core_spark.operators.graphs import pagerank
from dbt_core_spark.operators.skew import skew_report
from dbt_core_spark.session import get_spark

SCALES = {1: 5_000, 10: 50_000, 100: 500_000}


def main() -> None:
    spark = get_spark(
        app_name="pagerank_skew_probe",
        extra_conf={"spark.sql.warehouse.dir": "/tmp/pr_skew_wh"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    for factor, s in SCALES.items():
        base = spark.range(1, s + 1).select(
            F.col("id").cast("bigint").alias("id"))
        star = base.selectExpr("id as src", "cast(0 as bigint) as dst") \
            .localCheckpoint(eager=True)
        ring = base.selectExpr("id as src", f"(id % {s}) + 1 as dst") \
            .localCheckpoint(eager=True)
        top = skew_report(
            star.select(F.col("dst").alias("key")), "key", top_n=1
        ).collect()[0]

        t0 = time.time()
        pr_star = pagerank(star, iters=3)
        hub = {r.node: r.pagerank_micro for r in pr_star.collect()}[0]
        wall_star = time.time() - t0
        t0 = time.time()
        n_ring = pagerank(ring, iters=3).count()
        wall_ring = time.time() - t0
        # star hub after 3 sweeps: every leaf holds 150000 after sweep
        # 1+ (no in-edges); hub = 150000 + 850000·(S·(leaf//1))//1e6
        expect = 150_000 + (850_000 * (s * 150_000)) // 1_000_000
        print(
            f"x{factor}: edges={s} hub_in_share_e6={top['share_e6']} "
            f"| star: wall={wall_star:.2f}s hub_pr={hub} "
            f"(expect sweep-3 {expect}) "
            f"| ring: wall={wall_ring:.2f}s rows={n_ring} "
            f"| ratio={wall_star / max(wall_ring, 0.01):.2f}"
        )
        assert hub == expect
        assert n_ring == s


if __name__ == "__main__":
    main()
