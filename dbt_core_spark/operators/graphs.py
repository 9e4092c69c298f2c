"""Graph-centrality operators over pair/edge frames.

The dedup tier already builds duplicate-pair GRAPHS (Jaccard / MinHash
/ SimHash candidates) and resolves them to components
(operators/dedup.py:connected_components).  This module adds the
centrality verb on top: integer-exact PageRank with a fixed iteration
count — the canonical-representative / importance signal for a link
or similarity graph (Page et al. 1999, public).  No counterpart in
the reference (dbt-core delegates computation to the warehouse); the
iterative-join shape follows the connected-components precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 3,
    damping_micro: int = 850_000,
    src: str = "src",
    dst: str = "dst",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """INTEGER-exact PageRank, fixed ``iters`` sweeps — deterministic
    across engines and partitionings, so a SQL oracle can replay it
    by unrolling the iterations (float PageRank has no such oracle:
    reduction order changes the bits).

    Semantics (all micro-units, floor division):

        pr_0(i)     = 1_000_000
        give(j)     = pr_t(j) div out_deg(j)
        pr_{t+1}(i) = (1_000_000 - d) + d · Σ_{j→i} give(j) div 1_000_000

    with ``d = damping_micro``.  Dangling-node mass evaporates (the
    classic simplification; total mass is not conserved — ranks are
    an ORDERING signal, the use case here: picking the canonical
    member of a duplicate cluster / weighting a link neighborhood).
    Self-loops and parallel edges are counted as given.  The damped
    sum is carried in decimal(38,0) (d·S ≈ 8.5e11·N at the star-graph
    worst case overflows int64 past ~1e7 nodes; IntegralDivide on
    decimals is the exact truncated quotient — the auc_score
    precedent), then lands back in bigint (quotients are ≤ mass).

    Scale shape: ``out_deg`` is one edge-keyed aggregate computed
    ONCE; each sweep is one src-keyed equi-join (edges ⋈ ranks) + one
    dst-keyed partial-aggregated groupBy + a left join back onto the
    node set, sealed per round with ``localCheckpoint`` so sweep N+1
    never replays sweeps 1..N (the connected_components discipline).
    Skewed in-degree (one viral node) concentrates ONE group's
    aggregation — partial aggregation bounds it at
    partitions·1 row; skewed OUT-degree fans the join, the same
    blocking knobs as any hot equi-join (AQE skew split).  Returns
    (node, pagerank_micro).

    ``seeds``: PERSONALIZED PageRank (random walk with restart) —
    teleport mass lands only on the seed set: pr_0 = 1e6 for seeds /
    0 elsewhere, and the (1e6-d) restart term applies to seeds only
    (unnormalized — the ordering-signal convention above).  The
    curation verb: rank the whole corpus by graph proximity to a
    trusted/labeled seed set (Haveliwala 2002, public)."""
    # sealed: e feeds the out-degree aggregate AND the join side of
    # ewd (≥2 consumers) — without the seal the caller's edge-building
    # lineage (e.g. a Jaccard pair graph) replays once per consumer
    # (optimization r11)
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")) \
        .localCheckpoint(eager=False)
    if nodes is None:
        node_df = (
            e.select(F.col("_s").alias("node"))
            .union(e.select(F.col("_d").alias("node")))
            .distinct()
        )
    else:
        node_df = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()

    base = MICRO - damping_micro
    if seeds is not None:
        seed_df = seeds.select(
            F.col(seeds.columns[0]).alias("node")
        ).distinct().withColumn("_is_seed", F.lit(True))
        node_df = (
            node_df.join(seed_df, "node", "left")
            .select("node",
                    F.coalesce("_is_seed", F.lit(False)).alias("_is_seed"))
        )
    else:
        node_df = node_df.withColumn("_is_seed", F.lit(True))
    node_df = node_df.localCheckpoint(eager=False)
    base_col = F.when(F.col("_is_seed"), F.lit(base)).otherwise(F.lit(0))

    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ewd = e.join(deg, "_s").localCheckpoint(eager=False)

    pr = node_df.select(
        "node",
        F.when(F.col("_is_seed"), F.lit(MICRO)).otherwise(F.lit(0))
        .cast("bigint").alias("pagerank_micro"),
    )
    for _ in range(max(iters, 0)):
        contrib = (
            ewd.join(pr, ewd["_s"] == pr["node"])
            .select(
                F.col("_d").alias("node"),
                F.expr("pagerank_micro div _deg").alias("_give"),
            )
        )
        sums = contrib.groupBy("node").agg(
            F.sum(F.col("_give").cast("decimal(38,0)")).alias("_s_in")
        )
        pr = (
            node_df.join(sums, "node", "left")
            .select(
                "node",
                (
                    base_col
                    + F.expr(
                        f"cast({damping_micro} as decimal(38,0)) "
                        "* coalesce(_s_in, cast(0 as decimal(38,0))) "
                        f"div {MICRO}"
                    )
                ).cast("bigint").alias("pagerank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return pr.select("node", "pagerank_micro")
