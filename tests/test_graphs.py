"""Integer-exact PageRank (operators/graphs.py) — fixed-point
semantics, conservation on regular graphs, star concentration,
dangling evaporation, and decimal-carried damped sums."""

import pytest

from dbt_core_spark.operators.graphs import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_cycle_is_a_fixed_point(spark):
    """A↔B: every node gives its whole mass to the other — pr stays
    exactly 1_000_000 at every sweep (150000 + 850000·1e6//1e6)."""
    pr = {r.node: r.pagerank_micro
          for r in pagerank(_edges(spark, [(1, 2), (2, 1)]),
                            iters=4).collect()}
    assert pr == {1: 1_000_000, 2: 1_000_000}


def test_star_concentrates_rank_on_hub(spark):
    """Leaves → hub: the hub accumulates, leaves fall to the floor
    (no in-edges → 150000 after sweep 1)."""
    e = _edges(spark, [(i, 0) for i in range(1, 6)])
    pr = {r.node: r.pagerank_micro for r in pagerank(e, iters=1).collect()}
    assert pr[0] == 150_000 + (850_000 * 5_000_000) // 1_000_000
    assert all(pr[i] == 150_000 for i in range(1, 6))


def test_dangling_mass_evaporates(spark):
    """1→2 with 2 dangling: sweep 1 gives node 2 = 1e6, node 1 =
    floor; sweep 2: node 2 receives only node 1's floored give."""
    e = _edges(spark, [(1, 2)])
    pr = {r.node: r.pagerank_micro for r in pagerank(e, iters=2).collect()}
    assert pr[1] == 150_000
    assert pr[2] == 150_000 + (850_000 * 150_000) // 1_000_000


def test_isolated_nodes_settle_at_floor(spark):
    """nodes= including never-linked ids: they stay at the (1-d)
    base after the first sweep."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    pr = {r.node: r.pagerank_micro
          for r in pagerank(_edges(spark, [(0, 1), (1, 0)]),
                            nodes=nodes, iters=3).collect()}
    assert pr[0] == pr[1] == 1_000_000
    assert pr[2] == pr[3] == 150_000


def test_parallel_edges_count_in_degree_and_gives(spark):
    """Two parallel 1→2 edges: out_deg(1)=2, each edge gives pr//2 —
    node 2 receives 2·(pr//2)."""
    e = _edges(spark, [(1, 2), (1, 2)])
    pr = {r.node: r.pagerank_micro for r in pagerank(e, iters=1).collect()}
    assert pr[2] == 150_000 + (850_000 * 1_000_000) // 1_000_000


def test_zero_iters_returns_uniform(spark):
    pr = {r.node: r.pagerank_micro
          for r in pagerank(_edges(spark, [(1, 2)]), iters=0).collect()}
    assert pr == {1: 1_000_000, 2: 1_000_000}


def test_personalized_pagerank_seed_confinement(spark):
    """Seeds carry restart mass; a node with no path from the seed
    set stays exactly 0; a neighbor of a seed earns mass only via
    its in-edge."""
    from pyspark.sql import functions as F  # noqa: F401

    e = _edges(spark, [(1, 2), (3, 4)])  # two components
    nodes = _edges(spark, [(i, i) for i in range(1, 5)]).select(
        "src").withColumnRenamed("src", "id").distinct()
    seeds = nodes.filter("id = 1")
    pr = {r.node: r.pagerank_micro
          for r in pagerank(e, nodes=nodes, iters=2,
                            seeds=seeds).collect()}
    assert pr[1] == 150_000          # seed keeps restart, gives all away
    assert pr[3] == 0 and pr[4] == 0  # unreachable from seed set
    # node 2 at sweep 2: 0 restart + d·(pr1(1)//1)//1e6
    assert pr[2] == (850_000 * 150_000) // 1_000_000


def test_seeds_none_equals_all_seeds(spark):
    """Default pagerank ≡ personalized with seeds = every node."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
    nodes = e.select("src").withColumnRenamed("src", "id").distinct()
    a = sorted(map(tuple, pagerank(e, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e, iters=3, seeds=nodes).collect()))
    assert a == b
