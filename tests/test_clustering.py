from _slowmark import _mark_slow  # noqa: E402
"""Integer-exact k-means + cluster curation (operators/clustering.py).

The exactness claim is the whole point: the distributed Lloyd loop
must replay bit-identically against a trivial sequential reference
(same quantization, same argmin tie-break, same truncating-division
update, same empty-cell retention) — that is what makes the DuckDB
gate oracle exact rather than tolerance-based."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from dbt_core_spark.operators.clustering import (
    _truncdiv,
    cluster_outliers,
    cluster_sample,
    kmeans_fixed,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _ref_kmeans(rows, k, iters):
    """Sequential reference: returns {id: (cluster, dist2)}."""
    base = [
        (i, [int(_round_half_away(x * 10_000)) for x in v]) for i, v in rows
    ]
    cents = [
        (c, list(vq))
        for c, (_, vq) in enumerate(sorted(base, key=lambda r: r[0])[:k])
    ]

    def nearest(vq):
        return min(
            (sum((a - b) * (a - b) for a, b in zip(vq, cv)), cell)
            for cell, cv in cents
        )

    for _ in range(iters):
        members = {}
        for _i, vq in base:
            _, cell = nearest(vq)
            members.setdefault(cell, []).append(vq)
        cents = [
            (
                cell,
                [
                    _truncdiv(sum(m[p] for m in ms), len(ms))
                    for p in range(len(cv))
                ]
                if (ms := members.get(cell))
                else cv,
            )
            for cell, cv in cents
        ]
    return {i: (nearest(vq)[1], nearest(vq)[0]) for i, vq in base}


def _round_half_away(x):
    f = math.floor(abs(x) + 0.5)
    return f if x >= 0 else -f


@_mark_slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.lists(
            st.floats(
                min_value=-5, max_value=5, allow_nan=False, width=32
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=24,
    ),
    k=st.integers(min_value=1, max_value=4),
    iters=st.integers(min_value=0, max_value=3),
)
def test_kmeans_matches_sequential_reference(spark, data, k, iters):
    rows = [(i, v) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["vec_id"]: (r["cluster"], r["dist2_e8"])
        for r in kmeans_fixed(df, k=k, iters=iters).collect()
    }
    assert got == _ref_kmeans(rows, k, iters)


def test_empty_cell_keeps_previous_centroid(spark):
    """Seeds 0 and 1 are identical vectors, so every tie breaks to the
    lower cell and cell 1 empties on the first assignment; the emptied
    cell must survive with its previous centroid (deterministic k-cell
    frame), mirroring the oracle's left-join/coalesce — and stay empty
    on every later pass."""
    pts = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [10.0, 10.0]),
        (3, [10.0, 10.01]),
        (4, [10.01, 10.0]),
        (5, [9.99, 10.0]),
    ]
    df = spark.createDataFrame(pts, SCHEMA)
    out = kmeans_fixed(df, k=3, iters=2).collect()
    ref = _ref_kmeans(pts, 3, 2)
    assert {r["vec_id"]: (r["cluster"], r["dist2_e8"]) for r in out} == ref
    # the duplicate-seed tie always resolves to cell 0; cell 1 is empty
    assert {r["cluster"] for r in out if r["vec_id"] in (0, 1)} == {0}
    assert not [r for r in out if r["cluster"] == 1]


def test_empty_input_yields_empty_contract_frame(spark):
    """Empty corpus (or a model trained on one): every path returns a
    0-row frame with the (id, cluster, dist2_e8) schema instead of an
    unresolvable 0-wide literal matrix."""
    from dbt_core_spark.operators.clustering import (
        kmeans_apply,
        kmeans_centroids,
    )

    empty = spark.createDataFrame([], SCHEMA)
    out = kmeans_fixed(empty, k=3, iters=2)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "cluster", "dist2_e8"]
    model = kmeans_centroids(empty, k=3, iters=1)
    assert model.collect() == []
    batch = spark.createDataFrame([(1, [1.0, 2.0])], SCHEMA)
    assert kmeans_apply(batch, model).collect() == []


def test_k_exceeding_n_degenerates_to_identity(spark):
    pts = [(7, [1.0, 2.0]), (9, [3.0, 4.0])]
    df = spark.createDataFrame(pts, SCHEMA)
    out = {r["vec_id"]: r for r in kmeans_fixed(df, k=5, iters=1).collect()}
    assert len(out) == 2
    assert all(r["dist2_e8"] == 0 for r in out.values())


def test_assignment_output_is_zero_shuffle(spark, sf_dir):
    """The returned assignment frame is a narrow map over the sealed
    quantized base — centroids are literal expressions, so the plan
    must contain NO exchange at all (the 100 TB contract: query-side
    assignment never shuffles the corpus)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = kmeans_fixed(emb, k=4, iters=1)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_update_shuffle_bounded_by_k_d_partitions(spark, sf_dir):
    """The per-iteration centroid-update aggregation may shuffle at
    most k·d partial sums per map partition (map-side combine over
    (cell, pos)) — corpus-size-independent, the bound SCALING.md
    measures across two decades."""
    from dbt_core_spark.audit import exchange_stats
    from dbt_core_spark.operators.clustering import _nearest, _quantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k, d = 4, 64
    base = _quantize(emb, "embedding", "vec_id").localCheckpoint(eager=False)
    seed = [
        (i, list(r["vq"]))
        for i, r in enumerate(base.orderBy("id").limit(k).collect())
    ]
    upd = (
        base.select(_nearest(seed)["cell"].alias("cell"), "vq")
        .select("cell", F.posexplode("vq").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    upd.collect()
    stats = exchange_stats(upd)
    parts = spark.sparkContext.defaultParallelism
    assert 0 < stats["shuffle_records"] <= 2 * k * d * max(parts, 1)


def test_curation_branches_are_group_limited(spark, sf_dir):
    """Sample and outlier ranks must compile to WindowGroupLimit so
    each map partition pre-truncates to n rows per cluster before the
    k-keyed (skew-prone) exchange."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign = kmeans_fixed(emb, k=4, iters=1).localCheckpoint(eager=False)
    for branch in (
        cluster_sample(assign, n_per=5),
        cluster_outliers(assign, n_per=5),
    ):
        plan = branch._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


def test_sample_and_outliers_deterministic_and_bounded(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign = kmeans_fixed(emb, k=4, iters=2).localCheckpoint(eager=False)
    s1 = sorted(
        (r["cluster"], r["rk"], r["vec_id"])
        for r in cluster_sample(assign, n_per=7).collect()
    )
    s2 = sorted(
        (r["cluster"], r["rk"], r["vec_id"])
        for r in cluster_sample(assign, n_per=7).collect()
    )
    assert s1 == s2
    per = {}
    for c, rk, _ in s1:
        per[c] = max(per.get(c, 0), rk)
    assert all(v <= 7 for v in per.values())
    # outliers: rank 1 carries the cluster's max distance
    out = cluster_outliers(assign, n_per=3).collect()
    top = {r["cluster"]: r["dist2_e8"] for r in out if r["rk"] == 1}
    mx = {
        r["cluster"]: r["mx"]
        for r in assign.groupBy("cluster")
        .agg(F.max("dist2_e8").alias("mx"))
        .collect()
    }
    assert top == mx


@_mark_slow
def test_centroids_plus_apply_equals_fixed(spark, sf_dir):
    """Persisted-model path: kmeans_centroids -> (write/read round
    trip) -> kmeans_apply over the SAME corpus must reproduce
    kmeans_fixed bit-for-bit — train-once/assign-forever is only safe
    if apply is exactly the final assignment pass."""
    from dbt_core_spark.operators.clustering import (
        kmeans_apply,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = kmeans_centroids(emb, k=4, iters=2)
    path = "/tmp/test_kmeans_model"
    model.write.mode("overwrite").parquet(path)
    got = {
        r["vec_id"]: (r["cluster"], r["dist2_e8"])
        for r in kmeans_apply(emb, spark.read.parquet(path)).collect()
    }
    want = {
        r["vec_id"]: (r["cluster"], r["dist2_e8"])
        for r in kmeans_fixed(emb, k=4, iters=2).collect()
    }
    assert got == want


def test_apply_is_zero_shuffle(spark, sf_dir):
    from dbt_core_spark.operators.clustering import (
        kmeans_apply,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = kmeans_centroids(emb, k=4, iters=1)
    # ingest batch = a narrow filter (the realistic shape); a global
    # .limit() batch would add a single-partition CollectLimit exchange
    # of its own once the NULL-embedding entry filter sits above it —
    # that exchange belongs to limit, not to the assignment map
    out = kmeans_apply(emb.filter("vec_id % 7 = 0"), model)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_salt_changes_sample(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign = kmeans_fixed(emb, k=2, iters=1).localCheckpoint(eager=False)
    a = {r["vec_id"] for r in cluster_sample(assign, n_per=10, salt="a").collect()}
    b = {r["vec_id"] for r in cluster_sample(assign, n_per=10, salt="b").collect()}
    assert a != b


@pytest.mark.parametrize(
    ("a", "b", "want"),
    [(7, 2, 3), (-7, 2, -3), (6, 3, 2), (-6, 3, -2), (1, 2, 0), (-1, 2, 0)],
)
def test_truncdiv_matches_engines(a, b, want):
    """Truncation toward zero — what Spark ``div`` and DuckDB ``//``
    both implement (Python's ``//`` floors, hence the helper)."""
    assert _truncdiv(a, b) == want


@_mark_slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.lists(
            st.floats(
                min_value=-2, max_value=2, allow_nan=False, width=32
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=4,
        max_size=16,
    ),
    k=st.integers(min_value=2, max_value=3),
)
def test_kmeans_oracle_parity_on_random_data(spark, tmp_path_factory, data, k):
    """Spark kmeans_fixed vs the generated DuckDB oracle CTE on RANDOM
    vectors — the fixed-corpus gate can't probe the rounding/division/
    tie-break boundary semantics the way arbitrary floats do (negative
    sums hit the truncating division; float32 values hit the
    cast-to-double-then-round rule on both engines)."""
    import duckdb

    from oracles import _kmeans_cte

    rows = [(i, v) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path_factory.mktemp("kmp") / "emb.parquet")
    df.write.mode("overwrite").parquet(path)
    got = sorted(
        (r["vec_id"], r["cluster"], r["dist2_e8"])
        for r in kmeans_fixed(df, k=k, iters=2).collect()
    )
    con = duckdb.connect()
    con.sql(f"create view embeddings as select * from '{path}/*.parquet'")
    sql = _kmeans_cte(k=k, iters=2) + "\nselect vec_id, cluster, dist2_e8 from asg"
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want


def test_kmeanspp_seeding_beats_lowest_id_on_sorted_corpus(spark):
    """r5 verdict item 5: lowest-id init degenerates when ids correlate
    with content (sorted/sharded corpora — all k seeds in one region).
    The deterministic kmeans++-style farthest-first init must give
    strictly lower total distortion there, and must be reproducible."""
    from dbt_core_spark.operators.clustering import kmeans_fixed

    # ids sorted by content: 4 well-separated blobs, ids 0..39 ascending
    # with the blob index — the k lowest ids all land in blob 0
    rows = []
    for i in range(40):
        blob = i // 10
        center = [float(5 * blob)] * 8
        rows.append((i, [c + 0.01 * ((i * 7) % 5) for c in center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def distortion(init):
        out = kmeans_fixed(df, k=4, iters=2, init=init)
        return sum(r["dist2_e8"] for r in out.collect())

    d_low = distortion("lowest_id")
    d_pp = distortion("kmeanspp")
    assert d_pp < d_low, (d_pp, d_low)
    # farthest-first on 4 separated blobs recovers one seed per blob ->
    # near-zero within-cluster distortion
    assert d_pp * 10 < d_low
    assert distortion("kmeanspp") == d_pp  # deterministic replay


def test_kmeanspp_duplicate_heavy_sample_picks_distinct_rows(spark):
    """r6 ADVICE: with fewer distinct points than k in the md5 sample,
    min-distances go all-zero and an unmasked argmax re-picked index 0
    forever — the chosen-index mask must instead fall back to distinct
    unchosen sample rows, and every distinct coordinate must still be
    seeded before any duplicate row is."""
    from dbt_core_spark.operators.clustering import (
        _quantize,
        _seed_centroids,
    )

    # 2 distinct coordinates, 30 rows, k=5 — the degenerate class
    rows = [(i, [1.0] * 8 if i % 2 else [9.0] * 8) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = _quantize(df, "embedding", "vec_id")
    cents = _seed_centroids(base, k=5, init="kmeanspp")
    assert len(cents) == 5
    coords = [tuple(c) for _, c in cents]
    # both distinct coordinates are seeded (old code could fill every
    # slot after the first with copies of sample row 0)
    assert len(set(coords)) == 2
    assert coords[0] != coords[1]  # seed 2 is the farthest point, not a dup
