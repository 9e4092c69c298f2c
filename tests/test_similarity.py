"""Similarity-search operators: exact JVM fold vs Arrow+BLAS parity,
and ANN recall sanity (engine extension, driver north star)."""

import pytest

import __spark_entry__ as em
from _slowmark import _mark_slow  # noqa: E402


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return em._t(spark, sf_dir, "embeddings")


@_mark_slow
def test_blas_topk_matches_fold_topk(spark, sf_dir):
    """The Arrow+BLAS kernel must select the same neighbors in the same
    order as the zip_with/aggregate fold (ties broken by nbr_id)."""
    a = (
        em.cosine_topk_embeddings(spark, sf_dir)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        em.cosine_topk_blas_embeddings(spark, sf_dir)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    assert (a[["query_id", "nbr_id", "rank"]]
            == b[["query_id", "nbr_id", "rank"]]).all().all()
    assert (a["cosine"].round(6) == b["cosine"].round(6)).all()


def test_blas_topk_is_distributed(spark, sf_dir, emb):
    """The query side must fan out over partitions — no single-partition
    mapInPandas regardless of input file layout."""
    from dbt_core_spark.operators.similarity import cosine_topk_blas

    df = cosine_topk_blas(emb, "embedding", "vec_id", k=3)
    assert df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


@_mark_slow
def test_ivf_recall_reasonable(spark, sf_dir):
    """IVF with 4/16 probes should keep a majority of true neighbors
    (sanity floor — exact value is data-dependent)."""
    exact = {(r.query_id, r.nbr_id) for r in em.cosine_topk_embeddings(spark, sf_dir).collect()}
    ivf = {(r.query_id, r.nbr_id) for r in em.ann_ivf_topk_embeddings(spark, sf_dir).collect()}
    assert len(ivf & exact) / len(exact) > 0.4


@_mark_slow
def test_ivf_blas_recall_and_shape(spark, sf_dir):
    """The BLAS IVF path must keep recall parity with the JVM IVF and
    emit at most k neighbors per query with valid ranks."""
    exact = {(r.query_id, r.nbr_id) for r in em.cosine_topk_embeddings(spark, sf_dir).collect()}
    rows = em.ann_ivf_blas_topk_embeddings(spark, sf_dir).collect()
    blas = {(r.query_id, r.nbr_id) for r in rows}
    assert len(blas & exact) / len(exact) > 0.4
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    assert max(len(v) for v in per_q.values()) <= 3


def test_sharded_blas_topk_matches_dense(spark, sf_dir, emb):
    """Forcing the no-driver-collect sharded path (max_driver_rows below
    corpus size) must return the exact same neighbors/ranks as the dense
    broadcast path, and cosines equal to 9 dp."""
    from dbt_core_spark.operators.similarity import cosine_topk_blas

    dense = (
        cosine_topk_blas(emb, "embedding", "vec_id", k=3)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    sharded = (
        cosine_topk_blas(emb, "embedding", "vec_id", k=3,
                         max_driver_rows=10, shard_rows=50)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(dense) == len(sharded) > 0
    assert (dense[["query_id", "nbr_id", "rank"]]
            == sharded[["query_id", "nbr_id", "rank"]]).all().all()
    assert (dense["cosine"].round(9) == sharded["cosine"].round(9)).all()


def test_quantize_embeddings_roundtrip_error_bounded(spark, emb):
    """int8 quantization: values in [-127,127], scale = max|v|, and the
    dequantized vector reconstructs within half a quantization step."""
    from dbt_core_spark.operators.similarity import quantize_embeddings

    out = quantize_embeddings(emb.limit(50), "embedding", "vec_id")
    rows = out.collect()
    assert len(rows) == 50
    src = {r["vec_id"]: r["embedding"] for r in emb.limit(50).collect()}
    for r in rows:
        assert all(-127 <= q <= 127 for q in r["q"])
        v = src[r["vec_id"]]
        s = r["scale"]
        assert abs(s - max(abs(float(x)) for x in v)) < 1e-12
        step = s / 127
        for x, q in zip(v, r["q"]):
            assert abs(q * step - float(x)) <= step / 2 + 1e-9


@_mark_slow
def test_ivf_index_build_search_matches_oneshot(spark):
    """The persisted-index path must return exactly what ivf_topk_blas
    returns for the same queries: same centroids, same corpus
    assignment, same scoring — build/search only amortizes the corpus
    pass, it never changes results."""
    import math

    from dbt_core_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
        ivf_topk_blas,
    )

    rows = [(i, [math.sin(i * 0.37 + d) for d in range(6)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigns = ivf_index_build(df, n_cells=8, kmeans_iters=0)
    batch = df.filter("vec_id % 5 = 0")
    via_index = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=3, n_probe=3).collect()))
    oneshot = sorted(
        t for t in map(tuple, ivf_topk_blas(
            df, k=3, n_cells=8, n_probe=3, kmeans_iters=0).collect())
        if t[0] % 5 == 0
    )
    assert via_index == oneshot and len(via_index) == 16 * 3


@_mark_slow
def test_ivf_index_search_precomputed_member_counts(spark):
    """``member_counts=`` (the serve-many fast path: per-cell
    populations aggregated once per index snapshot instead of once per
    query batch — optimization r11) must be result-invariant: the
    counts only parameterize the skew blocking, never the scores."""
    import math

    from dbt_core_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
        ivf_member_counts,
    )

    rows = [(i, [math.sin(i * 0.37 + d) for d in range(6)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigns = ivf_index_build(df, n_cells=8, kmeans_iters=0)
    assigns = assigns.localCheckpoint(eager=False)
    batch = df.filter("vec_id % 5 = 0")
    mcounts = ivf_member_counts(assigns)
    with_counts = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=3, n_probe=3,
        member_counts=mcounts).collect()))
    without = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=3, n_probe=3).collect()))
    assert with_counts == without and len(with_counts) == 16 * 3
    # ... including under a tiny cap that actually exercises the 2-D
    # blocking with multiplied member/probe sub-blocks
    capped_with = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=3, n_probe=3, max_cell_rows=4,
        member_counts=mcounts).collect()))
    assert capped_with == without


@_mark_slow
def test_ivf_index_search_bounded_batch_fast_path(spark):
    """``bounded_batch=True`` + ``centroid_matrix=`` (the r12 serve
    fast path: no per-batch centroid collect, no per-batch probe-side
    count aggregate, no probe split, no probe seal) must be
    result-invariant — probe blocking only PARTITIONS probes across
    psub groups, and a probe row in a memberless cell produced no
    pairs anyway — including under a tiny member-side cap that forces
    real member-block multiplication, and on an empty batch."""
    import math

    from dbt_core_spark.operators.similarity import (
        ivf_centroid_matrix,
        ivf_index_build,
        ivf_index_search,
        ivf_member_counts,
    )

    rows = [(i, [math.sin(i * 0.37 + d) for d in range(6)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigns = ivf_index_build(df, n_cells=8, kmeans_iters=0)
    assigns = assigns.localCheckpoint(eager=False)
    batch = df.filter("vec_id % 5 = 0")
    mcounts = ivf_member_counts(assigns)
    cmat = ivf_centroid_matrix(cents)
    base = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=3, n_probe=3).collect()))
    fast = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=3, n_probe=3,
        member_counts=mcounts, centroid_matrix=cmat,
        bounded_batch=True).collect()))
    assert fast == base and len(fast) == 16 * 3
    # member-side blocking still engages under the fast path (the cap
    # splits members; probes stay unsplit by declaration)
    capped = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=3, n_probe=3, max_cell_rows=4,
        member_counts=mcounts, centroid_matrix=cmat,
        bounded_batch=True).collect()))
    assert capped == base
    # empty batch: schema-stable empty result, no jobs against members
    empty = ivf_index_search(
        cents, assigns, batch.filter("vec_id < 0"), k=3, n_probe=3,
        member_counts=mcounts, centroid_matrix=cmat,
        bounded_batch=True).collect()
    assert empty == []


@_mark_slow
def test_ivf_index_persistence_roundtrip(spark, tmp_path):
    """The index survives a parquet roundtrip (the actual production
    lifecycle: build -> save -> reload in a later job -> search)."""
    import math

    from dbt_core_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
    )

    rows = [(i, [math.sin(i * 0.37 + d) for d in range(6)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigns = ivf_index_build(df, n_cells=8, kmeans_iters=2)
    cents.write.parquet(str(tmp_path / "cents"))
    assigns.write.parquet(str(tmp_path / "assigns"))
    batch = df.filter("vec_id % 7 = 0")
    live = sorted(map(tuple, ivf_index_search(
        cents, assigns, batch, k=2, n_probe=2).collect()))
    reloaded = sorted(map(tuple, ivf_index_search(
        spark.read.parquet(str(tmp_path / "cents")),
        spark.read.parquet(str(tmp_path / "assigns")),
        batch, k=2, n_probe=2).collect()))
    assert live == reloaded and len(live) > 0


def test_semantic_dedup_incremental_batch_vs_corpus(spark):
    """Ingest-flow SemDeDup: planted batch near-duplicates of corpus
    vectors are caught with the lowest corpus id as keeper; novel batch
    vectors pass; a literally re-ingested id is not its own duplicate
    (but still matches OTHER corpus vectors near it)."""
    import math

    from dbt_core_spark.operators.similarity import (
        ivf_index_build,
        semantic_dedup_incremental,
    )

    # mutually orthogonal corpus (axis vectors): cosines between
    # distinct corpus vectors are exactly 0, so matches are unambiguous
    corpus_rows = [
        (i, [1.0 if d == i else 0.0 for d in range(6)]) for i in range(6)
    ]
    df = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<double>")
    cents, assigns = ivf_index_build(df, n_cells=4, kmeans_iters=0)
    assigns = assigns.localCheckpoint(eager=False)

    batch_rows = [
        # near-dup of corpus vec 2
        (100, [x + 1e-4 for x in corpus_rows[2][1]]),
        # novel direction (equidistant from every axis, cos = 1/sqrt(6))
        (101, [1.0] * 6),
        # literal re-ingest of corpus vec 2 (same id, same vector)
        (2, corpus_rows[2][1]),
    ]
    batch = spark.createDataFrame(batch_rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup_incremental(
        cents, assigns, batch, tau=0.999).collect()}
    assert out[100]["keeper_id"] == 2 and out[100]["cosine"] >= 0.999
    assert 101 not in out  # novel vector survives
    assert 2 not in out  # not a duplicate of itself


def test_ann_recall_math(spark):
    from dbt_core_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        "query_id int, nbr_id int",
    )
    # query 1: approx finds 2 of 3; query 2: none (and one bogus hit)
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 98), (2, 97), (2, 96)],
        "query_id int, nbr_id int",
    )
    out = {r["query_id"]: r for r in ann_recall(exact, approx, k=3).collect()}
    assert out[1]["n_hit"] == 2 and abs(out[1]["recall"] - 0.666667) < 1e-9
    assert out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0


@_mark_slow
def test_ann_recall_perfect_when_probing_all_cells(spark, emb):
    from dbt_core_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_topk,
    )

    exact = cosine_topk(emb, "embedding", "vec_id", k=2)
    approx = ivf_topk(emb, "embedding", "vec_id", k=2,
                      n_cells=4, n_probe=4, kmeans_iters=0)
    rec = ann_recall(exact, approx, k=2)
    assert rec.agg({"recall": "min"}).collect()[0][0] == 1.0


def test_ivf_index_append_matches_rebuild(spark, emb):
    """Appending a batch to an existing index must assign exactly the
    cells a full rebuild (same centroids) would."""
    from dbt_core_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
    )
    from pyspark.sql import functions as F

    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    cents, _ = ivf_index_build(corpus, n_cells=4, kmeans_iters=0)
    appended = {
        r["id"]: r["cell"] for r in ivf_index_append(cents, batch).collect()
    }
    # rebuild: assign the SAME batch through build's own pass by
    # searching with identical centroids — emulate via append on the
    # full set and compare the batch subset
    full = {
        r["id"]: r["cell"] for r in ivf_index_append(cents, emb).collect()
    }
    assert len(appended) > 0
    assert all(full[i] == c for i, c in appended.items())


# ---------------- product quantization ----------------

def _pq_fixture(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def _pq_reference(vecs, m=2, ks=4):
    """Plain-python PQ with the same deterministic codebook (lowest-id
    seeds) and tie-to-lower-code argmin."""
    import numpy as np

    n, dim = vecs.shape
    sd = dim // m
    cb = vecs[:ks].astype(np.float64)  # seeds = lowest ids
    codes = np.zeros((n, m), dtype=int)
    for i in range(n):
        for s in range(m):
            v = vecs[i, s * sd:(s + 1) * sd].astype(np.float64)
            d = [float(((v - cb[j, s * sd:(s + 1) * sd]) ** 2).sum())
                 for j in range(ks)]
            codes[i, s] = int(np.lexsort((range(ks), d))[0])
    return cb, codes


def test_pq_encode_matches_reference(spark):
    from dbt_core_spark.operators.similarity import pq_codebook, pq_encode

    df, vecs = _pq_fixture(spark)
    cb = pq_codebook(df, dim=8, m=2, ks=4)
    enc = pq_encode(df, cb, dim=8, m=2)
    got = {(r["vec_id"], r["sub"]): r["code"] for r in enc.collect()}
    _, codes = _pq_reference(vecs)
    exp = {(i, s): int(codes[i, s]) for i in range(20) for s in range(2)}
    assert got == exp


def test_pq_search_matches_reference_adc(spark):
    import numpy as np

    from dbt_core_spark.operators.similarity import (
        pq_codebook, pq_encode, pq_search)

    df, vecs = _pq_fixture(spark)
    cb_df = pq_codebook(df, dim=8, m=2, ks=4)
    enc = pq_encode(df, cb_df, dim=8, m=2)
    queries = df.filter("vec_id < 3")
    got = sorted(
        (r["query_id"], r["rank"], r["nbr_id"], r["dist_e6"])
        for r in pq_search(enc, queries, cb_df, k=2, dim=8, m=2).collect()
    )

    cb, codes = _pq_reference(vecs)
    sd = 4
    exp = []
    for q in range(3):
        luts = []
        for s in range(2):
            qv = vecs[q, s * sd:(s + 1) * sd].astype(np.float64)
            luts.append([
                int(round(float(((qv - cb[j, s * sd:(s + 1) * sd]) ** 2)
                                .sum()) * 1e6))
                for j in range(4)
            ])
        scored = sorted(
            (sum(luts[s][codes[i, s]] for s in range(2)), i)
            for i in range(20) if i != q
        )
        for rank, (d, i) in enumerate(scored[:2], 1):
            exp.append((q, rank, i, d))
    assert got == sorted(exp)


def test_pq_plans_broadcast_not_shuffle(spark):
    from dbt_core_spark.operators.similarity import (
        pq_codebook, pq_encode, pq_search)

    df, _ = _pq_fixture(spark)
    cb = pq_codebook(df, dim=8, m=2, ks=4)
    enc = pq_encode(df, cb, dim=8, m=2)
    ep = enc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in ep  # intended broadcast cross of the tiny codebook
    sp = pq_search(enc, df.filter("vec_id < 2"), cb, k=2, dim=8, m=2)
    spp = sp._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in spp  # LUT broadcast, codes side never replicated


def test_pq_codebook_requires_divisible_dim(spark):
    import pytest as _pytest

    from dbt_core_spark.operators.similarity import pq_codebook

    df, _ = _pq_fixture(spark)
    with _pytest.raises(ValueError):
        pq_codebook(df, dim=8, m=3)


# ---------------- gram matrix + PCA ----------------

def test_gram_matrix_matches_numpy_fixed_point(spark):
    import numpy as np

    from dbt_core_spark.operators.similarity import gram_matrix

    rng = np.random.RandomState(3)
    X = rng.randn(30, 6).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    got = {(r["i"], r["j"]): r["gram_e8"]
           for r in gram_matrix(df, dim=6).collect()}
    Xd = X.astype(np.float64)
    exp = {}
    for i in range(6):
        for j in range(6):
            exp[(i, j)] = int(np.floor(Xd[:, i] * Xd[:, j] * 1e8 + 0.5).sum())
    assert got == exp
    # symmetric by construction
    assert all(got[(i, j)] == got[(j, i)] for i in range(6) for j in range(6))


def test_gram_partition_invariance(spark):
    """Fixed-point terms make the sum order-free: 1 vs 7 partitions give
    bit-identical matrices."""
    import numpy as np

    from dbt_core_spark.operators.similarity import gram_matrix

    rng = np.random.RandomState(11)
    X = rng.randn(50, 4).astype("float32")
    rows = [(i, [float(x) for x in X[i]]) for i in range(50)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .coalesce(1)
    b = spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .repartition(7)
    ga = sorted(map(tuple, gram_matrix(a, dim=4).collect()))
    gb = sorted(map(tuple, gram_matrix(b, dim=4).collect()))
    assert ga == gb


def test_pca_project_recovers_dominant_direction(spark):
    """Data generated along a known direction: PC1 aligns with it and
    explains the spread; projection is a zero-shuffle row-local fold."""
    import numpy as np

    from dbt_core_spark.operators.similarity import gram_matrix, pca_project

    rng = np.random.RandomState(5)
    direction = np.array([3.0, 1.0, 0.5, 0.1])
    direction /= np.linalg.norm(direction)
    t = rng.randn(80) * 10
    X = (np.outer(t, direction) + rng.randn(80, 4) * 0.01).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    gram = gram_matrix(df, dim=4)
    out = pca_project(df, gram, n_components=2, dim=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # projection itself never shuffles
    pcs = {r["vec_id"]: r["pc"] for r in out.collect()}
    # PC1 projection should reproduce |t| ordering: corr(|pc1|, |t|) high
    pc1 = np.array([pcs[i][0] for i in range(80)])
    corr = np.corrcoef(pc1, t)[0, 1]
    assert abs(corr) > 0.999


# ---------------- random projection ----------------

def test_random_projection_matches_python(spark):
    import hashlib

    import numpy as np

    from dbt_core_spark.operators.similarity import random_projection

    rng = np.random.RandomState(9)
    X = rng.randn(10, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    got = {(r["vec_id"], r["k"]): r["proj_e6"]
           for r in random_projection(df, dim=8, out_dim=4).collect()}

    def coef(k, i):
        m = int(hashlib.md5(f"jl:{k}:{i}".encode()).hexdigest()[:15], 16) % 6
        return 1.0 if m == 0 else (-1.0 if m == 1 else 0.0)

    exp = {}
    for v in range(10):
        for k in range(4):
            s = 0.0
            for i in range(8):
                s += float(np.float64(X[v, i])) * coef(k, i)
            exp[(v, k)] = int(round(s * 1e6))
    assert got == exp


@_mark_slow
def test_random_projection_preserves_distances_roughly(spark):
    """JL property sanity: relative pairwise distances correlate."""
    import numpy as np

    from dbt_core_spark.operators.similarity import random_projection

    rng = np.random.RandomState(13)
    # varying norms so pairwise distances actually spread (isotropic
    # gaussians concentrate and make correlation meaningless)
    X = (rng.randn(30, 64) * (1 + np.arange(30) / 4)[:, None]).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = random_projection(df, dim=64, out_dim=32).collect()
    P = np.zeros((30, 32))
    for r in out:
        P[r["vec_id"], r["k"]] = r["proj_e6"] / 1e6
    P *= np.sqrt(3.0 / 32)
    d0, d1 = [], []
    for a in range(30):
        for b in range(a + 1, 30):
            d0.append(np.linalg.norm(X[a] - X[b]))
            d1.append(np.linalg.norm(P[a] - P[b]))
    corr = np.corrcoef(d0, d1)[0, 1]
    assert corr > 0.7


def test_random_projection_zero_shuffle(spark):
    from dbt_core_spark.operators.similarity import random_projection

    df = spark.createDataFrame([(0, [1.0] * 8)],
                               "vec_id long, embedding array<float>")
    plan = random_projection(df, dim=8, out_dim=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------- IVFPQ (IVFADC) ----------------

@_mark_slow
def test_ivfpq_search_matches_reference(spark):
    import numpy as np

    from dbt_core_spark.operators.similarity import ivfpq_search

    rng = np.random.RandomState(21)
    n, dim, m, sd, ks, n_cells, n_probe, k = 40, 8, 2, 4, 4, 4, 2, 3
    vecs = rng.randn(n, dim).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter("vec_id % 13 = 0")
    got = sorted(
        (r["query_id"], r["rank"], r["nbr_id"], r["dist_e6"])
        for r in ivfpq_search(df, queries, k=k, n_cells=n_cells,
                              n_probe=n_probe, m=m, ks=ks, dim=dim).collect()
    )

    V = vecs.astype(np.float64)
    cents = V[:n_cells]

    def l2(a, b):
        return float(((a - b) ** 2).sum())

    def assign_cells(v, nkeep):
        ds = sorted((l2(v, cents[c]), c) for c in range(n_cells))
        return [c for _, c in ds[:nkeep]]

    cell = {i: assign_cells(V[i], 1)[0] for i in range(n)}
    resid = {i: V[i] - cents[cell[i]] for i in range(n)}
    cb = [resid[j] for j in range(ks)]  # seeds = lowest ids

    def enc(r):
        out = []
        for s in range(m):
            ds = sorted(
                (l2(r[s * sd:(s + 1) * sd], cb[j][s * sd:(s + 1) * sd]), j)
                for j in range(ks))
            out.append(ds[0][1])
        return out

    codes = {i: enc(resid[i]) for i in range(n)}
    exp = []
    for q in [i for i in range(n) if i % 13 == 0]:
        cands = []
        for c in assign_cells(V[q], n_probe):
            qr = V[q] - cents[c]
            lut = [[int(np.floor(
                l2(qr[s * sd:(s + 1) * sd], cb[j][s * sd:(s + 1) * sd])
                * 1e6 + 0.5)) for j in range(ks)] for s in range(m)]
            for i in range(n):
                if cell[i] == c and i != q:
                    cands.append(
                        (sum(lut[s][codes[i][s]] for s in range(m)), i))
        for rank, (d, i) in enumerate(sorted(cands)[:k], 1):
            exp.append((q, rank, i, d))
    assert got == sorted(exp)


def test_ivfpq_plan_broadcasts_and_never_reshuffles_vectors(spark):
    import numpy as np

    from dbt_core_spark.operators.similarity import ivfpq_search

    rng = np.random.RandomState(2)
    vecs = rng.randn(30, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = ivfpq_search(df, df.filter("vec_id < 2"), k=2,
                       n_cells=4, n_probe=2, m=2, ks=4, dim=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # LUT side broadcast


@_mark_slow
def test_ivfpq_finds_planted_near_duplicates(spark):
    """Recall on structure that matters: for each query vector a planted
    near-copy exists; IVFPQ must surface it in the top-3 for most
    queries.  (On ISOTROPIC random vectors approximate-distance ranking
    is statistically noise — distances concentrate — so raw-gaussian
    recall floors are not a meaningful quality bar for ANY quantizing
    index; planted-neighbor recovery is.)"""
    import numpy as np

    from dbt_core_spark.operators.similarity import ivfpq_search

    rng = np.random.RandomState(31)
    base = rng.randn(60, 16).astype("float32") * 3
    rows = []
    for i in range(60):
        rows.append((i, [float(x) for x in base[i]]))
        rows.append((1000 + i,
                     [float(x) for x in base[i] + rng.randn(16) * 0.05]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 60")
    got = {}
    for r in ivfpq_search(df, queries, k=3, n_cells=8, n_probe=4,
                          m=4, ks=16, dim=16).collect():
        got.setdefault(r["query_id"], set()).add(r["nbr_id"])
    hits = sum(1 for q in range(60) if 1000 + q in got.get(q, set()))
    assert hits / 60 > 0.6  # majority of planted copies recovered


def test_gram_merge_equals_whole(spark):
    import numpy as np

    from dbt_core_spark.operators.similarity import gram_matrix, gram_merge

    rng = np.random.RandomState(17)
    X = rng.randn(40, 4).astype("float32")
    rows = [(i, [float(x) for x in X[i]]) for i in range(40)]
    whole = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = whole.filter("vec_id < 20")
    b = whole.filter("vec_id >= 20")
    merged = sorted(map(tuple, gram_merge(
        gram_matrix(a, dim=4), gram_matrix(b, dim=4)).collect()))
    direct = sorted(map(tuple, gram_matrix(whole, dim=4).collect()))
    assert merged == direct  # bit-identical shard rollup


@_mark_slow
def test_pq_codebook_lloyd_reduces_distortion(spark):
    """Trained codebooks must quantize no worse than seed sampling, and
    encode/search contracts stay intact."""
    import numpy as np

    from dbt_core_spark.operators.similarity import pq_codebook, pq_encode

    rng = np.random.RandomState(41)
    # clustered data: seeds rarely coincide with true centers
    centers = rng.randn(6, 8) * 5
    X = np.vstack([c + rng.randn(30, 8) * 0.3 for c in centers]) \
        .astype("float32")
    order = rng.permutation(len(X))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[order[i]]]) for i in range(len(X))],
        "vec_id long, embedding array<float>")

    def distortion(cb_df):
        cb = {}
        for r in cb_df.collect():
            cb.setdefault(r["sub"], {})[r["code"]] = np.array(r["cvec"])
        total = 0.0
        for v in X.astype(np.float64):
            for s in range(2):
                sub = v[s * 4:(s + 1) * 4]
                total += min(((sub - c) ** 2).sum()
                             for c in cb[s].values())
        return total

    seeded = pq_codebook(df, dim=8, m=2, ks=6)
    trained = pq_codebook(df, dim=8, m=2, ks=6, kmeans_iters=8)
    assert distortion(trained) < distortion(seeded) * 0.8
    # contract intact: encode against the trained book still works
    enc = pq_encode(df, trained, dim=8, m=2)
    assert enc.count() == len(X) * 2
    assert enc.select("code").distinct().count() <= 6


def test_pq_codebook_lloyd_deterministic(spark):
    import numpy as np

    from dbt_core_spark.operators.similarity import pq_codebook

    rng = np.random.RandomState(3)
    X = rng.randn(50, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(50)],
        "vec_id long, embedding array<float>")
    a = sorted(map(str, pq_codebook(df, dim=8, m=2, ks=4,
                                    kmeans_iters=5).collect()))
    b = sorted(map(str, pq_codebook(df, dim=8, m=2, ks=4,
                                    kmeans_iters=5).collect()))
    assert a == b


def test_rounded_topk_cols_matches_bruteforce():
    """Property: _rounded_topk_cols == brute-force sort by
    (round(s, dp) desc, index asc) cut to k — including boundary ties
    (argpartition alone picks arbitrarily among equal rounded scores;
    the helper must keep the LOWEST indices).  Non-finite scores ride
    along like any smallest/largest value; callers skip them after."""
    import numpy as np

    from dbt_core_spark.operators.similarity import _rounded_topk_cols

    rng = np.random.RandomState(7)
    for trial in range(200):
        n = rng.randint(1, 30)
        # coarse grid → many exact ties at 6dp; sprinkle ulp noise and
        # the occasional -inf self-match marker
        s = rng.randint(-3, 4, size=n) / 4.0
        s = s + rng.choice([0.0, 1e-12, -1e-12], size=n)
        if n > 2 and trial % 3 == 0:
            s[rng.randint(n)] = -np.inf
        k = rng.randint(1, n + 1)
        got = list(_rounded_topk_cols(s, k, 6))
        r = np.round(s, 6)
        want = sorted(range(n), key=lambda i: (-r[i], i))[:k]
        assert got == want, (trial, s.tolist(), k, got, want)


@_mark_slow
def test_ivf_index_rebalance_splits_only_hot_cells(spark, sf_dir):
    """Rebalance: the member SET is preserved exactly, cold cells and
    their rows pass through verbatim, retired hot ids disappear, new
    sub-cells number deterministically from max(cell)+1, and the
    rebalanced index still serves searches."""
    from pyspark.sql import functions as F

    from dbt_core_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_rebalance,
        ivf_index_search,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, assigns = ivf_index_build(emb, n_cells=4, kmeans_iters=0)
    assigns = assigns.localCheckpoint(eager=True)
    before = {r["id"]: r["cell"] for r in assigns.collect()}
    counts = {}
    for c in before.values():
        counts[c] = counts.get(c, 0) + 1
    mcr = 25
    hot = {c for c, n in counts.items() if n > mcr}
    assert hot, "test premise: some cell must be hot at this sf"

    cents2, assigns2 = ivf_index_rebalance(cents, assigns,
                                           max_cell_rows=mcr)
    assigns2 = assigns2.localCheckpoint(eager=True)
    after = {r["id"]: r["cell"] for r in assigns2.collect()}
    assert set(after) == set(before)  # no member lost or invented
    base = max(counts) + 1
    for i, c in before.items():
        if c in hot:
            assert after[i] >= base  # moved to a fresh sub-cell id
        else:
            assert after[i] == c     # cold rows byte-identical
    # retired ids gone from the centroid table; cold centroids kept
    cells2 = {r["cell"] for r in cents2.select("cell").collect()}
    assert not (cells2 & hot)
    assert (set(counts) - hot) <= cells2
    # deterministic: a second rebalance of the same input is identical
    _, again = ivf_index_rebalance(cents, assigns, max_cell_rows=mcr)
    assert {r["id"]: r["cell"] for r in again.collect()} == after
    # the rebalanced index serves: every query gets k neighbors
    queries = emb.filter("vec_id % 50 = 0")
    res = ivf_index_search(cents2, assigns2, queries, k=3, n_probe=4)
    got = res.groupBy("query_id").count().collect()
    assert got and all(r["count"] == 3 for r in got)
    # no-op below the threshold: inputs returned unchanged
    c3, a3 = ivf_index_rebalance(cents, assigns, max_cell_rows=10**9)
    assert a3 is assigns and c3 is cents


@_mark_slow
def test_ivf_index_rebalance_keeps_partition_width_and_converges(spark):
    """(a) One rebalance round must not widen the snapshot: union
    concatenates both sides' partition lists, and iterated rounds
    would double the width per round — the r9 probe measured a
    100→25k-partition snapshot whose serving batches drowned in
    empty-task overhead.  (b) ivf_index_rebalance_converged iterates
    until every cell is under the cap (one geometric round can leave
    a dense sub-region hot)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dbt_core_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_rebalance,
        ivf_index_rebalance_converged,
    )

    rng = np.random.RandomState(5)
    # a dense cloud around one direction (hot region) + scattered rest
    rows = []
    for i in range(300):
        v = np.array([1.0, 0.0, 0.0, 0.0]) + rng.randn(4) * 0.02
        rows.append((i, [float(x) for x in v]))
    for i in range(300, 360):
        v = rng.randn(4)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(8)
    cents, assigns = ivf_index_build(emb, n_cells=4, kmeans_iters=0)
    assigns = assigns.localCheckpoint(eager=True)
    width = assigns.rdd.getNumPartitions()

    _, a2 = ivf_index_rebalance(cents, assigns, max_cell_rows=40)
    assert a2.rdd.getNumPartitions() <= width

    c3, a3, rounds = ivf_index_rebalance_converged(
        cents, assigns, max_cell_rows=40, max_rounds=12)
    sizes = [r["n"] for r in a3.groupBy("cell")
             .agg(F.count("*").alias("n")).collect()]
    assert rounds >= 1 and max(sizes) <= 40, (rounds, max(sizes))
    assert a3.rdd.getNumPartitions() <= width + 1
    # member set preserved through the loop
    assert {r["id"] for r in a3.select("id").collect()} == set(range(360))
    # centroid table and assignment cells stay consistent
    cell_ids = {r["cell"] for r in c3.select("cell").collect()}
    assert {r["cell"] for r in a3.select("cell").distinct().collect()} \
        <= cell_ids


@_mark_slow
def test_ivf_index_rebalance_empty_centroid_cell_no_collision(spark):
    """A centroid cell with ZERO members (duplicate vectors tying at
    build's rounded argmax, or identical sub-centroid seeds) must not
    collide with fresh sub-cell ids: numbering bases off the CENTROIDS
    frame's max cell, so the empty cell's id is skipped and the
    snapshot keeps one centroid row per cell id (r9 advice fix —
    max-over-assignments would mint id 4 twice here)."""
    from dbt_core_spark.operators.similarity import (
        ivf_index_rebalance,
        ivf_index_search,
    )

    # cells 0..4 in the centroid table; cell 4 EMPTY in assignments
    cent_rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (3, [0.7, 0.7, 0.0]),
        (4, [0.5, 0.5, 0.7]),
    ]
    cents = spark.createDataFrame(cent_rows, "cell int, cv array<double>")
    assign_rows = (
        # cell 0 hot: 12 members > max_cell_rows=5 -> k_c = 3 sub-cells
        [(i, [1.0, 0.01 * i, 0.002 * i], 0) for i in range(12)]
        + [(100, [0.0, 1.0, 0.0], 1), (101, [0.0, 0.0, 1.0], 2),
           (102, [0.7, 0.7, 0.0], 3)]
    )
    assigns = spark.createDataFrame(
        assign_rows, "id long, v array<double>, cell int"
    ).localCheckpoint(eager=True)

    cents2, assigns2 = ivf_index_rebalance(cents, assigns, max_cell_rows=5)
    cell_ids = [r["cell"] for r in cents2.select("cell").collect()]
    assert len(cell_ids) == len(set(cell_ids)), cell_ids  # no dup rows
    fresh = {r["cell"] for r in assigns2.collect()} - {1, 2, 3}
    assert fresh and min(fresh) == 5, fresh  # numbering skips empty cell 4
    assert 4 in cell_ids  # the empty cell's centroid survives untouched
    # the snapshot still serves
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                              "vec_id long, embedding array<double>")
    res = ivf_index_search(cents2, assigns2, q, k=2, n_probe=8)
    assert res.count() == 2


@_mark_slow
def test_ivf_rebalance_after_delete_never_trips_guards(spark):
    """The composed deletion lifecycle (r9 verdict item 6): deleting
    every member of one cell and most of a hot cell, then rebalancing,
    must not trip the fresh-id collision assert — the emptied cell's
    id is skipped by the centroids-frame numbering base — and the
    post-rebalance snapshot must keep exactly the survivors, one
    centroid row per cell id, and still serve."""
    from dbt_core_spark.operators.similarity import (
        ivf_index_delete,
        ivf_index_rebalance,
        ivf_index_search,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
         (2, [0.0, 0.0, 1.0])],
        "cell int, cv array<double>")
    assign_rows = (
        # cell 0: 14 members, 2 deleted -> 12 survivors, hot at cap 5
        [(i, [1.0, 0.01 * i, 0.002 * i], 0) for i in range(14)]
        # cell 1: every member tombstoned -> EMPTIES post-delete
        + [(100, [0.0, 1.0, 0.0], 1), (101, [0.0, 1.0, 0.1], 1)]
        # cell 2: cold survivor
        + [(200, [0.0, 0.0, 1.0], 2)]
    )
    assigns = spark.createDataFrame(
        assign_rows, "id long, v array<double>, cell int")
    tombstones = spark.createDataFrame(
        [(0,), (1,), (100,), (101,)], "vec_id long")
    surv = ivf_index_delete(assigns, tombstones).localCheckpoint(
        eager=True)
    assert surv.filter("cell = 1").count() == 0  # cell 1 emptied
    cents2, assigns2 = ivf_index_rebalance(cents, surv, max_cell_rows=5)
    cell_ids = [r["cell"] for r in cents2.select("cell").collect()]
    assert len(cell_ids) == len(set(cell_ids)), cell_ids
    assert 1 in cell_ids  # the emptied cell's standing centroid survives
    got_ids = {r["id"] for r in assigns2.collect()}
    assert got_ids == {i for i in range(2, 14)} | {200}
    # fresh sub-cells numbered past the CENTROIDS max (2), so the
    # emptied cell id 1 is never re-minted
    fresh = {r["cell"] for r in assigns2.collect()} - {0, 1, 2}
    assert fresh and min(fresh) == 3, fresh
    q = spark.createDataFrame([(999, [1.0, 0.0, 0.0])],
                              "vec_id long, embedding array<double>")
    assert ivf_index_search(cents2, assigns2, q, k=3, n_probe=8).count() == 3


@_mark_slow
def test_ivfpq_index_lifecycle_matches_transient_and_deletes(spark, sf_dir):
    """The r11 persisted-IVFPQ split: build+search composes to exactly
    the transient ivfpq_search; deletion is standing-model (centroids
    and codebook untouched — surviving codes byte-identical) and the
    post-delete ranking never contains a tombstoned neighbor."""
    from dbt_core_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_delete,
        ivfpq_index_search,
        ivfpq_search,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 50 = 0")
    cents, cb, codes = ivfpq_index_build(emb, n_cells=16, m=4, ks=16,
                                         dim=64)
    codes = codes.localCheckpoint(eager=False)
    via_index = sorted(map(tuple, ivfpq_index_search(
        cents, cb, codes, queries, k=3, n_probe=4, m=4, dim=64).collect()))
    transient = sorted(map(tuple, ivfpq_search(
        emb, queries, k=3, n_cells=16, n_probe=4, m=4, ks=16,
        dim=64).collect()))
    assert via_index == transient and len(via_index) > 0

    dead = emb.filter("vec_id % 6 = 0").select("vec_id")
    shrunk = ivfpq_index_delete(codes, dead)
    # standing model: surviving codes are the anti-join, bit-identical
    survivors = sorted(map(tuple, shrunk.collect()))
    expect = sorted(map(tuple,
                        codes.filter("vec_id % 6 != 0").collect()))
    assert survivors == expect
    served = ivfpq_index_search(cents, cb,
                                shrunk.localCheckpoint(eager=False),
                                queries, k=3, n_probe=4, m=4, dim=64)
    assert served.filter("nbr_id % 6 = 0").count() == 0
    assert served.count() > 0


@_mark_slow
def test_ivfpq_index_append_only_encodes_batch(spark, sf_dir):
    """Append semantics: the merged code table equals encoding the full
    corpus under the HISTORY-trained model (standing cents + codebook),
    history codes are byte-identical before and after the append (no
    re-encode), and post-append search surfaces appended neighbors."""
    from dbt_core_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_search,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    hist = emb.filter("vec_id % 7 != 0")
    batch = emb.filter("vec_id % 7 = 0")
    cents, cb, codes = ivfpq_index_build(hist, n_cells=16, m=4, ks=16,
                                         dim=64)
    cents = cents.localCheckpoint(eager=False)
    cb = cb.localCheckpoint(eager=False)
    codes = codes.localCheckpoint(eager=False)
    merged = ivfpq_index_append(cents, cb, codes, batch, m=4, dim=64)

    def rows(df, pred="true"):
        return sorted(map(tuple, df.filter(pred).collect()))

    # history codes untouched by the append
    assert rows(merged, "vec_id % 7 != 0") == rows(codes)
    # the appended half is present and encoded under the standing model:
    # re-appending the same batch to an EMPTY slice reproduces it
    again = ivfpq_index_append(cents, cb, codes.limit(0), batch,
                               m=4, dim=64)
    assert rows(merged, "vec_id % 7 = 0") == rows(again)
    # served ranking can reach appended neighbors
    served = ivfpq_index_search(
        cents, cb, merged.localCheckpoint(eager=False),
        emb.filter("vec_id % 50 = 0"), k=3, n_probe=4, m=4, dim=64)
    assert served.filter("nbr_id % 7 = 0").count() > 0


# ---------------------------------------------------------------------------
# kNN classification (r11)
# ---------------------------------------------------------------------------


def _knn_frame(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_classify_majority_vote(spark):
    """3 of 5 neighbors share a label → that label wins."""
    from dbt_core_spark.operators.similarity import knn_classify

    labeled = _knn_frame(spark, [
        (1, [1.0, 0.0], 7), (2, [0.99, 0.1], 7), (3, [0.98, 0.2], 7),
        (4, [0.0, 1.0], 8), (5, [0.1, 1.0], 8),
    ])
    q = _knn_frame(spark, [(100, [1.0, 0.05], None)])
    out = knn_classify(labeled, q, k=5).collect()
    assert len(out) == 1
    assert out[0].pred_label == 7 and out[0].votes == 3


@_mark_slow
def test_knn_classify_tiebreak_best_rank_then_label(spark):
    """Vote tie (2 vs 2 with k=4): the label holding the CLOSER
    neighbor (lower best rank) wins; with best_rank also tied, the
    smaller label wins — the pinned deterministic order."""
    from dbt_core_spark.operators.similarity import knn_classify

    labeled = _knn_frame(spark, [
        (1, [1.0, 0.0], 9),     # rank 1 → label 9 best_rank 1
        (2, [0.9, 0.3], 5),     # rank 2
        (3, [0.8, 0.4], 5),     # rank 3
        (4, [0.7, 0.5], 9),     # rank 4
    ])
    q = _knn_frame(spark, [(100, [1.0, 0.0], None)])
    out = knn_classify(labeled, q, k=4).collect()
    assert out[0].pred_label == 9 and out[0].best_rank == 1

    # mirror pair at identical (round-9dp) cosine: the rank tie breaks
    # by nbr_id ASC, so vec 1 (label 5) takes rank 1 and label 5 wins
    # on best_rank — the within-query label-ASC leg is unreachable
    # (per-label min(rank) values are distinct since ranks are a
    # permutation), kept as a determinism backstop only
    labeled2 = _knn_frame(spark, [
        (1, [1.0, 0.1], 5), (2, [1.0, -0.1], 3),
    ])
    out2 = knn_classify(labeled2, q.select("vec_id",
                                           "embedding", "label"), k=2)
    row = out2.collect()[0]
    assert row.pred_label == 5 and row.votes == 1 and row.best_rank == 1


def test_knn_classify_null_labels_cannot_vote_or_displace(spark):
    """A NULL-labeled corpus row must be excluded BEFORE search: even
    when it is the nearest vector it neither votes nor occupies a
    top-k slot that would displace a votable neighbor."""
    from dbt_core_spark.operators.similarity import knn_classify

    labeled = _knn_frame(spark, [
        (1, [1.0, 0.0], None),  # nearest, unlabeled
        (2, [0.9, 0.1], 4), (3, [0.8, 0.2], 4),
    ])
    q = _knn_frame(spark, [(100, [1.0, 0.0], None)])
    out = knn_classify(labeled, q, k=2).collect()
    assert out[0].pred_label == 4 and out[0].votes == 2


@_mark_slow
def test_knn_classify_injected_neighbors_path(spark):
    """The ANN-accelerated composition: passing a precomputed
    (query_id, nbr_id, cosine, rank) frame must produce the same
    votes as the default exact search when the frames agree."""
    from dbt_core_spark.operators.similarity import (
        cosine_topk_blas,
        knn_classify,
    )

    labeled = _knn_frame(spark, [
        (i, [float(i % 3 + 1), float(i % 5)], i % 2) for i in range(1, 13)
    ])
    q = _knn_frame(spark, [(100, [2.0, 1.0], None), (101, [1.0, 4.0], None)])
    nbrs = cosine_topk_blas(labeled, "embedding", "vec_id", k=4, queries=q)
    a = sorted(map(tuple, knn_classify(labeled, q, k=4).collect()))
    b = sorted(map(tuple,
                   knn_classify(labeled, q, neighbors=nbrs).collect()))
    assert a == b and len(a) == 2


def test_knn_classify_empty_labeled_corpus(spark):
    """All-NULL labels → no votable corpus → empty output with the
    contract schema (gate-fuzz shape)."""
    from dbt_core_spark.operators.similarity import knn_classify

    labeled = _knn_frame(spark, [(1, [1.0, 0.0], None)])
    q = _knn_frame(spark, [(100, [1.0, 0.0], None)])
    out = knn_classify(labeled, q, k=3)
    assert out.columns == ["query_id", "pred_label", "votes", "best_rank"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# nearest-centroid (Rocchio) classification (r11)
# ---------------------------------------------------------------------------


def test_centroid_classify_separable(spark):
    """Two compact classes: every held-out query lands with its
    cluster's prototype."""
    from dbt_core_spark.operators.similarity import centroid_classify

    labeled = _knn_frame(spark, [
        (1, [1.0, 0.0], 7), (2, [1.1, 0.1], 7), (3, [0.9, -0.1], 7),
        (4, [-1.0, 5.0], 8), (5, [-1.1, 5.2], 8),
    ])
    q = _knn_frame(spark, [(100, [1.05, 0.0], None),
                           (101, [-1.0, 5.1], None)])
    out = {r.query_id: r.pred_label
           for r in centroid_classify(labeled, q).collect()}
    assert out == {100: 7, 101: 8}


def test_centroid_classify_negative_mean_truncation(spark):
    """Negative coordinate sums: prototype means truncate toward
    zero on BOTH engines (the -7 div 2 = -3 convention) — pin the
    Spark side's value directly."""
    from dbt_core_spark.operators.similarity import centroid_classify

    # sum of quantized coords for label 1 at pos 0: -3500+(-4000) =
    # -7500; mean over 2 = -3750 exactly (no rounding); make an
    # odd split instead: three vectors summing to -7 at milli scale
    labeled = _knn_frame(spark, [
        (1, [-0.001, 0.0], 1), (2, [-0.003, 0.0], 1),
        (3, [-0.003, 0.0], 1),
        (4, [5.0, 5.0], 2),
    ])
    # label-1 prototype pos0: sum=-7, n=3 → trunc(-7/3) = -2 (floor
    # would give -3); query at exactly -0.002 distances: label1
    # (−2−(−2))²=0 vs label2 far → label 1
    q = _knn_frame(spark, [(100, [-0.002, 0.0], None)])
    out = centroid_classify(labeled, q).collect()
    assert out[0].pred_label == 1


def test_centroid_classify_tiebreak_label_asc(spark):
    """Equidistant prototypes → smaller label wins."""
    from dbt_core_spark.operators.similarity import centroid_classify

    labeled = _knn_frame(spark, [
        (1, [1.0, 0.0], 9), (2, [-1.0, 0.0], 3),
    ])
    q = _knn_frame(spark, [(100, [0.0, 0.0], None)])
    out = centroid_classify(labeled, q).collect()
    assert out[0].pred_label == 3


def test_centroid_classify_empty_training(spark):
    from dbt_core_spark.operators.similarity import centroid_classify

    labeled = _knn_frame(spark, [(1, [1.0, 0.0], None)])
    q = _knn_frame(spark, [(100, [1.0, 0.0], None)])
    out = centroid_classify(labeled, q)
    assert out.columns == ["query_id", "pred_label"]
    assert out.count() == 0
