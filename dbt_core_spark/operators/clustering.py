"""Distributed k-means clustering + cluster-based curation (balanced
sampling, outlier pruning) over embedding columns.

The reference has no clustering surface (dbt-core is an orchestration
engine); this module is part of the LLM-training-data extension tier:
"cluster-then-curate" is the standard shape for diversity sampling and
prototype/outlier pruning over web-scale embedding corpora (SemDeDup-
style cluster balance, SSL-prototype pruning), and the same machinery
is the full-corpus training path for the IVF coarse quantizer in
operators/similarity.py (whose Lloyd refinement is float/cosine and
driver-sample-seeded).

Everything here is **integer-exact** so the whole Lloyd loop replays
bit-identically in an exact DuckDB SQL oracle:

- vectors are quantized once to e4 fixed point
  (``cast(round(cast(x as double) * 10000) as bigint)``, the repo's
  oracle discipline);
- squared L2 distances are bigint sums (max term (2e5)^2 * d — no
  overflow until d ~ 2e8);
- centroid updates use **truncating** integer division (toward zero),
  which is what both Spark's ``div`` and DuckDB's ``//`` implement —
  the driver-side helper mirrors it exactly;
- ties (equal distance) break to the lower cell id via struct-min
  ordering, matching ``row_number() over (order by d2, cell)``.

Scale shape (the MLlib KMeans architecture):

- centroids live on the driver — k·d ints, O(KB) — and enter each
  pass as a *broadcast literal expression*, so **assignment is a
  narrow per-row map with ZERO shuffle**;
- the update step is one ``posexplode`` + ``groupBy(cell, pos)``
  partial aggregation whose shuffle is bounded by k·d·partitions
  records per iteration, independent of corpus size;
- corpus passes = iters + 1 over the quantized base, which is sealed
  once (``localCheckpoint(eager=False)``, the repo's lineage-seal
  convention) so no pass replays the parquet scan + quantize chain;
- empty cells keep their previous centroid (deterministic; mirrors
  the oracle's ``left join … coalesce``).

``cluster_sample`` / ``cluster_outliers`` are rank-per-cluster
filters; with only k distinct partition keys a naive window would be
skew city, but Spark's WindowGroupLimit pushes the ``rank <= n``
filter below the exchange (each map partition pre-truncates to n per
cluster), bounding the shuffle by k·n·partitions — the same plan
shape pinned for window_top3 in tests/test_shuffle_bounds.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmeans_fixed",
    "kmeans_centroids",
    "kmeans_apply",
    "cluster_sample",
    "cluster_outliers",
]

_SCALE = 10_000


def _truncdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark ``div``, DuckDB
    ``//``).  Python's ``//`` floors, so negatives need the mirror."""
    return -((-a) // b) if a < 0 else a // b


def _quantize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    # NULL embeddings are excluded at entry (contract pinned by the r5
    # ADVICE): a NULL vector would yield a NULL distance struct field,
    # and NULL-tie ordering diverges between Spark's array_min and the
    # oracle's row_number NULLS LAST — same convention as
    # pool_embeddings_by_label and the cosine-family operators' v-CTE.
    # finite contract (r6 NaN/Inf fuzz class): a NaN/Inf component makes
    # the e4 quantization cast engine-divergent (DuckDB errors, Spark
    # nulls) — corrupt vectors are excluded whole, same predicate as
    # similarity._finite_components (NaN orders above +inf everywhere);
    # the size>0 guard matches the oracles' list_max(), which is NULL
    # for an empty list and drops the row (r6 ADVICE empty-array class)
    finite = (F.size(F.col(vec_col)) > 0) & (
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        )
        < F.lit(float("inf"))
    )
    return df.filter(F.col(vec_col).isNotNull() & finite).select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * _SCALE).cast("long"),
        ).alias("vq"),
    )


def _nearest(cents: list[tuple[int, list[int]]]) -> Column:
    """struct(dist2, cell) of the nearest centroid, as a narrow
    zero-shuffle expression: the k·d centroid matrix enters as ONE
    nested-array literal (cell = row index — a k·d expression tree of
    per-value literals costs visible analysis/codegen time per pass),
    distance is an exact bigint fold, argmin is struct-min (ties →
    lower cell)."""
    ordered = sorted(cents)
    assert [c for c, _ in ordered] == list(range(len(ordered)))
    mat = F.lit([[int(v) for v in cv] for _, cv in ordered])
    cands = F.transform(
        mat,
        lambda cv, i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("vq"),
                    cv,
                    lambda a, b: (a - b.cast("long")) * (a - b.cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.cast("long").alias("cell"),
        ),
    )
    return F.array_min(cands)


def _seed_centroids(
    base: DataFrame, k: int, init: str
) -> list[tuple[int, list[int]]]:
    """Deterministic centroid seeding.

    ``"lowest_id"`` (default, the oracle-replayable init): the k
    lowest-id vectors.  Degenerate when ids correlate with content
    (sorted/sharded corpora — all k seeds land in one region).

    ``"kmeanspp"``: kmeans++-style farthest-first seeding on a BOUNDED
    md5-ranked driver sample (the pq_codebook precedent) — seed 1 is
    the lowest-md5(salt||id) sample row (a seeded uniform draw), each
    further seed is the sample point maximizing min squared distance
    to the chosen set (greedy k-center, the deterministic analog of
    D²-weighted sampling; ties break to the earlier md5 rank).  All
    arithmetic stays exact int64 on e4-quantized vectors.  Scale
    shape: the md5 rank + limit plans as TakeOrdered (partial top-N
    per partition, no global sort) and only sample_n·d ints reach the
    driver."""
    if init == "lowest_id":
        seed = base.orderBy("id").limit(k).collect()  # k rows — bounded
        return [(i, list(r["vq"])) for i, r in enumerate(seed)]
    if init != "kmeanspp":
        raise ValueError(f"unknown kmeans init {init!r}")
    import numpy as np

    n_sample = max(k, 256)
    sample = (
        base.withColumn(
            "_rk", F.md5(F.concat(F.lit("kmpp"), F.col("id").cast("string")))
        )
        .orderBy("_rk", "id")
        .limit(n_sample)  # TakeOrdered — bounded driver transfer
        .collect()
    )
    if not sample:
        return []
    X = np.array([list(r["vq"]) for r in sample], dtype=np.int64)
    # chosen rows are masked to -1 so argmax can never re-pick them
    # (r6 ADVICE): on a duplicate-heavy sample min-distances go all
    # zero and an unmasked argmax would return index 0 forever,
    # silently collapsing to fewer effective clusters — with the mask,
    # exhausted-distance ties fall back to the next unchosen
    # md5-ranked sample row (argmax picks the first 0 > -1).
    chosen = [0]
    d2 = ((X - X[0]) ** 2).sum(axis=1)
    d2[0] = -1
    while len(chosen) < min(k, len(X)):
        nxt = int(d2.argmax())  # ties -> earliest md5 rank (argmax picks first)
        chosen.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
        d2[nxt] = -1
    return [(i, [int(v) for v in X[c]]) for i, c in enumerate(chosen)]


def _train(
    base: DataFrame, k: int, iters: int, init: str = "lowest_id"
) -> list[tuple[int, list[int]]]:
    """Lloyd loop over a sealed quantized base; returns the centroid
    list.  Seeding per ``_seed_centroids`` (deterministic either way).
    Each iteration: one zero-shuffle assignment pass +
    one k·d-bounded partial-sum shuffle; new centroid coordinate =
    truncdiv(sum, count); empty cells keep their previous centroid.
    Driver state is k·d ints per iteration (MLlib-precedent, cf.
    similarity._materialize_tiny)."""
    cents = _seed_centroids(base, k, init)
    if not cents:  # empty corpus — nothing to train
        return []
    for _ in range(iters):
        assigned = base.select(_nearest(cents)["cell"].alias("cell"), "vq")
        sums = (
            assigned.select("cell", F.posexplode("vq").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()  # <= k*d rows — bounded
        )
        upd: dict[int, dict[int, int]] = {}
        for r in sums:
            upd.setdefault(r["cell"], {})[r["pos"]] = _truncdiv(r["s"], r["c"])
        cents = [
            (cell, [upd[cell][p] for p in range(len(cv))] if cell in upd else cv)
            for cell, cv in cents
        ]
    return cents


def kmeans_fixed(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    init: str = "lowest_id",
) -> DataFrame:
    """Integer-exact distributed Lloyd k-means; returns one row per
    input row: (id_col, cluster, dist2_e8) where dist2_e8 is the exact
    squared L2 distance to the assigned centroid in e4^2 fixed point.
    (Training mechanics: see _train; ``init="kmeanspp"`` opts into the
    farthest-first sample seeding for sorted/sharded corpora — the
    driver gates stay pinned at "lowest_id" for oracle stability.)"""
    base = _quantize(df, vec_col, id_col).localCheckpoint(eager=False)
    cents = _train(base, k, iters, init)
    if not cents:  # empty corpus: a 0-wide literal matrix can't resolve
        return _empty_assign(base, id_col)
    m = _nearest(cents)
    return base.select(
        F.col("id").alias(id_col),
        m["cell"].alias("cluster"),
        m["d"].alias("dist2_e8"),
    )


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    init: str = "lowest_id",
) -> DataFrame:
    """The persistable model half of the tier: train on today's corpus,
    write the k-row (cell, cv) table, and assign every future ingest
    batch with kmeans_apply — no retraining pass over 100 TB of history
    (the ivf_index_build/search precedent, similarity.py:568).  cv is
    the e4-quantized centroid (array<bigint>)."""
    base = _quantize(df, vec_col, id_col).localCheckpoint(eager=False)
    cents = _train(base, k, iters, init)
    return df.sparkSession.createDataFrame(
        [(cell, cv) for cell, cv in cents], "cell long, cv array<long>"
    )


def kmeans_apply(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign-only: collect the tiny centroid table (k rows — bounded,
    the broadcast-literal precedent) and run the zero-shuffle nearest
    map over the batch.  Same output contract as kmeans_fixed."""
    cents = sorted(
        (r["cell"], list(r["cv"])) for r in centroids.collect()
    )
    base = _quantize(df, vec_col, id_col)
    if not cents:  # empty model table (trained on an empty corpus)
        return _empty_assign(base, id_col)
    m = _nearest(cents)
    return base.select(
        F.col("id").alias(id_col),
        m["cell"].alias("cluster"),
        m["d"].alias("dist2_e8"),
    )


def _empty_assign(base: DataFrame, id_col: str) -> DataFrame:
    """Zero-row assignment frame with the contract schema."""
    return base.select(
        F.col("id").alias(id_col),
        F.lit(None).cast("long").alias("cluster"),
        F.lit(None).cast("long").alias("dist2_e8"),
    ).limit(0)


def cluster_sample(
    assign: DataFrame,
    n_per: int = 25,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    salt: str = "cs1",
) -> DataFrame:
    """Deterministic cluster-balanced sample: the n_per rows per
    cluster ranked lowest by md5(salt || id) — a seeded shuffle that is
    reproducible across engines and runs.  WindowGroupLimit keeps the
    per-cluster shuffle at k·n_per·partitions records."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(cluster_col).orderBy(key, F.col(id_col))
    return (
        assign.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per)
    )


def cluster_outliers(
    assign: DataFrame,
    n_per: int = 10,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    dist_col: str = "dist2_e8",
) -> DataFrame:
    """The n_per rows per cluster farthest from their centroid
    (candidates for pruning / human review).  Exact: ranks the integer
    dist2_e8 descending, ties to the lower id.  Same WindowGroupLimit
    shuffle bound as cluster_sample."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(dist_col).desc(), F.col(id_col)
    )
    return (
        assign.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per)
    )
