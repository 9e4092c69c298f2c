"""Distinct-count sketching: K-Minimum-Values (KMV) and a
deterministic HyperLogLog.

The brief's "novel sketch" slot.  Stock HLL implementations (Spark's
`approx_count_distinct`, DuckDB's) use engine-private hash/register
layouts, so their outputs can't be cross-checked.  Both sketches here
are **deterministic and engine-portable** — every bit of sketch state
is derived from md5 via exact integer arithmetic, so an independent
SQL engine reproduces the estimate bit-for-bit.

KMV: hash every value with md5, keep the k smallest hashes per group,
and estimate

    D ≈ (k - 1) / r_k        where r_k = kth smallest hash mapped to (0,1)

Standard error ≈ 1/√(k−2).  The plan is scale-shaped: one shuffle on
the group key, then a WindowGroupLimit top-k (partial top-k runs
map-side), so the sketch state per group is k × 16 bytes regardless of
cardinality.  Sketches also merge trivially (union the hash sets, keep
k smallest) — the property that makes them useful for rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_unit(col: Column) -> Column:
    """md5 → first 15 hex chars → integer → uniform (0, 1] double.

    15 hex chars (60 bits) fit a bigint exactly; conv() is engine-local
    but the arithmetic mirror in the oracle reproduces it digit by digit.
    """
    h = F.substring(F.md5(col.cast("string")), 1, 15)
    out = F.lit(0).cast("bigint")
    for i in range(15):
        ch = F.substring(h, i + 1, 1)
        out = out * 16 + (F.instr(F.lit("0123456789abcdef"), ch) - 1)
    return (out.cast("double") + 1.0) / float(16 ** 15)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per group via KMV.

    Returns group_cols + ``kmv_estimate`` (double) + ``n_hashes``
    (bigint; < k means the group had fewer than k distinct values and
    the estimate is exact).
    """
    group_cols = group_cols or []
    # COUNT(DISTINCT) semantics ignore NULLs; md5(NULL) would otherwise
    # inject a NULL hash row
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, _hash_unit(F.col(value_col)).alias("_h")
    ).dropDuplicates([*group_cols, "_h"])
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = hashed.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.max("_h").alias("_rk_max"),
            F.count("*").cast("bigint").alias("n_hashes"),
        )
        .select(
            *group_cols,
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
            .otherwise((F.lit(k - 1) / F.col("_rk_max")))
            .alias("kmv_estimate"),
            "n_hashes",
        )
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    rho_cap: int = 40,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per group via a
    deterministic, engine-portable HyperLogLog.

    Register layout (all exact integer math, reproducible in ANSI SQL):

    - ``h``     = first 15 hex chars of md5(value) as a 60-bit bigint
    - ``bucket``= h mod m            (m = 2**p registers)
    - ``rest``  = h div m            (a 60-p bit value)
    - ``rho``   = leading-zero rank of ``rest`` within 60-p bits,
                  computed WITHOUT floats as ``(60-p) - length(bin(rest))
                  + 1`` (``bin`` prints no leading zeros in both Spark
                  and DuckDB, and ``bin(0) = '0'`` in both), capped at
                  ``rho_cap`` so the harmonic sum stays exact in int64.

    The harmonic mean is kept exact by scaling: ``S = Σ_j 2^(rho_cap -
    M_j)`` over all m registers (empty register ⇒ M_j = 0) is an integer
    ≤ m·2^rho_cap, and the estimate ``α_m·m²·2^rho_cap / S`` is a single
    double division — bit-identical across engines.  The standard
    linear-counting correction applies below 2.5·m (one ``ln`` of an
    integer ratio; rounded to 6 dp like the raw path).

    Plan shape: one shuffle on (group, bucket) with map-side partial
    max, then a tiny per-group fold — register state is m × 1 byte
    regardless of cardinality, and sketches merge by register-max (the
    property rollups need).  Relative error ≈ 1.04/√m (~6.5% at p=8).
    """
    group_cols = group_cols or []
    m = 1 << p
    rest_bits = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)  # ref: Flajolet et al. 2007, m >= 128
    c_num = alpha * m * m * float(1 << rho_cap)
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    # NULL values must not reach the registers: md5(NULL) -> NULL bucket
    # and least() skipping the NULL rho would fabricate a phantom
    # register with rho = rho_cap (COUNT(DISTINCT) ignores NULLs)
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.pmod(h, F.lit(m)).alias("_bucket"),
        F.least(
            F.lit(rest_bits) - F.length(F.bin(F.shiftright(h, p))) + 1, F.lit(rho_cap)
        ).alias("_rho"),
    )
    regs = hashed.groupBy(*group_cols, "_bucket").agg(F.max("_rho").alias("_m"))
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {rho_cap} - _m)")).alias("_s_ne"),
        F.count("*").cast("bigint").alias("n_registers"),
    )
    s_total = F.col("_s_ne") + (F.lit(m) - F.col("n_registers")) * F.lit(
        1 << rho_cap
    ).cast("bigint")
    raw = F.lit(c_num) / s_total.cast("double")
    zeros = F.lit(m) - F.col("n_registers")
    linear = F.lit(float(m)) * F.log(F.lit(m).cast("double") / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return per_group.select(
        *group_cols,
        F.round(est, 6).alias("hll_estimate"),
        "n_registers",
    )


def bloom_membership(
    corpus: DataFrame,
    probes: DataFrame,
    value_col: str,
    probe_col: str | None = None,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter membership: is each probe value possibly in the
    corpus?  Deterministic md5-derived bit positions (``pos_i =
    md5(value || '#i') mod m``), so an independent SQL engine
    reproduces every bit — and the false-positive set — exactly.

    The 100 TB shape: the corpus collapses to its DISTINCT set bits —
    at most ``m_bits`` rows (a few KB) regardless of corpus size — via
    one map-side-combined aggregate; that bit set then BROADCASTS to
    the probe side, so probing is a per-row map with no corpus-keyed
    shuffle.  FP rate ≈ (1 - e^(-k·n/m))^k; sized here for test-scale
    demos, widen m_bits for production.

    Returns probe rows + ``might_contain`` (bloom verdict, true for all
    present values plus FPs).
    """
    probe_col = probe_col or value_col

    def _positions(col: Column) -> Column:
        parts = []
        for i in range(k):
            h = F.conv(
                F.substring(
                    F.md5(F.concat(col.cast("string"), F.lit(f"#{i}"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            parts.append(F.pmod(h, F.lit(m_bits)))
        return F.array(*parts)

    bits = (
        corpus.filter(F.col(value_col).isNotNull())
        .select(F.explode(_positions(F.col(value_col))).alias("bit"))
        .distinct()
    )
    # a probe's k md5 positions can collide with each other; the verdict
    # is "every DISTINCT position is set", not "k hits" — comparing to
    # the constant k would read a genuinely present value as absent
    # whenever its own positions collide (Bloom contract violation)
    probe_bits = probes.select(F.col(probe_col)).distinct().select(
        F.col(probe_col),
        F.explode(F.array_distinct(_positions(F.col(probe_col)))).alias("bit"),
    )
    verdicts = (
        probe_bits.join(
            F.broadcast(bits.withColumn("_hit", F.lit(True))), "bit", "left"
        )
        .groupBy(probe_col)
        .agg(F.min(F.coalesce(F.col("_hit"), F.lit(False))).alias("might_contain"))
    )
    return probes.join(verdicts, probe_col, "left").select(
        probe_col, "might_contain"
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    quantiles: tuple = (0.5, 0.95, 0.99),
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 256,
) -> DataFrame:
    """Mergeable quantile sketch via fixed-width histograms — the
    t-digest slot, made deterministic so a SQL oracle reproduces every
    estimate bit-for-bit (t-digest centroids depend on merge order;
    fixed binning does not).

    ``bin = clamp(floor((v-lo)/(hi-lo)·n_bins), 0, n_bins-1)``; the
    q-quantile estimate is the UPPER edge of the first bin whose
    cumulative count reaches ``ceil(q·total)``.  Rank error ≤ one bin's
    mass; value error ≤ one bin width.

    Scale shape: one (group, bin) shuffle with map-side partial counts —
    sketch state is ≤ n_bins rows per group regardless of cardinality,
    histograms merge by addition (rollup-friendly), and the cumulative
    window runs over n_bins rows per group, never the data.
    """
    group_cols = group_cols or []
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(hi - lo) * n_bins),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    ).cast("bigint")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("_bin"))
        .agg(F.count("*").cast("bigint").alias("_n"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = hist.withColumn("_cum", F.sum("_n").over(w_cum)).withColumn(
        "_total", F.sum("_n").over(w_tot)
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_total")))
        .groupBy(*group_cols, "q")
        .agg(F.min("_bin").alias("_qbin"))
        .select(
            *group_cols,
            "q",
            (F.lit(lo) + (F.col("_qbin") + 1) * F.lit(width)).alias("quantile_est"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# and heavy hitters in fixed memory.  Like KMV/HLL above, every counter
# position is md5-derived exact integer arithmetic, so an independent SQL
# engine reproduces the sketch (and therefore the estimates) bit-for-bit.
# ---------------------------------------------------------------------------


def _cms_pos(col: Column, width: int, j: int, seed: str) -> Column:
    """Row-j counter position for a value (portable md5 integer-uniform)."""
    key = F.md5(F.concat(F.lit(f"{seed}{j}:"), col.cast("string")))
    return F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"), F.lit(width)
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Count-min sketch of ``value_col`` as a (row, pos, cnt) counter
    table — depth × width cells regardless of input cardinality.

    One posexplode (each instance → its ``depth`` counter cells) and one
    groupBy(row, pos) with map-side partial aggregation: shuffle volume
    is bounded by depth·width per upstream partition, not by the data.
    Sketches MERGE by unioning counter tables and re-summing
    (``cms_merge``) — the property that makes per-shard / per-day
    sketches roll up at 100 TB."""
    cells = df.filter(F.col(value_col).isNotNull()).select(
        F.posexplode(
            F.array(*[_cms_pos(F.col(value_col), width, j, seed)
                      for j in range(depth)])
        ).alias("row", "pos")
    )
    return cells.groupBy("row", "pos").agg(F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with identical (depth, width, seed)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each item: estimate = min over the
    ``depth`` rows of the counter at (j, h_j(item)) — an overestimate
    within eN/width with probability 1 - exp(-depth).

    The sketch is ≤ depth·width rows → broadcast; the probe side never
    shuffles except the final groupBy(item) min, which is bounded by
    |items| · depth."""
    probes = items.select(
        F.col(value_col),
        F.posexplode(
            F.array(*[_cms_pos(F.col(value_col), width, j, seed)
                      for j in range(depth)])
        ).alias("row", "pos"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "pos"])
        .groupBy(value_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Values whose count-min estimate ≥ threshold (superset of the true
    heavy hitters — CMS never underestimates).  Returns (value, est_cnt).

    The candidate set is the DISTINCT values (one shuffle); the sketch
    lookup is a broadcast join.  At 100 TB the distinct pass dominates;
    when even that is too wide, feed a pre-aggregated candidate subset
    (e.g. per-partition local top-k) as ``items`` to ``cms_estimate``."""
    sketch = cms_build(df, value_col, depth=depth, width=width, seed=seed)
    items = df.filter(F.col(value_col).isNotNull()).select(value_col).distinct()
    est = cms_estimate(sketch, items, value_col,
                       depth=depth, width=width, seed=seed)
    return est.filter(F.col("est_cnt") >= threshold)


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Corpus-overlap (Jaccard) estimate between two value sets from
    their KMV sketches (Beyer et al. 2007): with S = the k smallest
    distinct hashes of A ∪ B, J ≈ |{h ∈ S: h ∈ A and h ∈ B}| / |S|.
    Exact when both distinct counts are < k.

    The production question this answers at 100 TB: "how much does this
    new crawl overlap the corpus we already trained on?" — WITHOUT a
    distinct-join between the two corpora.  Each side reduces to ≤ k
    hashes (TakeOrderedAndProject: per-partition partial top-k, driver
    merges k rows); everything after is k-bounded.  Returns one row:
    (n_union_k, n_common, jaccard_est)."""
    def sig(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(_hash_unit(F.col(value_col)).alias("_h"))
            .distinct()
            .orderBy("_h")
            .limit(k)
        )

    ha = sig(a).withColumn("_a", F.lit(1))
    hb = sig(b).withColumn("_b", F.lit(1))
    u = (
        ha.unionByName(hb, allowMissingColumns=True)
        .groupBy("_h")
        .agg(F.max("_a").alias("_ia"), F.max("_b").alias("_ib"))
        .orderBy("_h")
        .limit(k)
    )
    return u.agg(
        F.count("*").cast("bigint").alias("n_union_k"),
        F.coalesce(
            F.sum(
                F.when((F.col("_ia") == 1) & (F.col("_ib") == 1), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).cast("bigint").alias("n_common"),  # empty inputs: 0, not null
    ).select(
        "n_union_k",
        "n_common",
        # try_divide: an empty union (0/0) is NULL, not an ANSI error
        F.try_divide(F.col("n_common").cast("double"), F.col("n_union_k"))
        .alias("jaccard_est"),
    )
