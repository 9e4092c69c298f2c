"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting.  Engine extensions (driver north star) — all built-in
Spark SQL functions, no UDFs, so the whole surface runs inside
WholeStageCodegen and scales linearly with partitions.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_core_spark.operators.dedup import normalized_words

# Tiny built-in stopword lists for the n-gram/stopword language heuristic.
# Order matters: ties resolve to the first language listed.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "es": ["el", "la", "los", "de", "y", "es", "en", "un", "una", "por"],
}


def token_count(col: str | Column) -> Column:
    """Whitespace tokens (BPE-ish subword estimate ≈ chars/4 available via
    ``bpe_token_estimate``)."""
    return F.size(normalized_words(col))


def bpe_token_estimate(col: str | Column) -> Column:
    """Cheap BPE token estimate: word pieces split on non-alnum boundaries
    plus ceil(chars/4) for long words — a standard heuristic when no
    tokenizer is shippable cluster-side."""
    c = F.col(col) if isinstance(col, str) else col
    words = normalized_words(c)
    return F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.greatest(F.lit(1), F.ceil(F.length(w) / 4)).cast("bigint"),
    )


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features (length, word stats, punctuation &
    stopword ratios) + a composite 0..1 score — the usual pre-training
    corpus filters."""
    t = F.col(text_col)
    words = normalized_words(text_col)
    n_chars = F.length(t)
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(en_stop, w)))
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0).cast("bigint"),
                    lambda acc, w: acc + F.length(w).cast("bigint")) / n_words,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    # raw doubles throughout: every value is an int/int division or a
    # fixed-order fold of exact literals, bit-identical across engines
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def detect_language(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic: language with the most
    stopword hits wins (ties → priority order en,fr,de,es; no hits →
    'und' undetermined)."""
    words = normalized_words(text_col)
    scores = []
    for lang, stops in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in stops])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(arr, w))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # priority order preserved on ties: compare (hits, -index) via reverse scan
    best = scores[0]
    for s in scores[1:]:
        best = F.when(s["hits"] > best["hits"], s).otherwise(best)
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("detected_lang"),
        best["hits"].cast("bigint").alias("stopword_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the normalized word sequence — the
    canonical near-exact-dedup key (whitespace/punct/case-insensitive)."""
    words = normalized_words(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", words)).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# PII scrubbing (SURVEY §7 phase 4 — pre-training corpus hygiene)
# --------------------------------------------------------------------------

# Patterns use the Java-regex / RE2 common subset (no lookaround, no
# backrefs) so a SQL oracle can replay them verbatim.  Order matters:
# emails first (their local parts contain digit runs a later phone
# pass would half-redact).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\+?\d{1,2}[-. ]\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Redact PII-shaped spans (emails, SSNs, phone numbers, IPv4s) and
    count redactions per kind.  Pure JVM regexp_replace / regexp_count —
    whole-stage-codegen'd, no UDF, shuffle-free per-row map."""
    pats = patterns or PII_PATTERNS
    scrubbed = F.col(text_col)
    counts = []
    for kind, rx, token in pats:
        counts.append(F.regexp_count(scrubbed, F.lit(rx)).cast("bigint").alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, rx, token)
    return df.select(
        F.col(id_col), scrubbed.alias("scrubbed"), *counts,
    )


# --------------------------------------------------------------------------
# chunking + deterministic splits (training-data preparation)
# --------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split documents into overlapping word windows — the
    context-length packing step of a training pipeline.  One row per
    (doc, chunk): ``chunk_idx`` (0-based), ``chunk_text``, ``n_words``.
    Pure per-row map (words array → slice windows → explode);
    shuffle-free, linear in corpus size."""
    if overlap >= chunk_words:
        raise ValueError("overlap must be < chunk_words")
    step = chunk_words - overlap
    words = F.col("words")
    n = F.size(words)
    # window starts: 1, 1+step, ... — always ≥1 window (short docs get one)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - overlap, F.lit(1)),
        F.lit(step),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"),
                normalized_words(text_col).alias("words"))
        .filter(F.size("words") > 0)
        .select("doc_id",
                F.posexplode(
                    F.transform(starts, lambda s: F.slice(words, s, chunk_words))
                ).alias("chunk_idx", "chunk_words_arr"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.array_join("chunk_words_arr", " ").alias("chunk_text"),
            F.size("chunk_words_arr").cast("bigint").alias("n_words"),
        )
    )


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed id — stable
    across runs, engines, and cluster sizes (md5 arithmetic, no RNG).
    Buckets 0..9999 cut by cumulative weights."""
    w = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket, expr = _split_exprs(F.col(id_col), w, salt)
    return df.select(F.col(id_col), bucket.cast("bigint").alias("bucket"),
                     expr.alias("split"))


def _split_exprs(key: Column, w: dict[str, float], salt: str):
    """Shared (bucket, split-name) expressions for the hashed-key
    split family (assign_splits hashes the doc id; group_split hashes
    the duplicate-cluster root)."""
    from dbt_core_spark.operators.dedup import _hex_to_int

    bucket = F.pmod(
        _hex_to_int(F.md5(F.concat(F.lit(salt + ":"),
                                   key.cast("string")))),
        F.lit(10000),
    )
    cum = 0.0
    expr = None
    for name, frac in w.items():
        cum += frac
        cond = bucket < int(round(cum * 10000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float-sum shortfall: last listed split absorbs the remainder
    expr = expr.otherwise(list(w)[-1])
    return bucket, expr


def group_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "gsplit",
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test assignment: hash the duplicate-
    CLUSTER root, not the document id, so every member of a
    near-duplicate cluster lands in the SAME split.  Per-doc hashed
    splits (``assign_splits``) leak: two near-identical documents
    routinely straddle train and test, and the eval set silently
    contains training data — the contamination channel
    decontamination closes against EXTERNAL benchmarks, closed here
    WITHIN the corpus's own splits (Lee et al. 2022 §6 measure the
    effect; standard GroupShuffleSplit semantics with learned dup
    groups).

    ``pairs`` is any near-duplicate pair frame (n-gram Jaccard /
    MinHash-LSH / SimHash — the dedup tier's outputs).  Exact
    connected components give each doc its cluster root (min member
    id); singletons (docs in no pair) are their own group, which
    makes the assignment degrade EXACTLY to ``assign_splits``'s
    distribution as the pair graph thins.  The split expression is
    the shared md5-bucket lattice — deterministic across runs,
    engines, and cluster sizes.

    Scale shape: connected-components cost (iterative min-label over
    the PAIR graph only — dup pairs, not the corpus) + one left join
    corpus⋈components on id + a per-row hash; no extra shuffle over
    assign_splits beyond the components join.  Returns
    (id_col, grp, bucket, split); ``grp`` keeps the id column's own
    type (string ids hash on their string form, exactly like
    assign_splits — a bigint cast here would NULL/throw on them,
    code-review finding)."""
    w = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    grouped = _group_roots(df, pairs, id_col, a, b)
    bucket, expr = _split_exprs(F.col("grp"), w, salt)
    return grouped.select(
        F.col(id_col), "grp", bucket.cast("bigint").alias("bucket"),
        expr.alias("split"),
    )


def _group_roots(
    df: DataFrame, pairs: DataFrame, id_col: str, a: str, b: str
) -> DataFrame:
    """Shared (id, grp) frame for the leakage-safe split family: the
    duplicate-cluster root via exact connected components, singletons
    rooted at their own id, the id's type preserved."""
    from dbt_core_spark.operators.dedup import connected_components

    comps = connected_components(pairs, a=a, b=b).withColumnRenamed(
        "id", id_col)
    return (
        df.select(F.col(id_col))
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("grp"),
        )
    )


def group_kfold(
    df: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "gfold",
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Leakage-safe K-FOLD assignment — ``group_split``'s
    cross-validation sibling (GroupKFold semantics): fold =
    md5-bucket of the duplicate-cluster root mod k, so every member
    of a near-duplicate cluster shares a fold and no fold's holdout
    leaks into its training complement.  Same components + hash
    lattice as group_split (the shared ``_group_roots`` frame);
    returns (id_col, grp, fold int)."""
    grouped = _group_roots(df, pairs, id_col, a, b)
    bucket, _ = _split_exprs(F.col("grp"), {"train": 1.0}, salt)
    return grouped.select(
        F.col(id_col), "grp",
        F.pmod(bucket, F.lit(k)).cast("int").alias("fold"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, public): per
    document, the duplicate-word fraction and the share of bigrams
    occupied by the single most frequent bigram — the standard signals
    for dropping boilerplate/spam from a training corpus.

    Plan shape: word stats are pure per-row HOFs (no shuffle); the
    top-bigram pass is one explode → (id, bigram) count with map-side
    partial aggregation → min-struct argmax per doc (no sort window) —
    the wordcount shuffle shape, linear at 100 TB.  The bigram array is
    built with zip_with over two shifted slices, NOT element_at-in-
    lambda (which re-references the words array per gram and goes
    quadratic under Catalyst inlining)."""
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col),
        words.alias("words"),
    ).select(
        id_col,
        "words",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct_words"),
    )
    bigrams = base.filter(F.col("n_words") >= 2).select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("words"), 1, F.size("words") - 1),
                F.slice(F.col("words"), 2, F.size("words") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    top = (
        bigrams.groupBy(id_col, "bigram").count()
        .groupBy(id_col)
        .agg(
            # max over (count, bigram): argmax with deterministic
            # tiebreak by bigram text, one partial-aggregated pass
            F.max(F.struct(F.col("count"), F.col("bigram"))).alias("m"),
            F.sum("count").alias("n_bigrams"),
        )
        .select(
            id_col,
            F.col("m.bigram").alias("top_bigram"),
            F.col("m.count").alias("top_bigram_count"),
            "n_bigrams",
        )
    )
    return (
        base.drop("words")
        .join(top, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_distinct_words",
            (1.0 - F.col("n_distinct_words") / F.col("n_words")).alias(
                "dup_word_frac"),
            "top_bigram",
            F.col("top_bigram_count").cast("bigint").alias("top_bigram_count"),
            # the oracle's n_words-1 identity (gate-fuzz finding): 0 for
            # sub-2-word docs, NULL for NULL text (a flat lit(0)
            # fallback leaked 0 into NULL-text rows — r6 NULL-doc fuzz);
            # the frac below keeps the nullable denominator so no ANSI
            # divide-by-zero can fire
            F.coalesce(F.col("n_bigrams").cast("bigint"),
                       (F.col("n_words") - 1).cast("bigint")).alias(
                "n_bigrams"),
            (F.col("top_bigram_count") / F.col("n_bigrams")).alias(
                "top_bigram_frac"),
        )
    )


def cap_per_group(df: DataFrame, group_col: str = "source",
                  id_col: str = "doc_id", cap: int = 10) -> DataFrame:
    """Per-domain/source document caps — the standard anti-domination
    sampling step in corpus assembly (keep at most ``cap`` docs per
    group, deterministically by ascending id).

    One shuffle on the group key; Spark plans the rank≤cap filter as
    WindowGroupLimit (partial top-k before the full sort at scale)."""
    w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select(id_col, group_col, F.col("rn").cast("bigint").alias("rank_in_group"))
    )


def _ngram_array(words, n: int):
    """n-gram array via n shifted slices folded with zip_with — never
    element_at-in-lambda, which re-references the array per gram and
    goes quadratic under Catalyst expression inlining.  The slice
    length is clamped at 0: a sub-n-word doc yields an empty gram
    array, where the raw negative length THROWS under ANSI
    (gate-fuzz finding)."""
    length = F.greatest(F.lit(0), F.size(words) - (n - 1))
    out = F.slice(words, 1, length)
    for i in range(1, n):
        nxt = F.slice(words, i + 1, length)
        out = F.zip_with(out, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return out


def boilerplate_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 5,
) -> DataFrame:
    """Cross-document boilerplate signal (RefinedWeb/C4-style repetition
    removal, public): an n-gram appearing in ≥ ``min_docs`` DISTINCT
    documents is 'common'; per document, report the fraction of its
    distinct n-grams that are common — high fractions flag templated/
    boilerplate pages for removal from a training corpus.

    Plan shape: within-doc dedup happens in the array (array_distinct —
    each (doc, shingle) pair is emitted once), so corpus frequency is a
    plain count(*) wordcount shuffle with map-side combine; membership
    is a semi-join on the shingle key.  Two key shuffles total, linear
    at corpus scale; no driver collect."""
    words = F.split(F.col(text_col), " ")
    base = (
        df.select(
            F.col(id_col),
            F.array_distinct(_ngram_array(words, n)).alias("shingles"),
        )
        .filter(F.size(F.col("shingles")) > 0)
        # sealed: base feeds the exploded counts (twice, via common +
        # membership) and the per-doc denominator — unsealed, the
        # n-gram HOF replays once per branch
        .localCheckpoint(eager=False)
    )
    ex = base.select(id_col, F.explode("shingles").alias("shingle"))
    common = (
        ex.groupBy("shingle").count()
        .filter(F.col("count") >= min_docs)
        .select("shingle")
    )
    per_common = (
        ex.join(common, "shingle", "leftsemi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_common"))
    )
    return (
        base.select(id_col, F.size("shingles").alias("n_shingles"))
        .join(per_common, id_col, "left")
        .select(
            id_col,
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias(
                "n_common_shingles"),
            (F.coalesce(F.col("n_common"), F.lit(0))
             / F.col("n_shingles").cast("double")).alias("common_frac"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Classic TF-IDF keyword extraction: top-``k`` terms per document
    by ``tf · ln(N/df)`` (ties broken by term ascending).

    Plan shape (all JVM-side, no UDFs):

    - explode normalized words → one wordcount shuffle for per-doc TF
      (map-side combine applies);
    - document frequency reuses the SAME exploded aggregate (``df`` =
      count over distinct (doc, term), which the TF aggregate already
      is — no second pass over the corpus);
    - corpus size N joins in as a broadcast 1-row aggregate, and the
      term→df side of the join is vocabulary-sized (≪ corpus), which
      AQE converts to a broadcast join at runtime;
    - per-doc top-k plans as WindowGroupLimit (partial top-k before the
      per-doc sort).

    At 100 TB: the only corpus-scale shuffle is the (doc, term)
    wordcount; df/N are vocabulary/scalar-sized.  Score ordering is
    deterministic cross-engine: exact ties (equal tf and df) fall to
    the term tiebreak; unequal (tf, df) pairs can't collide in the
    double ULP by transcendence of ln on rational arguments.
    """
    tf = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(normalized_words(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        # sealed: tf feeds the df aggregate AND the scoring join — the
        # "df reuses the SAME exploded aggregate" claim only holds if
        # the lineage is cut; unsealed, the corpus wordcount runs twice
        .localCheckpoint(eager=False)
    )
    docfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df_docs"))
    n_docs = (
        df.filter(F.col(text_col).isNotNull())
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("df_docs").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df_docs",
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rn").cast("bigint").alias("term_rank"),
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50000,
    min_count: int = 1,
) -> DataFrame:
    """Tokenizer-style vocabulary build: corpus-wide term counts →
    contiguous token ids 0..V-1 assigned by (count desc, term asc).

    Scale shape: one corpus wordcount shuffle (map-side combine), then
    a DISTRIBUTED per-partition top-V prune before the global ranking —
    a term in the global top-V necessarily ranks in the top-V of
    whichever partition holds it, so ranking within
    ``spark_partition_id()`` first is lossless and cuts the
    single-partition global window's input from |distinct terms|
    (billions on 100 TB web text, min_count=1) to ≤ P·vocab_size rows.
    Spark's InferWindowGroupLimit can't do this automatically here: it
    skips empty-partition windows and limits above
    ``windowGroupLimitThreshold`` (default 1000) — vocab_size is
    typically 30k-100k.
    """
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(normalized_words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    pw = Window.partitionBy("_pid").orderBy(F.col("n").desc(), F.col("term").asc())
    pruned = (
        counts.withColumn("_pid", F.spark_partition_id())
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= vocab_size)
        .drop("_pid", "_pr")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= vocab_size)
        .select(
            (F.col("rn").cast("bigint") - 1).alias("token_id"), "term", "n"
        )
    )


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    per_group: int = 10,
) -> DataFrame:
    """Deterministic stratified (balanced) sampling: downsample each
    group to ≈ ``per_group`` expected rows via an md5 keep-threshold —
    the standard source-rebalancing step when assembling a training
    mix from skewed web sources.

    Keep rule, in exact integer math (no float rate, so the oracle
    reproduces it bit-for-bit):

        keep  ⇔  (md5_60bit(id) mod 1e6) · group_count  <  per_group · 1e6

    i.e. keep-probability min(1, per_group/count) per group.  Unlike
    ``cap_per_group`` (exact top-N, one window shuffle) this is
    shuffle-free on the corpus: group counts are a tiny aggregate that
    AQE broadcasts back, and the filter is a per-row hash compare —
    the shape that survives 100 TB.  Sampling is stable under corpus
    growth only in distribution (counts change ⇒ thresholds change);
    use a frozen count table for reproducible incremental runs.
    """
    counts = df.groupBy(group_col).agg(F.count("*").cast("bigint").alias("_gn"))
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        ),
        F.lit(1_000_000),
    )
    return (
        df.join(F.broadcast(counts), group_col)
        .filter(h * F.col("_gn") < F.lit(int(per_group) * 1_000_000))
        .select(id_col, group_col, F.col("_gn").alias("group_count"))
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    budget: int = 512,
) -> DataFrame:
    """Contiguous sequence packing: assign documents to fixed
    token-budget bins (GPT-style sample packing) by running token
    offset within each group, deterministically ordered by id.

    ``bin_id = floor(start_offset / budget)`` where start_offset is the
    exclusive running sum of token counts — pure integer math, so the
    oracle reproduces bin boundaries exactly (a doc straddling a budget
    boundary belongs to the bin its start falls in).

    One shuffle on the group key; the cumulative window sorts within
    groups only (never a global single-partition window).  Groups are
    the packing domains — at 100 TB use shards (e.g. source × date) as
    the group so no single window partition grows unbounded.
    """
    toks = df.select(
        F.col(id_col),
        F.col(group_col),
        token_count(text_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("_cum", F.sum("n_tokens").over(w))
    start = F.col("_cum") - F.col("n_tokens")
    return cum.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor(start / budget).cast("bigint").alias("bin_id"),
        F.pmod(start, F.lit(budget)).cast("bigint").alias("bin_offset"),
    )


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing text embeddings (the hashing trick, Weinberger
    et al. 2009 — the standard model-free baseline): each word hashes
    to a bucket in [0, dim) with a ±1 sign from an independent hash;
    the doc vector is the signed bucket counts, L2-normalized.  Closes
    the text→vector→ANN loop entirely in-engine: the output feeds
    ``ivf_index_build`` / ``semantic_dedup`` / ``cosine_topk_blas``
    directly, and unit tests of embedding pipelines get a vector column
    with NO model dependency.

    Determinism: md5-derived bucket and sign (portable integer
    arithmetic); signed counts are integers, so the norm's sum of
    squares is exact in float regardless of fold order — the whole
    vector reproduces bit-for-bit in any engine (hash_embed_docs gate
    row, values at 6 dp).

    Scale shape: explode words → ONE wordcount-style shuffle on
    (id, bucket) with map-side partial agg → per-doc map rebuild; the
    dense array never passes through an exchange.  Docs with no words
    (null/empty text) produce no row — there is nothing to embed.

    Returns (id_col, embedding array<double>), unit-norm."""
    from dbt_core_spark.operators.dedup import _hex_to_int, ensure_parallelism

    # md5-heavy per-word work: widen narrow (single-file) inputs first
    w = ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(normalized_words(text_col)).alias("w")
    )
    signed = w.select(
        id_col,
        F.pmod(_hex_to_int(F.md5(F.col("w")), 15), F.lit(dim)).alias("b"),
        (F.pmod(_hex_to_int(F.md5(F.concat(F.lit("s:"), F.col("w"))), 1), F.lit(2))
         * 2 - 1).alias("sgn"),
    )
    g = signed.groupBy(id_col, "b").agg(
        F.sum("sgn").cast("double").alias("v")
    )
    # ONE aggregate yields both the sparse map and the norm (sum of
    # integer-valued squares — exact in any fold order).  The norm must
    # be a plain COLUMN before it enters the transform lambda: an
    # expression there would be re-inlined and re-evaluated per element
    # (the measured HOF pitfall — see line_dedup's derivation note).
    stats = (
        g.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("b").cast("int"), F.col("v")))
            ).alias("m"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"),
        )
        .filter(F.col("nrm") > 0)
    )
    return stats.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            # element_at on a MAP is KEY lookup (buckets are 0-based)
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0.0))
            / F.col("nrm"),
        ).alias("embedding"),
    )


def _bucket_of(word: Column, dim: int, seed: str) -> Column:
    """Feature-hash bucket for a word (portable md5 integer-uniform,
    mirror of oracles._hex2int) — pure expression, HOF-lambda safe."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), word))
    return F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"), F.lit(dim)
    )


def _derived_weight_e6(bucket: Column, wseed: str) -> Column:
    """Deterministic pseudo-weight for a bucket, integer micro-logits in
    [-1000, 1000] (md5-derived, like the LSH hyperplanes)."""
    key = F.md5(F.concat(F.lit(f"{wseed}:"), bucket.cast("string")))
    return (
        F.pmod(
            F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"),
            F.lit(2001),
        )
        - F.lit(1000)
    )


def classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    weights: DataFrame | None = None,
    seed: str = "clf",
    wseed: str = "w",
) -> DataFrame:
    """fastText-style linear classifier INFERENCE: hashed bag-of-words →
    mean bucket weight → keep/drop label (the standard learned quality
    filter in front of LLM pretraining corpora — e.g. the CCNet/GPT-3
    Wikipedia-vs-CommonCrawl classifier).

    Training happens offline; this operator is the corpus-scale scoring
    pass, in two shapes:

    - ``weights=None`` (benchmark/demo): per-bucket micro-logit weights
      are derived from md5 of the bucket id, so scoring is a pure
      row-local fold (``F.aggregate`` over the words array) — ZERO
      shuffles, whole-stage codegen, embarrassingly parallel at 100 TB.
    - ``weights`` given (production): a (bucket, w_e6) table of trained
      weights, ≤ ``dim`` rows — broadcast-joined against the exploded
      words, then one groupBy(id) shuffle.  Never a driver-side loop.

    Integer micro-logits (e6) keep the oracle bit-exact; ``logit_e6`` is
    the floored mean weight, ``label`` is keep iff it is positive.
    The words array is staged as a column referenced twice (size +
    fold) so CollapseProject cannot inline the tokenizer into the
    lambda and re-run it per element (see with_unit_vectors)."""
    base = df.filter(F.col(text_col).isNotNull())
    if weights is None:
        staged = base.select(
            F.col(id_col), normalized_words(F.col(text_col)).alias("__w")
        )
        scored = staged.select(
            F.col(id_col),
            F.size("__w").cast("bigint").alias("n_words"),
            F.aggregate(
                F.col("__w"),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc
                + _derived_weight_e6(_bucket_of(x, dim, seed), wseed),
            ).alias("__s"),
        )
    else:
        ex = base.select(
            F.col(id_col),
            F.explode(normalized_words(F.col(text_col))).alias("word"),
        ).select(F.col(id_col), _bucket_of(F.col("word"), dim, seed).alias("bucket"))
        scored = (
            ex.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(
                F.count("*").alias("n_words"),
                F.sum("w_e6").alias("__s"),
            )
        )
    return (
        scored.filter(F.col("n_words") > 0)
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.floor(F.col("__s") / F.col("n_words")).cast("bigint").alias("logit_e6"),
        )
        .withColumn(
            "label",
            F.when(F.col("logit_e6") > 0, F.lit("keep")).otherwise(F.lit("drop")),
        )
    )


# Unicode canonicalization maps (1:1 chars go through translate() —
# exact, regex-free, identical semantics in Spark and DuckDB including
# delete-when-unmapped; multi-char rewrites use literal replace()).
# explicit \u escapes: a literal NBSP in source was once silently
# mangled to a plain space by tooling, breaking the oracle mirror
# (r6 unicode fuzz finding)
_XLATE_FROM = "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0\u00ad"
_XLATE_TO = "''\"\"-- "  # soft hyphen (last) deletes


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonicalize raw scraped text before hashing/dedup/tokenizing —
    the C4/CCNet-style cleanup pass that makes exact-dedup fingerprints
    stable across mojibake-adjacent variants of the same page:

    - '…' → '...'; curly quotes/dashes/NBSP → ASCII; soft hyphens
      dropped (translate, not regex — exact and cheap);
    - C0/C1-adjacent control characters stripped (tab/newline kept);
    - horizontal whitespace runs collapsed to one space, spaces around
      newlines trimmed, 3+ blank lines squeezed to one, ends trimmed.

    Pure row-local string expressions — zero shuffles, whole-stage
    codegen, trivially linear at 100 TB.  Returns
    (id, text_norm, n_chars_before, n_chars_after)."""
    t0 = F.col(text_col)
    t = F.replace(t0, F.lit("…"), F.lit("..."))
    t = F.translate(t, _XLATE_FROM, _XLATE_TO)
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    t = F.regexp_replace(t, "[ \\t]+", " ")
    t = F.regexp_replace(t, " *\\n *", "\n")
    t = F.regexp_replace(t, "\\n{3,}", "\n\n")
    t = F.trim(t)
    return df.filter(t0.isNotNull()).select(
        F.col(id_col),
        t.alias("text_norm"),
        F.length(t0).cast("bigint").alias("n_chars_before"),
        F.length(t).cast("bigint").alias("n_chars_after"),
    )


def strip_html(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """HTML → text extraction — the step BEFORE ``normalize_text`` in
    a web-corpus pipeline (CCNet/C4 extract from WET/WARC payloads;
    this is that verb for markup that survived extraction):

    - ``<script>``/``<style>`` blocks removed WITH their contents
      (code/CSS is not prose), ``<!-- comments -->`` removed;
    - remaining tags ``<...>`` stripped to a space (block boundaries
      must not glue words together);
    - the six ubiquitous entities decoded (&lt; &gt; &quot; &#39;
      &nbsp; then &amp; LAST — the double-escape rule: '&amp;lt;'
      must yield '&lt;', not '<');
    - whitespace collapsed and trimmed.

    Pure JVM regexp/replace chain — zero shuffles, whole-stage
    codegen, linear at 100 TB; NULL text propagates as NULL.  The
    tag regex is the pragmatic ``<[^>]*>`` (a bare '<' in prose only
    mis-eats when a '>' follows — acceptable for corpus curation,
    identical on both engines so the oracle replays exactly).
    Engine-portability (code-review finding): tag-name matching uses
    EXPLICIT case classes, not ``(?i)`` — RE2 (DuckDB) case-folds
    Unicode under (?i) (ſ matches s) where Java folds ASCII only —
    and the whitespace collapse uses an explicit ASCII class, not
    ``\\s`` — Java's \\s includes \\x0B, RE2's does not.  Returns
    (id, text_clean, n_tags)."""
    scr = "[sS][cC][rR][iI][pP][tT]"
    sty = "[sS][tT][yY][lL][eE]"
    ws = "[ \\t\\n\\x0B\\f\\r]+"
    t0 = F.col(text_col)
    t = F.regexp_replace(t0, f"(?s)<{scr}[^>]*>.*?</{scr}>", " ")
    t = F.regexp_replace(t, f"(?s)<{sty}[^>]*>.*?</{sty}>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    n_tags = F.regexp_count(t, F.lit("<[^>]*>")).cast("bigint")
    t = F.regexp_replace(t, "<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.trim(F.regexp_replace(t, ws, " "))
    return df.select(
        F.col(id_col),
        t.alias("text_clean"),
        n_tags.alias("n_tags"),
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Sparse document cosine similarity via an INVERTED-INDEX join —
    the sparse-vector complement of the dense-embedding ANN tier: only
    documents sharing at least one term are ever paired, so cost is
    Σ_term df(term)² over the surviving vocabulary instead of O(n²).

    Weights are tf · idf with idf floored to integer milli-nats per
    TERM (the type-level float discipline: ln of exact integer ratios,
    floored once, then pure bigint tf·idf products and sums — no
    cross-row float accumulation anywhere; the final cosine is one
    double division, rounded to 6 dp).  Terms appearing in more than
    ``max_df_frac`` of documents are dropped (stopword-class terms pair
    everything with everything — the standard fan-out bound; tune down
    at larger corpora).

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine ≥ threshold
    applied on the ROUNDED value so engine float noise cannot flip the
    boundary."""
    tf = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"),
                F.explode(normalized_words(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)  # feeds df-counts AND weights
    )
    n_docs = tf.select("id").distinct().count()  # one tiny action
    max_df = int(n_docs * max_df_frac)
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct("id").cast("bigint").alias("df_t"))
        .filter(F.col("df_t") <= max_df)
        .select(
            "term",
            F.floor(F.log(F.lit(float(n_docs)) / F.col("df_t")) * 1000)
            .cast("bigint").alias("idf_milli"),
        )
    )
    w = tf.join(idf, "term").select(
        "id", "term", (F.col("tf") * F.col("idf_milli")).alias("w")
    ).localCheckpoint(eager=False)  # feeds norms AND both join sides
    norms = w.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("nsq"))
    a = w.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = (
        dots.join(norms.select(F.col("id").alias("id_a"),
                               F.col("nsq").alias("nsq_a")), "id_a")
        .join(norms.select(F.col("id").alias("id_b"),
                           F.col("nsq").alias("nsq_b")), "id_b")
        .select(
            "id_a", "id_b",
            # floor-form rounding (class 17, see corpus.ngram_lm_score):
            # integer dot/norms can yield quotients terminating at a
            # 6-dp half, where JVM round() and the oracle's diverge
            (F.floor(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("nsq_a").cast("double"))
                   * F.sqrt(F.col("nsq_b").cast("double")))
                * F.lit(1000000.0)
                + F.lit(0.5)
            ) / F.lit(1000000.0)).alias("cosine"),
        )
    )
    return cos.filter(F.col("cosine") >= threshold)


def _bm25_qterms(
    queries: DataFrame, query_text_col: str, query_id_col: str
) -> DataFrame:
    """DISTINCT (query_id, term) — short-query BM25, query-side tf
    omitted (shared by bm25_rank and bm25_query)."""
    return (
        queries.filter(F.col(query_text_col).isNotNull())
        .select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                normalized_words(F.col(query_text_col))
            ).alias("term"),
        )
        .distinct()
    )


def _bm25_contrib(n_docs: int, total: int) -> Column:
    """Per-(query-term, doc) BM25 contribution in integer micro-units —
    ONE deterministic double expression over exact integers, floored
    (see bm25_rank for the k1=6/5, b=3/4 rational reduction)."""
    return F.floor(
        F.col("idf_milli").cast("double")
        * (F.lit(44.0) * F.col("tf") * F.lit(float(total)))
        / (
            F.lit(20.0) * F.col("tf") * F.lit(float(total))
            + F.lit(6.0) * F.lit(float(total))
            + F.lit(18.0) * F.col("dl") * F.lit(float(n_docs))
        )
        * F.lit(1000.0)
    ).cast("bigint")


_BM25_INDEX_SCHEMA = (
    "term string, id bigint, tf bigint, dl bigint, idf_milli bigint, "
    "n_docs bigint, total bigint, snap_id bigint"
)
_BM25_INDEX_SCHEMA_BUCKETED = (
    _BM25_INDEX_SCHEMA + ", bucket int, n_buckets int"
)


def _bm25_snap_id(
    chk: int, n_docs: int, total: int, n_buckets: int | None
) -> int:
    """Content-derived snapshot id (r9 verdict item 2): an md5 fold of
    the postings checksum (bit_xor of hash(term, id, tf) — order-free,
    so it is partitioning-invariant and append/delete can recompute it
    from merged/surviving postings) with the corpus scalars.  Stamped
    as a constant column at build/append/delete time, it makes
    ``delete ≡ rebuild`` and ``append ≡ rebuild`` bit-identical INCLUDING
    the stamp, while any hand-union of two different snapshots carries
    two values and fails the `_bm25_constants` min/max invariant."""
    import hashlib

    digest = hashlib.md5(
        f"bm25:{chk}:{n_docs}:{total}:{n_buckets or 0}".encode()
    ).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


# xor-fold of every posting's row hash; runs inside the existing
# per-id groupBy (no extra job at build) and re-folds exactly under
# append/delete because xor is associative and commutative
_BM25_CHK_EXPR = "bit_xor(cast(hash(term, id, tf) as bigint))"


def _bm25_sentinel(
    spark, n_docs: int, total: int, snap_id: int, n_buckets: int
) -> DataFrame:
    """One sentinel posting pinned to BUCKET 0 of a bucketed index
    (term '' — unreachable from normalized_words; tf 0 marks it, and
    bm25_query drops tf=0 rows before scoring).  Bucket 0 exists under
    EVERY n_buckets mapping, and bm25_query always scans it in
    addition to the query terms' buckets — so a raw union of two
    bucketed snapshots puts BOTH sentinels (two snap_id values) into
    one scanned bucket and the pruned-postings constants check fails
    loudly even when every query-touched bucket happens to hold rows
    from only one mapping (the r9 blind spot, closed structurally)."""
    return spark.createDataFrame(
        [("", -1, 0, 0, 0, n_docs, total, snap_id, 0, n_buckets)],
        _BM25_INDEX_SCHEMA_BUCKETED,
    )


def _bm25_bucket(term: Column, n_buckets: int) -> Column:
    """Deterministic term→bucket map shared by index build, append, and
    query-side pruning — the mapping must be identical everywhere or a
    pruned query silently misses postings."""
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def bm25_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Persistable BM25 postings index — the build-once/search-many
    scale contract for lexical retrieval (the ivf_index_build analog):
    compute corpus statistics ONCE per corpus snapshot, store the
    result as a table, and serve every future query batch from it
    without re-tokenizing 100 TB of history (the corpus tf/df rebuild
    is the dominant cost of bm25_rank at scale — SCALING.md).

    One row per posting: (term, id, tf, dl, idf_milli, n_docs, total,
    snap_id).  The corpus scalars and the content-derived snapshot id
    ride along as constant columns — columnar RLE compresses them to
    nothing, and the index stays ONE self-contained table.  Bucketed
    indexes additionally carry a sentinel posting pinned to bucket 0
    (`_bm25_sentinel`) so bm25_query's pruned-postings constants check
    catches ANY hand-union of two snapshots, including ones whose
    bucket numbering never collides (the r9 blind spot).

    ``n_buckets`` adds a term-hash ``bucket`` column (plus the
    ``n_buckets`` constant so query/append reuse the same mapping):
    write the index with ``.write.partitionBy("bucket")`` and
    ``bm25_query`` prunes the scan to the query terms' buckets — at
    100 TB a query batch touching b of N buckets reads b/N of the
    postings files instead of all of them (PartitionFilters, pinned by
    tests/test_plans.py).  Pick n_buckets ~ total index size /
    (128 MB·files-per-partition-target); hundreds for TB-scale
    indexes.

    ``bm25_query(bm25_index(df), q)`` is row-identical to
    ``bm25_rank(df, q)`` (pytest-pinned), bucketed or not."""
    tf = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"),
                F.explode(normalized_words(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)  # feeds dl, df_t, and postings
    )
    dl = tf.groupBy("id").agg(
        F.sum("tf").cast("bigint").alias("dl"),
        # per-id xor fold; the snapshot checksum re-folds these below —
        # same pass as dl, no extra job
        F.expr(_BM25_CHK_EXPR).alias("chk_id"),
    )
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("total"),
        F.expr("bit_xor(chk_id)").alias("chk"),
    ).collect()[0]
    n_docs, total = stats["n"], stats["total"]
    if n_docs == 0:
        return df.sparkSession.createDataFrame(
            [], _BM25_INDEX_SCHEMA_BUCKETED if n_buckets
            else _BM25_INDEX_SCHEMA)
    snap = _bm25_snap_id(int(stats["chk"]), int(n_docs), int(total),
                         n_buckets)
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct("id").cast("bigint").alias("df_t"))
        .select(
            "term",
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df_t") + F.lit(0.5))
                    / (F.col("df_t") + F.lit(0.5))
                )
                * 1000
            ).cast("bigint").alias("idf_milli"),
        )
    )
    out = (
        tf.join(idf, "term")
        .join(dl.select("id", "dl"), "id")
        .select(
            "term", "id", "tf", "dl", "idf_milli",
            F.lit(int(n_docs)).cast("bigint").alias("n_docs"),
            F.lit(int(total)).cast("bigint").alias("total"),
            F.lit(snap).cast("bigint").alias("snap_id"),
        )
    )
    if n_buckets:
        out = out.select(
            "*",
            _bm25_bucket(F.col("term"), n_buckets).alias("bucket"),
            F.lit(int(n_buckets)).cast("int").alias("n_buckets"),
        ).unionByName(_bm25_sentinel(
            df.sparkSession, int(n_docs), int(total), snap,
            int(n_buckets)))
    return out


def _bm25_constants(index: DataFrame) -> tuple[int, int, int | None] | None:
    """The index's (n_docs, total[, n_buckets]) corpus scalars,
    validated single-valued — min/max over RLE-constant columns, one
    bounded action.  None for an empty index; ExecutionError on a
    mixed-snapshot union or partial index (r6 ADVICE: scoring against
    an arbitrary row's constants would be silently wrong)."""
    from dbt_core_spark.exceptions import ExecutionError

    bucketed = "n_buckets" in index.columns
    # legacy (pre-snap_id) persisted indexes lack the column; every
    # build/append/delete path stamps it now
    stamped = "snap_id" in index.columns
    aggs = [
        F.min("n_docs").alias("n_lo"), F.max("n_docs").alias("n_hi"),
        F.min("total").alias("t_lo"), F.max("total").alias("t_hi"),
    ]
    if bucketed:
        aggs += [F.min("n_buckets").alias("b_lo"),
                 F.max("n_buckets").alias("b_hi")]
    if stamped:
        # min/max alone ignore NULLs: a legacy pre-snap_id index
        # unioned in via unionByName(allowMissingColumns=True) shows
        # one non-null snap_id and would pass silently — also count
        # the stamped rows and require ALL rows stamped (r10 ADVICE)
        aggs += [F.min("snap_id").alias("s_lo"),
                 F.max("snap_id").alias("s_hi"),
                 F.count(F.lit(1)).alias("rows_n"),
                 F.count("snap_id").alias("s_n")]
    if bucketed:
        # every bucketed snapshot carries EXACTLY ONE bucket-0
        # sentinel (tf = 0); a self-union of two builds of the
        # IDENTICAL corpus shares one content-derived snap_id and
        # would serve doubled postings undetected — the sentinel
        # count is the only signal that survives that case (r10
        # ADVICE), and 0 sentinels means a stripped/partial index
        aggs += [F.sum(F.when(F.col("tf") == 0, 1).otherwise(0))
                 .alias("sent_n")]
    stats = index.agg(*aggs).first()
    if stats["n_lo"] is None:
        return None
    mixed = (
        stats["n_lo"] != stats["n_hi"] or stats["t_lo"] != stats["t_hi"]
        or (bucketed and stats["b_lo"] != stats["b_hi"])
        or (stamped and stats["s_lo"] != stats["s_hi"])
        or (stamped and stats["s_n"] != stats["rows_n"])
        or (bucketed and stamped and stats["sent_n"] != 1)
    )
    if mixed:
        raise ExecutionError(
            "bm25 index carries mixed corpus constants "
            f"(n_docs {stats['n_lo']}..{stats['n_hi']}, total "
            f"{stats['t_lo']}..{stats['t_hi']}"
            + (f", n_buckets {stats['b_lo']}..{stats['b_hi']}"
               if bucketed else "")
            + (f", snap_id {stats['s_lo']}..{stats['s_hi']}, "
               f"{stats['rows_n'] - stats['s_n']} unstamped row(s)"
               if stamped else "")
            + (f", {stats['sent_n']} bucket-0 sentinel(s) (expect 1)"
               if bucketed and stamped else "")
            + ") — it looks like a union of different index snapshots "
            "or a partial index; rebuild with bm25_index over ONE "
            "corpus snapshot, or merge batches with bm25_index_append"
        )
    return (int(stats["n_lo"]), int(stats["t_lo"]),
            int(stats["b_lo"]) if bucketed else None)


def bm25_index_append(
    index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Append a document batch to a persisted BM25 index WITHOUT
    retokenizing corpus history — the lexical analog of
    ``ivf_index_append`` (similarity.py) completing the
    build-once/serve-forever lifecycle: only the BATCH is tokenized;
    history contributes its already-computed integer postings.

    ``bm25_index_append(bm25_index(A), B)`` is row-identical to
    ``bm25_index(A ∪ B)`` (pytest-pinned): exact BM25 idf depends on
    every term's global df and on n_docs, so the idf_milli column is
    recomputed — but from the MERGED POSTINGS (one (term)-keyed count
    over integer columns), never from text.  Per-batch cost:
    tokenize(batch) + one integer re-agg over the index + one
    broadcast-probe overlap check; the corpus text is never rescanned.

    Batch ids must be NEW: an id already present in the index would
    double-count its postings, so overlap fails loudly (one index scan
    filtered by the broadcast batch-id set — no shuffle).

    Returns the full merged index (same schema as ``bm25_index``);
    write it back as the next snapshot.  At 100 TB, prefer INSERT INTO
    of only the new postings plus a metadata-table constants/idf
    refresh — this operator keeps the one-self-contained-table
    contract instead, trading a full (integer-column) index rewrite
    for zero extra serving machinery."""
    from dbt_core_spark.exceptions import ExecutionError

    consts = _bm25_constants(index)
    if consts is None:  # appending to an empty index is a build
        # an EMPTY index has no rows to read n_buckets from, but its
        # schema still records whether it is bucketed — rebuilding
        # unbucketed would silently drop the layout contract the
        # serving path prunes on (r7 ADVICE), so require the caller's
        # n_buckets in that case
        if "n_buckets" in index.columns and n_buckets is None:
            raise ExecutionError(
                "bm25_index_append: the empty index is BUCKETED (its "
                "schema carries bucket/n_buckets) but its n_buckets "
                "value is unrecoverable from zero rows — pass "
                "n_buckets=<same value as the original bm25_index "
                "build> so the rebuild keeps the bucket mapping"
            )
        return bm25_index(new_docs, text_col=text_col, id_col=id_col,
                          n_buckets=n_buckets)
    idx_n_docs, idx_total, idx_buckets = consts
    if n_buckets is not None and idx_buckets != n_buckets:
        raise ExecutionError(
            f"bm25_index_append: caller n_buckets={n_buckets} disagrees "
            f"with the index's recorded n_buckets={idx_buckets} — the "
            "bucket mapping is fixed at build time"
        )
    n_docs, total, n_buckets = idx_n_docs, idx_total, idx_buckets

    new_tf = (
        new_docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"),
                F.explode(normalized_words(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)  # feeds dl, overlap probe, postings
    )
    new_dl = new_tf.groupBy("id").agg(
        F.sum("tf").cast("bigint").alias("dl"))
    new_ids = new_dl.select("id")
    # drop the bucket-0 sentinel (tf = 0) before merging: it is a
    # per-snapshot stamp, not a posting — a fresh one is re-added for
    # the merged snapshot below
    real = index.filter(F.col("tf") > 0)
    # no forced broadcast: AQE broadcasts a small batch's id set (the
    # common case — one scan of the index, no shuffle) and falls back
    # to a shuffled semi join of two integer columns for a huge batch
    overlap = (
        real.join(new_ids, "id", "left_semi")
        .select("id").limit(1).collect()
    )
    if overlap:
        raise ExecutionError(
            f"bm25_index_append: batch id {overlap[0]['id']} already "
            "exists in the index — appending would double-count its "
            "postings; dedup the batch against the index first"
        )
    batch_stats = new_dl.agg(
        F.count("*").cast("bigint").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("t"),
    ).collect()[0]
    if batch_stats["n"] == 0:  # empty batch — the index is unchanged
        return index
    n_docs2 = n_docs + int(batch_stats["n"])
    total2 = total + int(batch_stats["t"])

    merged = (
        real.select("term", "id", "tf", "dl")
        .unionByName(new_tf.join(new_dl, "id")
                     .select("term", "id", "tf", "dl"))
        .localCheckpoint(eager=False)  # feeds df re-agg AND postings
    )
    # merged-snapshot checksum: xor re-folds exactly, so this equals
    # the full rebuild's checksum and append ≡ rebuild stays
    # bit-identical including the snap_id stamp
    chk2 = merged.agg(F.expr(_BM25_CHK_EXPR).alias("chk")).first()["chk"]
    snap2 = _bm25_snap_id(int(chk2), n_docs2, total2, n_buckets)
    idf = (
        merged.groupBy("term")
        # (term, id) is unique in postings, so count(*) == df_t —
        # integer columns only, no text
        .agg(F.count("*").cast("bigint").alias("df_t"))
        .select(
            "term",
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs2)) - F.col("df_t") + F.lit(0.5))
                    / (F.col("df_t") + F.lit(0.5))
                )
                * 1000
            ).cast("bigint").alias("idf_milli"),
        )
    )
    out = (
        merged.join(idf, "term")
        .select(
            "term", "id", "tf", "dl", "idf_milli",
            F.lit(n_docs2).cast("bigint").alias("n_docs"),
            F.lit(total2).cast("bigint").alias("total"),
            F.lit(snap2).cast("bigint").alias("snap_id"),
        )
    )
    if n_buckets:
        # a bucketed index stays bucketed with the SAME mapping — the
        # n_buckets constant was validated single-valued above
        out = out.select(
            "*",
            _bm25_bucket(F.col("term"), n_buckets).alias("bucket"),
            F.lit(n_buckets).cast("int").alias("n_buckets"),
        ).unionByName(_bm25_sentinel(
            index.sparkSession, n_docs2, total2, snap2, n_buckets))
    return out


def bm25_query(
    index: DataFrame,
    queries: DataFrame,
    query_text_col: str = "text",
    query_id_col: str = "doc_id",
    top_k: int = 10,
    consts: tuple[int, int, int | None] | None = None,
) -> DataFrame:
    """BM25 retrieval against a PERSISTED ``bm25_index`` table: the
    per-batch cost is tokenizing the batch plus one inverted-index join
    bounded by Σ df(t) over the batch's terms — the corpus is never
    rescanned.  Returns the bm25_rank contract:
    (query_id, doc_id, score_micro, rank).

    The corpus scalars (n_docs, total) ride the index as constant
    columns and MUST be single-valued: a union of two index snapshots
    or a filtered index would otherwise silently score against one
    snapshot's constants (r6 ADVICE) — ``_bm25_constants``'s min/max
    invariant check (one cheap scan of two RLE-constant parquet
    columns) fails loudly instead.

    ``consts`` — the validated ``_bm25_constants(index)`` tuple, for
    SERVE-MANY callers (the streaming gates): run the invariant check
    once per index snapshot and pass the tuple; each per-batch call
    then skips the full-index constants scan — per-batch cost at
    100 TB should be the query terms' postings only, not an index
    metadata pass per micro-batch (optimization r11; the
    ivf_member_counts precedent).  None (the default) keeps the
    per-call validation — the right choice for one-shot callers and
    any index not validated this session."""
    out_schema = (
        "query_id bigint, doc_id bigint, score_micro bigint, rank int"
    )
    qterms = _bm25_qterms(queries, query_text_col, query_id_col)
    if consts is not None:
        n_docs, total, n_buckets = consts
        if "n_buckets" in index.columns:
            if n_buckets is None:
                from dbt_core_spark.exceptions import ExecutionError

                raise ExecutionError(
                    "bm25_query: consts carries n_buckets=None but the "
                    "index schema is bucketed — pass the tuple exactly "
                    "as _bm25_constants returned it"
                )
            # stale-consts guard (r11 ADVICE): consts from a DIFFERENT
            # snapshot (different n_buckets) would prune with the wrong
            # bucket mapping and silently drop postings — keep the
            # cheap one-file limit(1) probe (NOT the full constants
            # scan this fast path exists to skip) and fail loudly on
            # disagreement, the repo's snapshot-mismatch discipline
            probe = index.select("n_buckets").limit(1).collect()
            if probe and int(probe[0]["n_buckets"]) != n_buckets:
                from dbt_core_spark.exceptions import ExecutionError

                raise ExecutionError(
                    f"bm25_query: consts n_buckets {n_buckets} disagrees "
                    f"with the index's {int(probe[0]['n_buckets'])} — the "
                    "consts tuple is from a different snapshot; recompute "
                    "_bm25_constants for this index"
                )
            # bucket pruning exactly as the validated path below —
            # only the per-batch probe/validation scans are skipped
            qterms = qterms.localCheckpoint(eager=False)
            hit = (
                qterms.select(
                    _bm25_bucket(F.col("term"), n_buckets).alias("bucket"))
                .distinct().collect()
            )
            index = index.filter(
                F.col("bucket").isin(
                    sorted({0, *(r["bucket"] for r in hit)}))
                if hit else F.lit(False)
            )
        elif n_buckets is not None:
            # inverse mismatch (r11 ADVICE): bucketed consts against an
            # unbucketed index schema — the tuple is from some other
            # snapshot; scoring would silently use its n_docs/total
            from dbt_core_spark.exceptions import ExecutionError

            raise ExecutionError(
                f"bm25_query: consts carries n_buckets={n_buckets} but "
                "the index schema is unbucketed — pass the tuple "
                "_bm25_constants returned for THIS index"
            )
    elif "n_buckets" in index.columns:
        # serving-cost contract (r7 ADVICE): do NOT run the full
        # constants min/max scan over every partition BEFORE the bucket
        # filter — that touches all N bucket directories per query batch
        # and voids the advertised b/N pruning.  Sample n_buckets from
        # one file (limit(1) scan), prune first, then validate the
        # constants on the PRUNED postings only: every row that
        # contributes to a score is still checked single-valued, and
        # whole-index validation belongs at build/append time
        # (bm25_index_append runs _bm25_constants over the full index).
        #
        # The r9 mixed-n_buckets blind spot is closed STRUCTURALLY
        # (r9 verdict item 2): every bucketed snapshot carries a
        # content-derived snap_id constant plus a sentinel posting
        # pinned to BUCKET 0 (`_bm25_sentinel`), and the scan below
        # always includes bucket 0 alongside the query terms' buckets.
        # Bucket 0 exists under every mapping, so a raw union of two
        # snapshots ALWAYS places both sentinels (two snap_id values)
        # inside the pruned postings — the constants check fails
        # loudly even when every query-touched bucket holds rows from
        # only one mapping (previously silent-partial scoring).  Cost:
        # one extra bucket directory per batch, same b/N order.
        probe = index.select("n_buckets").limit(1).collect()
        if not probe:
            return index.sparkSession.createDataFrame([], out_schema)
        nb_sample = int(probe[0]["n_buckets"])
        # sealed: the bucket collect below AND the postings join both
        # consume qterms — without the seal the query batch tokenizes
        # twice (the ≥2-branch lineage rule)
        qterms = qterms.localCheckpoint(eager=False)
        # restrict the scan to the query terms' buckets as a LITERAL IN
        # on the partition column, so a partitionBy("bucket") layout
        # prunes at the file listing (PartitionFilters in the scan —
        # tests/test_plans.py).  The collect is bounded by n_buckets
        # ints; batch cost becomes (buckets touched)/N of the postings
        # files instead of all of them.
        hit = (
            qterms.select(
                _bm25_bucket(F.col("term"), nb_sample).alias("bucket"))
            .distinct().collect()
        )
        index = index.filter(
            # bucket 0 rides along for the sentinel check (see above)
            F.col("bucket").isin(
                sorted({0, *(r["bucket"] for r in hit)}))
            if hit else F.lit(False)
        )
        consts = _bm25_constants(index)
        if consts is None:  # no postings in the touched buckets
            return index.sparkSession.createDataFrame([], out_schema)
        n_docs, total, n_buckets = consts
        if n_buckets != nb_sample:
            from dbt_core_spark.exceptions import ExecutionError

            raise ExecutionError(
                f"bm25_query: sampled n_buckets {nb_sample} disagrees "
                f"with the pruned postings' constant {n_buckets} — the "
                "index mixes bucket mappings; rebuild one snapshot"
            )
    else:
        consts = _bm25_constants(index)
        if consts is None:
            return index.sparkSession.createDataFrame([], out_schema)
        n_docs, total, n_buckets = consts
    # sentinel postings (tf = 0, bucket-0 snapshot stamps) never score
    index = index.filter(F.col("tf") > 0)
    # a small index arrives as ONE file → one scan task, and the whole
    # scoring pipeline (join + partial agg over Σ df(t) candidate rows)
    # would run on a single core regardless of cluster size; widen it
    # first (no-op at production width — the dedup-tier convention).
    # Keyed by id, NOT round-robin: a doc's postings must stay
    # colocated or the (query, doc) partial aggregation stops reducing
    # and the group exchange carries Σ df(t) raw candidates instead of
    # distinct groups (measured 26M vs 1.9M rows on the probe corpus)
    target = index.sparkSession.sparkContext.defaultParallelism
    if index.rdd.getNumPartitions() < target:
        index = index.repartition(target, F.col("id"))
    scored = (
        qterms.join(index, "term")
        .groupBy("query_id", "id")
        .agg(F.sum(_bm25_contrib(n_docs, total)).alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            F.col("score_micro").cast("bigint").alias("score_micro"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_rank(
    df: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "doc_id",
    top_k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a set of text queries —
    the lexical complement of the ANN tier (and the classic half of
    hybrid RAG retrieval).  Okapi BM25 with the Robertson/Lucene
    positive idf, k1 = 1.2, b = 0.75 (the universal defaults, embedded
    as EXACT rationals 6/5 and 3/4 so the saturation term reduces to an
    integer-coefficient form).

    Score discipline (the tfidf_cosine_pairs convention): idf is
    floored to integer milli-nats per term; the per-(query-term, doc)
    contribution

        idf · 2.2·tf / (tf + 0.3 + 0.9·dl·N/total)
      = idf · 44·tf·total / (20·tf·total + 6·total + 18·dl·N)

    is evaluated as ONE deterministic double expression over exact
    integers and floored to micro-units; per-(query, doc) totals are
    then pure bigint sums — no cross-row float accumulation, so ranks
    hash identically across engines.

    Plan shape: inverted-index join of the (broadcast-size) distinct
    query-term list against corpus postings — cost is Σ df(t) over
    query terms, never |queries|×|corpus|; top-k per query is a
    WindowGroupLimit (rank window with pushed k), not a global sort.
    Two tiny driver scalars (N, total token count) are collected once.

    Query terms are DISTINCT per query (standard short-query BM25 —
    query-side tf omitted).  Returns (query_id, doc_id, score_micro,
    rank) with rank 1..top_k ordered by (score desc, doc_id)."""
    # seal the ephemeral index: bm25_query consumes it twice (the
    # constants invariant agg + the postings join), and without the
    # seal Catalyst replays the tokenize/tf/idf pipeline per consumer
    # (the repo's ≥2-branch lineage rule; persisted-index callers skip
    # this — their index is already a materialized table)
    index = bm25_index(df, text_col=text_col, id_col=id_col)
    index = index.localCheckpoint(eager=False)
    return bm25_query(
        index,
        queries,
        query_text_col=query_text_col,
        query_id_col=query_id_col,
        top_k=top_k,
    )


# unicode block ranges, embedded as literal characters so the same
# pattern text works in both Java regex and RE2 (no \u escape dialects)
_SCRIPT_PATTERNS = {
    "latin": "[A-Za-z]",
    "cyrillic": f"[{chr(0x0400)}-{chr(0x04FF)}]",
    "greek": f"[{chr(0x0370)}-{chr(0x03FF)}]",
    "cjk": f"[{chr(0x3040)}-{chr(0x30FF)}{chr(0x4E00)}-{chr(0x9FFF)}]",
    "arabic": f"[{chr(0x0600)}-{chr(0x06FF)}]",
}


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top_k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, public) — the
    standard hybrid-retrieval merge of heterogeneous rankers (BM25 +
    dense ANN being the RAG-classic pair): fused(d) = Σ_r 1/(k +
    rank_r(d)) over every ranking that returned d.

    Integer-exact by construction: each term is floor(1e9 / (k +
    rank)) — ranks are small integers, so the per-source contribution
    is a pure bigint and the cross-source sum is order-free (no float
    accumulation; the repo's micro/nano fixed-point discipline).
    Missing docs contribute nothing (the standard convention).

    Plan shape: a union of the (already tiny, top-k-bounded) ranking
    frames, one (query, doc)-keyed aggregation with map-side partials,
    and a WindowGroupLimit top-k — cost is bounded by Σ|rankings|,
    never the corpus.  Returns (query_id, doc_id, rrf_nano, rank),
    ties broken by doc_id."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking frame")
    contrib = F.floor(
        F.lit(1_000_000_000) / (F.lit(k) + F.col(rank_col))
    ).cast("bigint")
    slim = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            contrib.alias("c"),
        )
        for r in rankings
    ]
    allr = slim[0]
    for s in slim[1:]:
        allr = allr.unionByName(s)
    fused = allr.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("bigint").alias("rrf_nano")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_nano").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rrf_nano",
                F.col("rank").cast("int").alias("rank"))
    )


def detect_script(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Writing-system detection by unicode-block character counts —
    the triage step before language-ID on a multilingual crawl (fast,
    alphabet-level; ``detect_language`` refines within an alphabet).

    Counts per script block plus digits, then labels the document by
    the dominant block (ties resolve in the fixed order latin >
    cyrillic > greek > cjk > arabic; documents with no script
    characters at all label 'other').  Pure regexp_count expressions —
    zero shuffles, whole-stage codegen, and the block patterns embed
    literal range characters so Java regex and RE2 read them
    identically."""
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("bigint")
        for name, pat in _SCRIPT_PATTERNS.items()
    }
    counts["digit"] = F.regexp_count(t, F.lit("[0-9]")).cast("bigint")
    staged = df.filter(t.isNotNull()).select(
        F.col(id_col),
        *[c.alias(f"n_{n}") for n, c in counts.items()],
    )
    order = ["latin", "cyrillic", "greek", "cjk", "arabic"]
    best = F.greatest(*[F.col(f"n_{n}") for n in order])
    label = F.lit("other")
    for name in reversed(order):
        label = F.when(
            (best > 0) & (F.col(f"n_{name}") == best), F.lit(name)
        ).otherwise(label)
    return staged.withColumn("script", label)


def contrastive_pairs(
    chunks: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "chunk_text",
    neg_salt: str = "cneg",
    neg_buckets: int | None = None,
) -> DataFrame:
    """Mine (anchor, positive, negative) text triples for contrastive
    embedding training from a chunked corpus (``chunk_documents``
    output): the positive is the document's NEXT chunk (adjacent spans
    share topic — the standard in-document positive), the negative is a
    same-index chunk from a DIFFERENT document chosen by deterministic
    md5 bucketing.

    Scale shape: positives are a self-join on (doc, idx+1) — one
    doc-keyed shuffle; negatives bucket anchors by md5(doc) into
    ``neg_buckets`` groups (default ≈ corpus/2 so buckets average two
    docs) and pair each anchor with the bucket's other member via one
    bucket-keyed shuffle — never a cross join, never RAND().  Anchors
    whose bucket has no second document fall back to a SECOND salt
    round: the two lowest-md5('{neg_salt}:r2:'‖doc) anchors at that
    chunk index (two map-side-combinable MIN_BY aggregations, broadcast
    back — one tiny row per distinct index, no skewed window), so every
    anchor gets a deterministic negative whenever ≥2 documents have a
    chunk at its index; NULL only when the index is corpus-unique.
    Returns (doc_id, chunk_idx, anchor, positive, negative)."""
    nxt = chunks.select(
        F.col(doc_col), (F.col(idx_col) - 1).alias(idx_col),
        F.col(text_col).alias("_pos"),
    )
    pos = chunks.join(nxt, [doc_col, idx_col]).select(
        F.col(doc_col), F.col(idx_col),
        F.col(text_col).alias("anchor"), F.col("_pos").alias("positive"),
    ).localCheckpoint(eager=False)  # feeds the bucket join twice

    if neg_buckets is None:
        n_docs = pos.select(doc_col).distinct().count()
        neg_buckets = max(1, n_docs // 2)
    key = F.md5(F.concat(F.lit(f"{neg_salt}:"),
                         F.col(doc_col).cast("string")))
    bucket = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"),
        F.lit(neg_buckets),
    )
    left = pos.withColumn("_b", bucket)
    right = pos.select(
        F.col(doc_col).alias("_nd"), F.col(idx_col).alias("_nidx"),
        F.col("anchor").alias("_neg"),
    ).withColumn(
        "_nb",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{neg_salt}:"),
                                   F.col("_nd").cast("string"))), 1, 15),
                16, 10,
            ).cast("bigint"),
            F.lit(neg_buckets),
        ),
    )
    # self-exclusion INSIDE the join condition: an anchor whose bucket
    # holds no other doc keeps its row with a NULL negative instead of
    # vanishing
    joined = left.join(
        right,
        (F.col("_b") == F.col("_nb"))
        & (F.col(idx_col) == F.col("_nidx"))
        & (F.col("_nd") != F.col(doc_col)),
        "left",
    )
    # deterministic single negative: the lowest other doc id in-bucket
    w = Window.partitionBy(doc_col, idx_col).orderBy(
        F.col("_nd").asc_nulls_last()
    )
    round1 = (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(doc_col), F.col(idx_col), "anchor", "positive",
            F.col("_neg"),
        )
    )
    # salt round 2 for singleton buckets: per chunk index, the two
    # lowest-md5 candidate docs (unique md5 keys → deterministic
    # MIN_BY); one row per distinct index, broadcast back
    key2 = F.md5(F.concat(F.lit(f"{neg_salt}:r2:"),
                          F.col(doc_col).cast("string")))
    cand = pos.select(
        F.col(idx_col), F.col(doc_col).alias("_d"),
        F.col("anchor").alias("_a"), key2.alias("_k2"),
    )
    c1 = cand.groupBy(idx_col).agg(
        F.min_by("_d", "_k2").alias("_d1"),
        F.min_by("_a", "_k2").alias("_a1"),
    )
    c2 = (
        cand.join(F.broadcast(c1), idx_col)
        .filter(F.col("_d") != F.col("_d1"))
        .groupBy(idx_col)
        .agg(F.min_by("_a", "_k2").alias("_a2"))
    )
    fb = F.broadcast(c1.join(c2, idx_col, "left"))
    return round1.join(fb, idx_col, "left").select(
        F.col(doc_col), F.col(idx_col), "anchor", "positive",
        F.coalesce(
            F.col("_neg"),
            F.when(F.col("_d1") != F.col(doc_col), F.col("_a1"))
             .otherwise(F.col("_a2")),
        ).alias("negative"),
    )


def lexical_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical-diversity quality signals per document: type count,
    type-token ratio, hapax-legomena fraction, and unigram entropy —
    low diversity flags templated/boilerplate text, implausibly high
    entropy flags gibberish (the complement of the Gopher repetition
    filters).

    Integer discipline: TTR and hapax are e6 fixed-point integer
    ratios; entropy is computed from per-TYPE micro-nat floors of
    ln(c/n) — sum_w c·floor(ln(c_w/n)·10⁶) is exact bigint, and the
    final entropy_micro = −sum/n is one floored division.  Two
    wordcount-shaped shuffles ((doc, word) then doc); nothing scales
    beyond the doc-word table."""
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col),
                F.explode(normalized_words(F.col(text_col))).alias("w"))
    )
    wc = words.groupBy(id_col, "w").agg(
        F.count("*").alias("c")
    ).localCheckpoint(eager=False)  # feeds totals AND the log-prob join
    totals = wc.groupBy(id_col).agg(F.sum("c").alias("_n"))
    lp = (
        wc.join(totals, id_col)
        .withColumn(
            "_lp",
            F.floor(F.log(F.col("c").cast("double") / F.col("_n"))
                    * F.lit(1_000_000)).cast("bigint"),
        )
    )
    return (
        lp.groupBy(id_col)
        .agg(
            F.max("_n").alias("n_words"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_hapax"),
            F.sum(F.col("c") * F.col("_lp")).alias("_slp"),
        )
        .select(
            F.col(id_col),
            F.col("n_words").cast("bigint").alias("n_words"),
            "n_types",
            "n_hapax",
            F.floor(F.col("n_types") * F.lit(1_000_000) / F.col("n_words"))
            .cast("bigint").alias("ttr_e6"),
            F.floor(F.col("n_hapax") * F.lit(1_000_000) / F.col("n_types"))
            .cast("bigint").alias("hapax_e6"),
            F.floor(-F.col("_slp") / F.col("n_words"))
            .cast("bigint").alias("entropy_micro"),
        )
    )


def perceptron_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    epochs: int = 3,
    seed: str = "clf",
) -> DataFrame:
    """Train a linear text classifier IN-ENGINE — the distributed BATCH
    perceptron (fixed-increment batch variant of Rosenblatt 1958 /
    Minsky-Papert 1969, public) over hashed bag-of-words counts: the
    trainable complement of ``classifier_score`` (which only applies
    weights), closing the corpus-quality-filter loop the way
    ``kmeans_centroids`` closed clustering.

    Integer-exact end to end, so training replays in SQL: features are
    bucket COUNTS (``_bucket_of`` md5 hashing + a constant bias bucket
    ``dim``), weights are bigints, and each epoch updates

        w  +=  Σ_{misclassified docs}  y · x        (y ∈ {+1, −1})

    where "misclassified" is ``y·(w·x) <= 0`` (zero counts as wrong —
    epoch 1 therefore updates on every doc from w = 0).  The batch sum
    is order-free — no per-sample sequential updates, so the epoch
    parallelizes over any number of executors and two engines agree
    bit-for-bit (the driver gate replays all epochs in DuckDB).

    Plan shape per epoch (optimization r11 — ZERO corpus-scale
    shuffles; the old shape exchanged the featurized corpus twice per
    epoch, once for the groupBy(id) dot pass and once for the
    misclassified-id semi-join): the tokenized per-doc bucket ARRAY is
    sealed once (one row per doc, never exploded across an exchange);
    each epoch computes the dot product NARROWLY per doc with a
    higher-order ``aggregate`` against the ≤ dim+1 weight literal
    (element_at, zero broadcast machinery), filters misclassified docs
    in the same stage, and reduces the per-bucket delta through one
    map-side-partial ``groupBy(bucket)`` whose exchange carries
    ≤ dim+1 rows per task, collected to the driver (the kmeans update
    contract: driver state is model-sized, never corpus-sized).

    Returns the model as a (bucket int, w bigint) table — persist it
    and serve with ``perceptron_apply`` (or feed classifier_score-style
    pipelines).  Rows with NULL text or NULL label are excluded from
    training; ``label_col`` must hold +1 / −1."""
    spark = df.sparkSession
    feats = (
        df.filter(
            F.col(text_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.col(label_col).cast("bigint").alias("y"),
            F.concat(
                F.transform(
                    normalized_words(F.col(text_col)),
                    lambda x: _bucket_of(x, dim, seed),
                ),
                F.array(F.lit(dim).cast("bigint")),  # bias bucket
            ).alias("bkts"),
        )
        .localCheckpoint(eager=False)  # tokenized once, reused per epoch
    )
    w = [0] * (dim + 1)
    for _ in range(epochs):
        wcol = F.lit(w)  # <= dim+1 ints — a tiny literal, rebuilt per epoch
        # dot = sum over tokens of w[bucket] ≡ the old sum(cnt·w[bucket])
        dot = F.aggregate(
            "bkts", F.lit(0).cast("bigint"),
            lambda acc, b: acc + F.element_at(wcol, b.cast("int") + 1),
        )
        delta = (
            feats.withColumn("_dot", dot)
            .filter(F.col("y") * F.col("_dot") <= 0)
            .select("y", F.explode("bkts").alias("bucket"))
            .groupBy("bucket")
            .agg(F.sum("y").alias("d"))  # Σ_tokens y ≡ Σ_docs y·cnt
            .collect()  # <= dim+1 rows — bounded
        )
        if not delta:
            break  # converged: nothing misclassified
        for r in delta:
            w[int(r["bucket"])] += int(r["d"])
    return spark.createDataFrame(
        [(b, int(wb)) for b, wb in enumerate(w)], "bucket int, w bigint")


def perceptron_apply(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: str = "clf",
) -> DataFrame:
    """Score a corpus with a ``perceptron_train`` model: hashed-count
    dot product against the (bucket, w) table.  Optimization r11 —
    ZERO-shuffle serving (the old shape exploded tokens across a
    groupBy(id, bucket) exchange, broadcast-joined the weights, then
    exchanged again for the groupBy(id) sum): the model is model-sized
    by contract (≤ dim+1 rows), so it is collected once and enters the
    plan as a literal array; each doc's score is a NARROW higher-order
    ``aggregate`` over its token buckets — whole-stage codegen, no
    exchange, no join, the kmeans broadcast-literal-assignment shape.
    Join semantics are preserved exactly: duplicate bucket rows sum
    (the old join multiplied the row), and a doc appears in the output
    iff ≥ 1 of its buckets has a weights row (with a trained model —
    all dim+1 buckets present — that is every non-NULL-text doc).
    Returns (id, score bigint, pred int) with pred = +1 iff score > 0
    (the training rule's tie side: 0 is negative)."""
    wmap: dict[int, int] = {}
    for r in weights.collect():  # model-sized by contract: <= dim+1 rows
        b = int(r["bucket"])
        wmap[b] = wmap.get(b, 0) + int(r["w"])  # dup rows sum, as the join did
    warr = F.lit([wmap.get(b, 0) for b in range(dim + 1)])
    bkts = F.concat(
        F.transform(
            normalized_words(F.col(text_col)),
            lambda x: _bucket_of(x, dim, seed),
        ),
        F.array(F.lit(dim).cast("bigint")),
    )
    score = F.aggregate(
        "_bkts", F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.element_at(warr, b.cast("int") + 1),
    )
    out = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), bkts.alias("_bkts"))
    if set(wmap) < set(range(dim + 1)):
        # sparse model: the old inner join dropped docs having NO
        # bucket in the weights table — preserve that contract
        present = F.lit(sorted(wmap)).cast("array<bigint>")
        out = out.filter(F.arrays_overlap(F.col("_bkts"), present))
    return out.select(
        F.col("id").alias(id_col), score.alias("score")
    ).select(
        id_col, "score",
        F.when(F.col("score") > 0, F.lit(1))
        .otherwise(F.lit(-1)).cast("int").alias("pred"),
    )


def perceptron_train_averaged(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    epochs: int = 3,
    seed: str = "clf",
) -> DataFrame:
    """AVERAGED batch perceptron (Freund & Schapire 1999's averaging
    applied to the batch variant): the served weights are the SUM of
    the per-epoch weight snapshots w_1..w_E instead of the final w_E —
    the classic variance reduction that makes perceptron quality
    competitive for text filtering, and the natural next depth step on
    ``perceptron_train``.

    Integer-exact and SQL-replayable: every snapshot is already exact
    bigints, so the sum is too (the sign of Σ_e w_e·x equals the sign
    of the averaged score — no division anywhere).  The training loop
    is byte-for-byte ``perceptron_train``'s (same featurize pass, same
    epoch plan); only the returned table differs.  Serve with
    ``perceptron_apply`` as usual.  Returns (bucket int, w bigint)
    where w = Σ_e w_e[bucket]."""
    spark = df.sparkSession
    feats = (
        df.filter(
            F.col(text_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.col(label_col).cast("bigint").alias("y"),
            F.concat(
                F.transform(
                    normalized_words(F.col(text_col)),
                    lambda x: _bucket_of(x, dim, seed),
                ),
                F.array(F.lit(dim).cast("bigint")),
            ).alias("bkts"),
        )
        .localCheckpoint(eager=False)  # tokenized once, reused per epoch
    )
    w = [0] * (dim + 1)
    acc = [0] * (dim + 1)
    for _ in range(epochs):
        wcol = F.lit(w)
        dot = F.aggregate(
            "bkts", F.lit(0).cast("bigint"),
            lambda a, b: a + F.element_at(wcol, b.cast("int") + 1),
        )
        delta = (
            feats.withColumn("_dot", dot)
            .filter(F.col("y") * F.col("_dot") <= 0)
            .select("y", F.explode("bkts").alias("bucket"))
            .groupBy("bucket")
            .agg(F.sum("y").alias("d"))
            .collect()
        )
        for r in delta:
            w[int(r["bucket"])] += int(r["d"])
        for b in range(dim + 1):
            acc[b] += w[b]
        if not delta:
            # converged: every remaining epoch's snapshot equals w, and
            # the accumulator above already added THIS epoch's copy —
            # add the rest so early exit equals running all E epochs
            remaining = epochs - 1 - _
            for b in range(dim + 1):
                acc[b] += w[b] * remaining
            break
    return spark.createDataFrame(
        [(b, int(a)) for b, a in enumerate(acc)], "bucket int, w bigint")


def perceptron_train_ovr(
    df: DataFrame,
    class_col: str,
    classes: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    epochs: int = 3,
    seed: str = "clf",
) -> DataFrame:
    """MULTI-CLASS classifier training: one-vs-rest batch perceptrons,
    one per class, trained JOINTLY in the same per-epoch plan shape as
    the binary ``perceptron_train`` (language-ID / source-domain
    routing — the multi-class step of the quality-classifier story).

    Per-class result is BIT-IDENTICAL to running ``perceptron_train``
    with ``y = +1 if class==c else −1`` (pytest-pinned), but the k
    classifiers share the work: ONE featurize pass (the per-doc bucket
    array, sealed), and per epoch all k dots computed NARROWLY per doc
    by higher-order ``aggregate`` against a k×(dim+1) nested weight
    literal (the centroid-literal convention — one `lit`, never k·dim
    scalar expressions; optimization r11: zero corpus-scale exchanges
    per epoch, where the old shape paid a groupBy(id) pass plus a
    mis-flag join) plus ONE map-side-partial groupBy(bucket) delta
    aggregation with k conditional sums, collected as ≤ dim+1 rows of
    k columns.  Driver state is k·(dim+1) bigints — model-sized, the
    kmeans contract.

    ``classes`` pins the classifier set (and the SQL oracle); when
    None it is the sorted distinct non-NULL class values (one bounded
    collect).  Docs whose class is not in ``classes`` still train —
    as negatives for every classifier (standard OVR).  Returns
    (cls string, bucket int, w bigint): k·(dim+1) rows; persist and
    serve with ``perceptron_apply_ovr``."""
    spark = df.sparkSession
    if classes is None:
        classes = sorted(
            r[0]
            for r in df.filter(F.col(class_col).isNotNull())
            .select(F.col(class_col).cast("string")).distinct().collect()
        )
    classes = [str(c) for c in classes]
    k = len(classes)
    if k == 0:
        return spark.createDataFrame([], "cls string, bucket int, w bigint")
    feats = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(class_col).cast("string").alias("cls"),
            F.concat(
                F.transform(
                    normalized_words(F.col(text_col)),
                    lambda x: _bucket_of(x, dim, seed),
                ),
                F.array(F.lit(dim).cast("bigint")),  # bias bucket
            ).alias("bkts"),
        )
        .localCheckpoint(eager=False)  # tokenized once, reused per epoch
    )

    def _y(ci: int):
        # NULL class is a negative for every classifier (NULL == never
        # equal), matching the binary gate's `else -1` label rule
        return (
            F.when(F.col("cls") == F.lit(classes[ci]), F.lit(1))
            .otherwise(F.lit(-1)).cast("bigint")
        )

    W = [[0] * (dim + 1) for _ in range(k)]
    for _ in range(epochs):
        wlit = F.lit(W)  # ONE k×(dim+1) nested literal
        # all k dots per doc, NARROW (optimization r11 — the old shape
        # exchanged the featurized corpus twice per epoch: the
        # groupBy(id) dot pass + the mis-flag join); delta reduces
        # through one map-side-partial groupBy(bucket) whose exchange
        # carries <= dim+1 rows per task
        def _dot(ci: int) -> Column:
            wrow = F.element_at(wlit, ci + 1)
            return F.aggregate(
                "bkts", F.lit(0).cast("bigint"),
                lambda a, b: a + F.element_at(wrow, b.cast("int") + 1),
            )

        flagged = feats.select(
            "cls", "bkts",
            *[(_y(ci) * _dot(ci) <= 0).alias(f"mis{ci}")
              for ci in range(k)],
        )
        delta = (
            flagged.filter(
                functools.reduce(
                    lambda x, y: x | y,
                    [F.col(f"mis{ci}") for ci in range(k)]))
            .select("cls",
                    *[f"mis{ci}" for ci in range(k)],
                    F.explode("bkts").alias("bucket"))
            .groupBy("bucket")
            .agg(*[
                F.sum(
                    F.when(F.col(f"mis{ci}"), _y(ci))
                ).alias(f"d{ci}")
                for ci in range(k)
            ])
            .collect()  # <= dim+1 rows × k columns — bounded
        )
        moved = False
        for r in delta:
            b = int(r["bucket"])
            for ci in range(k):
                d = r[f"d{ci}"]
                if d:
                    W[ci][b] += int(d)
                    moved = True
        if not moved:
            break  # every classifier converged
    return spark.createDataFrame(
        [
            (classes[ci], b, int(wb))
            for ci in range(k)
            for b, wb in enumerate(W[ci])
        ],
        "cls string, bucket int, w bigint",
    )


def perceptron_apply_ovr(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: str = "clf",
) -> DataFrame:
    """Serve a ``perceptron_train_ovr`` model: per-class hashed-count
    dot products, winner by max score with ties broken by class name
    ascending (a min-struct over (−score, cls) — exact and
    SQL-replayable).  Optimization r11 — ZERO-shuffle serving (the
    old shape exploded tokens across a groupBy(id, bucket) exchange,
    broadcast-joined the k·(dim+1) weight rows, then exchanged twice
    more for the per-(id, cls) scores and the winner): the model is
    model-sized by contract, so it is collected once and each class's
    score is a NARROW higher-order ``aggregate`` over the doc's token
    buckets against a k×(dim+1) nested literal; the winner is an
    ``array_min`` over the k per-class structs in the same projection.
    Join semantics are preserved exactly: duplicate (cls, bucket) rows
    sum, and a (doc, class) pair competes iff ≥ 1 of the doc's buckets
    has a weights row for that class (with a trained model that is
    every pair).  Returns (id, label string, score bigint)."""
    per_cls: dict[str, dict[int, int]] = {}
    for r in weights.collect():  # model-sized by contract: k·(dim+1) rows
        cw = per_cls.setdefault(str(r["cls"]), {})
        b = int(r["bucket"])
        cw[b] = cw.get(b, 0) + int(r["w"])  # dup rows sum, as the join did
    classes = sorted(per_cls)
    if not classes:
        idtype = dict(df.dtypes).get(id_col, "string")
        return df.sparkSession.createDataFrame(
            [], f"`{id_col}` {idtype}, label string, score bigint")
    full = set(range(dim + 1))
    wlit = F.lit([[per_cls[c].get(b, 0) for b in range(dim + 1)]
                  for c in classes])
    bkts = F.concat(
        F.transform(
            normalized_words(F.col(text_col)),
            lambda x: _bucket_of(x, dim, seed),
        ),
        F.array(F.lit(dim).cast("bigint")),
    )

    def _score(ci: int) -> Column:
        wrow = F.element_at(wlit, ci + 1)
        return F.aggregate(
            "_bkts", F.lit(0).cast("bigint"),
            lambda a, b: a + F.element_at(wrow, b.cast("int") + 1),
        )

    def _competes(ci: int) -> Column:
        # class ci competes for a doc iff >= 1 doc bucket has a weights
        # row for it (the old inner-join presence semantics)
        if set(per_cls[classes[ci]]) >= full:
            return F.lit(True)
        present = F.lit(sorted(per_cls[classes[ci]])).cast("array<bigint>")
        return F.arrays_overlap(F.col("_bkts"), present)

    cand = F.filter(
        F.array(*[
            F.struct(
                _competes(ci).alias("ok"),
                (-_score(ci)).alias("ns"),
                F.lit(classes[ci]).alias("cls"),
                _score(ci).alias("score"),
            ) for ci in range(len(classes))
        ]),
        lambda x: x["ok"],
    )
    best = F.array_min(F.transform(
        cand, lambda x: F.struct(x["ns"].alias("ns"), x["cls"].alias("cls"),
                                 x["score"].alias("score"))))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), bkts.alias("_bkts"))
        .select("id", best.alias("_k"))
        .filter(F.col("_k").isNotNull())  # no class competes -> no row
        .select(
            F.col("id").alias(id_col),
            F.col("_k.cls").alias("label"),
            F.col("_k.score").alias("score"),
        )
    )


def naive_bayes_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    smoothing: int = 1,
    tokenizer=None,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial Naive Bayes text classifier IN-ENGINE — the
    count-based complement of the perceptron tier (McCallum & Nigam
    1998, public): where the perceptron learns by iterative error
    correction, NB is a SINGLE aggregation pass over the corpus, which
    makes it the cheapest trainable quality/language filter at 100 TB
    (two wordcount-class shuffles, no epochs, no driver loop).

    Integer-exact cross-engine (the vocab_drift micro-nat discipline):
    every learned quantity is a bigint of micro-nats,

        w_micro(c, t)  = floor(1e6 * ln((n_ct + s) / (t_c + s*V)))
        oov_micro(c)   = floor(1e6 * ln(      s     / (t_c + s*V)))
        prior_micro(c) = floor(1e6 * ln(d_c / D))

    each evaluated as ONE deterministic double expression over exact
    integer counts (no cross-row float accumulation anywhere), so the
    whole training pass replays in SQL and serving scores are exact
    bigint sums.  A smoothed-zero (c, t) weight equals oov_micro(c)
    exactly — the sparse model (observed pairs only) is therefore
    LOSSLESS, and serving needs no vocabulary lookup at all:
    unmatched tokens (in-vocab-unseen and out-of-vocab alike) score
    the class's oov_micro.

    ``vocab_size`` caps training counts to the top-N terms by corpus
    count (ties to the lexically smaller term — the build_vocab
    convention); tokens outside the cap are dropped from the count
    tables (V, t_c shrink accordingly) but still score oov at serve
    time, so the cap trades model size against per-token resolution
    without breaking exactness.

    Scale shape: one (cls, term) wordcount shuffle (map-side combined)
    + one vocabulary-sized shuffle for the optional cap + a k-row
    class-stats aggregate; driver state is k + 1 scalars (the kmeans
    tiny-state contract).  Rows with NULL text or NULL label are
    excluded from training entirely.

    Returns ``(weights, class_stats)``:
      weights     — (cls string, term string, w_micro bigint), sparse
                    over observed (class, term) pairs;
      class_stats — (cls string, n_docs bigint, prior_micro bigint,
                    oov_micro bigint), one row per class.
    Persist both and serve with ``naive_bayes_apply``."""
    s = int(smoothing)
    if s < 1:
        raise ValueError(
            f"naive_bayes_train: smoothing must be >= 1 (got {smoothing})"
            " — add-s smoothing is what keeps every class-conditional"
            " probability positive (the vocab_drift contract)")
    term_counts, doc_counts = naive_bayes_counts(
        df, label_col, text_col=text_col, id_col=id_col,
        tokenizer=tokenizer)
    return naive_bayes_finalize(
        term_counts, doc_counts, vocab_size=vocab_size,
        smoothing=smoothing)


def naive_bayes_counts(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> tuple[DataFrame, DataFrame]:
    """Sufficient statistics of a multinomial NB model — the
    INCREMENTAL representation: because NB learns nothing but counts,
    the statistics of two batches MERGE by addition
    (``naive_bayes_merge``) and finalizing the merged counts is
    bit-identical to retraining on the union (the bm25_index_append
    append-≡-rebuild contract, applied to model training).  Persist
    these two tables per ingest batch; never re-tokenize old data.

    Returns ``(term_counts, doc_counts)``:
      term_counts — (cls string, term string, n bigint);
      doc_counts  — (cls string, n_docs bigint).
    Rows with NULL text or NULL label are excluded (the trainer
    contract).  ``tokenizer`` (Column → array<string> Column) defaults
    to word tokens (``normalized_words``); pass ``char_ngrams`` for
    the langid feature space — serving MUST use the same tokenizer."""
    tok = tokenizer if tokenizer is not None else normalized_words
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull())
    term_counts = (
        base.select(
            F.col(label_col).cast("string").alias("cls"),
            F.explode(tok(F.col(text_col))).alias("term"),
        )
        .groupBy("cls", "term")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    doc_counts = (
        base.groupBy(F.col(label_col).cast("string").alias("cls"))
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    return term_counts, doc_counts


def naive_bayes_merge(
    stats_a: tuple[DataFrame, DataFrame],
    stats_b: tuple[DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """Merge two ``naive_bayes_counts`` statistics by exact bigint
    addition — associative and commutative, so any batch arrival order
    finalizes to the identical model.  One vocabulary-sized and one
    k-row aggregate; nothing corpus-scale."""
    ta, da = stats_a
    tb, db = stats_b
    term_counts = (
        ta.unionByName(tb).groupBy("cls", "term")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    doc_counts = (
        da.unionByName(db).groupBy("cls")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )
    return term_counts, doc_counts


def naive_bayes_finalize(
    term_counts: DataFrame,
    doc_counts: DataFrame,
    vocab_size: int | None = None,
    smoothing: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Turn NB sufficient statistics into the served model — the
    ln/floor step of ``naive_bayes_train``, split out so incremental
    count merges finalize without re-tokenizing (see
    ``naive_bayes_counts``).  Same contract as the trainer: returns
    ``(weights, class_stats)``, micro-nat bigints throughout."""
    s = int(smoothing)
    if s < 1:
        raise ValueError(
            f"naive_bayes_finalize: smoothing must be >= 1 (got "
            f"{smoothing}) — add-s smoothing is what keeps every "
            "class-conditional probability positive")
    counts = term_counts
    if vocab_size is not None:
        # top-N terms by total count (ties -> lexically smaller term);
        # per-partition prefilter before the global rank window is
        # unnecessary here because the frame is already vocabulary-
        # sized, not corpus-sized
        tot = counts.groupBy("term").agg(F.sum("n").alias("tn"))
        w_rank = Window.orderBy(F.col("tn").desc(), F.col("term").asc())
        vocab = (
            tot.withColumn("r", F.row_number().over(w_rank))
            .filter(F.col("r") <= int(vocab_size)).select("term")
        )
        counts = counts.join(vocab, "term", "left_semi")
    counts = counts.localCheckpoint(eager=False)  # read by V, t_c, weights
    # vocabulary size V and the doc total D stay IN-PLAN as broadcast
    # 1-row aggregates instead of blocking driver actions: the previous
    # shape paid one distinct().count() job + one collect() job before
    # the model plan even existed — two driver round-trip barriers per
    # training call, on every NB/langid gate (optimization r11; the
    # numeric expressions are unchanged, literal → 1-row column).
    v_frame = counts.agg(
        F.count_distinct("term").cast("bigint").alias("_v"))
    d_stats = doc_counts
    t_c = counts.groupBy("cls").agg(F.sum("n").alias("t_c"))
    denom = (F.col("t_c") + F.lit(s) * F.col("_v")).cast("double")
    # V = 0 (every training doc tokenizes empty): no class-conditional
    # distribution exists — oov_micro pins to 0 so serving degenerates
    # to priors-only instead of ln(s/0) = +Inf garbage (fuzz class;
    # the oracle carries the same case guard)
    oov_expr = F.when(F.col("_v") == 0, F.lit(0).cast("bigint")).otherwise(
        F.floor(F.log(
            F.lit(float(s)) / (
                F.coalesce(F.col("t_c"), F.lit(0))
                + F.lit(s) * F.col("_v")).cast("double")
        ) * 1_000_000).cast("bigint")
    )
    # ONE sealed k-row class frame carries (t_c, _v, _dt): class_stats
    # and weights both read it, so the scalar aggregates and the
    # per-class totals are computed once, not once per consumer (the
    # first in-plan cut cross-joined v_frame into both branches and
    # duplicated the count_distinct subtree — +6 AQE stages measured).
    # _dt (the doc total) is a window-sum over this k-row frame, NOT a
    # second aggregate over doc_counts: that aggregate re-ran the
    # corpus label scan as its own broadcast subtree (one extra corpus
    # pass per training call; optimization r11, guide §1.2).  The
    # left join keeps exactly one row per class and v_frame is one
    # row, so sum(n_docs) over the frame ≡ sum over doc_counts.
    cls_frame = (
        d_stats.join(t_c, "cls", "left")
        .crossJoin(F.broadcast(v_frame))
        .withColumn(
            "_dt",
            F.sum("n_docs").over(Window.partitionBy()).cast("bigint"))
        .localCheckpoint(eager=False)
    )
    class_stats = cls_frame.select(
        "cls",
        "n_docs",
        F.floor(F.log(
            F.col("n_docs").cast("double") / F.col("_dt").cast("double")
        ) * 1_000_000).cast("bigint").alias("prior_micro"),
        oov_expr.alias("oov_micro"),
    )
    # every cls in term_counts appears in doc_counts (both aggregate
    # the same base rows), so this inner join keeps every counts row
    # with its non-null t_c — ≡ the old counts⋈t_c join
    weights = counts.join(
        F.broadcast(cls_frame.select("cls", "t_c", "_v")), "cls"
    ).select(
        "cls",
        "term",
        F.floor(F.log(
            (F.col("n") + F.lit(s)).cast("double") / denom
        ) * 1_000_000).cast("bigint").alias("w_micro"),
    )
    return weights, class_stats


def naive_bayes_apply(
    df: DataFrame,
    weights: DataFrame,
    class_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """Serve a ``naive_bayes_train`` model: per-document class scores
    are exact bigint micro-nat sums

        score(d, c) = prior_micro(c) + sum_t cnt(d, t) * w_micro(c, t)
                      + (n_tokens(d) - matched(d, c)) * oov_micro(c)

    — the sparse-model identity from the trainer (every unmatched
    token scores oov_micro), so no vocabulary table is needed at serve
    time.  Winner by max score, ties to the lexically smaller class
    (the perceptron_apply_ovr min-struct idiom).

    Scale shape: ONE tokenize+explode pass over the corpus feeding ONE
    sealed (doc, term, cnt) wordcount frame read by both consumers
    (n_tokens and the model join).  The seal is load-bearing: without
    it catalyst pushes the model-join branch's ``term IS NOT NULL``
    filter below that branch's aggregate, the two consumers' exchange
    subtrees stop being identical, ReusedExchange does not fire, and
    the corpus is tokenized+exploded TWICE (the r11 after-plan carried
    two Generate nodes — optimization r12, guide §2.4/§5.3), one term-keyed
    join against the model (AQE broadcasts a capped-vocab model; an
    uncapped one sort-merges on term — either way the corpus text
    never moves again), one (doc, cls) aggregate, and a k-per-doc
    argmax.  Zero-token documents keep their prior-only score via an
    ``explode_outer`` placeholder row (NULL term — excluded from both
    the token count and the model join).  Returns (id_col, label
    string, score_micro bigint); NULL-text rows are excluded (the
    perceptron contract).  ``tokenizer`` must match the one the model
    was trained with."""
    tok = tokenizer if tokenizer is not None else normalized_words
    tok_counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode_outer(tok(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # one tokenize pass, two consumers
    )
    n_tok = tok_counts.groupBy("id").agg(
        F.sum(F.when(F.col("term").isNotNull(), F.col("cnt"))
              .otherwise(F.lit(0)))
        .cast("bigint").alias("n_tokens"))
    matched = (
        tok_counts.filter(F.col("term").isNotNull()).join(weights, "term")
        .groupBy("id", "cls")
        .agg(
            F.sum(F.col("cnt") * F.col("w_micro")).alias("m_sum"),
            F.sum("cnt").alias("m_cnt"),
        )
    )
    scores = (
        n_tok.crossJoin(
            F.broadcast(class_stats.select("cls", "prior_micro",
                                           "oov_micro")))
        .join(matched, ["id", "cls"], "left")
        .select(
            "id", "cls",
            (
                F.col("prior_micro")
                + F.coalesce(F.col("m_sum"), F.lit(0))
                + (F.col("n_tokens") - F.coalesce(F.col("m_cnt"), F.lit(0)))
                * F.col("oov_micro")
            ).cast("bigint").alias("score_micro"),
        )
    )
    return (
        scores.groupBy("id")
        .agg(F.min(F.struct(
            (-F.col("score_micro")).alias("ns"), "cls", "score_micro"
        )).alias("k"))
        .select(
            F.col("id").alias(id_col),
            F.col("k.cls").alias("label"),
            F.col("k.score_micro").alias("score_micro"),
        )
    )


def char_ngrams(col: str | Column, n: int = 3) -> Column:
    """Character n-grams over the SPACE-JOINED normalized words, padded
    with one boundary space each side — the langid feature space
    (Cavnar & Trenkle 1994 n-gram text categorization, public): word
    boundaries become part of the grams (' th' vs 'th ' are distinct
    features) while the alphabet stays the [a-z0-9 ] the word
    normalizer already makes cross-engine-safe (normalized_words' İ
    sweep — no new Unicode lowering surface).  A corpus with no words
    yields an empty array (two pad spaces < n — never a pad-only
    gram).  JVM-side throughout, and LINEAR: zip_with over n shifted
    slices of the char array (the word_ngrams discipline) — the
    substring-in-a-transform-lambda form embeds the whole normalized
    string expression per character position and re-evaluates it there
    (measured 60s vs ~4s on the sf0.1 langid gate); the slice form
    references the char array only n times."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.concat(F.lit(" "), F.array_join(normalized_words(c), " "),
                 F.lit(" "))
    chars = F.split(s, "")
    cnt = F.greatest(F.size(chars) - n + 1, F.lit(0))
    z = F.slice(chars, 1, cnt)
    for j in range(1, n):
        z = F.zip_with(z, F.slice(chars, j + 1, cnt),
                       lambda x, y: F.concat(x, y))
    return z


def langid_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    vocab_size: int | None = None,
    smoothing: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """TRAINED language identification — multinomial NB over character
    n-grams (``char_ngrams``), the real-operator upgrade over the
    4-language stopword heuristic ``detect_language`` (r10 verdict,
    item 3): char n-grams see morphology and function-word shapes in
    ANY language present in the training labels, not a hand-picked
    stopword list, and the model is the same single-aggregation-pass
    NB the trainer tier already replays exactly in SQL.

    Pure composition: ``naive_bayes_train`` with the char-n-gram
    tokenizer — every learned weight is the same floor-rounded
    micro-nat bigint, so training AND serving replay in DuckDB
    bit-for-bit (the perceptron replayed-training precedent).  The
    n-gram vocabulary is alphabet-bounded (≤ 37^n forms; ~50k observed
    trigrams on real text) — broadcast-sized at serve time regardless
    of corpus scale.

    Returns ``(weights, class_stats)`` — serve with ``langid_apply``
    (NOT ``naive_bayes_apply`` directly: the tokenizer must match)."""
    return naive_bayes_train(
        df, label_col, text_col=text_col, id_col=id_col,
        vocab_size=vocab_size, smoothing=smoothing,
        tokenizer=lambda c: char_ngrams(c, n=n))


def langid_apply(
    df: DataFrame,
    weights: DataFrame,
    class_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Serve a ``langid_train`` model: per-document language scores as
    exact bigint micro-nat sums over the document's char n-grams —
    ``naive_bayes_apply`` with the matching tokenizer.  ``n`` must
    equal the training value.  Returns (id_col, label string,
    score_micro bigint)."""
    return naive_bayes_apply(
        df, weights, class_stats, text_col=text_col, id_col=id_col,
        tokenizer=lambda c: char_ngrams(c, n=n))


def retrieval_metrics(
    rankings: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality evaluation at cutoff ``k`` — the measurement
    verb the BM25 / hybrid / ANN retrieval tier was missing: given a
    ranking table (``bm25_rank`` / ``rrf_fuse`` / ``ivf_index_search``
    output shape: one row per (query, doc) with 1-based ``rank``) and
    binary relevance judgments ``qrels`` (query, doc), emit per-query
    MRR@k, recall@k, and NDCG@k (Järvelin & Kekäläinen 2002) — the
    standard IR triple.

    Integer-exact cross-engine: each discounted-gain term is floored
    to micro-units SEPARATELY (floor(1e6 / log2(rank+1)) — one double
    expression per row, the micro-nat discipline), so DCG/IDCG are
    exact bigint sums and every ratio is bigint division:

        mrr_micro    = 1e6 div first_hit_rank          (0 if no hit)
        recall_micro = hits·1e6 div n_rel
        ndcg_micro   = dcg_micro·1e6 div idcg_micro    (0 if no hit)

    Only queries present in ``qrels`` are evaluated (n_rel ≥ 1 by
    construction); labeled queries missing from the rankings score 0
    across the board.  Duplicate qrel rows are deduped.

    Scale shape: the ranking table is already ≤ |queries|·k rows; one
    (query, doc) equi-join against qrels, one per-query aggregate, and
    a broadcast k-row discount table for IDCG — nothing corpus-sized
    moves.  Returns (query_col, n_rel, hits, mrr_micro, recall_micro,
    dcg_micro, idcg_micro, ndcg_micro)."""
    if k < 1:
        # a k < 1 cutoff would yield an empty discount table, and the
        # inner n_rel⋈idcg join would silently drop every labeled
        # query instead of failing (r9 ADVICE)
        raise ValueError(f"retrieval_metrics: k must be >= 1, got {k}")
    spark = rankings.sparkSession
    qr = qrels.select(query_col, doc_col).distinct()
    n_rel = qr.groupBy(query_col).agg(
        F.count("*").cast("bigint").alias("n_rel"))
    dterm = F.floor(
        F.lit(1000000.0) / F.log2(F.col(rank_col) + F.lit(1))
    ).cast("bigint")
    h = (
        rankings.filter(F.col(rank_col) <= k)
        .select(query_col, doc_col, rank_col)
        .join(qr, [query_col, doc_col])
        .groupBy(query_col)
        .agg(
            F.count("*").cast("bigint").alias("hits"),
            F.min(rank_col).alias("first_rank"),
            F.sum(dterm).cast("bigint").alias("dcg_micro"),
        )
    )
    terms = spark.range(1, k + 1).select(
        F.col("id").alias("_i"),
        F.floor(F.lit(1000000.0) / F.log2(F.col("id") + F.lit(1)))
        .cast("bigint").alias("_t"),
    )
    idcg = (
        n_rel.join(F.broadcast(terms),
                   F.col("_i") <= F.least(F.col("n_rel"), F.lit(k)))
        .groupBy(query_col)
        .agg(F.sum("_t").cast("bigint").alias("idcg_micro"))
    )
    return (
        n_rel.join(idcg, query_col)
        .join(h, query_col, "left")
        .select(
            query_col,
            "n_rel",
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            F.expr("case when first_rank is null then 0 "
                   "else 1000000 div first_rank end")
            .cast("bigint").alias("mrr_micro"),
            F.expr("(coalesce(hits, 0) * 1000000) div n_rel")
            .cast("bigint").alias("recall_micro"),
            F.coalesce("dcg_micro", F.lit(0)).cast("bigint")
            .alias("dcg_micro"),
            "idcg_micro",
            F.expr("(coalesce(dcg_micro, 0) * 1000000) div idcg_micro")
            .cast("bigint").alias("ndcg_micro"),
        )
    )


CC_CANDIDATE_REGEX = r"\d(?:[ -]?\d){12,18}"


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812, public) over a digits-only string
    column — pure JVM expressions (reverse + indexed fold), so
    validation runs inside WholeStageCodegen and replays in SQL:
    from the RIGHT, double every second digit, subtract 9 from
    two-digit products, total ≡ 0 (mod 10)."""
    rev = F.reverse(digits)
    dig = lambda i: F.substr(rev, i, F.lit(1)).cast("int")  # noqa: E731
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(digits)),
        F.lit(0),
        lambda acc, i: acc + F.when(i % 2 == 1, dig(i)).otherwise(
            F.when(dig(i) * 2 > 9, dig(i) * 2 - 9).otherwise(dig(i) * 2)),
    )
    return total % 10 == 0


def detect_credit_cards(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Checksum-VALIDATED credit-card detection — the precision upgrade
    over scrub_pii's regex-only classes: 13–19-digit candidate runs
    (spaces/dashes allowed) are extracted per document and each is
    Luhn-verified, so random digit strings (ids, timestamps, phone
    numbers) stop redacting as cards — the standard PII
    false-positive fix.

    Candidate extraction uses a lookaround-free regex (RE2-compatible,
    so the DuckDB oracle extracts identically); a >19-digit run yields
    its first 19 digits as the candidate (then almost surely fails the
    checksum) — documented shared semantics, not a divergence.

    Zero-shuffle row-local map (regexp_extract_all + posexplode + the
    Luhn fold).  Returns one row per candidate: (id_col, span string,
    digits string, n_digits int, luhn_valid boolean); documents with
    no candidates emit no rows; NULL text is excluded."""
    spans = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(CC_CANDIDATE_REGEX), F.lit(0))
            ).alias("span"),
        )
        .withColumn("digits", F.regexp_replace("span", "[^0-9]", ""))
    )
    return spans.select(
        id_col,
        "span",
        "digits",
        F.length("digits").cast("int").alias("n_digits"),
        (F.length("digits").between(13, 19)
         & luhn_valid(F.col("digits"))).alias("luhn_valid"),
    )


def scrub_credit_cards(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token: str = "[CARD]",
) -> DataFrame:
    """Redact ONLY Luhn-valid card spans (detect_credit_cards
    semantics), leaving checksum-failing digit runs untouched.  The
    replacement is a fold of literal ``replace`` calls over the
    document's validated spans — row-local, shuffle-free, no UDF.
    Returns (id_col, scrubbed, n_cards)."""
    base = df.filter(F.col(text_col).isNotNull())
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(CC_CANDIDATE_REGEX), F.lit(0))
    valid = F.filter(
        cands,
        lambda s: (
            F.length(F.regexp_replace(s, "[^0-9]", "")).between(13, 19)
            & luhn_valid(F.regexp_replace(s, "[^0-9]", ""))
        ),
    )
    return base.select(
        F.col(id_col),
        F.aggregate(
            valid,
            F.col(text_col),
            lambda acc, s: F.replace(acc, s, F.lit(token)),
        ).alias("scrubbed"),
        F.size(valid).cast("bigint").alias("n_cards"),
    )


def classification_metrics(
    predictions: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "label",
    label_col: str = "label",
) -> DataFrame:
    """Per-class evaluation of a classifier run — the measurement verb
    for the trainer tier (perceptron/OvR/Naive Bayes), mirroring what
    retrieval_metrics is to the retrieval tier: join predictions to
    gold labels on the id and emit one row per class with the
    confusion counts and precision / recall / F1.

    Integer-exact: counts are bigints and every rate is bigint
    division in micro units —

        precision_micro = tp·1e6 div (tp + fp)      (0 when no preds)
        recall_micro    = tp·1e6 div (tp + fn)      (0 when no golds)
        f1_micro        = 2·tp·1e6 div (2·tp + fp + fn)

    (the harmonic-mean identity F1 = 2tp/(2tp+fp+fn) keeps F1 a single
    integer division — no float precision/recall intermediates).
    Classes are the UNION of predicted and gold classes, so a class
    the model never predicts (recall failure) and a class that never
    occurs (precision failure) both get rows.  Only ids present in
    BOTH frames are scored (the evaluation join); NULL classes on
    either side are excluded.

    Scale shape: one id-keyed equi-join + two class-sized aggregates —
    the per-class frame is k rows, never corpus rows.  Returns
    (cls, tp, fp, fn, n_gold, n_pred, precision_micro, recall_micro,
    f1_micro)."""
    p = predictions.select(
        F.col(id_col).alias("_id"),
        F.col(pred_col).cast("string").alias("_pred"),
    ).filter(F.col("_pred").isNotNull())
    g = labels.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("string").alias("_gold"),
    ).filter(F.col("_gold").isNotNull())
    # ONE corpus-scale pass: the (pred, gold) confusion matrix is k²
    # rows — both per-class views derive from it, and the seal keeps
    # the id-join from recomputing per consumer (k² rows, safe)
    cm = (
        p.join(g, "_id")
        .groupBy("_pred", "_gold")
        .agg(F.count("*").cast("bigint").alias("_n"))
        .localCheckpoint(eager=False)
    )
    pred_stats = cm.groupBy(F.col("_pred").alias("cls")).agg(
        F.sum("_n").cast("bigint").alias("n_pred"),
        F.sum(F.when(F.col("_pred") == F.col("_gold"), F.col("_n"))
              .otherwise(0)).cast("bigint").alias("tp"),
    )
    gold_stats = cm.groupBy(F.col("_gold").alias("cls")).agg(
        F.sum("_n").cast("bigint").alias("n_gold"),
    )
    return (
        pred_stats.join(gold_stats, "cls", "full_outer")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint").alias("fp"),
            (F.coalesce("n_gold", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint").alias("fn"),
            F.coalesce("n_gold", F.lit(0)).cast("bigint").alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
        )
        .withColumn(
            "precision_micro",
            F.expr("case when tp + fp = 0 then 0 "
                   "else (tp * 1000000) div (tp + fp) end").cast("bigint"))
        .withColumn(
            "recall_micro",
            F.expr("case when tp + fn = 0 then 0 "
                   "else (tp * 1000000) div (tp + fn) end").cast("bigint"))
        .withColumn(
            "f1_micro",
            F.expr("case when 2 * tp + fp + fn = 0 then 0 "
                   "else (2 * tp * 1000000) div (2 * tp + fp + fn) end")
            .cast("bigint"))
    )


def classification_summary(
    predictions: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "label",
    label_col: str = "label",
) -> DataFrame:
    """ONE-row roll-up of ``classification_metrics`` — the
    scoreboard number for a trained filter: micro accuracy plus
    MACRO-averaged precision/recall/F1 (unweighted mean over classes
    — the standard imbalance-robust summary; micro accuracy alone
    rewards predicting the majority class).

    Exact integer identities over the per-class frame:
    ``accuracy_micro = Σtp·1e6 div Σn_gold`` (every scored id has
    exactly one gold class, so Σn_gold = n_scored), and each macro
    metric is ``Σ per-class micro value div n_classes`` (floor
    division, matching the per-class micro convention; classes =
    union of predicted and gold classes, the metrics contract).
    Always returns exactly one row; an empty evaluation yields
    all-zero counts.  Headroom: Σtp·1e6 fits int64 below ~9.2e12
    scored rows — beyond the corpus sizes even the 100 TB framing
    implies for labeled eval sets.

    Scale shape: the class-sized metrics frame collapses through one
    tiny aggregate — nothing corpus-scale beyond the metrics join
    itself."""
    m = classification_metrics(predictions, labels, id_col=id_col,
                               pred_col=pred_col, label_col=label_col)
    return m.agg(
        F.coalesce(F.sum("n_gold"), F.lit(0)).cast("bigint")
        .alias("n_scored"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.expr("case when coalesce(sum(n_gold), 0) = 0 then 0 "
               "else (sum(tp) * 1000000) div sum(n_gold) end")
        .cast("bigint").alias("accuracy_micro"),
        F.expr("case when count(*) = 0 then 0 "
               "else sum(precision_micro) div count(*) end")
        .cast("bigint").alias("macro_precision_micro"),
        F.expr("case when count(*) = 0 then 0 "
               "else sum(recall_micro) div count(*) end")
        .cast("bigint").alias("macro_recall_micro"),
        F.expr("case when count(*) = 0 then 0 "
               "else sum(f1_micro) div count(*) end")
        .cast("bigint").alias("macro_f1_micro"),
    )


def bm25_index_delete(
    index: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Remove documents from a persisted BM25 index WITHOUT
    re-tokenizing history — the deletion leg of the build / append /
    DELETE lifecycle: anti-join the postings against the tombstone
    list, then re-aggregate the pure-count statistics (df_t per term,
    n_docs, total) from the SURVIVING postings only.  Per-doc tf and
    dl never depended on other documents, so the result is
    BIT-IDENTICAL to rebuilding the index on the remaining corpus
    (``bm25_index_delete(bm25_index(df), ids) ≡
    bm25_index(df_minus_ids)`` — the append-≡-rebuild contract run in
    reverse; the gate's oracle replays the rebuild).

    Scale shape: one anti-join + one (id)-keyed distinct for the two
    scalars + one vocabulary-sized df/idf re-aggregation — the
    dominant build cost (corpus tokenize) is never paid again.
    Bucketed indexes keep their bucket mapping (the term hash is
    unchanged)."""
    surv = index.filter(F.col("tf") > 0).join(
        # tf > 0 drops the bucket-0 sentinel stamp (not a posting; a
        # fresh one for the shrunken snapshot is re-added below)
        ids.select(F.col(ids.columns[0] if id_col not in ids.columns
                         else id_col).alias("id")).distinct(),
        "id", "left_anti"
    ).localCheckpoint(eager=False)  # read by scalars, idf, output
    bucketed = "n_buckets" in surv.columns
    # ONE driver barrier for all four scalars (n_docs, total, chk,
    # n_buckets) — the bm25_index build shape: per-id re-fold (dl and
    # n_buckets are constant per id; the xor checksum re-folds exactly
    # because xor is associative/commutative), then one k-row aggregate.
    # The previous shape paid THREE blocking driver actions (distinct
    # docs agg + n_buckets first() + checksum agg), i.e. three separate
    # passes over the surviving postings before the output plan existed
    # (optimization r11; guide §5 — the driver should do almost no
    # data work, and §1.2 — count the passes).
    per_id = surv.groupBy("id").agg(
        F.first("dl").alias("dl"),
        F.expr(_BM25_CHK_EXPR).alias("chk_id"),
        *([F.first("n_buckets").alias("nb")] if bucketed else []),
    )
    stats = per_id.agg(
        F.count("*").cast("bigint").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("total"),
        F.expr("bit_xor(chk_id)").alias("chk"),
        *([F.first("nb").alias("nb")] if bucketed else []),
    ).collect()[0]
    n_docs, total = int(stats["n"]), int(stats["total"])
    if n_docs == 0:
        return index.sparkSession.createDataFrame(
            [], _BM25_INDEX_SCHEMA_BUCKETED if bucketed
            else _BM25_INDEX_SCHEMA)
    # surviving-postings checksum: identical xor fold to bm25_index, so
    # the recomputed snap_id equals the rebuild's stamp and
    # delete ≡ rebuild stays bit-identical including snap_id
    nb = int(stats["nb"]) if bucketed else None
    snap = _bm25_snap_id(int(stats["chk"]), n_docs, total, nb)
    # identical idf expression shape to bm25_index — the rebuild
    # bit-identity depends on it
    idf = (
        surv.groupBy("term")
        .agg(F.countDistinct("id").cast("bigint").alias("df_t"))
        .select(
            "term",
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df_t") + F.lit(0.5))
                    / (F.col("df_t") + F.lit(0.5))
                )
                * 1000
            ).cast("bigint").alias("idf_milli"),
        )
    )
    out = surv.drop(
        "idf_milli", "n_docs", "total", "snap_id"
    ).join(idf, "term").select(
        "term", "id", "tf", "dl", "idf_milli",
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        F.lit(total).cast("bigint").alias("total"),
        F.lit(snap).cast("bigint").alias("snap_id"),
        *(["bucket", "n_buckets"] if bucketed else []),
    )
    if bucketed:
        out = out.unionByName(_bm25_sentinel(
            index.sparkSession, n_docs, total, snap, nb))
    return out


def pr_curve(
    scored: DataFrame,
    positives: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    quantize: int | None = None,
) -> DataFrame:
    """Precision/recall as a function of score threshold — the
    filter-threshold-selection verb the trainable tier was missing
    (r9 verdict item 5): the perceptron and NB filters serve at a
    fixed decision rule today, but picking an operating point for a
    quality/PII/language filter needs the whole sweep.  One row per
    DISTINCT score value t, evaluating the rule ``predict positive iff
    score >= t`` over the scored corpus against the gold positive-id
    set — row-identical to running ``classification_metrics`` once per
    threshold and reading the positive class (pytest-pinned), at the
    cost of ONE pass.

    Integer-exact (the classification_metrics discipline): confusion
    counts are cumulative bigint sums down the sorted threshold lattice
    and every rate is bigint division in micro units
    (f1 = 2·tp·1e6 div (2·tp + fp + fn)).

    ``quantize`` coarsens scores onto a lattice (floor to a multiple
    of ``quantize``) BEFORE the sweep — the scale lever: the
    cumulative window runs over DISTINCT thresholds in one task, so a
    score domain with unbounded cardinality (raw dot products over a
    100 TB corpus) is capped to (score range)/quantize rows.  None
    keeps every distinct score (exact sweep).

    Gold positives are evaluated over the SCORED corpus (inner-id
    semantics, the classification_metrics join): positive ids missing
    from ``scored`` do not enter total_pos — score the full corpus if
    coverage matters.

    Scale shape: one left-semi-flag join (AQE broadcasts a small
    positive set), one per-threshold aggregate (wordcount-shaped,
    map-side partials), then the cumulative window over distinct
    thresholds only — the corpus never enters a window.  Returns
    (threshold, n_pred, tp, fp, fn, precision_micro, recall_micro,
    f1_micro)."""
    if quantize is not None and quantize < 1:
        raise ValueError(f"pr_curve: quantize must be >= 1, got {quantize}")
    pos = positives.select(
        F.col(positives.columns[0] if id_col not in positives.columns
              else id_col).alias("_id")
    ).distinct().withColumn("_is_pos", F.lit(1))
    thr_expr = F.col("_score") if quantize is None else F.expr(
        # floor-to-lattice for signed ints (truncated % on both
        # engines: subtract the positive residue)
        f"_score - ((_score % {quantize}) + {quantize}) % {quantize}")
    lab = (
        scored.filter(F.col(score_col).isNotNull())
        .select(F.col(id_col).alias("_id"),
                F.col(score_col).cast("bigint").alias("_score"))
        .join(pos, "_id", "left")
        .select(thr_expr.cast("bigint").alias("threshold"),
                F.coalesce("_is_pos", F.lit(0)).alias("_is_pos"))
    )
    per = lab.groupBy("threshold").agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum("_is_pos").cast("bigint").alias("_np"),
    )
    # cumulative sums down the threshold lattice: rows here are
    # DISTINCT thresholds (bounded by quantize), never the corpus
    w_cum = Window.orderBy(F.col("threshold").desc())
    w_all = Window.partitionBy()
    return (
        per.select(
            "threshold",
            F.sum("_n").over(w_cum).cast("bigint").alias("n_pred"),
            F.sum("_np").over(w_cum).cast("bigint").alias("tp"),
            F.sum("_np").over(w_all).cast("bigint").alias("_total_pos"),
        )
        .select(
            "threshold", "n_pred", "tp",
            (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
            (F.col("_total_pos") - F.col("tp")).cast("bigint").alias("fn"),
            F.expr("(tp * 1000000) div n_pred").cast("bigint")
            .alias("precision_micro"),
            F.expr("case when _total_pos = 0 then 0 "
                   "else (tp * 1000000) div _total_pos end").cast("bigint")
            .alias("recall_micro"),
            F.expr("case when 2 * tp + (n_pred - tp) "
                   "+ (_total_pos - tp) = 0 then 0 "
                   "else (2 * tp * 1000000) div (2 * tp + (n_pred - tp) "
                   "+ (_total_pos - tp)) end").cast("bigint")
            .alias("f1_micro"),
        )
    )


def select_threshold(
    scored: DataFrame,
    positives: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    quantize: int | None = None,
) -> DataFrame:
    """Operating-point selection — the eval tier's conclusion: the
    F1-OPTIMAL decision threshold off the ``pr_curve`` sweep, as ONE
    row (threshold, n_pred, tp, fp, fn, precision_micro, recall_micro,
    f1_micro).  Ties break to the LOWEST threshold (equal F1 → prefer
    the higher-recall operating point — deterministic, the min-struct
    idiom).  This is the verb a filter-deployment pipeline actually
    calls: sweep once, pin the threshold, serve with a constant.

    Scale shape: the ``pr_curve`` pass (corpus never enters a window)
    plus one min-struct aggregate over the DISTINCT-threshold-sized
    curve — nothing new touches the corpus.  Empty curve (no non-NULL
    scores) returns an empty frame."""
    curve = pr_curve(scored, positives, id_col=id_col,
                     score_col=score_col, quantize=quantize)
    cols = ["threshold", "n_pred", "tp", "fp", "fn",
            "precision_micro", "recall_micro", "f1_micro"]
    return (
        curve.agg(F.min(F.struct(
            (-F.col("f1_micro")).alias("_nf"),
            *[F.col(c) for c in cols],
        )).alias("k"))
        .filter(F.col("k").isNotNull())  # empty curve -> empty frame
        .select(*[F.col(f"k.{c}").alias(c) for c in cols])
    )


def auc_score(
    scored: DataFrame,
    positives: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Exact ROC-AUC of a scorer against a gold positive-id set — the
    threshold-free summary completing the eval tier (pr_curve is the
    per-threshold view; AUC integrates it): the Mann-Whitney U
    statistic with MIDRANK tie handling, evaluated entirely in bigint
    arithmetic.  With ascending-score midranks R,

        auc = (Σ_pos R − P(P+1)/2) / (P·N)

    and doubling clears the halves: per distinct-score group g with
    n_g members (np_g positive) and cum_g rows strictly below it,
    every member's doubled midrank is 2·cum_g + n_g + 1, so

        auc_micro = (Σ_g np_g·(2·cum_g + n_g + 1) − P(P+1)) · 1e6
                    div (2·P·N)

    — one bigint expression, no floats, ties exact (a constant scorer
    yields exactly 500000).  NULL when P = 0 or N = 0 (undefined).

    Scale shape: the pr_curve discipline — one flag join, one
    per-score aggregate, one cumulative window over DISTINCT scores
    only, then a single global fold.  Returns ONE row
    (n_pos, n_neg, auc_micro)."""
    pos = positives.select(
        F.col(positives.columns[0] if id_col not in positives.columns
              else id_col).alias("_id")
    ).distinct().withColumn("_is_pos", F.lit(1))
    lab = (
        scored.filter(F.col(score_col).isNotNull())
        .select(F.col(id_col).alias("_id"),
                F.col(score_col).cast("bigint").alias("_score"))
        .join(pos, "_id", "left")
        .select("_score", F.coalesce("_is_pos", F.lit(0)).alias("_is_pos"))
    )
    per = lab.groupBy("_score").agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum("_is_pos").cast("bigint").alias("_np"),
    )
    w_cum = Window.orderBy("_score").rowsBetween(
        Window.unboundedPreceding, -1)
    ranked = per.select(
        "_n", "_np",
        F.coalesce(F.sum("_n").over(w_cum), F.lit(0))
        .cast("bigint").alias("_cum"),
    )
    # r2 and the micro numerator are carried in decimal(38,0): r2 grows
    # ~2·P·N, so the bigint fold wraps silently (ANSI off) once the
    # scored corpus passes ~2M rows while the DuckDB oracle's HUGEINT
    # does not.  `div` on decimals is IntegralDivide → Decimal.quot
    # (BigDecimal.divideToIntegralValue): EXACT truncated quotient
    # returned as bigint — no float/rounded-scale path anywhere, and
    # the quotient is ≤ 1e6 so bigint always holds it.
    return ranked.agg(
        F.sum("_np").cast("bigint").alias("n_pos"),
        (F.sum("_n") - F.sum("_np")).cast("bigint").alias("n_neg"),
        F.sum(F.col("_np").cast("decimal(38,0)")
              * (F.lit(2) * F.col("_cum") + F.col("_n") + F.lit(1)))
        .cast("decimal(38,0)").alias("_r2"),
    ).select(
        "n_pos", "n_neg",
        F.expr("case when n_pos = 0 or n_neg = 0 then null "
               "else ((_r2 - cast(n_pos as decimal(38,0)) * (n_pos + 1))"
               " * 1000000) "
               "div (cast(2 as decimal(38,0)) * n_pos * n_neg) end")
        .cast("bigint").alias("auc_micro"),
    )


def score_calibration(
    scored: DataFrame,
    positives: DataFrame,
    n_bins: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reliability diagram / calibration table for a scorer: the score
    range [min, max] split into ``n_bins`` equal-width integer bins,
    one row per NON-EMPTY bin with its observed positive rate — the
    standard check that a filter's score means what its magnitude
    suggests before a pr_curve threshold is picked.

    Integer-exact: bin edges are bigint lattice arithmetic on the
    observed [lo, hi] (bin = min((score−lo)·n_bins div span, n_bins−1),
    span = hi−lo; a constant scorer collapses to bin 0), rates are
    bigint micro divisions, and the per-bin mean score is
    score-sum div n (floored).

    Scale shape: one flag join, a two-scalar min/max collect, then ONE
    wordcount-shaped per-bin aggregate — nothing enters a window.
    Returns (bin, lo_score, n, n_pos, pos_rate_micro, mean_score)."""
    if n_bins < 1:
        raise ValueError(f"score_calibration: n_bins must be >= 1, "
                         f"got {n_bins}")
    pos = positives.select(
        F.col(positives.columns[0] if id_col not in positives.columns
              else id_col).alias("_id")
    ).distinct().withColumn("_is_pos", F.lit(1))
    lab = (
        scored.filter(F.col(score_col).isNotNull())
        .select(F.col(id_col).alias("_id"),
                F.col(score_col).cast("bigint").alias("_score"))
        .join(pos, "_id", "left")
        .select("_score", F.coalesce("_is_pos", F.lit(0)).alias("_is_pos"))
        .localCheckpoint(eager=False)  # feeds the range scan AND bins
    )
    rng = lab.agg(F.min("_score").alias("lo"),
                  F.max("_score").alias("hi")).first()
    if rng["lo"] is None:
        return scored.sparkSession.createDataFrame(
            [], "bin int, lo_score bigint, n bigint, n_pos bigint, "
                "pos_rate_micro bigint, mean_score bigint")
    lo, hi = int(rng["lo"]), int(rng["hi"])
    span = hi - lo
    bin_expr = (F.lit(0).cast("int") if span == 0 else F.least(
        F.expr(f"((_score - {lo}) * {n_bins}) div {span}"),
        F.lit(n_bins - 1)).cast("int"))
    return (
        lab.withColumn("bin", bin_expr)
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("_is_pos").cast("bigint").alias("n_pos"),
            F.sum("_score").cast("bigint").alias("_ssum"),
        )
        .select(
            "bin",
            F.expr(f"cast({lo} + (cast(bin as bigint) * {span}) "
                   f"div {n_bins} as bigint)").alias("lo_score"),
            "n", "n_pos",
            F.expr("(n_pos * 1000000) div n").cast("bigint")
            .alias("pos_rate_micro"),
            # FLOOR-exact mean under a possibly-negative sum: subtract
            # the positive residue so the quotient is exact and immune
            # to div-rounding-convention differences across engines
            F.expr("(_ssum - ((_ssum % n) + n) % n) div n")
            .cast("bigint").alias("mean_score"),
        )
    )


def stump_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    max_bins: int | None = None,
) -> DataFrame:
    """Train a decision stump (depth-1 tree) over integer feature
    columns — the simplest tree-family member of the trainable-filter
    tier (NB and perceptron are linear in feature space; the stump is
    the axis-aligned threshold rule a quality-filter cascade actually
    deploys, cf. the Gopher/RefinedWeb hand-set thresholds — this
    learns the threshold instead of hand-picking it).

    Exhaustive exact split search, all-bigint: for every feature and
    every distinct observed value v (candidate rule ``value <= v``),
    the left/right class counts come from one cumulative window over
    the per-value aggregate, each leaf predicts its majority class
    (tie → 1), and the split minimizing total misclassification
    error wins.  Tie-break pinned: error ASC → feature name ASC →
    threshold ASC.  NULL labels drop rows; a NULL feature value drops
    that row for THAT feature only (per-feature candidate sets are
    independent).  Every quantity is a bigint count, so the DuckDB
    oracle replays training bit-for-bit (the replayed-training
    precedent: perceptron / langid / NB).

    Scale shape: one corpus-scale explode to (feature, value, y) →
    per-(feature, value) partial-aggregated groupBy (candidate frame
    is Σ distinct values per feature, NOT corpus rows) → per-feature
    cumulative window → per-feature argmin → |features|-row global
    argmin.  At 100 TB with near-continuous features, pass
    ``max_bins``: values histogram into ≤ max_bins equal-WIDTH
    buckets per feature (the LightGBM design) computed from a tiny
    broadcast (feature → min/max) frame — the bin id is a pure
    map-side expression (decimal-carried so huge value ranges cannot
    overflow the product), candidate thresholds become each bin's
    max OBSERVED value (always a real value — an arithmetic upper
    bound can fall below the bin's content on degenerate ranges),
    and the cumulative/argmin frame is bounded at
    features·max_bins rows.  When ``max_bins`` covers every
    feature's value range the result is IDENTICAL to the exact
    search (pytest-pinned).  Returns ONE row: (feature, threshold,
    left_label, right_label, train_error)."""
    y = F.col(label_col).cast("int")
    longf = (
        df.filter(y.isNotNull())
        .select(
            y.alias("y"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(c).alias("feature"),
                    F.col(c).cast("bigint").alias("value"),
                )
                for c in feature_cols
            ])).alias("fv"),
        )
        .select("fv.feature", "fv.value", "y")
        .filter(F.col("value").isNotNull())
    )
    per_val = longf.groupBy("feature", "value").agg(
        F.sum("y").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).alias("neg"),
    )
    if max_bins is not None:
        # bounds from the MODEL-sized per-value aggregate, not the
        # corpus-scale exploded frame (identical min/max, one less
        # corpus pass); every term decimal-carried BEFORE subtracting
        # — value ranges wider than int64 would overflow the bigint
        # difference itself (both: code-review findings)
        rng = per_val.groupBy("feature").agg(
            F.min("value").alias("_lo"), F.max("value").alias("_hi"))
        per_val = (
            per_val.join(F.broadcast(rng), "feature")
            .withColumn(
                "_bin",
                F.expr(f"cast((cast(value as decimal(38,0)) - _lo) "
                       f"* {int(max_bins)} div "
                       f"(cast(_hi as decimal(38,0)) - _lo + 1) as bigint)"),
            )
            .groupBy("feature", "_bin")
            .agg(
                F.max("value").alias("value"),
                F.sum("pos").alias("pos"),
                F.sum("neg").alias("neg"),
            )
            .drop("_bin")
        )
    cum = (
        Window.partitionBy("feature").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("feature")
    cand = per_val.select(
        "feature",
        F.col("value").alias("threshold"),
        F.sum("pos").over(cum).alias("lp"),
        F.sum("neg").over(cum).alias("ln"),
        (F.sum("pos").over(tot) - F.sum("pos").over(cum)).alias("rp"),
        (F.sum("neg").over(tot) - F.sum("neg").over(cum)).alias("rn"),
    )
    scored = cand.select(
        "feature",
        "threshold",
        F.when(F.col("lp") >= F.col("ln"), F.lit(1)).otherwise(F.lit(0))
        .alias("left_label"),
        F.when(F.col("rp") >= F.col("rn"), F.lit(1)).otherwise(F.lit(0))
        .alias("right_label"),
        (
            F.col("lp") + F.col("ln")
            - F.greatest(F.col("lp"), F.col("ln"))
            + F.col("rp") + F.col("rn")
            - F.greatest(F.col("rp"), F.col("rn"))
        ).cast("bigint").alias("train_error"),
    )
    per_feat = Window.partitionBy("feature").orderBy(
        F.col("train_error").asc(), F.col("threshold").asc()
    )
    best_per_feat = (
        scored.withColumn("_r", F.row_number().over(per_feat))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    # global argmin runs over |features| rows only — the single-
    # partition window is model-sized by construction
    overall = Window.orderBy(
        F.col("train_error").asc(), F.col("feature").asc(),
        F.col("threshold").asc()
    )
    return (
        best_per_feat.withColumn("_r", F.row_number().over(overall))
        .filter(F.col("_r") == 1)
        .select("feature", "threshold", "left_label", "right_label",
                "train_error")
    )


def stump_apply(
    df: DataFrame,
    stump: DataFrame,
    feature_cols: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Serve a trained stump: route each row by the learned
    (feature, threshold) rule — ``value <= threshold`` → left leaf's
    label, else right's.  The one-row model joins as a broadcast
    cross join (no driver collect, the centroid-literal convention);
    the CASE chain over ``feature_cols`` keeps the plan whole-stage
    codegen with zero Python.  A NULL value in the CHOSEN feature
    yields a NULL prediction (the row cannot be routed — surfaced,
    not guessed).  Returns (id_col, pred int)."""
    joined = df.crossJoin(F.broadcast(stump))
    pred = F.lit(None).cast("int")
    for c in feature_cols:
        pred = F.when(
            F.col("feature") == c,
            F.when(F.col(c).isNull(), F.lit(None).cast("int"))
            .when(F.col(c).cast("bigint") <= F.col("threshold"),
                  F.col("left_label"))
            .otherwise(F.col("right_label")),
        ).otherwise(pred)
    return joined.select(F.col(id_col), pred.cast("int").alias("pred"))
