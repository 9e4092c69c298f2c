"""Dedup graph operators (engine extension)."""

from dbt_core_spark.operators.dedup import connected_components


def test_connected_components_chain(spark):
    """Transitive chains collapse to one component labeled by min id —
    the case single-link one-pass dedup gets wrong."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 3)], "id_a long, id_b long")
    got = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (5, 1), (10, 10), (11, 10)}


def test_connected_components_converges_early(spark):
    """A single pair converges without exhausting max_iter."""
    pairs = spark.createDataFrame([(7, 9)], "id_a long, id_b long")
    out = connected_components(pairs, max_iter=25)
    assert {(r.id, r.component) for r in out.collect()} == {(7, 7), (9, 7)}


def test_repetition_stats(spark):
    """Gopher repetition filters: dup-word fraction and top-bigram
    coverage with deterministic tiebreaks."""
    from dbt_core_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"),     # bigrams: "a b"x2, "b a"x2 → tie, 'b a' wins (desc)
         (2, "x y z"),         # all distinct
         (3, "solo")],         # no bigrams
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_words"] == 5 and out[1]["n_distinct_words"] == 2
    assert abs(out[1]["dup_word_frac"] - 0.6) < 1e-12
    assert out[1]["top_bigram"] == "b a" and out[1]["top_bigram_count"] == 2
    assert abs(out[1]["top_bigram_frac"] - 0.5) < 1e-12
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["top_bigram_count"] == 1
    assert out[3]["top_bigram"] is None and out[3]["n_bigrams"] is None


def test_cap_per_group(spark):
    from dbt_core_spark.operators.textstats import cap_per_group

    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(10)], "doc_id long, source string")
    out = cap_per_group(df, "source", "doc_id", cap=3).collect()
    assert len(out) == 6  # 3 per source
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 1, 2, 3, 4, 5]  # lowest ids kept deterministically
