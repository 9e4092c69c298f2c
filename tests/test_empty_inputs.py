"""Empty-input robustness: every session-5 operator must return an
empty (or identity) result on an empty frame — not crash.  At 100 TB an
empty partition/source/day is routine, and driver-side .collect()-based
seeds (codebooks, centroids) are the usual crash point."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string")


@pytest.fixture(scope="module")
def empty_vecs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_text_ops_empty(spark, empty_docs):
    from dbt_core_spark.operators.textstats import (
        classifier_score, detect_script, normalize_text,
        tfidf_cosine_pairs)

    assert classifier_score(empty_docs).count() == 0
    assert normalize_text(empty_docs).count() == 0
    assert detect_script(empty_docs).count() == 0
    assert tfidf_cosine_pairs(empty_docs).count() == 0


def test_corpus_ops_empty(spark, empty_docs):
    from dbt_core_spark.operators.corpus import (
        bpe_token_counts, bpe_train, curriculum_order, pmi_collocations)

    assert bpe_train(empty_docs) == []
    assert bpe_token_counts(empty_docs, [("a", "b")]).count() == 0
    assert pmi_collocations(empty_docs).count() == 0
    assert curriculum_order(
        empty_docs.withColumn("score", F.lit(1.0)), "score", [0.5]
    ).count() == 0


def test_event_ops_empty(spark, empty_events):
    from dbt_core_spark.operators.sequence import (
        cohort_retention, count_anomalies, event_transitions, funnel)
    from dbt_core_spark.operators.skew import skew_report

    assert funnel(empty_events, ["view", "click"]).count() == 0
    assert count_anomalies(empty_events).count() == 0
    assert cohort_retention(empty_events).count() == 0
    assert event_transitions(empty_events).count() == 0
    assert skew_report(empty_events, "user_id").count() == 0


def test_sketch_ops_empty(spark, empty_docs):
    from dbt_core_spark.operators.sketches import (
        cms_build, cms_heavy_hitters, kmv_jaccard)

    w = empty_docs.select(F.col("text").alias("v"))
    assert cms_build(w, "v").count() == 0
    assert cms_heavy_hitters(w, "v", threshold=1).count() == 0
    row = kmv_jaccard(w, w, "v").collect()[0]
    assert row["n_union_k"] == 0 and row["n_common"] == 0
    assert row["jaccard_est"] is None  # 0/0 stays null, not a crash


def test_vector_ops_empty(spark, empty_vecs):
    from dbt_core_spark.operators.similarity import (
        gram_matrix, pq_codebook, pq_encode, random_projection)

    assert random_projection(empty_vecs, dim=64, out_dim=4).count() == 0
    assert gram_matrix(empty_vecs, dim=4).count() == 0
    cb = pq_codebook(empty_vecs, dim=64, m=4, ks=16)
    assert cb.count() == 0
    assert pq_encode(empty_vecs, cb, dim=64, m=4).count() == 0


def test_range_join_empty_sides(spark, empty_events):
    from dbt_core_spark.operators.asof import range_join

    win = empty_events.select(
        F.col("event_id").alias("wid"),
        F.col("ts").alias("s"), F.col("ts").alias("e"))
    assert range_join(empty_events, win, "ts", "s", "e").count() == 0
