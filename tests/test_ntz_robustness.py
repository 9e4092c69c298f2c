"""Temporal operators driven against RAW parquet timestamps.

Parquet ns-timestamps read as TIMESTAMP_NTZ, which rejects several
casts plain TIMESTAMP allows (NTZ→bigint found the range_join bug that
motivated this file).  Every temporal operator must work on the raw
column, not only on the driver's normalized copies."""

import pytest
from pyspark.sql import functions as F

RAW = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def raw_events(spark):
    df = spark.read.parquet(RAW)
    assert "ntz" in df.schema["ts"].dataType.typeName()  # the point
    return df


def test_range_join_on_ntz(spark, raw_events):
    from dbt_core_spark.operators.asof import range_join

    win = raw_events.filter("event_id % 50 = 0").select(
        F.col("event_id").alias("wid"),
        (F.col("ts") - F.expr("INTERVAL 300 SECONDS")).alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"))
    out = range_join(raw_events.select("event_id", "ts"), win,
                     "ts", "s", "e", bucket_width=600)
    assert out.count() > 0


def test_asof_tolerance_on_ntz(spark, raw_events):
    from dbt_core_spark.operators.asof import asof_join

    r = raw_events.filter("event_id % 100 = 0").select(
        F.col("user_id"), F.col("ts").alias("rts"),
        F.col("event_id").alias("ref"))
    out = asof_join(raw_events.select("user_id", "ts", "event_id"),
                    r.dropDuplicates(["user_id", "rts"]),
                    on="user_id", left_ts="ts", right_ts="rts",
                    right_values=["ref"], tolerance=3600)
    assert out.count() == raw_events.count()


def test_funnel_and_transitions_on_ntz(spark, raw_events):
    from dbt_core_spark.operators.sequence import (
        event_transitions, funnel)

    f = funnel(raw_events, ["view", "click", "purchase"],
               tiebreak_col="event_id")
    assert f.count() > 0
    t = event_transitions(raw_events, tiebreak_col="event_id")
    assert t.count() > 0


def test_anomalies_and_cohorts_on_ntz(spark, raw_events):
    from dbt_core_spark.operators.sequence import (
        cohort_retention, count_anomalies)

    assert count_anomalies(raw_events).count() > 0
    assert cohort_retention(raw_events, granularity="week").count() > 0


def test_streaming_cms_source_schema_on_ntz(spark, raw_events):
    """Batch CMS over the raw NTZ table (the stream side is exercised in
    test_streaming; here the concern is the md5 cast path on NTZ rows)."""
    from dbt_core_spark.operators.sketches import cms_build

    assert cms_build(raw_events, "event_type", depth=2,
                     width=16).count() <= 32
