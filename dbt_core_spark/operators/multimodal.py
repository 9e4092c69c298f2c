"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Engine extension (driver north star).  The container has no image/audio
codecs, so the decode kernels are STUBBED behind ``_decode_image_stub``
(deterministic fake) / ``NotImplementedError`` — but the Spark-side
plumbing is real and tested: schema contracts, Arrow batch transfer,
partition sizing, and the mapInPandas iterator protocol are exactly what
a real decoder would use (swap the stub for PIL/ffmpeg on a cluster).

Scale notes: binary payloads dominate partition size — repartition so
``rows_per_partition × avg_payload ≤ spark.sql.files.maxPartitionBytes``;
never collect; metadata-only predicates (width/duration/mime) are plain
columns so Catalyst prunes before any Python runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.LongType(), True),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Demo constructor: wrap a text column as a binary payload with fake
    metadata — stands in for `spark.read.format("binaryFile")` on real
    media lakes."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes) -> int:
    """STUB decode kernel — deterministic fake feature (payload length
    mod 97).  A real deployment replaces this with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + a feature extractor;
    everything around it (batching, schema, partitioning) is unchanged."""
    if payload is None:
        return -1
    return len(payload) % 97


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The mapInPandas iterator form keeps peak memory to one Arrow batch
    per task regardless of partition size — required when payloads are
    MBs each."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["data"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": data.map(lambda b: len(b) if b is not None else 0),
                    "feature": data.map(_decode_image_stub),
                }
            )

    from dbt_core_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expands each media row into frame
    timestamps (decode itself stubbed).  Real decoder would emit one
    binary frame per row here."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    duration = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), duration, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def decode_audio(df: DataFrame) -> DataFrame:  # pragma: no cover — stub
    """Audio decode is not available in this container."""
    raise NotImplementedError(
        "audio codecs unavailable here; swap in a soundfile/ffmpeg kernel "
        "inside extract_features-style mapInPandas on a real cluster"
    )
