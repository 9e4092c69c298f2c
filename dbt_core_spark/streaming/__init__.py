"""Event-time batch processing: microbatch incremental + structured streaming."""

from dbt_core_spark.streaming.microbatch import MicrobatchBuilder  # noqa: F401
