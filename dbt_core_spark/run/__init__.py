"""Execution layer: thread-pooled graph runner + run results."""

from dbt_core_spark.run.runner import GraphRunner, NodeResult, RunResults  # noqa: F401
