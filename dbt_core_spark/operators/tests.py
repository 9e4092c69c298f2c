"""Test execution & evaluation contract.

A data test compiles to a SELECT returning *failing rows*; the
materialization reduces it to exactly one row × three cols
(``failures``, ``should_warn``, ``should_error``) computed by
``fail_calc`` (default count(*)) compared via ``warn_if``/``error_if``
(default ``!= 0``) with ``where``/``limit``/``severity`` modifiers
(ref: task/test.py:64-87,143-197 result contract; :294-329 status
mapping; config knobs v1/config.py:164-229).

``store_failures`` materializes failing rows into the audit schema
``dbt_test__audit`` (ref: tests/functional/adapter/store_test_failures_tests/).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import SparkSession

from dbt_core_spark.operators import relations as R
from dbt_core_spark.plans.nodes import Node


@dataclass
class TestOutcome:
    status: str  # pass | warn | fail | error
    failures: int
    should_warn: bool
    should_error: bool
    stored_at: Optional[str] = None


def execute_test(
    spark: SparkSession,
    node: Node,
    sql: str,
    audit_schema: Optional[str] = None,
) -> TestOutcome:
    cfg = node.config
    fail_calc = cfg.get("fail_calc") or "count(*)"
    warn_if = cfg.get("warn_if") or "!= 0"
    error_if = cfg.get("error_if") or "!= 0"
    limit = cfg.get("limit")
    severity = (cfg.get("severity") or "ERROR").upper()

    inner = f"select * from ({sql}) dbt_internal_test"
    if limit:
        inner += f" limit {limit}"
    wrapped = (
        f"select {fail_calc} as failures, "
        f"{fail_calc} {warn_if} as should_warn, "
        f"{fail_calc} {error_if} as should_error "
        f"from ({inner}) dbt_internal_test"
    )
    row = spark.sql(wrapped).collect()[0]
    failures = int(row["failures"] or 0)
    should_warn = bool(row["should_warn"])
    should_error = bool(row["should_error"])

    stored_at = None
    if cfg.get("store_failures") or cfg.get("store_failures_as"):
        schema = audit_schema or "dbt_test__audit"
        R.ensure_database(spark, schema)
        rel = f"{schema}.{node.name}"
        store_as = cfg.get("store_failures_as") or "table"
        if store_as == "view":
            R.create_view(spark, rel, sql)
        else:
            R.write_table(spark, rel, spark.sql(sql), mode="overwrite")
        stored_at = rel

    # severity mapping (ref: task/test.py:294-329): WARN severity never errors
    if severity == "WARN":
        status = "warn" if (should_warn or should_error) else "pass"
    else:
        status = "fail" if should_error else ("warn" if should_warn else "pass")
    return TestOutcome(status, failures, should_warn, should_error, stored_at)
