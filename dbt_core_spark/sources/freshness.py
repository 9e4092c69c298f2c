"""Source freshness checks.

ref: FreshnessThreshold/Time components.py:97-129; task/freshness.py:36-220
(execute :109-166 — calculate_freshness via max(loaded_at_field), or
metadata-based from file modification times).
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dbt_core_spark.plans.nodes import Node

_PERIOD_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


@dataclass
class FreshnessResult:
    status: str  # pass | warn | error | runtime error
    max_loaded_at: Optional[_dt.datetime]
    age_seconds: float


def _threshold_seconds(t: Optional[dict]) -> Optional[float]:
    if not t:
        return None
    return t["count"] * _PERIOD_SECONDS[t["period"]]


def check_freshness(
    spark: SparkSession,
    node: Node,
    relation: str,
    now: Optional[_dt.datetime] = None,
) -> FreshnessResult:
    now = now or _dt.datetime.now(_dt.timezone.utc)
    fresh = node.freshness or {}
    filter_sql = fresh.get("filter")
    if node.loaded_at_field:
        df = spark.table(relation)
        if filter_sql:
            df = df.filter(filter_sql)
        # loaded_at_field may be a SQL expression, not just a column name
        # (ref: loaded_at_field docs; task/freshness.py renders it raw)
        row = df.agg(F.max(F.expr(node.loaded_at_field)).alias("m")).collect()[0]
        max_loaded = row["m"]
        if isinstance(max_loaded, _dt.date) and not isinstance(max_loaded, _dt.datetime):
            max_loaded = _dt.datetime.combine(max_loaded, _dt.time())
    else:
        # metadata path: file mtimes of the external location
        loc = node.external_location or ""
        mtime = os.path.getmtime(loc) if loc and os.path.exists(loc) else None
        max_loaded = _dt.datetime.fromtimestamp(mtime, _dt.timezone.utc) if mtime else None
    if max_loaded is None:
        return FreshnessResult("runtime error", None, float("inf"))
    if max_loaded.tzinfo is None:
        max_loaded = max_loaded.replace(tzinfo=_dt.timezone.utc)
    age = (now - max_loaded).total_seconds()
    warn_s = _threshold_seconds(fresh.get("warn_after"))
    error_s = _threshold_seconds(fresh.get("error_after"))
    if error_s is not None and age > error_s:
        status = "error"
    elif warn_s is not None and age > warn_s:
        status = "warn"
    else:
        status = "pass"
    return FreshnessResult(status, max_loaded, age)
