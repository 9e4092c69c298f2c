"""Function surfaces: Jinja context functions (ref: core/dbt/context/base.py,
providers.py) and the cross-database SQL macro library (ref: semantics pinned
by /root/reference/tests/functional/adapter/utils/)."""

from dbt_core_spark.functions import xdb  # noqa: F401
