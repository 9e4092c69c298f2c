"""Source registration & freshness."""

from dbt_core_spark.sources.readers import register_source  # noqa: F401
from dbt_core_spark.sources.freshness import check_freshness  # noqa: F401
