"""Dump .explain("formatted") for named queries to plans/r11/<name>_<tag>.txt.

Usage:
  PYTHONPATH=/root/repo python3 scripts/capture_plans.py <tag> [query ...]

tag is e.g. "before" or "after".  Queries resolve like bench.py: from
queries() first, then module attributes.  Streaming-serve queries are
skipped (their inner per-batch plan is captured via the on_batch_result
hook by scripts/gen_plans.py; the outer function triggers a full run).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dbt_core_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fmt(df):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(
        app_name="capture_plans",
        extra_conf={"spark.sql.warehouse.dir": f"/tmp/plans_wh_{os.getpid()}"},
    )
    entrymod._reg(spark, SF_DIR)
    qs = entrymod.queries()
    os.makedirs("plans/r11", exist_ok=True)
    for name in names:
        fn = qs.get(name) or getattr(entrymod, name)
        df = fn(spark, SF_DIR)
        out = f"plans/r11/{name}_{tag}.txt"
        with open(out, "w") as fh:
            fh.write(fmt(df))
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
