"""dbt_core_spark — a PySpark-native analytics/transformation engine.

A from-scratch re-expression of the capabilities of dbt-core 1.9
(reference: pnadolny13/dbt-core, read-only at /root/reference) where
**Spark itself is the warehouse**: models are SELECT statements templated
with Jinja2, compiled to Spark SQL, executed by Catalyst/Tungsten, and
materialized as Spark tables/views (parquet locally; Delta/Iceberg on a
real cluster).  The engine owns the layer dbt provides *above* the
warehouse — parse → manifest → DAG → compile → materialize → test —
plus the materialization strategies dbt delegates to its adapters,
implemented here natively on the Spark DataFrame/SQL API.

Beyond dbt parity the package ships LLM-data-pipeline operators
(deduplication, similarity search, text analysis, multimodal plumbing)
designed shuffle-aware for 100 TB scale (``dbt_core_spark.operators``).

Architecture map (reference citations inside each module):

- ``session``        SparkSession builder tuned for the engine
- ``project``        project/config model   (ref: core/dbt/config/project.py)
- ``plans``          nodes, manifest, parser, compiler, graph, selector
                     (ref: core/dbt/contracts/graph, core/dbt/compilation.py)
- ``functions``      Jinja context + cross-database macro surface
                     (ref: core/dbt/context/{base,providers}.py)
- ``operators``      materializations, generic tests, LLM-pipeline ops
                     (ref: dbt-adapters global project semantics, pinned by
                     /root/reference/tests/functional/adapter/)
- ``sources``        seeds (CSV), external sources, freshness
- ``streaming``      microbatch incremental + structured-streaming helpers
                     (ref: core/dbt/materializations/incremental/microbatch.py)
- ``run``            thread-pooled graph runner, run results
                     (ref: core/dbt/task/{runnable,run}.py)
"""

__version__ = "0.1.0"

from dbt_core_spark.api import Engine  # noqa: E402,F401
from dbt_core_spark.project import ProjectDef  # noqa: E402,F401
from dbt_core_spark.run.cli import RunnerResult, SparkbtRunner  # noqa: E402,F401
from dbt_core_spark.session import get_spark  # noqa: E402,F401

__all__ = ["Engine", "ProjectDef", "SparkbtRunner", "RunnerResult",
           "get_spark", "__version__"]
