"""Logical-plan layer: nodes, manifest, parser, compiler, graph, selection."""

from dbt_core_spark.plans.nodes import Manifest, Node, NodeType  # noqa: F401
from dbt_core_spark.plans.graph import GraphQueue, Linker  # noqa: F401
