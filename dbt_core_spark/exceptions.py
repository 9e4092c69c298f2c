"""Engine exceptions (ref: core/dbt/exceptions.py, context/exceptions_jinja.py)."""

from __future__ import annotations


class DbtSparkError(Exception):
    """Base class for all engine errors."""


class CompilationError(DbtSparkError):
    """Jinja render / SQL compile failure (ref: dbt CompilationError)."""


class ParsingError(DbtSparkError):
    """Project / manifest parsing failure."""


class DagCycleError(CompilationError):
    """Cycle in the model graph (ref: core/dbt/compilation.py:132-139)."""


class ExecutionError(DbtSparkError):
    """Runtime failure while materializing a node."""


class SchemaChangeError(ExecutionError):
    """on_schema_change='fail' tripped
    (ref: tests/functional/adapter/incremental/test_incremental_on_schema_change.py)."""


class ContractError(ExecutionError):
    """Model contract (enforced schema) violated
    (ref: core/dbt/contracts/graph/nodes.py:589-612)."""
