"""Unit tests: run one model's SQL against mocked inputs.

ref: definitions artifacts/resources/v1/unit_test_definition.py:25-77
(given fixtures in csv/dict/sql formats); loader parser/unit_tests.py:43-245
(each input becomes an ephemeral node replacing the real ref/source);
execution + diff task/test.py:206-282; pinned by
tests/functional/unit_testing/ (15 files).

Spark-native approach: each ``given`` fixture becomes a temp view whose
name replaces the model's ref()/source() relations at compile time; the
model SQL runs against those; actual vs ``expect`` rows compare
order-insensitively via exceptAll both ways (the daff-diff analog).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Optional

from pyspark.sql import Row, SparkSession

from dbt_core_spark.exceptions import ExecutionError
from dbt_core_spark.plans.compiler import compile_node
from dbt_core_spark.plans.nodes import Manifest, Node

if TYPE_CHECKING:  # pragma: no cover
    pass


@dataclass
class UnitTestResult:
    name: str
    status: str  # pass | fail | error
    actual_rows: list = field(default_factory=list)
    missing_rows: list = field(default_factory=list)  # expected but absent
    unexpected_rows: list = field(default_factory=list)  # present but not expected
    message: str = ""


def render_unit_diff(
    columns: list[str],
    matched: list[tuple],
    missing: list[tuple],
    unexpected: list[tuple],
    max_rows: int = 20,
) -> str:
    """daff-style aligned row diff for failed unit tests (ref:
    task/test.py:264-282 _render_daff_diff): one column-aligned table,
    '' = row in both, '+' = actual-only (unexpected), '-' = expected-only
    (missing)."""
    marked = (
        [("", r) for r in matched[:max_rows]]
        + [("-", r) for r in missing[:max_rows]]
        + [("+", r) for r in unexpected[:max_rows]]
    )
    header = ["", *columns]
    rows = [[m, *("NULL" if v is None else str(v) for v in r)] for m, r in marked]
    widths = [
        max(len(header[i]), *(len(r[i]) for r in rows)) if rows else len(header[i])
        for i in range(len(header))
    ]

    def line(cells: list[str]) -> str:
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"

    out = ["actual differs from expected:", "", line(header),
           line(["-" * w for w in widths])]
    out += [line(r) for r in rows]
    trunc = max(0, len(missing) - max_rows) + max(0, len(unexpected) - max_rows)
    if trunc:
        out.append(f"... {trunc} more differing row(s)")
    return "\n".join(out)


def _rows_to_view(spark: SparkSession, rows: list[dict], like: Optional[str],
                  name: str) -> None:
    """Build a temp view from fixture rows.  If ``like`` names an existing
    relation, absent columns are filled with NULLs of the right type
    (ref: 'partial' unit-test input format)."""
    if like and spark.catalog.tableExists(like):
        schema = spark.table(like).schema
        norm = []
        for r in rows:
            norm.append({f.name: r.get(f.name) for f in schema.fields})
        df = spark.createDataFrame([Row(**r) for r in norm], schema=schema)
    else:
        df = spark.createDataFrame([Row(**r) for r in rows])
    df.createOrReplaceTempView(name)


def run_unit_test(
    spark: SparkSession,
    manifest: Manifest,
    test_name: str,
    model_name: str,
    given: dict[str, list[dict]],
    expect: list[dict],
    relations: Optional[dict[str, str]] = None,
    cli_vars: Optional[dict[str, Any]] = None,
    overrides: Optional[dict[str, Any]] = None,
) -> UnitTestResult:
    """``given`` maps a ref name ('model_a') or source ('src.tbl') to
    fixture rows; ``expect`` is the expected output rows.

    ``overrides`` mocks compile-time context for the test only
    (ref: UnitTestOverrides unit_test_definition.py:25-43; pinned by
    tests/functional/unit_testing/ override cases):
    ``{"vars": {...}, "env_vars": {...}, "macros": {name: literal}}`` —
    macro overrides shadow project macros with a literal-returning stub.
    """
    model = manifest.resolve_ref(model_name)
    if model is None:
        raise ExecutionError(f"unit test {test_name}: model '{model_name}' not found")

    ov = overrides or {}
    compile_vars = dict(cli_vars or {})
    compile_vars.update(ov.get("vars") or {})

    suffix = uuid.uuid4().hex[:8]
    mock_relations: dict[str, str] = dict(relations or {})
    for input_name, rows in given.items():
        view = f"__ut_{suffix}_{input_name.replace('.', '_')}"
        if "." in input_name:
            source_name, table_name = input_name.split(".", 1)
            target = manifest.resolve_source(source_name, table_name)
        else:
            target = manifest.resolve_ref(input_name)
        if target is None:
            raise ExecutionError(
                f"unit test {test_name}: input '{input_name}' not in manifest"
            )
        like = mock_relations.get(target.unique_id) or target.relation_name
        _rows_to_view(spark, rows, like, view)
        mock_relations[target.unique_id] = view

    import os

    old_macros = manifest.macros
    macro_stubs = {
        f"__ut_override_{i}": (
            # touching varargs/kwargs in the body lets the stub absorb
            # any call arity (Jinja only collects extra args for macros
            # that reference them) — overrides must mock macros however
            # the model calls them
            "{%% macro %s() %%}{%% if varargs or kwargs %%}{%% endif %%}"
            "%s{%% endmacro %%}" % (name, val)
        )
        for i, (name, val) in enumerate((ov.get("macros") or {}).items())
    }
    env_patch = ov.get("env_vars") or {}
    saved_env = {k: os.environ.get(k) for k in env_patch}
    try:
        if macro_stubs:
            # stubs FIRST: macro compilation is first-definition-wins
            # (locality setdefault in functions/context.render)
            manifest.macros = {**macro_stubs, **old_macros}
        os.environ.update({k: str(v) for k, v in env_patch.items()})
        sql = compile_node(manifest, model, spark, mock_relations,
                           cli_vars=compile_vars)
        actual = spark.sql(sql)
        expected = spark.createDataFrame([Row(**r) for r in expect]) if expect else None
        if expected is not None:
            exp_cast = expected
            # align expected column types to actual (fixtures are untyped)
            for f in actual.schema.fields:
                if f.name in exp_cast.columns:
                    exp_cast = exp_cast.withColumn(
                        f.name, exp_cast[f.name].cast(f.dataType)
                    )
            actual_proj = actual.select(*sorted(actual.columns))
            exp_proj = exp_cast.select(*sorted(exp_cast.columns))
            missing = [tuple(r) for r in exp_proj.exceptAll(actual_proj).collect()]
            unexpected = [tuple(r) for r in actual_proj.exceptAll(exp_proj).collect()]
        else:
            missing, unexpected = [], [tuple(r) for r in actual.collect()]
        status = "pass" if not missing and not unexpected else "fail"
        cols = sorted(actual.columns)
        matched = (
            [tuple(r) for r in actual_proj.intersectAll(exp_proj).limit(20).collect()]
            if expected is not None and status == "fail" else []
        )
        return UnitTestResult(
            test_name, status,
            actual_rows=[tuple(r) for r in actual.limit(100).collect()],
            missing_rows=missing, unexpected_rows=unexpected,
            message="" if status == "pass" else render_unit_diff(
                cols, matched, missing, unexpected),
        )
    except Exception as e:
        return UnitTestResult(test_name, "error", message=f"{type(e).__name__}: {e}")
    finally:
        manifest.macros = old_macros
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        for input_name in given:
            view = f"__ut_{suffix}_{input_name.replace('.', '_')}"
            spark.catalog.dropTempView(view)
