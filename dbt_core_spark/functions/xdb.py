"""Cross-database SQL macro surface, rendered to Spark SQL.

The reference delegates these to the dbt-adapters global project; their
observable semantics are pinned by one fixture+test pair per macro under
/root/reference/tests/functional/adapter/utils/ (e.g. test_dateadd.py,
test_listagg.py).  Here each macro is a Python function returning a Spark
SQL expression string — available inside model Jinja as ``dbt.<name>(...)``
and importable for DataFrame-side use.

Everything maps to *built-in* Spark SQL functions: JVM-side, codegen'd,
no UDFs — so the whole surface stays inside WholeStageCodegen at 100 TB.
"""

from __future__ import annotations

from typing import Optional, Sequence


# --- string functions ------------------------------------------------------

def concat(fields: Sequence[str]) -> str:
    """ref: tests/functional/adapter/utils/test_concat.py"""
    return f"concat({', '.join(fields)})"


def length(expr: str) -> str:
    """ref: utils/test_length.py"""
    return f"length({expr})"


def position(substring: str, string: str) -> str:
    """1-based index, 0 if absent (ref: utils/test_position.py)."""
    return f"position({substring} in {string})"


def replace(expr: str, pattern: str, replacement: str) -> str:
    """ref: utils/test_replace.py"""
    return f"replace({expr}, {pattern}, {replacement})"


def right(expr: str, n: str | int) -> str:
    """Rightmost n chars; empty string for n=0 (ref: utils/test_right.py)."""
    return f"case when {n} = 0 then '' else right({expr}, {n}) end"


def split_part(expr: str, delimiter: str, part: str | int) -> str:
    """1-based field extraction (ref: utils/test_split_part.py)."""
    return f"split_part({expr}, {delimiter}, {part})"


def escape_single_quotes(value: str) -> str:
    """ref: utils/test_escape_single_quotes.py"""
    return value.replace("'", "\\'")


def string_literal(value: str) -> str:
    """ref: utils/test_string_literal.py"""
    return f"'{value}'"


# --- date/time functions ---------------------------------------------------

def dateadd(datepart: str, interval: str | int, from_expr: str) -> str:
    """ref: utils/test_dateadd.py — Spark: timestampadd."""
    return f"timestampadd({datepart}, {interval}, {from_expr})"


def datediff(first: str, second: str, datepart: str) -> str:
    """Boundary-crossing count like dbt's datediff
    (ref: utils/test_datediff.py) — Spark: timestampdiff counts *complete*
    periods, so truncate both endpoints first to count boundary crossings."""
    dp = datepart.lower()
    if dp in ("day", "week", "month", "quarter", "year"):
        return f"timestampdiff({dp}, date_trunc('{dp}', {first}), date_trunc('{dp}', {second}))"
    return f"timestampdiff({dp}, date_trunc('{dp}', {first}), date_trunc('{dp}', {second}))"


def date_trunc(datepart: str, expr: str) -> str:
    """ref: utils/test_date_trunc.py"""
    return f"date_trunc('{datepart}', {expr})"


def last_day(expr: str, datepart: str = "month") -> str:
    """ref: utils/test_last_day.py"""
    if datepart.lower() == "month":
        return f"last_day({expr})"
    # generic: advance one part then truncate back minus one day
    return f"date_add(date_trunc('{datepart}', timestampadd({datepart}, 1, {expr})), -1)"


def current_timestamp() -> str:
    """ref: utils/test_current_timestamp.py"""
    return "current_timestamp()"


def date_spine(datepart: str, start_date: str, end_date: str) -> str:
    """Row-per-period between [start, end) — ref: utils/test_date_spine.py.
    Spark: sequence + explode keeps it fully JVM-side; at scale prefer
    ``spark.range`` + timestampadd to avoid one giant array."""
    return (
        f"select explode(sequence(cast({start_date} as timestamp), "
        f"timestampadd({datepart}, -1, cast({end_date} as timestamp)), "
        f"interval 1 {datepart})) as date_{datepart}"
    )


def generate_series(upper_bound: int) -> str:
    """1..n inclusive (ref: utils/test_generate_series.py)."""
    return f"select explode(sequence(1, {upper_bound})) as generated_number"


def get_intervals_between(start_date: str, end_date: str, datepart: str) -> str:
    """ref: utils/test_get_intervals_between.py"""
    return f"timestampdiff({datepart}, {start_date}, {end_date})"


def get_powers_of_two(upper_bound: str | int) -> str:
    """ceil(log2(n)) via bit-length arithmetic — no float log, so the
    result is exact at powers of two (ref: utils/test_get_powers_of_two.py)."""
    n = upper_bound
    return f"case when {n} <= 1 then 0 else length(bin({n} - 1)) end"


# --- aggregate / conditional ----------------------------------------------

def any_value(expr: str) -> str:
    """ref: utils/test_any_value.py"""
    return f"any_value({expr})"


def bool_or(expr: str) -> str:
    """ref: utils/test_bool_or.py"""
    return f"bool_or({expr})"


def listagg(
    measure: str,
    delimiter: str = "','",
    order_by: Optional[str] = None,
    limit: Optional[int] = None,
) -> str:
    """Ordered, optionally limited string agg (ref: utils/test_listagg.py).

    Spark's listagg/string_agg (4.x) lacks a limit clause, so compose:
    collect_list(struct(order, measure)) → array_sort → slice → transform
    → array_join.  Stays in the JVM; one shuffle (the group-by's own).
    """
    ord_expr = order_by if order_by else measure
    arr = f"array_sort(collect_list(struct({ord_expr} as _o, {measure} as _m)))"
    if limit:
        arr = f"slice({arr}, 1, {limit})"
    return f"array_join(transform({arr}, x -> cast(x._m as string)), {delimiter})"


def hash(field: str) -> str:
    """md5 of the stringified value (ref: utils/test_hash.py)."""
    return f"md5(cast({field} as string))"


# --- casts / comparisons ---------------------------------------------------

def cast(field: str, type_: str) -> str:
    return f"cast({field} as {type_})"


def safe_cast(field: str, type_: str) -> str:
    """NULL on failure (ref: utils/test_safe_cast.py) — Spark: try_cast."""
    return f"try_cast({field} as {type_})"


def cast_bool_to_text(field: str) -> str:
    """ref: utils/test_cast_bool_to_text.py"""
    return f"cast({field} as string)"


def equals(a: str, b: str) -> str:
    """Null-safe equality (ref: utils/test_equals.py, fixture_null_compare.py)."""
    return f"{a} <=> {b}"


# --- arrays ---------------------------------------------------------------

def array_append(arr: str, new_element: str) -> str:
    """ref: utils/test_array_append.py"""
    return f"array_append({arr}, {new_element})"


def array_concat(a: str, b: str) -> str:
    """ref: utils/test_array_concat.py"""
    return f"concat({a}, {b})"


def array_construct(elements: Sequence[str], data_type: str = "int") -> str:
    """ref: utils/test_array_construct.py"""
    if not elements:
        return f"array()"
    return f"array({', '.join(str(e) for e in elements)})"


# --- type name macros (ref: utils/data_types/test_type_*.py) ---------------

def type_bigint() -> str:
    return "bigint"


def type_boolean() -> str:
    return "boolean"


def type_float() -> str:
    return "double"


def type_int() -> str:
    return "int"


def type_numeric(precision: int = 28, scale: int = 6) -> str:
    return f"decimal({precision}, {scale})"


def type_string() -> str:
    return "string"


def type_timestamp() -> str:
    return "timestamp"


# registry used by the Jinja context's `dbt` namespace
ALL = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and not name.startswith("_") and name not in ("Optional", "Sequence")
}
