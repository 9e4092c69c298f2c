"""Golden tests for the cross-database macro surface — one case per
macro, mirroring the reference's fixture+test-per-macro pattern
(ref: tests/functional/adapter/utils/fixture_*.py / test_*.py)."""

import pytest

from dbt_core_spark.functions import xdb


def run1(spark, expr: str):
    return spark.sql(f"select {expr} as v").collect()[0]["v"]


CASES = [
    # (macro call → SQL expr, input-free literal form, expected)
    (xdb.concat(["'ab'", "'cd'"]), "abcd"),
    (xdb.length("'abcdef'"), 6),
    (xdb.position("'b'", "'abc'"), 2),
    (xdb.position("'z'", "'abc'"), 0),
    (xdb.replace("'a b c'", "' '", "'_'"), "a_b_c"),
    (xdb.right("'abcdef'", 3), "def"),
    (xdb.right("'abcdef'", 0), ""),
    (xdb.split_part("'a|b|c'", "'|'", 2), "b"),
    (xdb.hash("'x'"), "9dd4e461268c8034f5c8564e155c67a6"),
    (xdb.safe_cast("'notanint'", "int"), None),
    (xdb.safe_cast("'42'", "int"), 42),
    (xdb.cast_bool_to_text("true"), "true"),
    (xdb.equals("null", "null"), True),
    (xdb.equals("1", "null"), False),
    (xdb.string_literal("hi"), "hi"),
    (xdb.get_powers_of_two(1), 0),
    (xdb.get_powers_of_two(2), 1),
    (xdb.get_powers_of_two(63), 6),
    (xdb.get_powers_of_two(64), 6),
    (xdb.get_powers_of_two(65), 7),
    (xdb.get_intervals_between("timestamp'2020-01-01'", "timestamp'2020-03-01'", "month"), 2),
    (xdb.array_construct([1, 2, 3]), [1, 2, 3]),
    (xdb.array_append(xdb.array_construct([1, 2]), 3), [1, 2, 3]),
    (xdb.array_concat(xdb.array_construct([1]), xdb.array_construct([2])), [1, 2]),
    (xdb.cast("'7'", "int"), 7),
    (xdb.type_numeric(), "decimal(28, 6)"),
]


@pytest.mark.parametrize("expr,expected", [(c[0], c[1]) for c in CASES if not isinstance(c[0], tuple)])
def test_scalar_macro(spark, expr, expected):
    if expr == "decimal(28, 6)":  # type macro: returns a DDL type name
        assert expected == "decimal(28, 6)"
        return
    assert run1(spark, expr) == expected


def test_dateadd_datediff_trunc_lastday(spark):
    assert str(run1(spark, xdb.dateadd("day", 3, "timestamp'2020-02-27 00:00:00'"))) \
        == "2020-03-01 00:00:00"
    # boundary-crossing semantics: 23:59 Dec 31 → 00:01 Jan 1 is 1 day
    assert run1(spark, xdb.datediff(
        "timestamp'2019-12-31 23:59:00'", "timestamp'2020-01-01 00:01:00'", "day")) == 1
    assert run1(spark, xdb.datediff(
        "timestamp'2020-01-01 00:00:00'", "timestamp'2020-12-31 00:00:00'", "year")) == 0
    assert str(run1(spark, xdb.date_trunc("month", "timestamp'2020-05-15 10:30:00'"))) \
        == "2020-05-01 00:00:00"
    assert str(run1(spark, xdb.last_day("timestamp'2020-02-15 00:00:00'"))) == "2020-02-29"


def test_generate_series_and_date_spine(spark):
    rows = spark.sql(xdb.generate_series(5)).collect()
    assert [r["generated_number"] for r in rows] == [1, 2, 3, 4, 5]
    spine = spark.sql(xdb.date_spine("day", "'2020-01-01'", "'2020-01-04'")).collect()
    assert len(spine) == 3  # end-exclusive
    assert str(spine[0]["date_day"]) == "2020-01-01 00:00:00"


def test_listagg_order_and_limit(spark):
    spark.sql(
        "select * from values ('b', 2), ('a', 1), ('c', 3) as t(s, o)"
    ).createOrReplaceTempView("la_in")
    expr = xdb.listagg("s", "'-'", order_by="o", limit=2)
    row = spark.sql(f"select {expr} as v from la_in").collect()[0]
    assert row["v"] == "a-b"
    expr_all = xdb.listagg("s", "','", order_by="o")
    row = spark.sql(f"select {expr_all} as v from la_in").collect()[0]
    assert row["v"] == "a,b,c"


def test_any_value_bool_or(spark):
    spark.sql("select * from values (1, true), (1, false) as t(g, b)") \
        .createOrReplaceTempView("ab_in")
    row = spark.sql(
        f"select {xdb.any_value('g')} as g, {xdb.bool_or('b')} as b from ab_in group by g"
    ).collect()[0]
    assert row["g"] == 1 and row["b"] is True


def test_escape_single_quotes():
    assert xdb.escape_single_quotes("it's") == "it\\'s"


def test_current_timestamp(spark):
    assert run1(spark, xdb.current_timestamp()) is not None


def test_type_macros():
    assert xdb.type_bigint() == "bigint"
    assert xdb.type_boolean() == "boolean"
    assert xdb.type_float() == "double"
    assert xdb.type_int() == "int"
    assert xdb.type_string() == "string"
    assert xdb.type_timestamp() == "timestamp"
