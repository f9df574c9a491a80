"""Filter mini-DSL parser/compiler (SURVEY §2.2 P2; reference bug fixes §7.5)."""

import pytest

from datapipelines_essentials_python_spark.errors import FilterDSLError
from datapipelines_essentials_python_spark.expr.filter_dsl import (
    compile_filter,
    compile_filters,
    parse,
)


def test_parse_ops():
    assert parse("eq('Dadar')") == ("eq", ["Dadar"])
    assert parse("gt(100)") == ("gt", [100])
    assert parse("lte(3.5)") == ("lte", [3.5])
    assert parse("in(1, 2, 3)") == ("in", [1, 2, 3])
    assert parse("notin('a','b')") == ("notin", ["a", "b"])
    assert parse("between(1, 10)") == ("between", [1, 10])
    assert parse("isnull()") == ("isnull", [])


def test_notin_is_not_confused_with_in():
    # the reference's substring matcher routed notin( through 'in' handling
    op, args = parse("notin(5)")
    assert op == "notin"
    assert args == [5]


def test_quoted_commas():
    assert parse("in('a,b', 'c')") == ("in", ["a,b", "c"])


def test_errors():
    with pytest.raises(FilterDSLError):
        parse("frobnicate(1)")
    with pytest.raises(FilterDSLError):
        parse("eq")
    with pytest.raises(FilterDSLError):
        compile_filter("c", "eq(1, 2)")
    with pytest.raises(FilterDSLError):
        compile_filter("c", "in()")


def test_compile_against_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "id int, name string, val double",
    )
    assert df.where(compile_filter("name", "eq('b')")).count() == 1
    assert df.where(compile_filter("val", "gte(20)")).count() == 3
    assert df.where(compile_filter("name", "notin('a','b')")).count() == 1  # null excluded
    assert df.where(compile_filter("name", "isnull()")).count() == 1
    assert df.where(compile_filter("val", "between(15, 35)")).count() == 2
    combined = compile_filters({"val": "gt(15)", "name": "ne('c')"})
    assert df.where(combined).count() == 1
