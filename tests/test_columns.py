"""Column hygiene + contract validation (SURVEY §2.2 P4-P8)."""

import pytest
from pyspark.sql import types as T

from datapipelines_essentials_python_spark.errors import (
    ColumnMismatchError,
    ProhibitedColumnsPresentError,
    RequiredColumnsMissingError,
    SchemaMismatchError,
)
from datapipelines_essentials_python_spark.utils.columns import (
    assert_columns_equal,
    column_to_list,
    rename_columns,
    snake_case_column_names,
    sort_columns,
    standardize_column_names,
    two_columns_to_dict,
    validate_prohibited_columns,
    validate_required_columns,
    validate_schema_subset,
)


@pytest.fixture
def df(spark):
    return spark.createDataFrame([(1, "a", 2)], "`  First Name ` int, lastName string, Zip int")


def test_standardize(df):
    assert standardize_column_names(df).columns == ["first_name", "lastname", "zip"]


def test_snake_case(spark):
    df = spark.createDataFrame([(1, 2)], "cookTime int, datePublishedV2 int")
    assert snake_case_column_names(df).columns == ["cook_time", "date_published_v2"]


def test_rename_and_sort(spark):
    df = spark.createDataFrame([(1, 2)], "b int, a int")
    assert rename_columns(df, {"b": "z"}).columns == ["z", "a"]
    assert sort_columns(df).columns == ["a", "b"]
    assert sort_columns(df, "desc").columns == ["b", "a"]


def test_validations(spark):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    validate_required_columns(df, ["id"])
    with pytest.raises(RequiredColumnsMissingError):
        validate_required_columns(df, ["missing"])
    validate_prohibited_columns(df, ["secret"])
    with pytest.raises(ProhibitedColumnsPresentError):
        validate_prohibited_columns(df, ["name"])
    validate_schema_subset(df, T.StructType([T.StructField("id", T.IntegerType())]))
    with pytest.raises(SchemaMismatchError):
        validate_schema_subset(df, T.StructType([T.StructField("id", T.LongType())]))


def test_assert_columns_equal(spark):
    ok = spark.createDataFrame([(1, 1), (None, None)], "a int, b int")
    assert_columns_equal(ok, "a", "b")  # null-safe equality
    bad = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ColumnMismatchError):
        assert_columns_equal(bad, "a", "b")


def test_driver_bridges(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert sorted(column_to_list(df, "k")) == [1, 2]
    assert two_columns_to_dict(df, "k", "v") == {1: "a", 2: "b"}
