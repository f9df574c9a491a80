"""End-to-end reproduction of the reference's flagship recipe pipeline
(SURVEY §3.1): JSON → DQ → standardize → null-normalize/cast/split →
parquet → difficulty struct → groupBy avg duration → ISO text → CSV.

The reference runs this with row UDFs and a collect_list+Python average
(``recipe_tasks.py``); here the same lifecycle is pure Column expressions.
Golden formatting is asserted exactly (including the reference's
``PT7M5.086705S`` microsecond shape).
"""

import json

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.dq.engine import execute_rules
from datapipelines_essentials_python_spark.dq.rules import DQConfig, Rule
from datapipelines_essentials_python_spark.functions.datetime_fns import to_date_safe
from datapipelines_essentials_python_spark.functions.durations import (
    seconds_to_iso_duration,
    total_time_and_difficulty,
)
from datapipelines_essentials_python_spark.io.readers import read_data
from datapipelines_essentials_python_spark.io.writers import write_data
from datapipelines_essentials_python_spark.utils.columns import snake_case_column_names

RECIPES = [
    # two 'easy' recipes averaging to the reference's golden microsecond shape
    {"name": "r1", "cookTime": "PT3M", "prepTime": "PT4M5.086705S",
     "ingredients": "salt\npepper", "datePublished": "2013-01-01", "recipeYield": "4"},
    {"name": "r2", "cookTime": "PT7M5.086705S", "prepTime": "",
     "ingredients": "rice", "datePublished": "2013-02-01", "recipeYield": "2"},
    # medium: totals 1900 + 2000 → avg 1950 s
    {"name": "r3", "cookTime": "PT31M40S", "prepTime": None,
     "ingredients": "x\ny\nz", "datePublished": "2013-03-01", "recipeYield": "1"},
    {"name": "r4", "cookTime": "PT30M", "prepTime": "PT3M20S",
     "ingredients": "a", "datePublished": "", "recipeYield": ""},
    # hard: 7000 s
    {"name": "r5", "cookTime": "PT1H", "prepTime": "PT56M40S",
     "ingredients": "b\nc", "datePublished": "2013-05-01", "recipeYield": "6"},
    # duplicate name on purpose: the reference's DQ rule fails on it
    {"name": "r5", "cookTime": "PT1H", "prepTime": "PT56M40S",
     "ingredients": "b\nc", "datePublished": "2013-05-01", "recipeYield": "6"},
]


@pytest.fixture
def recipe_json(tmp_path):
    p = tmp_path / "recipes.json"
    p.write_text("\n".join(json.dumps(r) for r in RECIPES))
    return str(p)


def test_recipe_pipeline_end_to_end(spark, recipe_json, tmp_path):
    # task1: read json → DQ → standardize → normalize/cast/split → parquet
    raw = read_data(spark, "json", recipe_json)
    cfg = DQConfig(
        dq_id="recipes",
        rules=[
            Rule("1001", "name_unique", "unique", columns=("name",)),
            Rule("1002", "name_not_null", "not null", columns=("name",)),
        ],
    )
    all_passed, results = execute_rules(spark, raw, cfg)
    assert not all_passed  # duplicate r5, as in the reference suite
    assert {r.rule_id: r.passed for r in results} == {"1001": False, "1002": True}

    std = snake_case_column_names(raw)
    cleaned = std.select(
        "name",
        F.split(F.col("ingredients"), "\n").alias("ingredients"),
        to_date_safe("date_published", "yyyy-MM-dd").alias("date_published"),
        F.col("recipe_yield").try_cast("int").alias("recipe_yield"),
        "cook_time",
        "prep_time",
    )
    staged = str(tmp_path / "staged")
    write_data(cleaned, "parquet", staged, partition_by=["date_published"])
    back = read_data(spark, "parquet", staged)
    assert back.count() == 6
    assert dict(back.dtypes)["ingredients"] == "array<string>"

    # task2: difficulty struct → groupBy → native avg → ISO format → csv
    with_diff = back.withColumn(
        "ttd", total_time_and_difficulty("cook_time", "prep_time")
    )
    agg = (
        with_diff.groupBy(F.col("ttd.difficulty").alias("difficulty"))
        .agg(F.avg(F.col("ttd.total_seconds")).alias("avg_secs"))
    )
    out = agg.select(
        "difficulty", seconds_to_iso_duration("avg_secs").alias("avg_total_cooking_time")
    )
    got = {r["difficulty"]: r["avg_total_cooking_time"] for r in out.collect()}
    assert got == {
        "easy": "PT7M5.086705S",       # reference-golden microsecond shape
        "medium": "PT32M30S",
        "hard": "PT1H56M40S",
    }
    csv_out = str(tmp_path / "task2")
    write_data(out, "csv", csv_out, options={"header": True}, num_output_files=1)
    assert read_data(spark, "csv", csv_out, options={"header": True}).count() == 3
