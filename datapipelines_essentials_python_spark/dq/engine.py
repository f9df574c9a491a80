"""Single-pass DQ rule execution.

Capability parity (SURVEY.md §2.11 Q1-Q4): reference ``data_quality.py``
runs each rule as its own Spark action — Q1 unique (``:50-68``), Q2 not-null
(``:70-87``), Q3 arbitrary-SQL (``:89-108``), orchestration + HTML
(``:110-223``) — plus an extra ``df.count()`` (``:127``): N rules ⇒ N+1 full
scans.

Here all not-null rules and the total count are fused into ONE conditional
aggregation pass (``F.sum(F.when(pred, 1))`` — the fix SURVEY §2.11 calls
for), and each unique rule is one groupBy-count action. At 100 TB that turns
N+1 scans into 1 + #unique_rules (+ user queries, which are arbitrary SQL
and can't be fused safely).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.dq.rules import DQConfig, Rule, RuleResult
from datapipelines_essentials_python_spark.functions.nulls import is_null_or_blank


def _not_null_violation_pred(columns: tuple[str, ...]):
    """Reference semantics (data_quality.py:70-87): a row violates when ANY
    listed column is NULL or blank (ORed)."""
    return reduce(lambda a, b: a | b, [is_null_or_blank(c) for c in columns])


def execute_rules(
    spark: SparkSession, df: DataFrame, config: DQConfig
) -> tuple[bool, list[RuleResult]]:
    """Run all rules; returns (all_passed, per-rule results)."""
    results: list[RuleResult] = []

    # ---- fused pass: total count + every not-null rule -------------------
    not_null_rules = [r for r in config.rules if r.rule_type.lower() == "not null"]
    aggs = [F.count(F.lit(1)).alias("__total")]
    for r in not_null_rules:
        aggs.append(
            F.sum(F.when(_not_null_violation_pred(r.columns), 1).otherwise(0)).alias(
                f"__nn_{r.rule_id}"
            )
        )
    fused = df.agg(*aggs).collect()[0]
    total = int(fused["__total"])
    for r in not_null_rules:
        violations = int(fused[f"__nn_{r.rule_id}"] or 0)
        results.append(
            RuleResult(
                rule_id=r.rule_id,
                name=r.name,
                rule_type=r.rule_type,
                passed=violations == 0,
                violation_count=violations,
                total_count=total,
                detail=f"columns={list(r.columns)}",
            )
        )

    # ---- unique rules: one aggregated action each ------------------------
    for r in config.rules:
        if r.rule_type.lower() != "unique":
            continue
        dup_row = (
            df.groupBy(*r.columns)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > 1)
            .agg(
                F.count(F.lit(1)).alias("dup_keys"),
                F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("dup_rows"),
            )
            .collect()[0]
        )
        violations = int(dup_row["dup_rows"])
        results.append(
            RuleResult(
                rule_id=r.rule_id,
                name=r.name,
                rule_type=r.rule_type,
                passed=violations == 0,
                violation_count=violations,
                total_count=total,
                detail=f"duplicate keys={int(dup_row['dup_keys'])} over columns={list(r.columns)}",
            )
        )

    # ---- query rules: arbitrary SQL against view `temp` ------------------
    query_rules = [r for r in config.rules if r.rule_type.lower() == "query"]
    if query_rules:
        df.createOrReplaceTempView("temp")
        for r in query_rules:
            violations = spark.sql(r.query).count()
            results.append(
                RuleResult(
                    rule_id=r.rule_id,
                    name=r.name,
                    rule_type=r.rule_type,
                    passed=violations == 0,
                    violation_count=violations,
                    total_count=total,
                    detail="nonzero rows from rule query = violations",
                )
            )

    ordered = {r.rule_id: next(res for res in results if res.rule_id == r.rule_id) for r in config.rules}
    results = list(ordered.values())
    return all(r.passed for r in results), results


def file_completeness(
    df: DataFrame, expected_files: list[str]
) -> DataFrame:
    """Missing-input-file check — the reference's rule 1013 anti-join shape
    (``conf/data-quality/rules/production_configs/recipe-task1-dq-rules.json``):
    every expected file name that no scanned row reports via
    ``input_file_name()`` is a violation row.

    Returns ``(missing_file)``. Scale shape: the distinct file-name side
    collapses to one row per input file at the scan (map-side partial
    aggregation over a name-only projection); the expected list is a tiny
    local relation, so the anti-join broadcasts. Zero rows = rule passes.
    """
    spark = df.sparkSession
    decoded = F.url_decode(F.regexp_replace(F.input_file_name(), r"\+", "%2B"))
    seen = df.select(
        F.element_at(F.split(decoded, "/"), -1).alias("missing_file")
    ).distinct()
    expected = spark.createDataFrame(
        [(name,) for name in expected_files], "missing_file string"
    )
    return expected.join(seen, "missing_file", "left_anti")


def dq_summary_df(spark: SparkSession, results: list[RuleResult]) -> DataFrame:
    """Rule results as a DataFrame (for sinks/reporting)."""
    rows = [
        (r.rule_id, r.name, r.rule_type, r.passed, r.violation_count, r.total_count, r.detail)
        for r in results
    ]
    return spark.createDataFrame(
        rows,
        "rule_id string, name string, rule_type string, passed boolean, "
        "violation_count long, total_count long, detail string",
    )


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass column profile: total rows + per-column null and distinct
    counts, returned long-format ``(n_rows, col_name, n_nulls,
    n_distinct)`` — one row per profiled column.

    The whole profile is a SINGLE aggregation over one scan (2·N aggregate
    expressions, partial map-side); the long-format pivot is a ``stack``
    over the one-row result, so cost is one pass regardless of how many
    columns are profiled. The standard first look at an unknown 100 TB
    table before writing DQ rules against it.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"__nl_{c}"))
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{c}', __nl_{c}, __nd_{c}" for c in columns)
    return row.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(columns)}, {pairs}) AS (col_name, n_nulls, n_distinct)"
        ),
    )


def fd_violations(
    df: DataFrame,
    dependencies: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency violation profile: for each candidate
    ``A → B``, how many A-values map to MORE than one distinct B — the
    schema-inference / data-contract check behind "is this column a
    lookup of that one?" (order → customer, zip → city, code → label).
    Zero violating keys means the dependency HOLDS on this data.

    One pass per dependency, each a (A)-keyed count-distinct with
    map-side partials (state bounded by |distinct A|), folded into one
    dependency-cardinality summary — rule count never multiplies scans
    of anything corpus-sized beyond the keyed aggs themselves.

    → ``(determinant, dependent, n_keys, n_violating_keys, max_images)``
    per dependency: distinct A count, A-values with ≥ 2 images, and the
    worst key's image count.
    """
    if not dependencies:
        raise ValueError("fd_violations needs at least one (A, B) pair")
    outs = []
    for a, b in dependencies:
        images = df.groupBy(F.col(a).alias("__k")).agg(
            F.countDistinct(F.col(b)).cast("long").alias("__imgs")
        )
        outs.append(
            images.agg(
                F.lit(a).alias("determinant"),
                F.lit(b).alias("dependent"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("__imgs") > 1).cast("long"))
                .cast("long")
                .alias("n_violating_keys"),
                F.max("__imgs").alias("max_images"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
