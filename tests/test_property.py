"""Property-based tests (hypothesis) — the working replacement for the
reference's broken MockupData randomized-testing intent (SURVEY §5).

Each property runs a bounded number of examples against one shared Spark
session; examples are batched into single DataFrames where possible so a
property costs O(1) Spark jobs, not O(examples).
"""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.expr.filter_dsl import compile_filter
from datapipelines_essentials_python_spark.functions.durations import (
    iso_duration_to_seconds,
    seconds_to_iso_duration,
)
from datapipelines_essentials_python_spark.operators.sampling import hash_fraction

_SECONDS = st.one_of(
    st.integers(min_value=0, max_value=10**6),
    st.floats(min_value=0, max_value=10**6, allow_nan=False, allow_infinity=False),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_SECONDS, min_size=1, max_size=30))
def test_iso_duration_roundtrip(spark, values):
    """format → parse recovers the seconds (to microsecond precision,
    matching the golden output's 6-decimal format)."""
    df = spark.createDataFrame([(float(v),) for v in values], "secs double")
    out = df.select(
        "secs",
        iso_duration_to_seconds(seconds_to_iso_duration(F.col("secs"))).alias("rt"),
    ).collect()
    for r in out:
        assert math.isclose(
            round(r["secs"], 6), r["rt"], rel_tol=0, abs_tol=1e-6
        ), (r["secs"], r["rt"])


_CMP_VALUES = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=20, deadline=None)
@given(
    op=st.sampled_from(["eq", "ne", "gt", "lt", "gte", "lte"]),
    pivot=_CMP_VALUES,
    data=st.lists(_CMP_VALUES, min_size=1, max_size=50),
)
def test_filter_dsl_matches_python_semantics(spark, op, pivot, data):
    """The compiled DSL predicate selects exactly the rows Python would."""
    py_ops = {
        "eq": lambda a: a == pivot,
        "ne": lambda a: a != pivot,
        "gt": lambda a: a > pivot,
        "lt": lambda a: a < pivot,
        "gte": lambda a: a >= pivot,
        "lte": lambda a: a <= pivot,
    }
    df = spark.createDataFrame([(i, v) for i, v in enumerate(data)], "i long, v long")
    got = sorted(
        r["i"] for r in df.where(compile_filter("v", f"{op}({pivot})")).collect()
    )
    want = sorted(i for i, v in enumerate(data) if py_ops[op](v))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    frac=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    salt=st.text(alphabet="abcxyz", max_size=5),
)
def test_hash_fraction_deterministic_and_bounded(spark, frac, salt):
    """hash_fraction is stable across evaluations and uniform on [0, 1);
    the same (id, salt) always lands on the same side of any threshold."""
    df = spark.range(0, 200).withColumn("h", hash_fraction("id", salt))
    rows = {r["id"]: r["h"] for r in df.collect()}
    rows2 = {r["id"]: r["h"] for r in df.collect()}
    assert rows == rows2
    assert all(0.0 <= h < 1.0 for h in rows.values())
    kept = {i for i, h in rows.items() if h < frac}
    kept2 = {
        r["id"]
        for r in df.where(hash_fraction("id", salt) < frac).collect()
    }
    assert kept == kept2
