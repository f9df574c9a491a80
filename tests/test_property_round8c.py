"""Hypothesis property tests for the continuation-session operators:
randomized inputs checked against invariants and sequential
references (the test_property_round8* discipline extended to the
sixth-through-eighteenth batches).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.relational import (
    gini_coefficient,
    kendall_tau_binned,
    peak_concurrency,
    sequence_gaps,
    spearman_corr,
    weighted_median,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=3,
        max_size=40,
    )
)
def test_spearman_bounded_and_tau_sign_agrees(spark, pairs):
    """|rho| <= 1 always; when both are decisive (|stat| > 0.2) the
    Spearman and Kendall signs agree (both measure monotone
    association)."""
    rows = [("g", float(x), float(y)) for x, y in pairs]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    rho = spearman_corr(df, "g", "x", "y").collect()[0]["spearman_rho"]
    assert -1.0 <= rho <= 1.0
    df2 = spark.createDataFrame(
        [("g", x, y) for x, y in pairs], "g string, x long, y long"
    )
    tau = kendall_tau_binned(df2, "g", "x", "y").collect()[0]["tau_b"]
    assert -1.0 <= tau <= 1.0
    if abs(rho) > 0.2 and abs(tau) > 0.2:
        assert (rho > 0) == (tau > 0)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 10_000), min_size=2, max_size=50)
)
def test_gini_bounds(spark, vals):
    """0 <= G <= (n-1)/n for non-negative values; equal values give
    exactly 0."""
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    g = gini_coefficient(df, "g", "v", "id").collect()[0]["gini"]
    n = len(vals)
    assert -1e-9 <= g <= (n - 1) / n + 1e-9
    if len(set(vals)) == 1 and vals[0] > 0:
        assert g == 0.0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 9)),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_is_a_present_value_and_balanced(spark, vw):
    """The weighted median is an input value, and the mass strictly
    below it is < half the total (the lower-median defining
    property)."""
    rows = [("g", v, w) for v, w in vw]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = weighted_median(df, "g", "v", "w").collect()[0]
    med = r["weighted_median"]
    assert med in {v for v, _ in vw}
    total = sum(w for _, w in vw)
    below = sum(w for v, w in vw if v < med)
    assert 2 * below < total


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 30)),
        min_size=1,
        max_size=30,
    )
)
def test_peak_concurrency_vs_sequential_sweep(spark, iv):
    """Peak equals the sequential sweep with the same +1-before--1
    order, and is at least the max point multiplicity."""
    intervals = [(s, s + d) for s, d in iv]
    rows = [("g", s, e) for s, e in intervals]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    r = peak_concurrency(df, "g", "s", "e").collect()[0]
    events = sorted(
        [(s, 0) for s, _ in intervals] + [(e, 1) for _, e in intervals]
    )
    live = peak = 0
    for _, kind in events:
        live += 1 if kind == 0 else -1
        peak = max(peak, live)
    assert r["peak_concurrent"] == peak
    assert r["n_intervals"] == len(intervals)


@settings(**_SETTINGS)
@given(
    st.sets(st.integers(0, 500), min_size=1, max_size=80),
    st.sampled_from([4, 16, 64, 1000]),
)
def test_sequence_gaps_partition_identity(spark, ids, bs):
    """Kept ids plus gap ranges exactly tile [min, max] — nothing
    missing, nothing double-counted — for any block size."""
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    gaps = sequence_gaps(df, "id", block_size=bs).collect()
    covered = set(ids)
    for r in gaps:
        rng = set(range(r["gap_start"], r["gap_end"] + 1))
        assert not (rng & covered), "gap overlaps an existing id"
        covered |= rng
    assert covered == set(range(min(ids), max(ids) + 1))
