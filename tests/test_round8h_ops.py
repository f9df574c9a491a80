"""Unit/property tests for the round-8 eighth batch: rich-club
coefficient, equi-depth range-partition planning, sweep-line peak
concurrency, and weighted median — each vs a sequential reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.graph import rich_club
from datapipelines_essentials_python_spark.operators.relational import (
    peak_concurrency,
    range_partition_plan,
    weighted_median,
)


# ------------------------------------------------- rich club


def test_rich_club_clique_plus_leaves(spark):
    """K4 core (degrees >= 3) with a pendant leaf on each core node
    (core degrees become 4, leaves 1): at k=2 the club is exactly the
    K4 -> phi = 1.0; at k=4 nobody qualifies -> 0.0."""
    core = [(a, b) for a in range(4) for b in range(4) if a < b]
    leaves = [(i, 10 + i) for i in range(4)]
    df = spark.createDataFrame(core + leaves, "src long, dst long")
    got = {r["k"]: r for r in rich_club(df, [2, 4]).collect()}
    assert got[2]["n_rich_nodes"] == 4
    assert got[2]["n_rich_edges"] == 6
    assert got[2]["phi"] == 1.0
    assert got[4]["n_rich_nodes"] == 0
    assert got[4]["phi"] == 0.0


def test_rich_club_star_has_no_club(spark):
    """A star: the hub has degree n but zero edges among {hub} alone
    (n_rich_nodes = 1 -> guarded 0.0, not NaN)."""
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src long, dst long"
    )
    got = {r["k"]: r for r in rich_club(df, [3]).collect()}
    assert got[3]["n_rich_nodes"] == 1
    assert got[3]["n_rich_edges"] == 0
    assert got[3]["phi"] == 0.0


def test_rich_club_rejects_empty_k(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        rich_club(df, [])


# ------------------------------------------------- range partition


def test_range_partition_exact_quarters(spark):
    """Keys 1..100 one row each, 4 partitions: boundaries at 25/50/75
    with exact cumulative counts."""
    df = spark.createDataFrame([(k,) for k in range(1, 101)], "key long")
    got = {r["bucket"]: r for r in
           range_partition_plan(df, "key", 4).collect()}
    assert len(got) == 3
    for i in (1, 2, 3):
        assert got[i]["target_rows"] == 25 * i
        assert got[i]["boundary_key"] == 25 * i
        assert got[i]["rows_at_or_below"] == 25 * i


def test_range_partition_skewed_key(spark):
    """One key holds 90 of 100 rows: every boundary collapses onto the
    hot key and the realized counts EXPOSE the skew (rows_at_or_below
    jumps to 95, far past the 25/50/75 targets)."""
    rows = [(5,)] * 90 + [(k,) for k in range(10, 20)]
    df = spark.createDataFrame(rows, "key long")
    got = {r["bucket"]: r for r in
           range_partition_plan(df, "key", 4).collect()}
    assert got[1]["boundary_key"] == 5
    assert got[2]["boundary_key"] == 5
    assert got[3]["boundary_key"] == 5
    assert got[1]["rows_at_or_below"] == 90
    assert got[1]["target_rows"] == 25


def test_range_partition_rejects_p1(spark):
    df = spark.createDataFrame([(1,)], "key long")
    with pytest.raises(ValueError):
        range_partition_plan(df, "key", 1)


# ------------------------------------------------- peak concurrency


def test_peak_concurrency_staircase(spark):
    """Intervals [0,10], [2,8], [4,6]: live hits 3 at t=4 (earliest)."""
    rows = [("g", 0, 10), ("g", 2, 8), ("g", 4, 6)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    r = peak_concurrency(df, "g", "s", "e").collect()[0]
    assert r["n_intervals"] == 3
    assert r["peak_concurrent"] == 3
    assert r["peak_at_us"] == 4


def test_peak_concurrency_touching_counts(spark):
    """[0,5] and [5,9]: +1 sorts before -1 at t=5, so touching
    intervals are concurrent -> peak 2 at t=5."""
    rows = [("g", 0, 5), ("g", 5, 9)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    r = peak_concurrency(df, "g", "s", "e").collect()[0]
    assert r["peak_concurrent"] == 2
    assert r["peak_at_us"] == 5


def test_peak_concurrency_matches_sequential_sweep(spark):
    """Deterministic pseudo-random intervals vs a pure-Python sweep
    with the same (t asc, +1-before--1) order."""
    iv = [((i * 37) % 50, (i * 37) % 50 + 1 + (i * 11) % 20)
          for i in range(40)]
    rows = [("g", s, e) for s, e in iv]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    events = sorted(
        [(s, -1) for s, _ in iv] + [(e, 1) for _, e in iv],
        key=lambda p: (p[0], p[1]),
    )  # delta stored negated so +1 sorts first at equal t
    live = peak = 0
    peak_at = None
    for t, nd in events:
        live += -nd
        if live > peak:
            peak, peak_at = live, t
    r = peak_concurrency(df, "g", "s", "e").collect()[0]
    assert r["peak_concurrent"] == peak
    assert r["peak_at_us"] == peak_at


def test_peak_concurrency_groups_isolated(spark):
    rows = [("a", 0, 10), ("a", 1, 9), ("b", 0, 1)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = {r["group"]: r for r in
           peak_concurrency(df, "g", "s", "e").collect()}
    assert got["a"]["peak_concurrent"] == 2
    assert got["b"]["peak_concurrent"] == 1


# ------------------------------------------------- weighted median


def test_weighted_median_volume_shifts_center(spark):
    """Values 1..5 weight 1 except value 5 with weight 10: the plain
    median is 3 but half the WEIGHT sits at 5."""
    rows = [("g", v, 1) for v in range(1, 5)] + [("g", 5, 10)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = weighted_median(df, "g", "v", "w").collect()[0]
    assert r["total_weight"] == 14
    assert r["weighted_median"] == 5


def test_weighted_median_lower_convention(spark):
    """Even split 2|2: the LOWER value wins (2*cum >= total at the
    first value)."""
    rows = [("g", 10, 2), ("g", 20, 2)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = weighted_median(df, "g", "v", "w").collect()[0]
    assert r["weighted_median"] == 10


def test_weighted_median_matches_sequential(spark):
    vals = [((i * 13) % 30, (i * 7) % 5 + 1) for i in range(50)]
    rows = [("g", v, w) for v, w in vals]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    total = sum(w for _, w in vals)
    agg = {}
    for v, w in vals:
        agg[v] = agg.get(v, 0) + w
    cum = 0
    expected = None
    for v in sorted(agg):
        cum += agg[v]
        if 2 * cum >= total:
            expected = v
            break
    r = weighted_median(df, "g", "v", "w").collect()[0]
    assert r["weighted_median"] == expected
    assert r["total_weight"] == total
