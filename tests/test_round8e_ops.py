"""Unit/property tests for the round-8 fifth batch: min-plus cheapest
paths, gaps-and-islands longest streaks, and the functional-dependency
violation profiler.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.dq.engine import fd_violations
from datapipelines_essentials_python_spark.operators import graph
from datapipelines_essentials_python_spark.operators.relational import (
    longest_streaks,
)


# ------------------------------------------------- cheapest paths


def test_cheapest_paths_prefers_cheap_detour(spark):
    """Direct edge 1-3 costs 10; the 2-hop detour 1-2-3 costs 2+3=5 —
    min-plus must take the detour, a plain BFS would not."""
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 3), (1, 3, 10)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in graph.cheapest_paths(edges, seeds, "w", max_hops=3).collect()
    }
    assert got == {1: 0, 2: 2, 3: 5}


def test_cheapest_paths_hop_cap_is_the_contract(spark):
    """Path 1-2-3-4 with unit weights: max_hops=2 reaches 3 (cost 2) but
    NOT 4 — the capped result is 'cheapest using <= max_hops edges'."""
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in graph.cheapest_paths(edges, seeds, "w", max_hops=2).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}


def test_cheapest_paths_multi_source_takes_min(spark):
    """Seeds {1, 5} on the path 1-2-3-4-5 (unit weights): node 3 costs 2
    from either side, node 4 costs 1 from seed 5 — per-node min over
    sources, the multi-source semantics."""
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in graph.cheapest_paths(edges, seeds, "w", max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_cheapest_paths_parallel_edges_take_min_weight(spark):
    edges = spark.createDataFrame(
        [(1, 2, 7), (2, 1, 3)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in graph.cheapest_paths(edges, seeds, "w", max_hops=1).collect()
    }
    assert got == {1: 0, 2: 3}


def test_cheapest_paths_validates_hops(spark):
    edges = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="max_hops"):
        graph.cheapest_paths(edges, seeds, "w", max_hops=0)


# ------------------------------------------------- streaks


def test_longest_streaks_islands_and_ties(spark):
    """Days {1,2,3, 7,8, 20}: three islands (3, 2, 1); a second key with
    two equal-length islands must report the EARLIEST start."""
    rows = [("a", d) for d in (1, 2, 3, 7, 8, 20)] + [
        ("b", d) for d in (5, 6, 10, 11)
    ]
    df = spark.createDataFrame(rows, "key string, day long")
    got = {
        r["key"]: (
            r["n_active_days"],
            r["n_streaks"],
            r["longest_streak"],
            r["longest_streak_start"],
        )
        for r in longest_streaks(df, "key", "day").collect()
    }
    assert got["a"] == (6, 3, 3, 1)
    assert got["b"] == (4, 2, 2, 5)  # tie -> earliest island


def test_longest_streaks_dedups_input_days(spark):
    """Duplicate (key, day) rows must not break consecutiveness."""
    df = spark.createDataFrame(
        [("k", 1), ("k", 1), ("k", 2)], "key string, day long"
    )
    row = longest_streaks(df, "key", "day").collect()[0]
    assert (row["longest_streak"], row["n_active_days"]) == (2, 2)


def test_longest_streaks_min_len_filters_islands(spark):
    df = spark.createDataFrame(
        [("k", 1), ("k", 2), ("k", 9)], "key string, day long"
    )
    row = longest_streaks(df, "key", "day", min_len=2).collect()[0]
    assert (row["n_streaks"], row["n_active_days"]) == (1, 2)


# ------------------------------------------------- FD violations


def test_fd_violations_holding_and_broken(spark):
    df = spark.createDataFrame(
        [
            (1, "x", "p"),
            (2, "x", "q"),  # a -> c broken for a=... no: b='x' -> {p,q}
            (3, "y", "p"),
        ],
        "a long, b string, c string",
    )
    out = {
        (r["determinant"], r["dependent"]): (
            r["n_keys"],
            r["n_violating_keys"],
            r["max_images"],
        )
        for r in fd_violations(df, [("a", "c"), ("b", "c")]).collect()
    }
    assert out[("a", "c")] == (3, 0, 1)  # pk -> holds
    assert out[("b", "c")] == (2, 1, 2)  # 'x' maps to {p, q}


def test_fd_violations_validates(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="at least one"):
        fd_violations(df, [])
