"""Unit tests for operators.graph — PageRank power iteration."""

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_two_node_cycle_is_stationary(spark):
    """a↔b is already the stationary distribution: every iteration keeps
    0.5 / 0.5 exactly."""
    ranks = graph.pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iterations=5)
    out = {r["node"]: r["rank"] for r in ranks.collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_pagerank_dangling_mass_redistributes(spark):
    """a→b with b dangling: after one step r(a) = 0.15/2 + 0.85·(0.5/2)
    and r(b) = 0.15/2 + 0.85·0.5 + 0.85·(0.5/2) — the dangling node's
    mass returns uniformly instead of leaking, so ranks still sum to 1."""
    edges = _edges(spark, [("a", "b")])
    ranks = graph.pagerank(edges, iterations=1)
    out = {r["node"]: r["rank"] for r in ranks.collect()}
    assert out["a"] == pytest.approx(0.075 + 0.85 * 0.25, abs=1e-6)
    assert out["b"] == pytest.approx(0.075 + 0.85 * 0.5 + 0.85 * 0.25, abs=1e-6)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_star_hub_dominates(spark):
    """Symmetric star (hub↔3 spokes): the hub outranks every spoke and
    spokes tie exactly (they are automorphic)."""
    pairs = []
    for s in ("s1", "s2", "s3"):
        pairs += [("hub", s), (s, "hub")]
    out = {r["node"]: r["rank"] for r in graph.pagerank(_edges(spark, pairs), iterations=8).collect()}
    assert out["hub"] > out["s1"]
    assert out["s1"] == out["s2"] == out["s3"]
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_matches_driver_side_reference(spark):
    """Distributed iterations equal a sequential NumPy-free reference on
    an asymmetric digraph with a dangling node, at every iteration's
    6-dp rounding."""
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "d")]
    # d is dangling (no out-edges)
    nodes = sorted({x for p in pairs for x in p})
    n = len(nodes)
    outdeg = {}
    for s, _ in pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        contrib = {v: 0.0 for v in nodes}
        for s, t in pairs:
            contrib[t] += round(r[s] / outdeg[s], 12)
        dangling = sum(round(r[v], 12) for v in nodes if v not in outdeg)
        r = {
            v: round((1.0 - 0.85) / n + 0.85 * contrib[v] + 0.85 * dangling / n, 6)
            for v in nodes
        }
    got = {
        row["node"]: row["rank"]
        for row in graph.pagerank(_edges(spark, pairs), iterations=3).collect()
    }
    assert got == pytest.approx(r, abs=2e-6)


def test_pagerank_rejects_zero_iterations(spark):
    with pytest.raises(ValueError):
        graph.pagerank(_edges(spark, [("a", "b")]), iterations=0)


def test_out_degrees_and_init(spark):
    edges = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    deg = {r["node"]: r["outdeg"] for r in graph.out_degrees(edges).collect()}
    assert deg == {"a": 2, "b": 1}
    init = graph.init_ranks(edges).collect()
    assert {r["node"] for r in init} == {"a", "b", "c"}
    assert all(r["rank"] == pytest.approx(1 / 3) for r in init)


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, w long")


def test_weighted_pagerank_uniform_weights_equal_unweighted(spark):
    """With every weight equal, the weighted share w/W is exactly
    1/outdeg, so weighted PageRank reproduces the unweighted ranks
    bit-for-bit."""
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    un = {
        r["node"]: r["rank"]
        for r in graph.pagerank(_edges(spark, pairs), iterations=3).collect()
    }
    we = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            _wedges(spark, [(s, t, 7) for s, t in pairs]),
            iterations=3,
            weight_col="w",
        ).collect()
    }
    assert un == we


def test_weighted_pagerank_follows_the_heavy_edge(spark):
    """a sends 9/10 of its mass to b and 1/10 to c → b outranks c."""
    out = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            _wedges(spark, [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]),
            iterations=6,
            weight_col="w",
        ).collect()
    }
    assert out["b"] > out["c"]
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_weighted_pagerank_zero_weight_source_is_dangling(spark):
    """A source whose edges all weigh 0 contributes like a dangling node
    (uniform redistribution), not a division by zero."""
    out = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            _wedges(spark, [("a", "b", 1), ("b", "a", 0)]),
            iterations=1,
            weight_col="w",
        ).collect()
    }
    # same shape as the unweighted dangling test: b's mass returns uniformly
    assert out["a"] == pytest.approx(0.075 + 0.85 * 0.25, abs=1e-6)
    assert out["b"] == pytest.approx(0.075 + 0.85 * 0.5 + 0.85 * 0.25, abs=1e-6)
