"""Round-8 property tests: invariants of the graph-depth operators
(k-core, k-truss, Adamic-Adar, BFS) checked against driver-side
reference implementations on bounded random graphs.

Same conventions as test_property.py — bounded examples, one shared
Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import graph


def _edges_strategy(max_node=9, max_edges=20):
    pair = st.tuples(
        st.integers(min_value=0, max_value=max_node),
        st.integers(min_value=0, max_value=max_node),
    )
    return st.lists(pair, min_size=1, max_size=max_edges)


def _norm(pairs):
    """Driver-side undirected_edges: canonical (u<v), no loops, distinct."""
    out = set()
    for a, b in pairs:
        if a != b:
            out.add((min(a, b), max(a, b)))
    return out


def _py_kcore(und, k):
    und = set(und)
    while True:
        deg = {}
        for u, v in und:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        low = {n for n, d in deg.items() if d < k}
        if not low:
            return deg
        und = {(u, v) for u, v in und if u not in low and v not in low}


@settings(max_examples=10, deadline=None)
@given(pairs=_edges_strategy())
def test_kcore_fixpoint_matches_reference(spark, pairs):
    """With max_rounds ample, kcore equals the sequential peel fixpoint,
    and every survivor's in-core degree is >= k."""
    k = 2
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node"]: r["core_degree"]
        for r in graph.kcore(df, k=k, max_rounds=30).collect()
    }
    want = _py_kcore(_norm(pairs), k)
    assert got == want
    assert all(d >= k for d in got.values())


def _py_support(und):
    und = set(und)
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return {
        (u, v): len(adj[u] & adj[v])
        for u, v in und
    }


@settings(max_examples=10, deadline=None)
@given(pairs=_edges_strategy())
def test_edge_support_matches_common_neighbor_count(spark, pairs):
    """An edge's triangle support is exactly |N(u) ∩ N(v)|."""
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["support"]
        for r in graph.edge_support(df).collect()
    }
    assert got == _py_support(_norm(pairs))


@settings(max_examples=8, deadline=None)
@given(pairs=_edges_strategy(max_node=7, max_edges=14))
def test_ktruss_fixpoint_supports_hold(spark, pairs):
    """At an ample round cap the truss is the sequential fixpoint: every
    surviving edge has support >= k-2 inside the surviving subgraph, and
    the result matches the reference peel."""
    k = 3
    und = _norm(pairs)
    while True:
        sup = _py_support(und)
        kept = {e for e, s in sup.items() if s >= k - 2}
        if kept == und:
            break
        und = kept
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["support"]
        for r in graph.ktruss(df, k=k, max_rounds=30).collect()
    }
    assert got == _py_support(und)
    assert all(s >= k - 2 for s in got.values())


@settings(max_examples=10, deadline=None)
@given(pairs=_edges_strategy())
def test_adamic_adar_matches_reference(spark, pairs):
    """Scores, witness counts, pair set, and ranking all match the
    sequential definition (quantized the same way)."""
    und = _norm(pairs)
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in und:
                continue
            common = adj[u] & adj[v]
            common = {w for w in common if len(adj[w]) >= 2}
            if not common:
                continue
            aa = sum(round(1.0 / math.log(len(adj[w])), 6) for w in common)
            want[(u, v)] = (len(common), round(aa * 1e6))
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa_micro"])
        for r in graph.adamic_adar(df, top_n=1000).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    pairs=_edges_strategy(),
    seeds=st.sets(st.integers(min_value=0, max_value=9), min_size=1, max_size=3),
)
def test_bfs_matches_reference_layers(spark, pairs, seeds):
    """BFS distances equal the sequential multi-source BFS, truncated at
    the cap."""
    cap = 3
    und = _norm(pairs)
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, cap + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in want:
                    nxt.add(m)
        for m in nxt:
            want[m] = h
        frontier = nxt
    df = spark.createDataFrame(pairs, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["dist"]
        for r in graph.bfs_distances(df, sdf, max_hops=cap).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(pairs=_edges_strategy(max_node=7, max_edges=14))
def test_ktruss_endpoints_inside_kminus1_core(spark, pairs):
    """Cohen's containment theorem: every edge of the k-truss has both
    endpoints in the (k-1)-core (each truss edge carries k-2 triangles,
    so each endpoint keeps degree >= k-1 inside the truss)."""
    k = 4
    df = spark.createDataFrame(pairs, "src long, dst long")
    truss_nodes = {
        n
        for r in graph.ktruss(df, k=k, max_rounds=30).collect()
        for n in (r["u"], r["v"])
    }
    core_nodes = {
        r["node"] for r in graph.kcore(df, k=k - 1, max_rounds=30).collect()
    }
    assert truss_nodes <= core_nodes
