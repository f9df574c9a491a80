"""Round-9 property tests, third batch: the graph tail the sixth driver
rotation gated — landmark harmonic centrality, min-plus cheapest paths,
rich-club profiles, and the Newman weighted projection — each checked
against a pure-Python reference on bounded random graphs.

Same conventions as test_property_round8.py: bounded examples, shared
session, driver-side references.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import graph


def _edges_strategy(max_node=7, max_edges=14):
    pair = st.tuples(
        st.integers(min_value=0, max_value=max_node),
        st.integers(min_value=0, max_value=max_node),
    )
    return st.lists(pair, min_size=1, max_size=max_edges)


def _norm(pairs):
    out = set()
    for a, b in pairs:
        if a != b:
            out.add((min(a, b), max(a, b)))
    return out


def _adj(und):
    nbrs = {}
    for u, v in und:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    return nbrs


def _bfs_dists(nbrs, src, max_hops):
    dist = {src: 0}
    frontier = [src]
    for h in range(1, max_hops + 1):
        nxt = []
        for n in frontier:
            for m in nbrs.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.append(m)
        frontier = nxt
        if not frontier:
            break
    return dist


@settings(max_examples=10, deadline=None)
@given(pairs=_edges_strategy(), lms=st.sets(st.integers(0, 7), min_size=1, max_size=3))
def test_landmark_harmonic_matches_reference(spark, pairs, lms):
    und = _norm(pairs)
    if not und:
        return
    edges = spark.createDataFrame(sorted(und), "src long, dst long")
    landmarks = spark.createDataFrame([(l,) for l in sorted(lms)], "node long")
    got = {
        r["node"]: (r["n_landmarks"], r["harmonic_micro"])
        for r in graph.landmark_harmonic(edges, landmarks, max_hops=3).collect()
    }
    nbrs = _adj(und)
    want = {}
    for lm in lms:
        for node, d in _bfs_dists(nbrs, lm, 3).items():
            if d >= 1:
                n, s = want.get(node, (0, 0))
                want[node] = (n + 1, s + 1_000_000 // d)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    wedges=st.lists(
        st.tuples(
            st.integers(0, 6),
            st.integers(0, 6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    seeds=st.sets(st.integers(0, 6), min_size=1, max_size=2),
)
def test_cheapest_paths_matches_hop_capped_bellman_ford(spark, wedges, seeds):
    ed = [(u, v, w) for u, v, w in wedges if u != v]
    if not ed:
        return
    edges = spark.createDataFrame(ed, "src long, dst long, w long")
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in graph.cheapest_paths(edges, sdf, "w", max_hops=3).collect()
    }
    # reference: min-plus relaxation, <= 3 edges, symmetrized min-weight
    adj = {}
    for u, v, w in ed:
        for a, b in ((u, v), (v, u)):
            adj[(a, b)] = min(adj.get((a, b), w), w)
    cost = {s: 0 for s in seeds}
    for _ in range(3):
        nxt = dict(cost)
        for (a, b), w in adj.items():
            if a in cost and cost[a] + w < nxt.get(b, float("inf")):
                nxt[b] = cost[a] + w
        cost = nxt
    assert got == cost


@settings(max_examples=10, deadline=None)
@given(pairs=_edges_strategy())
def test_rich_club_matches_reference(spark, pairs):
    und = _norm(pairs)
    if not und:
        return
    edges = spark.createDataFrame(sorted(und), "src long, dst long")
    ks = [0, 1, 2, 3]
    got = {
        r["k"]: (r["n_rich_nodes"], r["n_rich_edges"], r["phi"])
        for r in graph.rich_club(edges, ks).collect()
    }
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    for k in ks:
        rich = {n for n, d in deg.items() if d > k}
        ek = sum(1 for u, v in und if u in rich and v in rich)
        nk = len(rich)
        phi = round(2.0 * ek / (nk * (nk - 1.0)), 6) if nk >= 2 else 0.0
        assert got[k] == (nk, ek, phi)


@settings(max_examples=10, deadline=None)
@given(
    baskets=st.dictionaries(
        st.integers(0, 4),
        st.sets(st.integers(0, 6), min_size=1, max_size=5),
        min_size=1,
        max_size=5,
    )
)
def test_newman_projection_matches_reference(spark, baskets):
    rows = [(k, p) for k, items in baskets.items() for p in items]
    df = spark.createDataFrame(rows, "k long, p long")
    got = {
        (r["u"], r["v"]): (r["n_baskets"], r["weight_micro"])
        for r in graph.newman_weighted_projection(df, "k", "p").collect()
    }
    want = {}
    for items in baskets.values():
        d = len(items)
        if d < 2:
            continue
        w = 1_000_000 // (d - 1)
        s = sorted(items)
        for i, u in enumerate(s):
            for v in s[i + 1 :]:
                n, tot = want.get((u, v), (0, 0))
                want[(u, v)] = (n + 1, tot + w)
    assert got == want
