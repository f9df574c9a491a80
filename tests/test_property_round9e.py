"""Round-9 property tests, fifth batch: Salton-cosine link prediction
and the dedup threshold-sensitivity sweep vs pure-Python references.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import dedup, graph


def _norm(pairs):
    out = set()
    for a, b in pairs:
        if a != b:
            out.add((min(a, b), max(a, b)))
    return out


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=12,
    )
)
def test_salton_cosine_matches_reference(spark, pairs):
    und = _norm(pairs)
    if not und:
        return
    edges = spark.createDataFrame(sorted(und), "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["cos_micro"])
        for r in graph.salton_cosine(edges, top_n=1000).collect()
    }
    nbrs = {}
    for u, v in und:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    want = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in und:
                continue
            cn = len(nbrs[u] & nbrs[v])
            if cn == 0:
                continue
            cos = round(cn / math.sqrt(len(nbrs[u]) * len(nbrs[v])), 6)
            want[(u, v)] = (cn, cos)
    assert set(got) == set(want)
    for k, (cn, cos) in want.items():
        assert got[k][0] == cn
        assert abs(got[k][1] - round(cos * 1e6)) <= 1


def _shingle_set(toks, n):
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _components(edges_set):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges_set:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {x: find(x) for x in parent}


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["p", "q", "r", "s"]), min_size=1, max_size=8
        ),
        min_size=2,
        max_size=5,
    )
)
def test_threshold_sweep_matches_reference_and_is_monotone(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    thresholds = [0.3, 0.6, 0.9]
    rows = {
        r["threshold"]: (
            r["n_docs_in_pairs"], r["n_clusters"], r["n_dups_removed"]
        )
        for r in dedup.threshold_sensitivity(
            df, "doc_id", "text", thresholds, n=3, unblocked=True
        ).collect()
    }
    # reference: exact jaccard over distinct 3-token shingles
    sh = {i: _shingle_set(t, 3) for i, t in enumerate(docs)}
    jac = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            jac[(a, b)] = round(
                inter / (len(sh[a]) + len(sh[b]) - inter), 6
            )
    prev_removed = None
    for t in thresholds:
        surviving = {e for e, j in jac.items() if j >= t}
        comp = _components(surviving)
        n_docs = len(comp)
        n_clusters = len(set(comp.values()))
        want = (n_docs, n_clusters, n_docs - n_clusters)
        assert rows[round(t, 6)] == want, (t, rows[round(t, 6)], want)
        # monotone: raising the threshold can only reduce removals
        if prev_removed is not None:
            assert want[2] <= prev_removed
        prev_removed = want[2]
