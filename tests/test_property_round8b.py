"""Round-8 second-batch property tests: invariants of the new
operators (neighbor Jaccard, deterministic random walks, boilerplate
segments, group MinHash) checked against driver-side reference
implementations on bounded random inputs.

Same conventions as test_property_round8.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import graph
from datapipelines_essentials_python_spark.operators.chunking import (
    boilerplate_segments,
)
from datapipelines_essentials_python_spark.operators.dedup import (
    group_minhash_similarity,
    minhash_coeffs,
    MINHASH_P,
)


def _edges_strategy(max_node=8, max_edges=16):
    pair = st.tuples(
        st.integers(min_value=0, max_value=max_node),
        st.integers(min_value=0, max_value=max_node),
    )
    return st.lists(pair, min_size=1, max_size=max_edges)


def _norm(pairs):
    out = set()
    for a, b in pairs:
        if a == b:
            continue
        out.add((min(a, b), max(a, b)))
    return out


# ---------------------------------------------------- neighbor_jaccard


def _py_neighbor_jaccard(und):
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            common = len(adj[u] & adj[v])
            if common == 0:
                continue
            jac = round(common / (len(adj[u]) + len(adj[v]) - common), 6)
            out[(u, v)] = (common, round(jac * 1e6))
    return out


@settings(max_examples=10, deadline=None)
@given(pairs=_edges_strategy())
def test_neighbor_jaccard_matches_reference(spark, pairs):
    """Uncapped top-N large enough to hold every candidate pair: the
    operator equals the sequential |N∩|/|N∪| computation, micro-scores
    included."""
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["jac_micro"])
        for r in graph.neighbor_jaccard(df, top_n=1000).collect()
    }
    assert got == _py_neighbor_jaccard(_norm(pairs))


# ------------------------------------------------------- random_walks


def _py_walks(und, walk_len, seed="walk"):
    adj: dict[int, list[int]] = {}
    for u, v in und:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    out = {}
    for start in adj:
        cur = start
        path = {0: start}
        for t in range(1, walk_len + 1):
            cur = min(
                adj[cur],
                key=lambda d: (
                    hashlib.md5(f"{seed}|{t}|{cur}|{d}".encode()).hexdigest(),
                    d,
                ),
            )
            path[t] = cur
        out[start] = path
    return out


@settings(max_examples=10, deadline=None)
@given(pairs=_edges_strategy())
def test_random_walks_match_reference(spark, pairs):
    """Every walk equals the sequential keyed-hash replay — on ANY
    random graph, not just the fixed fixture."""
    df = spark.createDataFrame(pairs, "src long, dst long")
    got: dict[int, dict[int, int]] = {}
    for r in graph.random_walks(df, walk_len=2).collect():
        got.setdefault(r["start"], {})[r["step"]] = r["node"]
    assert got == _py_walks(_norm(pairs), 2)


# ------------------------------------------------- boilerplate_segments


_texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


def _py_boilerplate(texts, block_size, min_docs):
    blocks = {}  # doc -> [block strings]
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        blocks[i] = [
            " ".join(toks[s:s + block_size])
            for s in range(0, len(toks), block_size)
        ]
    df_count: dict[str, set[int]] = {}
    for i, bs in blocks.items():
        for b in bs:
            df_count.setdefault(b, set()).add(i)
    flagged = {b for b, docs in df_count.items() if len(docs) >= min_docs}
    out = {}
    for i, bs in blocks.items():
        kept = [b for b in bs if b not in flagged]
        out[i] = (" ".join(kept), len(bs), len(bs) - len(kept))
    return out


@settings(max_examples=15, deadline=None)
@given(texts=_texts)
def test_boilerplate_matches_reference(spark, texts):
    """Operator equals the sequential df>=min_docs removal on random
    tiny-vocab corpora (where cross-document collisions are common)."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["text_clean"], r["n_blocks_total"], r["n_blocks_removed"]
        )
        for r in boilerplate_segments(df, block_size=2, min_docs=2).collect()
    }
    assert got == _py_boilerplate(texts, 2, 2)


# ---------------------------------------------- group_minhash_similarity


def _py_shingles(text, n=3):
    toks = [w for w in text.lower().split() if w]
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_group_sig(texts, num_hashes):
    coeffs = minhash_coeffs(num_hashes)
    sig = [MINHASH_P] * num_hashes
    for t in texts:
        for s in _py_shingles(t):
            v = int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MINHASH_P
            for i, (a, b) in enumerate(coeffs):
                sig[i] = min(sig[i], (a * v + b) % MINHASH_P)
    return sig


@settings(max_examples=10, deadline=None)
@given(
    ga=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=5).map(" ".join),
        min_size=1, max_size=4,
    ),
    gb=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=5).map(" ".join),
        min_size=1, max_size=4,
    ),
)
def test_group_minhash_matches_reference(spark, ga, gb):
    """The pair estimate equals a sequential replay of the md5-affine
    MinHash family over each group's shingle union."""
    rows = [("a", t) for t in ga] + [("b", t) for t in gb]
    df = spark.createDataFrame(rows, "source string, text string")
    [r] = group_minhash_similarity(df, num_hashes=8).collect()
    sa = _py_group_sig(ga, 8)
    sb = _py_group_sig(gb, 8)
    want_equal = sum(1 for x, y in zip(sa, sb) if x == y)
    assert r["n_equal"] == want_equal
    assert r["jaccard_est"] == round(want_equal / 8.0, 6)
