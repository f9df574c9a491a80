"""Round-9 property tests: randomized invariants for the operators the
r8 ADVICE fixes touched, each checked against a driver-side pure-Python
reference — mann_kendall (incl. single-point keys), psi_drift NULL
bucketing, ndcg_at_k's rel_totals query universe, and the
exact_substring_dedup interval-merge reassembly.

Same conventions as test_property.py — bounded examples, one shared
Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import relational as rel
from datapipelines_essentials_python_spark.operators.chunking import (
    exact_substring_dedup,
)


# ---------------------------------------------------------------- mann_kendall


def _py_mann_kendall(points):
    """Reference: S, tie-corrected var18, z, trend for one key's
    [(t, y), ...] series (distinct t per the operator contract)."""
    n = len(points)
    s = 0
    pts = sorted(points)
    for i in range(n):
        for j in range(i + 1, n):
            d = pts[j][1] - pts[i][1]
            s += (d > 0) - (d < 0)
    ties = {}
    for _, y in points:
        ties[y] = ties.get(y, 0) + 1
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    if var18 > 0 and s > 0:
        z = (s - 1.0) / math.sqrt(var18 / 18.0)
    elif var18 > 0 and s < 0:
        z = (s + 1.0) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    trend = "increasing" if s > 0 else ("decreasing" if s < 0 else "flat")
    return n, s, var18, round(z, 6), trend


@settings(max_examples=10, deadline=None)
@given(
    series=st.dictionaries(
        st.sampled_from(["a", "b", "solo"]),
        st.lists(
            st.integers(min_value=-50, max_value=50),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_mann_kendall_matches_reference(spark, series):
    """Every key — including single-point ones — appears with the
    reference S/var18/z/trend; no key vanishes."""
    rows = [
        (k, t, y) for k, ys in series.items() for t, y in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "k string, t int, y int")
    got = {
        r["key"]: (
            r["n_points"], r["s_stat"], r["var18"], r["mk_z"], r["trend"]
        )
        for r in rel.mann_kendall(df, "k", "t", "y").collect()
    }
    assert set(got) == set(series)
    for k, ys in series.items():
        want = _py_mann_kendall(list(enumerate(ys)))
        assert got[k] == want, (k, got[k], want)


# ------------------------------------------------------------------ psi_drift


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-20, max_value=60)),
            st.booleans(),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_psi_drift_bucket_counts_match_reference(spark, vals):
    """Bucket membership (incl. the NULL -1 bucket) and the smoothed
    shares match a pure-Python fold; total PSI is the sum of terms."""
    edges = [0.0, 25.0]
    df = spark.createDataFrame(vals, "v int, is_ref boolean")
    out = rel.psi_drift(df, "v", F.col("is_ref"), edges).collect()

    def bucket(v):
        if v is None:
            return -1
        b = 0
        for i, e in enumerate(edges):
            if v >= e:
                b = i + 1
        return b

    want: dict[int, list[int]] = {}
    for v, is_ref in vals:
        b = bucket(v)
        cnt = want.setdefault(b, [0, 0])
        cnt[0 if is_ref else 1] += 1
    got = {r["bucket"]: (r["n_ref"], r["n_cur"]) for r in out}
    assert got == {b: tuple(c) for b, c in want.items()}
    # smoothed shares replay: p = (n_ref+1)/(tot_ref+nb)
    nb = len(want)
    tot_ref = sum(c[0] for c in want.values()) + nb
    tot_cur = sum(c[1] for c in want.values()) + nb
    for r in out:
        b = r["bucket"]
        assert r["p_ref"] == round((want[b][0] + 1) / tot_ref, 6)
        assert r["q_cur"] == round((want[b][1] + 1) / tot_cur, 6)
    # one shared total, repeated on every row
    totals = {r["psi_total"] for r in out}
    assert len(totals) == 1


# ------------------------------------------------------------------ ndcg_at_k


@settings(max_examples=10, deadline=None)
@given(
    data=st.tuples(
        # retrieved: query -> list of rel flags (positions 1..len)
        st.dictionaries(
            st.integers(min_value=0, max_value=4),
            st.lists(st.booleans(), min_size=1, max_size=5),
            max_size=4,
        ),
        # totals: query -> n_relevant
        st.dictionaries(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=9),
            min_size=1,
            max_size=5,
        ),
    )
)
def test_ndcg_output_universe_is_union(spark, data):
    """Output rows = retrieved-queries UNION rel_totals-queries; zero-
    retrieved queries carry all-zero metrics; MRR is 10^6 div first
    relevant position."""
    from datapipelines_essentials_python_spark.operators.similarity import (
        ndcg_at_k,
    )

    retrieved, totals = data
    ranked_rows = [
        (q, pos + 1, bool(flag))
        for q, flags in retrieved.items()
        for pos, flag in enumerate(flags)
    ]
    if not ranked_rows:
        ranked_rows = [(99, 1, False)]
        retrieved = {99: [False]}
    ranked = spark.createDataFrame(
        ranked_rows, "q long, pos long, rel boolean"
    )
    tot = spark.createDataFrame(
        list(totals.items()) or [(98, 0)], "q long, n long"
    )
    out = {
        r["query"]: r
        for r in ndcg_at_k(ranked, "q", "pos", "rel", tot, k=10).collect()
    }
    assert set(out) == set(retrieved) | set(totals)
    for q, r in out.items():
        flags = retrieved.get(q, [])
        assert r["n_retrieved"] == len(flags)
        assert r["n_relevant_total"] == totals.get(q, 0)
        first_rel = next(
            (i + 1 for i, f in enumerate(flags) if f), None
        )
        assert r["mrr_micro"] == (
            1_000_000 // first_rel if first_rel else 0
        )
        if not flags:
            assert r["dcg_micro"] == 0 and r["ndcg"] == 0.0


# ------------------------------------------------- exact_substring_dedup


def _py_exact_substring(docs, w):
    """Reference: stride-1 window fingerprints, first occurrence by
    (id, start), later occurrences remove their covered tokens."""
    wins = {}
    for did in sorted(docs):
        toks = docs[did]
        for s in range(0, max(len(toks) - w + 1, 0)):
            key = tuple(toks[s : s + w])
            wins.setdefault(key, (did, s))
    out = {}
    for did, toks in docs.items():
        removed = set()
        for s in range(0, max(len(toks) - w + 1, 0)):
            key = tuple(toks[s : s + w])
            if wins[key] != (did, s):
                removed.update(range(s, s + w))
        kept = [t for i, t in enumerate(toks) if i not in removed]
        out[did] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z", "w"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_exact_substring_matches_reference(spark, docs):
    """The merged-interval reassembly equals the naive per-token
    reference on random small-alphabet corpora (dense duplication —
    exactly where interval merging has to be lossless)."""
    w = 3
    corpus = {i: toks for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["text_clean"], r["n_tokens_total"], r["n_tokens_removed"]
        )
        for r in exact_substring_dedup(df, "text", "doc_id", w).collect()
    }
    assert got == _py_exact_substring(corpus, w)
