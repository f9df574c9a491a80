"""Round-9 property batch N: randomized invariants for the last
uncovered round-10 pool primitives — labeled_topk (hard-negative /
positive mining, both label modes, vs a brute-force Python cosine
reference), chunk_documents (overlapping token windows), and the
vector-diagnostic array folds (norm / mean / positive count).

Same conventions as test_property_round9.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.chunking import (
    chunk_documents,
)
from datapipelines_essentials_python_spark.operators.similarity import (
    labeled_topk,
    norm,
)


def _close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=0.0, abs_tol=tol)


# ----------------------------------------------------------------- labeled_topk


_VEC = st.lists(
    st.integers(min_value=-5, max_value=5), min_size=4, max_size=4
).filter(lambda v: any(x != 0 for x in v))


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(_VEC, st.sampled_from(["a", "b"])),
        min_size=2,
        max_size=12,
    ),
    same_label=st.booleans(),
    k=st.sampled_from([2, 3]),
)
def test_labeled_topk_matches_bruteforce(spark, vecs, same_label, k):
    """Per query: the k most-cosine-similar OTHER vectors passing the
    label predicate, ranked (cosine DESC, neighbor_id ASC) on the
    6-rounded cosine — checked id-for-id against driver-side brute
    force."""
    rows = [
        (i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = labeled_topk(df, df, k=k, same_label=same_label).collect()

    def cos(u, v):
        dot = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u))
        nv = math.sqrt(sum(b * b for b in v))
        return round(dot / (nu * nv), 6)

    want = {}
    for qi, qv, ql in rows:
        cands = [
            (cos(qv, cv), ci)
            for ci, cv, cl in rows
            if ci != qi and ((cl == ql) if same_label else (cl != ql))
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        want[qi] = [(ci, c) for c, ci in cands[:k]]
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"])
        )
    for qi in got:
        got[qi].sort()
    assert set(got) == {q for q, w in want.items() if w}
    for qi, w in want.items():
        if not w:
            continue
        g = got[qi]
        assert [x[1] for x in g] == [ci for ci, _ in w], (qi, g, w)
        for (rk, ci, c), (wci, wc) in zip(g, w):
            assert _close(c, wc, tol=2e-6), (qi, ci, c, wc)


# -------------------------------------------------------------- chunk_documents


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["tok", "a", "bb", "xyz"]), min_size=0, max_size=15
        ),
        min_size=1,
        max_size=5,
    ),
    chunk_size=st.sampled_from([3, 5]),
    stride=st.sampled_from([2, 3, 5]),
)
def test_chunk_documents_matches_reference(spark, docs, chunk_size, stride):
    """Starts at 0, stride, 2·stride … while start < n_tokens; the last
    chunk may be short; zero-token documents yield no chunks."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(
        df, "text", "doc_id", chunk_size=chunk_size, stride=stride
    ).collect()
    want = {}
    for i, toks in enumerate(docs):
        cid = 0
        for start in range(0, len(toks), stride):
            piece = toks[start : start + chunk_size]
            want[(i, cid)] = (start, " ".join(piece), len(piece))
            cid += 1
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start"], r["chunk_text"], r["n_tokens"])
        for r in out
    }
    assert got == want


# ------------------------------------------------------- vector-stat array folds


@settings(max_examples=8, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-100, max_value=100), min_size=1, max_size=8
        ),
        min_size=1,
        max_size=10,
    )
)
def test_vector_fold_diagnostics_match_reference(spark, vecs):
    """The vector_stats panel's folds — L2 norm via F.aggregate, mean,
    extrema, positive count — replayed in Python over the same
    doubles."""
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = F.col("embedding")
    total = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    out = df.select(
        "vec_id",
        F.round(norm(v), 6).alias("l2_norm"),
        F.round(total / F.size(v).cast("double"), 6).alias("mean_val"),
        F.round(F.array_min(v).cast("double"), 6).alias("min_val"),
        F.round(F.array_max(v).cast("double"), 6).alias("max_val"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
    ).collect()
    got = {r["vec_id"]: r for r in out}
    for i, vec in enumerate(vecs):
        r = got[i]
        assert _close(r["l2_norm"], round(math.sqrt(sum(x * x for x in vec)), 6), tol=2e-6)
        assert _close(r["mean_val"], round(sum(vec) / len(vec), 6), tol=2e-6)
        assert r["min_val"] == min(vec) and r["max_val"] == max(vec)
        assert r["n_positive"] == sum(1 for x in vec if x > 0)
