"""Round-9 property tests, sixth batch: Kendall tau-b (joint-histogram
form), per-group token entropy, and the Zipf-exponent fit vs
pure-Python references.
"""

from __future__ import annotations

import math
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import relational as rel
from datapipelines_essentials_python_spark.operators.text import (
    token_entropy_by_group,
    zipf_fit,
)


@settings(max_examples=10, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2"]),
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 4)),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=2,
    )
)
def test_kendall_tau_binned_matches_reference(spark, groups):
    rows = [(g, x, y) for g, xy in groups.items() for x, y in xy]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    got = {
        r["group"]: r
        for r in rel.kendall_tau_binned(df, "g", "x", "y").collect()
    }
    assert set(got) == set(groups)
    for g, xy in groups.items():
        n = len(xy)
        c = d = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = xy[j][0] - xy[i][0]
                dy = xy[j][1] - xy[i][1]
                if dx * dy > 0:
                    c += 1
                elif dx * dy < 0:
                    d += 1
        n0 = n * (n - 1) // 2
        tx = {}
        ty = {}
        for x, y in xy:
            tx[x] = tx.get(x, 0) + 1
            ty[y] = ty.get(y, 0) + 1
        n1 = sum(t * (t - 1) for t in tx.values()) // 2
        n2 = sum(t * (t - 1) for t in ty.values()) // 2
        den = math.sqrt(n0 - n1) * math.sqrt(n0 - n2)
        tau = (c - d) / den if den > 0 else 0.0
        r = got[g]
        assert (r["n"], r["concordant"], r["discordant"]) == (n, c, d)
        assert abs(r["tau_b"] - round(tau, 6)) <= 1e-6
        assert -1.0 - 1e-9 <= r["tau_b"] <= 1.0 + 1e-9


@settings(max_examples=8, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["s1", "s2"]),
        st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=1,
                max_size=8,
            ),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=2,
    )
)
def test_token_entropy_matches_reference(spark, groups):
    rows = [
        (g, " ".join(toks)) for g, docs in groups.items() for toks in docs
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["group"]: r
        for r in token_entropy_by_group(df, "source", "text").collect()
    }
    for g, docs in groups.items():
        counts = {}
        for toks in docs:
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
        total = sum(counts.values())
        terms = Decimal(0)
        for c in counts.values():
            p = c / total
            terms += Decimal(str(round(p * math.log2(p), 9)))
        h = round(-float(terms), 6)
        r = got[g]
        assert (r["n_tokens"], r["vocab_size"]) == (total, len(counts))
        assert abs(r["entropy"] - h) <= 2e-8 * (len(counts) + 1)
        if len(counts) > 1:
            # 1.5e-6: Spark computes log2 as ln/ln2 while Python's
            # math.log2 is native — an ulp apart at a round-6 boundary
            # splits the two rounded values by exactly 1e-6
            assert (
                abs(r["norm_entropy"] - round(r["entropy"] / math.log2(len(counts)), 6))
                <= 1.5e-6
            )
        else:
            assert r["norm_entropy"] == 0.0


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["t1", "t2", "t3", "t4", "t5"]),
            min_size=2,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_zipf_fit_matches_reference(spark, docs):
    df = spark.createDataFrame(
        [("src", " ".join(t)) for t in docs], "source string, text string"
    )
    r = zipf_fit(df, "source", "text", top_n=100).collect()[0]
    counts = {}
    for t in docs:
        for tok in t:
            counts[tok] = counts.get(tok, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    sx = sy = sxy = sxx = syy = Decimal(0)
    for i, (_, c) in enumerate(ranked, start=1):
        lx = Decimal(str(round(math.log(i), 9)))
        ly = Decimal(str(round(math.log(c), 9)))
        sx += lx
        sy += ly
        sxy += lx * ly
        sxx += lx * lx
        syy += ly * ly
    n = float(len(ranked))
    fx, fy = float(sx), float(sy)
    fxy, fxx, fyy = float(sxy), float(sxx), float(syy)
    den = n * fxx - fx * fx
    slope = (n * fxy - fx * fy) / den if den > 0 else 0.0
    intercept = (fy - slope * fx) / n
    r2_den = (n * fxx - fx * fx) * (n * fyy - fy * fy)
    r2 = ((n * fxy - fx * fy) ** 2) / r2_den if r2_den > 0 else 0.0
    assert r["n_terms_fit"] == len(ranked)
    assert abs(r["zipf_slope"] - round(slope, 6)) <= 1e-6
    assert abs(r["zipf_intercept"] - round(intercept, 6)) <= 1e-6
    assert abs(r["r2"] - round(r2, 6)) <= 1e-6
    # natural-text sanity: slope of a count-ranked fit is never positive
    assert r["zipf_slope"] <= 1e-9
    assert -1e-9 <= r["r2"] <= 1.0 + 1e-9
