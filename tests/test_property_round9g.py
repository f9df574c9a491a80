"""Round-9 property batch G: randomized invariants for the round-10
rotation-pool STATISTICS operators, each checked against a driver-side
pure-Python reference — trimmed_mean, mode_value, weighted_median,
auc_mann_whitney, contingency_chi2, simpson_diversity.

Same conventions as test_property_round9.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example. Float outputs are
compared to 1e-6 absolute (one fixed double shape rounded to 6 on the
Spark side; Python's bankers-rounding can differ by one ulp at exact
half-way points, which the tolerance absorbs); integer/decimal outputs
are compared exactly.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import relational as rel
from datapipelines_essentials_python_spark.operators.text import (
    simpson_diversity,
)


def _close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=0.0, abs_tol=tol)


# --------------------------------------------------------------- trimmed_mean


def _py_trimmed_mean(vals, t_ppm):
    n = len(vals)
    k = (n * t_ppm) // 1_000_000
    kept = sorted(vals)[k : n - k]
    if not kept:
        return n, 0, None
    return n, len(kept), round(sum(kept) / len(kept), 6)


@settings(max_examples=8, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=2,
    ),
    trim_pct=st.sampled_from([0, 10, 25, 40]),
)
def test_trimmed_mean_matches_reference(spark, groups, trim_pct):
    """Rank-range selection: drop floor(n·t) from each tail, average
    the middle; every group appears."""
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v int")
    out = rel.trimmed_mean(df, "g", "v", trim_pct / 100.0).collect()
    got = {r["group"]: (r["n"], r["n_kept"], r["trimmed_mean"]) for r in out}
    assert set(got) == set(groups)
    for g, vs in groups.items():
        n, n_kept, mean = _py_trimmed_mean(vs, trim_pct * 10_000)
        gn, gk, gm = got[g]
        assert (gn, gk) == (n, n_kept), (g, got[g], (n, n_kept, mean))
        if mean is None:
            assert gm is None
        else:
            assert gm is not None and _close(float(gm), mean), (g, gm, mean)


# ----------------------------------------------------------------- mode_value


@settings(max_examples=8, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["x", "y"]),
        st.lists(
            st.integers(min_value=-5, max_value=5), min_size=1, max_size=15
        ),
        min_size=1,
        max_size=2,
    )
)
def test_mode_value_matches_reference(spark, groups):
    """Highest count wins; count ties break to the SMALLEST value —
    a total function of the data."""
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        r["group"]: (r["mode_value"], r["mode_count"], r["n_distinct"])
        for r in rel.mode_value(df, "g", "v").collect()
    }
    assert set(got) == set(groups)
    for g, vs in groups.items():
        counts = {}
        for v in vs:
            counts[v] = counts.get(v, 0) + 1
        best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
        assert got[g] == (best[0], best[1], len(counts)), (g, got[g])


# ------------------------------------------------------------ weighted_median


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["p", "q"]),
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=20),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_weighted_median_matches_reference(spark, rows):
    """Lower weighted median: smallest value whose cumulative weight
    reaches half the total (2·cum ≥ total), integer weights."""
    df = spark.createDataFrame(rows, "g string, v int, w int")
    got = {
        r["group"]: (r["total_weight"], r["weighted_median"])
        for r in rel.weighted_median(df, "g", "v", "w").collect()
    }
    by_g = {}
    for g, v, w in rows:
        by_g.setdefault(g, {}).setdefault(v, 0)
        by_g[g][v] += w
    assert set(got) == set(by_g)
    for g, vw in by_g.items():
        total = sum(vw.values())
        cum = 0
        med = None
        for v in sorted(vw):
            cum += vw[v]
            if 2 * cum >= total:
                med = v
                break
        assert got[g] == (total, med), (g, got[g], (total, med))


# ----------------------------------------------------------- auc_mann_whitney


def _py_auc(pairs):
    """pairs: [(label, score)] for one group → (n_pos, n_neg, u2, auc)
    via doubled tie-average ranks, matching the operator's integer
    identity."""
    n = len(pairs)
    scores = sorted(p[1] for p in pairs)
    # min-rank and equal-count per score (SQL rank semantics)
    min_rank = {}
    cnt_eq = {}
    for i, s in enumerate(scores, start=1):
        min_rank.setdefault(s, i)
        cnt_eq[s] = cnt_eq.get(s, 0) + 1
    n_pos = sum(1 for y, _ in pairs if y)
    n_neg = n - n_pos
    s2pos = sum(
        2 * min_rank[s] + cnt_eq[s] - 1 for y, s in pairs if y
    )
    u2 = s2pos - n_pos * (n_pos + 1)
    if n_pos > 0 and n_neg > 0:
        auc = round(u2 / (2.0 * n_pos * n_neg), 6)
    else:
        auc = 0.0
    return n_pos, n_neg, u2, auc


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.booleans(), st.integers(min_value=0, max_value=8)
        ),
        min_size=1,
        max_size=18,
    )
)
def test_auc_mann_whitney_matches_reference(spark, pairs):
    """Exact U via doubled average ranks; ties get 0.5 credit; one-class
    groups report auc=0.0, never NULL or a crash."""
    rows = [("g", y, s) for y, s in pairs]
    df = spark.createDataFrame(rows, "g string, y boolean, s int")
    out = rel.auc_mann_whitney(df, "g", "y", "s").collect()
    assert len(out) == 1
    r = out[0]
    n_pos, n_neg, u2, auc = _py_auc(pairs)
    assert (r["n_pos"], r["n_neg"], r["u2"]) == (n_pos, n_neg, u2)
    assert _close(r["auc"], auc), (r["auc"], auc)


# ----------------------------------------------------------- contingency_chi2


@settings(max_examples=8, deadline=None)
@given(
    obs=st.lists(
        st.tuples(
            st.sampled_from(["a1", "a2", "a3"]),
            st.sampled_from(["b1", "b2"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_contingency_chi2_matches_reference(spark, obs):
    """Full margin grid (absent cells appear with observed=0), exact
    integer per-cell micro contributions, BIGINT chi2 total, Cramér's V
    as the one double shape."""
    df = spark.createDataFrame(obs, "a string, b string")
    out = rel.contingency_chi2(df, "a", "b").collect()

    cells = {}
    for a, b in obs:
        cells[(a, b)] = cells.get((a, b), 0) + 1
    n_a = {}
    n_b = {}
    for (a, b), c in cells.items():
        n_a[a] = n_a.get(a, 0) + c
        n_b[b] = n_b.get(b, 0) + c
    n = sum(cells.values())
    want = {}
    chi2_micro = 0
    for a in n_a:
        for b in n_b:
            o = cells.get((a, b), 0)
            num = o * n - n_a[a] * n_b[b]
            den = n * n_a[a] * n_b[b]
            contrib = (num * num * 1_000_000) // den
            want[(a, b)] = (o, contrib)
            chi2_micro += contrib
    dof = (len(n_a) - 1) * (len(n_b) - 1)
    if dof > 0 and n > 0:
        v = round(
            math.sqrt(
                (chi2_micro / 1_000_000.0)
                / (n * min(len(n_a) - 1, len(n_b) - 1))
            ),
            6,
        )
    else:
        v = 0.0

    got = {(r["a"], r["b"]): (r["observed"], r["contrib_micro"]) for r in out}
    assert got == want
    for r in out:
        assert r["chi2_micro"] == chi2_micro
        assert r["dof"] == dof
        assert _close(r["cramers_v"], v), (r["cramers_v"], v)


# ---------------------------------------------------------- simpson_diversity


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.lists(
                st.sampled_from(["the", "cat", "sat", "on", "Mat"]),
                min_size=0,
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_simpson_diversity_matches_reference(spark, docs):
    """Unbiased repeat rate Σc(c−1)/(N(N−1)) in exact micro-units +
    inverse-Simpson effective types; groups with zero tokens emit no
    row (explode drops them)."""
    rows = [(g, " ".join(toks)) for g, toks in docs]
    df = spark.createDataFrame(rows, "g string, text string")
    out = simpson_diversity(df, "g", "text").collect()

    counts = {}
    for g, toks in docs:
        for t in toks:
            key = (g, t.lower())
            counts[key] = counts.get(key, 0) + 1
    want = {}
    groups = {g for g, _ in counts}
    for g in groups:
        cs = [c for (gg, _), c in counts.items() if gg == g]
        n = sum(cs)
        cc1 = sum(c * (c - 1) for c in cs)
        c2 = sum(c * c for c in cs)
        repeat = (cc1 * 1_000_000) // (n * (n - 1)) if n > 1 else 0
        hill2 = round(n * n / c2, 6) if c2 > 0 else 0.0
        want[g] = (n, len(cs), repeat, hill2)

    got = {
        r["group"]: (
            r["n_tokens"],
            r["vocab_size"],
            r["repeat_micro"],
            r["hill2_types"],
        )
        for r in out
    }
    assert set(got) == set(want)
    for g, (n, vs, rp, h2) in want.items():
        gn, gv, gr, gh = got[g]
        assert (gn, gv, gr) == (n, vs, rp), (g, got[g], want[g])
        assert _close(gh, h2), (g, gh, h2)
