"""Round-9 property tests, second batch: the statistics family that the
sixth driver rotation gated for the first time — Theil-Sen, Siegel,
Welch, one-way ANOVA, Kruskal-Wallis, Wilson intervals, EB shrinkage,
and CUSUM — each checked against a pure-Python reference on bounded
random inputs. Integer outputs compare exactly (the operators'
quantization contracts are replicated with truncating integer
division); rounded-double outputs compare within 1e-6 (one ulp of the
round-to-6 boundary, where Spark HALF_UP and Python bankers can part).
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import relational as rel


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark `div` / SQL `//` semantics)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _two_middle_sum(vals: list[int]) -> int:
    s = sorted(vals)
    n = len(s)
    return s[(n - 1) // 2] + s[n // 2]


_series = st.dictionaries(
    st.sampled_from(["a", "b"]),
    st.lists(st.integers(min_value=0, max_value=500), min_size=2, max_size=7),
    min_size=1,
    max_size=2,
)


@settings(max_examples=10, deadline=None)
@given(series=_series)
def test_theil_sen_matches_reference(spark, series):
    rows = [(k, t, y) for k, ys in series.items() for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t int, y int")
    got = {
        r["key"]: (r["n_points"], r["sen_milli_x2"])
        for r in rel.theil_sen_slope(df, "k", "t", "y").collect()
    }
    for k, ys in series.items():
        pts = list(enumerate(ys))
        slopes = [
            _tdiv(1000 * (y2 - y1), t2 - t1)
            for i, (t1, y1) in enumerate(pts)
            for t2, y2 in pts[i + 1 :]
        ]
        assert got[k] == (len(pts), _two_middle_sum(slopes))


@settings(max_examples=10, deadline=None)
@given(series=_series)
def test_siegel_matches_reference(spark, series):
    rows = [(k, t, y) for k, ys in series.items() for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t int, y int")
    got = {
        r["key"]: (r["n_points"], r["siegel_milli_x4"])
        for r in rel.siegel_slopes(df, "k", "t", "y").collect()
    }
    for k, ys in series.items():
        pts = list(enumerate(ys))
        inner = [
            _two_middle_sum(
                [
                    _tdiv(1000 * (y2 - y1), t2 - t1)
                    for t2, y2 in pts
                    if t2 != t1
                ]
            )
            for t1, y1 in pts
        ]
        assert got[k] == (len(pts), _two_middle_sum(inner))


@settings(max_examples=10, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2", "g3"]),
        st.lists(
            st.integers(min_value=0, max_value=300), min_size=2, max_size=8
        ),
        min_size=2,
        max_size=3,
    )
)
def test_welch_matches_reference(spark, groups):
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in rel.welch_ttest(df, "g", "v").collect()
    }
    names = sorted(groups)
    expect_pairs = {
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    }
    assert set(got) == expect_pairs
    for (a, b), r in got.items():
        va, vb = groups[a], groups[b]
        na, nb = len(va), len(vb)
        ma, mb = sum(va) / na, sum(vb) / nb
        sa = (sum(x * x for x in va) - sum(va) ** 2 / na) / (na - 1)
        sb = (sum(x * x for x in vb) - sum(vb) ** 2 / nb) / (nb - 1)
        se2 = sa / na + sb / nb
        t = (ma - mb) / math.sqrt(se2) if se2 > 0 else 0.0
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert abs(r["mean_a"] - round(ma, 6)) <= 1e-6
        assert abs(r["mean_b"] - round(mb, 6)) <= 1e-6
        assert abs(r["t_stat"] - round(t, 6)) <= 1e-6
        assert r["significant"] == (abs(t) > 1.96)


@settings(max_examples=10, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2", "g3"]),
        st.lists(
            st.integers(min_value=0, max_value=50), min_size=1, max_size=8
        ),
        min_size=1,
        max_size=3,
    )
)
def test_anova_matches_reference(spark, groups):
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v int")
    r = rel.anova_oneway(df, "g", "v").collect()[0]
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    sq = sum(x * x for v in groups.values() for x in v)
    terms = sum(
        (sum(v) * sum(v) * 10**6) // len(v) for v in groups.values()
    )
    grand = (s * s * 10**6) // n
    ssb = terms - grand
    sst = sq * 10**6 - grand
    ssw = sst - ssb
    assert (r["k_groups"], r["n"]) == (k, n)
    assert r["ssb_micro"] == ssb
    assert r["ssw_micro"] == ssw
    df1, df2 = k - 1, n - k
    if df1 > 0 and df2 > 0 and ssw > 0:
        f = (ssb / df1) / (ssw / df2)
        assert abs(r["f_stat"] - round(f, 6)) <= 1e-6
    else:
        assert r["f_stat"] == 0.0


@settings(max_examples=10, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2", "g3"]),
        st.lists(
            st.integers(min_value=0, max_value=6), min_size=1, max_size=8
        ),
        min_size=1,
        max_size=3,
    )
)
def test_kruskal_matches_reference(spark, groups):
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v int")
    r = rel.kruskal_wallis(df, "g", "v").collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    n = len(allv)
    hist = {}
    for v in allv:
        hist[v] = hist.get(v, 0) + 1
    below = {}
    acc = 0
    for v in sorted(hist):
        below[v] = acc
        acc += hist[v]
    r2 = {v: 2 * below[v] + hist[v] + 1 for v in hist}
    terms = 0
    for vs in groups.values():
        s2g = sum(r2[v] for v in vs)
        terms += (s2g * s2g * 250000) // len(vs)
    tie_t = sum(c**3 - c for c in hist.values())
    assert (r["k_groups"], r["n"], r["tie_t"]) == (len(groups), n, tie_t)
    h_raw = 12.0 * (float(terms) / 1000000.0) / (n * (n + 1.0)) - 3.0 * (
        n + 1.0
    )
    tie_div = 1.0 - tie_t / (n**3 - n) if n > 1 else 0.0
    if n > len(groups) and tie_div > 0:
        assert abs(r["h_stat"] - round(h_raw / tie_div, 6)) <= 1e-6
    else:
        assert r["h_stat"] == 0.0


@settings(max_examples=10, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2", "g3"]),
        st.lists(st.booleans(), min_size=1, max_size=10),
        min_size=1,
        max_size=3,
    )
)
def test_wilson_matches_reference(spark, groups):
    rows = [(g, f) for g, fs in groups.items() for f in fs]
    df = spark.createDataFrame(rows, "g string, s boolean")
    got = {
        r["group"]: r
        for r in rel.wilson_intervals(df, "g", F.col("s")).collect()
    }
    assert set(got) == set(groups)
    z = 1.96
    for g, fs in groups.items():
        n, x = len(fs), sum(fs)
        p = x / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        r = got[g]
        assert (r["n"], r["successes"]) == (n, x)
        assert abs(r["rate"] - round(p, 6)) <= 1e-6
        assert abs(r["ci_low"] - round((center - half) / denom, 6)) <= 1e-6
        assert abs(r["ci_high"] - round((center + half) / denom, 6)) <= 1e-6
        # the interval brackets the rate and stays in [0, 1]
        assert -1e-9 <= r["ci_low"] <= r["rate"] <= r["ci_high"] <= 1 + 1e-9


@settings(max_examples=10, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2", "g3", "g4"]),
        st.lists(st.booleans(), min_size=1, max_size=10),
        min_size=1,
        max_size=4,
    )
)
def test_eb_shrinkage_pulls_toward_mean(spark, groups):
    """Invariants (prior-fit float details live in the oracle twin):
    counts exact; raw_rate = 9dp rate; with a fitted prior every
    shrunk rate lies between its raw rate and the prior mean
    alpha/(alpha+beta); degenerate prior -> shrunk == raw."""
    rows = [(g, f) for g, fs in groups.items() for f in fs]
    df = spark.createDataFrame(rows, "g string, s boolean")
    out = {
        r["group"]: r
        for r in rel.eb_shrunk_rates(df, "g", F.col("s")).collect()
    }
    assert set(out) == set(groups)
    for g, fs in groups.items():
        r = out[g]
        assert (r["n"], r["successes"]) == (len(fs), sum(fs))
        assert abs(r["raw_rate"] - round(sum(fs) / len(fs), 9)) <= 1e-9
        if r["alpha"] == 0.0 and r["beta"] == 0.0:
            assert abs(r["shrunk_rate"] - round(r["raw_rate"], 6)) <= 1e-6
        else:
            mu = r["alpha"] / (r["alpha"] + r["beta"])
            lo, hi = sorted((r["raw_rate"], mu))
            assert lo - 2e-6 <= r["shrunk_rate"] <= hi + 2e-6


@settings(max_examples=10, deadline=None)
@given(series=_series)
def test_cusum_matches_reference(spark, series):
    rows = [(k, d, v) for k, vs in series.items() for d, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k string, d int, v int")
    got = {
        r["key"]: (r["n_days"], r["cp_day"], r["cusum_stat"])
        for r in rel.cusum_changepoint(df, "k", "d", "v").collect()
    }
    for k, vs in series.items():
        n = len(vs)
        s_n = sum(vs)
        best = None
        s_t = 0
        for t, (d, v) in enumerate(zip(range(n), vs), start=1):
            s_t += v
            stat = abs(n * s_t - t * s_n)
            if best is None or stat > best[1]:
                best = (d, stat)
        assert got[k] == (n, best[0], best[1])
