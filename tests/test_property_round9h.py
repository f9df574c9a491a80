"""Round-9 property batch H: randomized invariants for the round-10
rotation-pool SEQUENCE/TEMPORAL operators, each checked against a
driver-side pure-Python reference — longest_streaks, sequence_gaps
(two-level vs global), peak_concurrency (sweep-line), trend_break_ols
(CUSUM breakpoint + piecewise OLS), delta_encoding_audit.

Same conventions as test_property_round9.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import relational as rel


def _close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=0.0, abs_tol=tol)


# ------------------------------------------------------------ longest_streaks


def _py_streaks(days, min_len):
    ds = sorted(set(days))
    runs = []
    start = prev = ds[0]
    for d in ds[1:]:
        if d == prev + 1:
            prev = d
        else:
            runs.append((start, prev - start + 1))
            start = prev = d
    runs.append((start, prev - start + 1))
    runs = [(s, ln) for s, ln in runs if ln >= min_len]
    if not runs:
        return None
    best = max(runs, key=lambda r: (r[1], -r[0]))
    return (
        sum(ln for _, ln in runs),
        len(runs),
        best[1],
        best[0],
    )


@settings(max_examples=8, deadline=None)
@given(
    keys=st.dictionaries(
        st.sampled_from(["u1", "u2"]),
        st.lists(
            st.integers(min_value=0, max_value=20), min_size=1, max_size=15
        ),
        min_size=1,
        max_size=2,
    ),
    min_len=st.sampled_from([1, 2]),
)
def test_longest_streaks_matches_reference(spark, keys, min_len):
    """Gaps-and-islands: consecutive-day runs; length ties break to the
    EARLIEST start; keys whose every run is under min_len emit no row."""
    rows = [(k, d) for k, ds in keys.items() for d in ds]
    df = spark.createDataFrame(rows, "k string, d int")
    got = {
        r["key"]: (
            r["n_active_days"],
            r["n_streaks"],
            r["longest_streak"],
            r["longest_streak_start"],
        )
        for r in rel.longest_streaks(df, "k", "d", min_len).collect()
    }
    want = {
        k: w
        for k, ds in keys.items()
        if (w := _py_streaks(ds, min_len)) is not None
    }
    assert got == want


# -------------------------------------------------------------- sequence_gaps


@settings(max_examples=8, deadline=None)
@given(
    ids=st.sets(
        st.integers(min_value=0, max_value=60), min_size=1, max_size=25
    ),
    min_gap=st.sampled_from([1, 3]),
)
def test_sequence_gaps_two_level_equals_global(spark, ids, min_gap):
    """The block-internal + block-boundary union is exactly the global
    gap set — with a tiny block size so boundaries (and wholly-missing
    blocks) are exercised."""
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    out = rel.sequence_gaps(df, "id", block_size=4, min_gap_len=min_gap)
    got = {
        (r["gap_start"], r["gap_end"], r["gap_len"]) for r in out.collect()
    }
    ds = sorted(ids)
    want = set()
    for a, b in zip(ds, ds[1:]):
        if b - a > 1 and (b - 1) - (a + 1) + 1 >= min_gap:
            want.add((a + 1, b - 1, b - a - 1))
    assert got == want


# ----------------------------------------------------------- peak_concurrency


@settings(max_examples=8, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(
            st.sampled_from(["d1", "d2"]),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_peak_concurrency_matches_reference(spark, intervals):
    """Sweep-line with +1-before-−1 at equal instants: touching
    intervals count as concurrent; peak_at is the earliest peak
    instant."""
    rows = [(g, s, s + dur) for g, s, dur in intervals]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = {
        r["group"]: (r["n_intervals"], r["peak_concurrent"], r["peak_at_us"])
        for r in rel.peak_concurrency(df, "g", "s", "e").collect()
    }
    by_g = {}
    for g, s, e in rows:
        by_g.setdefault(g, []).append((s, e))
    want = {}
    for g, ivs in by_g.items():
        events = [(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs]
        events.sort(key=lambda x: (x[0], -x[1]))
        live = 0
        trace = []
        for t, d in events:
            live += d
            trace.append((t, live))
        peak = max(l for _, l in trace)
        peak_at = min(t for t, l in trace if l == peak)
        want[g] = (len(ivs), peak, peak_at)
    assert got == want


# ------------------------------------------------------------ trend_break_ols


def _py_cusum_cp(series):
    """series: sorted [(day, v)] → cp_day (argmax |n·S_t − t·S_n|,
    earliest day on ties)."""
    n = len(series)
    s_n = sum(v for _, v in series)
    best = None
    s_t = 0
    for t, (day, v) in enumerate(series, start=1):
        s_t += v
        stat = abs(n * s_t - t * s_n)
        if best is None or stat > best[0] or (stat == best[0] and day < best[1]):
            best = (stat, day)
    return best[1]


def _py_slope(pts):
    n = len(pts)
    if n < 2:
        return 0.0
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    if den <= 0:
        return 0.0
    return (n * sxy - sx * sy) / den


@settings(max_examples=8, deadline=None)
@given(
    keys=st.dictionaries(
        st.sampled_from(["k1", "k2"]),
        st.lists(
            st.integers(min_value=-100, max_value=100),
            min_size=2,
            max_size=12,
        ),
        min_size=1,
        max_size=2,
    )
)
def test_trend_break_ols_matches_reference(spark, keys):
    """CUSUM argmax picks the breakpoint, then exact-moment OLS slopes
    on (day ≤ cp) / (day > cp); slope_delta rounds the UNROUNDED
    difference."""
    rows = [
        (k, d, v) for k, vs in keys.items() for d, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "k string, d int, v int")
    got = {
        r["key"]: r
        for r in rel.trend_break_ols(df, "k", "d", "v").collect()
    }
    assert set(got) == set(keys)
    for k, vs in keys.items():
        series = list(enumerate(vs))
        cp = _py_cusum_cp(series)
        before = [(d, v) for d, v in series if d <= cp]
        after = [(d, v) for d, v in series if d > cp]
        sb, sa = _py_slope(before), _py_slope(after)
        r = got[k]
        assert r["cp_day"] == cp, (k, r["cp_day"], cp)
        assert (r["n_before"], r["n_after"]) == (len(before), len(after))
        assert _close(r["slope_before"], round(sb, 6))
        assert _close(r["slope_after"], round(sa, 6))
        assert _close(r["slope_delta"], round(sa - sb, 6))


# ------------------------------------------------------- delta_encoding_audit


@settings(max_examples=8, deadline=None)
@given(
    keys=st.dictionaries(
        st.sampled_from(["s1", "s2"]),
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=2,
    )
)
def test_delta_encoding_audit_matches_reference(spark, keys):
    """Σ|Δ| vs Σ|x| with exact bit widths; single-point series report
    NULL delta sums (no pairs) and delta_bits=0."""
    rows = [
        (k, t, v) for k, vs in keys.items() for t, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    got = {
        r["key"]: r
        for r in rel.delta_encoding_audit(df, "k", "t", "v").collect()
    }
    assert set(got) == set(keys)
    for k, vs in keys.items():
        deltas = [abs(b - a) for a, b in zip(vs, vs[1:])]
        sum_raw = sum(abs(v) for v in vs)
        sum_d = sum(deltas) if deltas else None
        max_raw = max(abs(v) for v in vs)
        max_d = max(deltas) if deltas else None
        if sum_raw > 0 and sum_d is not None:
            ratio = (sum_d * 1_000_000) // sum_raw
        elif sum_raw > 0:
            ratio = None  # NULL delta sum propagates through the div
        else:
            ratio = 0
        r = got[k]
        assert r["n_points"] == len(vs)
        assert r["sum_abs_raw"] == sum_raw
        assert r["sum_abs_delta"] == sum_d
        assert r["delta_ratio_micro"] == ratio, (k, r["delta_ratio_micro"], ratio)
        assert r["raw_bits"] == (max_raw.bit_length() if max_raw > 0 else 0)
        want_db = max_d.bit_length() if max_d is not None and max_d > 0 else 0
        assert r["delta_bits"] == want_db
