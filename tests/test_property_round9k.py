"""Round-9 property batch K: randomized invariants for the round-10
rotation-pool ROBUST-PROFILE operators, each checked against a
driver-side pure-Python reference — pareto_frontier_2d (vs the O(n²)
dominance definition), rolling_mad_anomaly (exact-integer robust
control chart), dow_seasonal_outliers (per-weekday Tukey fences),
skew_profile (salt-factor planning).

Same conventions as test_property_round9.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import relational as rel


def _close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=0.0, abs_tol=tol)


# ---------------------------------------------------------- pareto_frontier_2d


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pareto_frontier_matches_dominance_definition(spark, pts):
    """The distributed sweep returns exactly the rows not dominated by
    any other (cost ≤, gain ≥, strictly better on one axis); equal
    (cost, gain) duplicates all survive."""
    df = spark.createDataFrame(pts, "cost int, gain int")
    got = sorted(
        (r["cost"], r["gain"])
        for r in rel.pareto_frontier_2d(df, "cost", "gain").collect()
    )
    want = sorted(
        (c, g)
        for c, g in pts
        if not any(
            (c2 <= c and g2 >= g and (c2 < c or g2 > g)) for c2, g2 in pts
        )
    )
    assert got == want


# --------------------------------------------------------- rolling_mad_anomaly


def _py_med2_mad4(window_vals, x, k):
    a = sorted(window_vals)
    n = len(a)
    lo, hi = (n - 1) // 2, n // 2
    med2 = a[lo] + a[hi]
    dev = sorted(abs(2 * v - med2) for v in a)
    mad4 = dev[lo] + dev[hi]
    return med2, mad4, 2 * abs(2 * x - med2) > k * mad4


@settings(max_examples=8, deadline=None)
@given(
    series=st.dictionaries(
        st.sampled_from(["p1", "p2"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),
                st.integers(min_value=-500, max_value=500),
            ),
            min_size=1,
            max_size=12,
            unique_by=lambda r: r[0],
        ),
        min_size=1,
        max_size=2,
    ),
    preceding=st.sampled_from([2, 6]),
)
def test_rolling_mad_anomaly_matches_reference(spark, series, preceding):
    """Trailing RANGE frame keyed on the integer day (gaps shrink the
    frame), doubled-median / quadrupled-MAD integer identities, pure
    BIGINT anomaly comparison."""
    rows = [(p, d, v) for p, dv in series.items() for d, v in dv]
    df = spark.createDataFrame(rows, "p string, d int, v int")
    out = rel.rolling_mad_anomaly(df, "p", "d", "v", preceding=preceding)
    got = {
        (r["p"], r["d"]): (r["med_x2"], r["mad_x4"], r["is_anomaly"])
        for r in out.collect()
    }
    for p, dv in series.items():
        dv_sorted = sorted(dv)
        for d, v in dv_sorted:
            frame = [vv for dd, vv in dv_sorted if d - preceding <= dd <= d]
            assert got[(p, d)] == _py_med2_mad4(frame, v, 3), (p, d)


# ------------------------------------------------------- dow_seasonal_outliers


def _py_pct(sorted_vals, q):
    """Spark/NumPy 'linear' percentile over a sorted list."""
    n = len(sorted_vals)
    if n == 1:
        return float(sorted_vals[0])
    pos = (n - 1) * q
    lo = int(math.floor(pos))
    frac = pos - lo
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


@settings(max_examples=8, deadline=None)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=59),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    )
)
def test_dow_seasonal_outliers_matches_reference(spark, days):
    """Per (key, weekday) Tukey fences from linear-interpolated
    percentiles; a day trips only its own weekday's fence."""
    epoch = dt.date(2024, 1, 1)
    rows = [("k", epoch + dt.timedelta(days=d), v) for d, v in days]
    df = spark.createDataFrame(rows, "k string, day date, v int")
    out = rel.dow_seasonal_outliers(df, "k", "day", "v").collect()

    by_dow = {}
    for _, day, v in rows:
        # Spark dayofweek: Sunday=1 .. Saturday=7
        dow = (day.toordinal() % 7) + 1
        by_dow.setdefault(dow, []).append(v)
    got = {r["day"]: r for r in out}
    assert len(got) == len(days)
    for _, day, v in rows:
        dow = (day.toordinal() % 7) + 1
        vals = sorted(by_dow[dow])
        q1, med, q3 = (_py_pct(vals, q) for q in (0.25, 0.5, 0.75))
        iqr = q3 - q1
        r = got[day]
        assert r["dow"] == dow
        assert _close(r["q1"], q1) and _close(r["med"], med) and _close(r["q3"], q3)
        assert r["is_outlier"] == (v > q3 + 1.5 * iqr or v < q1 - 1.5 * iqr)


# ---------------------------------------------------------------- skew_profile


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=40
    ),
    partitions=st.sampled_from([8, 200]),
)
def test_skew_profile_matches_reference(spark, keys, partitions):
    """share, skew_ratio, hot flag at the 2.0 threshold, and
    salt_factor = ceil(ratio) for hot keys / 1 otherwise."""
    df = spark.createDataFrame([(k,) for k in keys], "k int")
    out = rel.skew_profile(df, ["k"], partitions=partitions).collect()
    counts = {}
    for k in keys:
        counts[k] = counts.get(k, 0) + 1
    total = len(keys)
    got = {r["k"]: r for r in out}
    assert set(got) == set(counts)
    for k, n in counts.items():
        ratio = n * partitions / total
        r = got[k]
        assert r["n_rows"] == n
        assert _close(r["share"], round(n / total, 6))
        assert _close(r["skew_ratio"], round(ratio, 6))
        assert r["is_hot"] == (ratio >= 2.0)
        assert r["salt_factor"] == (math.ceil(ratio) if ratio >= 2.0 else 1)
