"""Unit/property tests for the round-8 third batch: landmark harmonic
centrality, Theil-Sen robust trend, CUSUM changepoint, n-dim skyline,
rolling median+MAD control chart, per-group token entropy, and
day-of-week seasonal Tukey fences — each checked against a sequential
Python reference on inputs small enough to verify by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import graph
from datapipelines_essentials_python_spark.operators import relational as rel
from datapipelines_essentials_python_spark.operators.skyline import skyline
from datapipelines_essentials_python_spark.operators.text import (
    token_entropy_by_group,
)


# ------------------------------------------------- landmark harmonic


def _seq_harmonic(edges, landmarks, max_hops):
    """Sequential BFS-per-landmark reference."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out: dict[int, list[int]] = {}
    for lm in landmarks:
        dist = {lm: 0}
        frontier = [lm]
        for h in range(1, max_hops + 1):
            nxt = []
            for n in frontier:
                for m in adj.get(n, ()):
                    if m not in dist:
                        dist[m] = h
                        nxt.append(m)
            frontier = nxt
        for node, d in dist.items():
            if d >= 1:
                out.setdefault(node, []).append(1_000_000 // d)
    return {n: (len(c), sum(c)) for n, c in out.items()}


def test_landmark_harmonic_matches_sequential_bfs(spark):
    """Path 1-2-3-4-5 plus a branch 3-6: landmarks {1, 6}; distances and
    micro-contributions replay the per-landmark BFS exactly."""
    raw = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    lms = spark.createDataFrame([(1,), (6,)], "node long")
    got = {
        r["node"]: (r["n_landmarks"], r["harmonic_micro"])
        for r in graph.landmark_harmonic(edges, lms, max_hops=3).collect()
    }
    assert got == _seq_harmonic(raw, [1, 6], 3)


def test_landmark_harmonic_excludes_self_and_caps_hops(spark):
    """A landmark at distance 0 from itself contributes nothing; nodes
    beyond max_hops are absent entirely."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    lms = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["harmonic_micro"]
        for r in graph.landmark_harmonic(edges, lms, max_hops=2).collect()
    }
    # node 1 (the landmark, d=0) absent; 4 is at d=3 > cap; 5 unreachable
    assert got == {2: 1_000_000, 3: 500_000}


def test_landmark_harmonic_validates_hops(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    lms = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="max_hops"):
        graph.landmark_harmonic(edges, lms, max_hops=0)


# ------------------------------------------------- Theil-Sen


def _milli_slopes(pts):
    """Sequential reference: trunc-toward-zero milli-slopes, sorted."""
    out = []
    for i, (t1, y1) in enumerate(pts):
        for t2, y2 in pts[i + 1 :]:
            num, den = 1000 * (y2 - y1), t2 - t1
            q = abs(num) // abs(den)
            out.append(q if (num >= 0) == (den > 0) else -q)
    return sorted(out)


def test_theil_sen_matches_median_of_pairwise_slopes(spark):
    """Series with one wild outlier: the sequential median-of-milli-
    slopes reference and the operator agree, and the slope ignores the
    outlier (robustness — OLS would not)."""
    pts = [(0, 100), (1, 200), (2, 300), (3, 400), (4, 5_000_000)]
    df = spark.createDataFrame(
        [("k", t, y) for t, y in pts], "key string, t long, y long"
    )
    s = _milli_slopes(pts)
    n = len(s)
    want = s[(n - 1) // 2] + s[n // 2]
    row = rel.theil_sen_slope(df, "key", "t", "y").collect()[0]
    assert row["n_points"] == 5
    assert row["sen_milli_x2"] == want
    assert row["sen_milli_x2"] == 200_000  # slope 100, outlier ignored


def test_theil_sen_even_pair_count_two_middle_sum(spark):
    """4 points -> 6 slopes: the result is the exact SUM of the two
    middle milli-slopes (2x the interpolated median, no float), and a
    NEGATIVE trend truncates toward zero identically on both engines."""
    pts = [(0, 60), (1, 40), (2, 10), (3, 3)]
    df = spark.createDataFrame(
        [("k", t, y) for t, y in pts], "key string, t long, y long"
    )
    s = _milli_slopes(pts)
    want = s[2] + s[3]
    assert rel.theil_sen_slope(df, "key", "t", "y").collect()[0][
        "sen_milli_x2"
    ] == want


def test_theil_sen_drops_single_point_keys(spark):
    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, 2), ("b", 0, 9)], "key string, t long, y long"
    )
    keys = {r["key"] for r in rel.theil_sen_slope(df, "key", "t", "y").collect()}
    assert keys == {"a"}


# ------------------------------------------------- CUSUM changepoint


def test_cusum_finds_the_step(spark):
    """Flat 100s then flat 200s: |n*S_t - t*S_n| is maximized exactly at
    the last day of the low regime."""
    vals = [100] * 5 + [200] * 5
    df = spark.createDataFrame(
        [("k", d, v) for d, v in enumerate(vals)],
        "key string, day long, v long",
    )
    row = rel.cusum_changepoint(df, "key", "day", "v").collect()[0]
    assert row["cp_day"] == 4
    assert row["n_days"] == 10
    # sequential reference: argmax |n*S_t - t*S_n|
    s = 0
    stats = []
    for t, v in enumerate(vals, start=1):
        s += v
        stats.append(abs(len(vals) * s - t * sum(vals)))
    assert row["cusum_stat"] == max(stats)


def test_cusum_tie_breaks_earliest_day(spark):
    """A symmetric series has symmetric statistics — the earliest argmax
    day must win."""
    vals = [0, 100, 0]
    df = spark.createDataFrame(
        [("k", d, v) for d, v in enumerate(vals)],
        "key string, day long, v long",
    )
    row = rel.cusum_changepoint(df, "key", "day", "v").collect()[0]
    # stats: day0 |3*0-1*100|=100, day1 |3*100-2*100|=100, day2 0 —
    # a tie between day 0 and day 1; the EARLIEST day must win.
    assert row["cp_day"] == 0 and row["cusum_stat"] == 100


def test_cusum_constant_series_stat_zero(spark):
    df = spark.createDataFrame(
        [("k", d, 7) for d in range(4)], "key string, day long, v long"
    )
    row = rel.cusum_changepoint(df, "key", "day", "v").collect()[0]
    assert row["cusum_stat"] == 0 and row["cp_day"] == 0


# ------------------------------------------------- skyline


def _seq_skyline(rows, signs):
    out = []
    for q in rows:
        dominated = False
        for d in rows:
            if d == q:
                continue
            le = all(s * dv <= s * qv for dv, qv, s in zip(d, q, signs))
            lt = any(s * dv < s * qv for dv, qv, s in zip(d, q, signs))
            if le and lt:
                dominated = True
                break
        if not dominated:
            out.append(q)
    return sorted(out)


def test_skyline_matches_brute_force_dominance(spark):
    rows = [
        (1, 10, 10, 5),
        (2, 20, 5, 5),
        (3, 5, 20, 5),
        (4, 10, 10, 4),  # dominates row 1 (same maxes, cheaper)
        (5, 1, 1, 9),  # dominated by everything
        (6, 20, 20, 9),  # best on both maxes, worst price — still skyline
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    spec = [("a", "max"), ("b", "max"), ("c", "min")]
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in skyline(df, spec).collect()
    )
    want = _seq_skyline([(a, b, c) for _, a, b, c in rows], [-1, -1, 1])
    assert got == want
    ids = {r["id"] for r in skyline(df, spec).collect()}
    assert ids == {2, 3, 4, 6}


def test_skyline_partitioning_invariant(spark):
    """The two-phase plan must give the same SET under any partitioning —
    local removals are always justified by a surviving dominator."""
    rows = [(i, i % 17, (i * 7) % 13, (i * 3) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    spec = [("a", "max"), ("b", "max"), ("c", "min")]
    one = {r["id"] for r in skyline(df.repartition(1), spec).collect()}
    many = {r["id"] for r in skyline(df.repartition(16), spec).collect()}
    assert one == many
    want = _seq_skyline([r[1:] for r in rows], [-1, -1, 1])
    got = sorted((r["a"], r["b"], r["c"]) for r in skyline(df, spec).collect())
    # ties on all dims keep every copy — compare as multisets of dims
    assert got == sorted(
        t for t in [r[1:] for r in rows] if t in {tuple(w) for w in want}
    )


def test_skyline_all_ties_kept_and_validates(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], "id long, a long")
    assert skyline(df, [("a", "min")]).count() == 2
    with pytest.raises(ValueError, match="at least one"):
        skyline(df, [])
    with pytest.raises(ValueError, match="min|max"):
        skyline(df, [("a", "up")])


# ------------------------------------------------- rolling MAD


def _seq_mad(vals, preceding=6, k=3):
    out = []
    for i, (d, x) in enumerate(vals):
        frame = sorted(v for dd, v in vals if d - preceding <= dd <= d)
        n = len(frame)
        med2 = frame[(n - 1) // 2] + frame[n // 2]
        dev = sorted(abs(2 * v - med2) for v in frame)
        mad4 = dev[(n - 1) // 2] + dev[n // 2]
        out.append((d, med2, mad4, 2 * abs(2 * x - med2) > k * mad4))
    return out


def test_rolling_mad_matches_sequential_reference(spark):
    vals = [(0, 100), (1, 110), (2, 90), (3, 105), (4, 5000), (5, 95), (6, 100), (8, 102)]
    df = spark.createDataFrame(
        [("k", d, v) for d, v in vals], "key string, day long, v long"
    )
    got = {
        r["day"]: (r["med_x2"], r["mad_x4"], r["is_anomaly"])
        for r in rel.rolling_mad_anomaly(df, "key", "day", "v").collect()
    }
    for d, med2, mad4, flag in _seq_mad(vals):
        assert got[d] == (med2, mad4, flag), f"day {d}"
    assert got[4][2] is True  # the spike is flagged
    assert sum(1 for v in got.values() if v[2]) == 1  # and only the spike


def test_rolling_mad_range_frame_respects_gaps(spark):
    """Day 8's frame is [2, 8]: day 0/1 fall out by VALUE, not by row
    count — the RANGE-vs-ROWS distinction."""
    vals = [(0, 1), (1, 1), (8, 100), (9, 100)]
    df = spark.createDataFrame(
        [("k", d, v) for d, v in vals], "key string, day long, v long"
    )
    got = {
        r["day"]: r["med_x2"]
        for r in rel.rolling_mad_anomaly(df, "key", "day", "v").collect()
    }
    assert got[8] == 200  # frame = {100} only
    assert got[9] == 200  # frame = {100, 100}


# ------------------------------------------------- token entropy


def test_token_entropy_uniform_is_log2_vocab(spark):
    """4 equiprobable tokens: H = log2(4) = 2, normalized = 1."""
    df = spark.createDataFrame(
        [(1, "a b c d", "s")], "doc_id long, text string, source string"
    )
    row = token_entropy_by_group(df, "source", "text").collect()[0]
    assert row["n_tokens"] == 4 and row["vocab_size"] == 4
    assert row["entropy"] == 2.0 and row["norm_entropy"] == 1.0


def test_token_entropy_single_token_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam", "s")], "doc_id long, text string, source string"
    )
    row = token_entropy_by_group(df, "source", "text").collect()[0]
    assert row["entropy"] == 0.0 and row["norm_entropy"] == 0.0
    assert row["vocab_size"] == 1


def test_token_entropy_groups_are_independent(spark):
    df = spark.createDataFrame(
        [(1, "a a a a", "low"), (2, "a b c d", "high")],
        "doc_id long, text string, source string",
    )
    got = {
        r["group"]: r["entropy"]
        for r in token_entropy_by_group(df, "source", "text").collect()
    }
    assert got["low"] == 0.0 and got["high"] == 2.0


# ------------------------------------------------- dow fences


def test_dow_outliers_fence_per_weekday(spark):
    """Mondays at ~100 with one 10x Monday; the fat Monday trips ITS
    weekday's fence while an ordinary 100 does not. All values exact."""
    import datetime as dt

    mondays = [dt.date(2024, 1, 1) + dt.timedelta(days=7 * i) for i in range(5)]
    rows = [("k", d, 100 + i) for i, d in enumerate(mondays[:4])]
    rows.append(("k", mondays[4], 1000))
    df = spark.createDataFrame(rows, "key string, day date, v long")
    got = {
        str(r["day"]): r["is_outlier"]
        for r in rel.dow_seasonal_outliers(df, "key", "day", "v").collect()
    }
    assert got[str(mondays[4])] is True
    assert all(got[str(d)] is False for d in mondays[:4])


def test_dow_outliers_seasonality_not_global(spark):
    """Weekend days at 10x weekday volume: a global IQR fence would flag
    every Sunday; the per-dow fence flags none."""
    import datetime as dt

    rows = []
    for i in range(28):
        d = dt.date(2024, 1, 1) + dt.timedelta(days=i)
        rows.append(("k", d, 1000 if d.weekday() == 6 else 100))
    df = spark.createDataFrame(rows, "key string, day date, v long")
    out = rel.dow_seasonal_outliers(df, "key", "day", "v").collect()
    assert not any(r["is_outlier"] for r in out)
    assert {r["dow"] for r in out} == set(range(1, 8))
