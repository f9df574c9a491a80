"""Unit/property tests for the round-8 seventh batch: histogram-based
Kendall tau-b, inter-arrival quantiles, piecewise OLS at the CUSUM
break, and Simpson diversity — each vs a sequential reference.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.relational import (
    interarrival_quantiles,
    kendall_tau_binned,
    trend_break_ols,
)
from datapipelines_essentials_python_spark.operators.text import (
    simpson_diversity,
)


# ------------------------------------------------- kendall tau-b


def _tau_b_reference(pairs):
    n = len(pairs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[j][0] - pairs[i][0]
            dy = pairs[j][1] - pairs[i][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    from collections import Counter

    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in pairs).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in pairs).values())
    den = math.sqrt(n0 - n1) * math.sqrt(n0 - n2)
    return c, d, (c - d) / den if den > 0 else 0.0


def test_tau_perfect_concordance(spark):
    rows = [("g", i, i * 10) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = kendall_tau_binned(df, "g", "x", "y").collect()[0]
    assert r["tau_b"] == 1.0
    assert r["discordant"] == 0


def test_tau_matches_sequential_reference_with_ties(spark):
    pairs = [((i * 7) % 5, (i * 11) % 4) for i in range(30)]
    rows = [("g", x, y) for x, y in pairs]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    c, d, tau = _tau_b_reference(pairs)
    r = kendall_tau_binned(df, "g", "x", "y").collect()[0]
    assert r["concordant"] == c
    assert r["discordant"] == d
    assert r["n"] == 30
    assert r["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_tau_all_tied_x_is_zero(spark):
    """Every x identical: no ordered pairs at all -> C = D = 0 and the
    denominator guard yields 0.0, not NaN."""
    rows = [("g", 1, y) for y in range(6)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = kendall_tau_binned(df, "g", "x", "y").collect()[0]
    assert r["concordant"] == 0 and r["discordant"] == 0
    assert r["tau_b"] == 0.0


# ------------------------------------------------- interarrival


def test_interarrival_exact_indexes(spark):
    """One series, gaps 1..10 seconds: lower-median index (9 div 2)+1=5
    -> 5 s; p90 index (9*9 div 10)+1 = 9 -> 9 s; mean = 5.5 truncated
    to 5 s (all in microseconds)."""
    base = 1_700_000_000
    ts, acc = [base], base
    for g in range(1, 11):
        acc += g
        ts.append(acc)
    rows = [(i, "u1", "click", t) for i, t in enumerate(ts)]
    df = spark.createDataFrame(
        rows, "event_id long, user string, etype string, sec long"
    ).withColumn("ts", F.col("sec").cast("timestamp"))
    out = interarrival_quantiles(
        df, ["user", "etype"], "etype", "ts", "event_id"
    ).collect()[0]
    assert out["n_gaps"] == 10
    assert out["p50_gap_us"] == 5_000_000
    assert out["p90_gap_us"] == 9_000_000
    assert out["mean_gap_us"] == 5_500_000


def test_interarrival_series_isolation(spark):
    """Gaps never span series: two users each with 2 events produce 2
    gaps, not 3."""
    rows = [
        (1, "u1", "click", 100),
        (2, "u1", "click", 160),
        (3, "u2", "click", 1000),
        (4, "u2", "click", 1030),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user string, etype string, sec long"
    ).withColumn("ts", F.col("sec").cast("timestamp"))
    out = interarrival_quantiles(
        df, ["user", "etype"], "etype", "ts", "event_id"
    ).collect()[0]
    assert out["n_gaps"] == 2
    assert out["p50_gap_us"] == 30_000_000  # lower median of {60s, 30s}
    assert out["mean_gap_us"] == 45_000_000


def test_interarrival_equal_ts_tiebreak(spark):
    """Simultaneous events order by the tiebreak id -> a 0 gap, never a
    nondeterministic negative one."""
    rows = [(2, "u1", "x", 100), (1, "u1", "x", 100), (3, "u1", "x", 105)]
    df = spark.createDataFrame(
        rows, "event_id long, user string, etype string, sec long"
    ).withColumn("ts", F.col("sec").cast("timestamp"))
    out = interarrival_quantiles(
        df, ["user", "etype"], "etype", "ts", "event_id"
    ).collect()[0]
    assert out["n_gaps"] == 2
    assert out["p50_gap_us"] == 0
    # lower empirical quantile: index floor(0.9*(2-1))+1 = 1 -> the
    # smaller gap (numpy percentile method='lower' agrees)
    assert out["p90_gap_us"] == 0
    assert out["mean_gap_us"] == 2_500_000


# ------------------------------------------------- trend break


def test_trend_break_detects_bend(spark):
    """Flat-then-steep series: slope_before ~ 0, slope_after ~ 100;
    the cusum argmax lands inside the flat prefix (cumulative
    deviation peaks at the regime edge) and both segment fits are
    closed-form exact."""
    rows = [("k", t, 1000) for t in range(10)] + [
        ("k", t, 1000 + (t - 9) * 100) for t in range(10, 20)
    ]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    r = trend_break_ols(df, "k", "d", "v").collect()[0]
    assert r["n_before"] + r["n_after"] == 20
    # the cusum argmax lands near the regime boundary (cumulative
    # deviation peaks around the bend, not exactly on it) and the
    # after-segment slope is decisively steeper
    assert 5 <= r["cp_day"] <= 14
    assert r["slope_after"] > r["slope_before"] + 50
    assert r["slope_delta"] == pytest.approx(
        r["slope_after"] - r["slope_before"], abs=1e-5
    )


def test_trend_break_matches_manual_ols(spark):
    """Pin the exact per-segment slopes for a hand-checkable series."""
    ys = [10, 20, 30, 40, 400, 300, 200, 100]
    rows = [("k", t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    r = trend_break_ols(df, "k", "d", "v").collect()[0]

    def ols(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, y in pts)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    cp = r["cp_day"]
    before = [(t, y) for t, y in enumerate(ys) if t <= cp]
    after = [(t, y) for t, y in enumerate(ys) if t > cp]
    assert r["slope_before"] == pytest.approx(ols(before), abs=1e-6)
    assert r["slope_after"] == pytest.approx(ols(after), abs=1e-6)


def test_trend_break_single_segment_guard(spark):
    """If the break lands at the end, the after-segment has < 2 points
    and its slope is the guarded 0.0, not a NaN."""
    rows = [("k", t, t * 10) for t in range(5)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    r = trend_break_ols(df, "k", "d", "v").collect()[0]
    assert r["n_before"] + r["n_after"] == 5
    if r["n_after"] < 2:
        assert r["slope_after"] == 0.0


# ------------------------------------------------- simpson


def test_simpson_uniform_tokens(spark):
    """4 distinct tokens once each: repeat rate 0, hill2 = N^2/N = 4 =
    vocab (max diversity)."""
    df = spark.createDataFrame([("s", "a b c d")], "src string, text string")
    r = simpson_diversity(df, "src", "text").collect()[0]
    assert r["n_tokens"] == 4
    assert r["vocab_size"] == 4
    assert r["repeat_micro"] == 0
    assert r["hill2_types"] == 4.0


def test_simpson_dominated_distribution(spark):
    """'a' 9 times + 'b' once: hill2 = 100/82 ~ 1.2195 — dominance
    collapses effective types toward 1; repeat rate = (72+0)/90."""
    df = spark.createDataFrame(
        [("s", " ".join(["a"] * 9 + ["b"]))], "src string, text string"
    )
    r = simpson_diversity(df, "src", "text").collect()[0]
    assert r["hill2_types"] == pytest.approx(100 / 82, abs=1e-6)
    assert r["repeat_micro"] == (72 * 1_000_000) // 90


def test_simpson_vs_entropy_ordering(spark):
    """A dominated source scores LOWER hill2 than a balanced one with
    the same vocab — the dominance sensitivity that motivates the
    operator."""
    balanced = " ".join(["a", "b", "c", "d"] * 5)
    dominated = " ".join(["a"] * 17 + ["b", "c", "d"])
    df = spark.createDataFrame(
        [("bal", balanced), ("dom", dominated)], "src string, text string"
    )
    got = {r["group"]: r["hill2_types"] for r in
           simpson_diversity(df, "src", "text").collect()}
    assert got["dom"] < got["bal"]
    assert got["bal"] == pytest.approx(4.0, abs=1e-6)
