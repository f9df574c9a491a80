"""Unit/property tests for the round-8 thirteenth batch: Siegel
repeated-medians slope and the delta-encoding compressibility audit.
"""

from __future__ import annotations

import statistics

import pytest

from datapipelines_essentials_python_spark.operators.relational import (
    delta_encoding_audit,
    siegel_slopes,
)


def _siegel_reference_x4(points):
    """Pure-Python repeated medians in the operator's exact arithmetic:
    milli-slopes by truncating div, inner median as two-middle sum
    (x2), outer as two-middle sum of those (x4)."""
    def two_middle_sum(vals):
        s = sorted(vals)
        n = len(s)
        return s[(n - 1) // 2] + s[n // 2]

    inner = []
    for t1, y1 in points:
        slopes = []
        for t2, y2 in points:
            if t2 != t1:
                num = 1000 * (y2 - y1)
                den = t2 - t1
                q = abs(num) // abs(den)
                slopes.append(q if (num >= 0) == (den > 0) else -q)
        inner.append(two_middle_sum(slopes))
    return two_middle_sum(inner)


def test_siegel_clean_line_exact(spark):
    pts = [(t, 50 + 7 * t) for t in range(10)]
    df = spark.createDataFrame([("k", t, y) for t, y in pts],
                               "k string, t long, y long")
    r = siegel_slopes(df, "k", "t", "y").collect()[0]
    # slope 7 -> milli 7000 -> x4 = 28000
    assert r["siegel_milli_x4"] == 28000
    assert r["n_points"] == 10


def test_siegel_survives_almost_half_corrupted(spark):
    """4 of 10 points blown up by +10^6: Siegel still reports the
    clean slope (50% breakdown), matching the sequential reference."""
    pts = [(t, 50 + 7 * t) for t in range(10)]
    pts = [(t, y + (1_000_000 if t in (1, 4, 6, 9) else 0)) for t, y in pts]
    df = spark.createDataFrame([("k", t, y) for t, y in pts],
                               "k string, t long, y long")
    r = siegel_slopes(df, "k", "t", "y").collect()[0]
    assert r["siegel_milli_x4"] == _siegel_reference_x4(pts)
    # the estimate stays near the clean 7000 milli-slope
    assert abs(r["siegel_milli_x4"] / 4 - 7000) < 1000


def test_siegel_matches_reference_random(spark):
    pts = [(t, ((t * 37) % 11) * 13 + 5 * t) for t in range(12)]
    df = spark.createDataFrame([("k", t, y) for t, y in pts],
                               "k string, t long, y long")
    r = siegel_slopes(df, "k", "t", "y").collect()[0]
    assert r["siegel_milli_x4"] == _siegel_reference_x4(pts)


# ------------------------------------------------- delta audit


def test_delta_audit_smooth_vs_noisy(spark):
    """A smooth ramp compresses (ratio << 10^6); an alternating series
    does not (Σ|Δ| ≈ 2·mean jump per step)."""
    smooth = [("s", t, 1000 + t) for t in range(100)]
    noisy = [("n", t, 1000 if t % 2 == 0 else -1000) for t in range(100)]
    df = spark.createDataFrame(smooth + noisy, "k string, t long, x long")
    got = {r["key"]: r for r in
           delta_encoding_audit(df, "k", "t", "x").collect()}
    assert got["s"]["sum_abs_delta"] == 99  # unit steps
    assert got["s"]["delta_ratio_micro"] < 1000
    assert got["n"]["sum_abs_delta"] == 2000 * 99
    assert got["n"]["delta_ratio_micro"] > 1_000_000
    assert got["s"]["delta_bits"] == 1
    assert got["s"]["raw_bits"] >= 10


def test_delta_audit_exact_bits(spark):
    """max |x| = 7 -> 3 bits; max |Δ| = 4 -> 3 bits; boundary 8 -> 4."""
    rows = [("k", 0, 7), ("k", 1, 3), ("k", 2, 7), ("b", 0, 8), ("b", 1, 0)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {r["key"]: r for r in
           delta_encoding_audit(df, "k", "t", "x").collect()}
    assert got["k"]["raw_bits"] == 3
    assert got["k"]["delta_bits"] == 3  # |Δ| = 4 -> bin "100" = 3 bits
    assert got["b"]["raw_bits"] == 4  # bin "1000" = 4 bits


# ------------------------------------------------- trimmed mean / mode


def test_trimmed_mean_drops_tails(spark):
    """Values 1..10 with a blown-up outlier 1000 instead of 10:
    trim 10% drops one from each side (the 1000 among them)."""
    from datapipelines_essentials_python_spark.operators.relational import (
        trimmed_mean,
    )

    vals = list(range(1, 10)) + [1000]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = trimmed_mean(df, "g", "v", 0.1).collect()[0]
    assert r["n"] == 10 and r["n_kept"] == 8
    assert r["trimmed_mean"] == pytest.approx(sum(range(2, 10)) / 8, abs=1e-6)


def test_trimmed_mean_zero_trim_is_mean(spark):
    from datapipelines_essentials_python_spark.operators.relational import (
        trimmed_mean,
    )

    df = spark.createDataFrame([("g", v) for v in (10, 20, 40)],
                               "g string, v long")
    r = trimmed_mean(df, "g", "v", 0.0).collect()[0]
    assert r["n_kept"] == 3
    assert r["trimmed_mean"] == pytest.approx(70 / 3, abs=1e-6)


def test_trimmed_mean_rejects_half(spark):
    from datapipelines_essentials_python_spark.operators.relational import (
        trimmed_mean,
    )

    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError):
        trimmed_mean(df, "g", "v", 0.5)


def test_mode_deterministic_tie_break(spark):
    """Counts tie between values 3 and 7: the SMALLEST value wins."""
    from datapipelines_essentials_python_spark.operators.relational import (
        mode_value,
    )

    rows = [("g", 7)] * 3 + [("g", 3)] * 3 + [("g", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = mode_value(df, "g", "v").collect()[0]
    assert r["mode_value"] == 3
    assert r["mode_count"] == 3
    assert r["n_distinct"] == 3
