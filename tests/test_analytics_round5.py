"""Unit tests for the round-5 late-block analytics operators: RFM
segmentation, lag-1 autocorrelation, Benford profiling, n-gram paths,
and truncated EWMA smoothing.
"""

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import relational


def test_rfm_segments_scores_and_boundaries(spark):
    """8 customers with strictly increasing frequency/monetary and
    strictly decreasing recency → every metric quartiles into 2+2+2+2 and
    the best customer scores 444, the worst 111."""
    rows = []
    for i in range(8):  # customer i orders (i+1) times, latest on day i+1
        for j in range(i + 1):
            rows.append((i, date(2024, 1, min(i + 1, 28)), 100.0 * (i + 1)))
    df = spark.createDataFrame(rows, "cust long, d date, amt double")
    out = {r["cust"]: r for r in relational.rfm_segments(df, "cust", "d", "amt").collect()}
    assert len(out) == 8
    assert out[7]["segment"] == "444" and out[0]["segment"] == "111"
    for metric in ("r", "f", "m"):
        scores = sorted(out[i][metric] for i in range(8))
        assert scores == [1, 1, 2, 2, 3, 3, 4, 4]
    assert out[3]["frequency"] == 4
    assert out[3]["monetary_cents"] == 4 * 40000  # 4 orders x $400 in cents
    assert out[7]["recency_days"] == 0


def test_rfm_segments_monetary_exact_cents(spark):
    """Float-looking amounts accumulate exactly via the decimal cast —
    0.1 + 0.2 must be 30 cents, not 30.000000000000004."""
    df = spark.createDataFrame(
        [(1, date(2024, 1, 1), 0.1), (1, date(2024, 1, 2), 0.2)],
        "cust long, d date, amt double",
    )
    r = relational.rfm_segments(df, "cust", "d", "amt").collect()[0]
    assert r["monetary_cents"] == 30


def test_autocorr_lag1_alternating_series(spark):
    """A perfectly alternating daily series (1,3,1,3,…) has acf1 = -1;
    a monotone ramp has acf1 = +1."""
    rows = [("alt", datetime(2024, 1, 1 + i), [1.0, 3.0][i % 2]) for i in range(8)]
    rows += [("ramp", datetime(2024, 1, 1 + i), float(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["key"]: r for r in relational.autocorr_lag1(df, "k", "ts", "v").collect()}
    assert out["alt"]["acf1"] == pytest.approx(-1.0)
    assert out["ramp"]["acf1"] == pytest.approx(1.0)
    assert out["alt"]["n_days"] == 8


def test_autocorr_lag1_min_days_filter(spark):
    df = spark.createDataFrame(
        [("short", datetime(2024, 1, 1), 1.0), ("short", datetime(2024, 1, 2), 2.0)],
        "k string, ts timestamp, v double",
    )
    assert relational.autocorr_lag1(df, "k", "ts", "v", min_days=3).count() == 0


def test_benford_profile_counts_and_expectations(spark):
    """Digits extracted lexically: 0.05 → 5, 123.4 → 1, negative amounts
    use their magnitude's lead digit; shares sum to 1."""
    amounts = [123.4, 150.0, 19.99, 0.05, 555.0, -2.5]
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    out = {r["digit"]: r for r in relational.benford_profile(df, "amt").collect()}
    assert {d: r["n"] for d, r in out.items()} == {1: 3, 5: 2, 2: 1}
    assert sum(r["share"] for r in out.values()) == pytest.approx(1.0)
    assert out[1]["benford_p"] == pytest.approx(0.30103, abs=1e-5)
    assert out[1]["deviation"] == pytest.approx(0.5 - 0.30103, abs=1e-5)


def test_ngram_paths_trigrams_and_min_count(spark):
    """u1 journey a,b,c,b,c → trigrams (a,b,c),(b,c,b),(c,b,c); u2's short
    journey contributes none; min_count filters."""
    rows = [("u1", i, s) for i, s in enumerate("abcbc")] + [
        ("u2", 0, "a"),
        ("u2", 1, "b"),
    ]
    df = spark.createDataFrame(rows, "u string, seq long, s string")
    out = sorted(
        (r["s1"], r["s2"], r["s3"], r["cnt"])
        for r in relational.ngram_paths(df, "u", ["seq"], "s", n=3).collect()
    )
    assert out == [("a", "b", "c", 1), ("b", "c", "b", 1), ("c", "b", "c", 1)]
    assert relational.ngram_paths(df, "u", ["seq"], "s", n=3, min_count=2).count() == 0


def test_ngram_paths_bigram_equals_transition_counts(spark):
    """n=2 paths reproduce the transition-matrix pair counts."""
    rows = [("u", i, s) for i, s in enumerate("aabab")]
    df = spark.createDataFrame(rows, "u string, seq long, s string")
    paths = {
        (r["s1"], r["s2"]): r["cnt"]
        for r in relational.ngram_paths(df, "u", ["seq"], "s", n=2).collect()
    }
    trans = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in relational.transition_counts(df, "u", ["seq"], "s").collect()
    }
    assert paths == trans == {("a", "a"): 1, ("a", "b"): 2, ("b", "a"): 1}


def test_ngram_paths_rejects_n1(spark):
    df = spark.createDataFrame([("u", 1, "a")], "u string, seq long, s string")
    with pytest.raises(ValueError):
        relational.ngram_paths(df, "u", ["seq"], "s", n=1)


def test_ewma_smooth_renormalizes_at_series_head(spark):
    """Day 1 has no history → ewma = v; day 2 blends (v2 + 0.5·v1)/1.5."""
    rows = [
        ("k", datetime(2024, 1, 1), 10.0),
        ("k", datetime(2024, 1, 2), 40.0),
        ("k", datetime(2024, 1, 3), 40.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        str(r["day"]): r["ewma"]
        for r in relational.ewma_smooth(df, "k", "ts", "v").collect()
    }
    assert out["2024-01-01"] == pytest.approx(10.0)
    assert out["2024-01-02"] == pytest.approx((40 + 0.5 * 10) / 1.5)
    assert out["2024-01-03"] == pytest.approx((40 + 0.5 * 40 + 0.25 * 10) / 1.75)


def test_ewma_smooth_truncates_beyond_k(spark):
    """With k=2 only the current and previous observation contribute —
    a huge value 3 days back must not leak in."""
    rows = [
        ("k", datetime(2024, 1, 1), 1e6),
        ("k", datetime(2024, 1, 2), 2.0),
        ("k", datetime(2024, 1, 3), 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        str(r["day"]): r["ewma"]
        for r in relational.ewma_smooth(df, "k", "ts", "v", k=2).collect()
    }
    assert out["2024-01-03"] == pytest.approx((4 + 0.5 * 2) / 1.5)


def test_ewma_truncation_contrast(spark):
    """VERDICT r05 item 8: quantify the fixed-depth truncation on a
    series LONGER than k. The engine must equal the truncated
    renormalized reference exactly (at the 6-dp round), and its
    deviation from the UNBOUNDED renormalized EWMA must be (a) nonzero
    once history exceeds k — the truncation is real — yet (b) inside the
    analytic tail bound: dropping weights α^j (j ≥ k) perturbs a
    renormalized mean of values in [lo, hi] by at most
    ``(α^k / (1 − α^k)) · (hi − lo)``."""
    alpha, k, n_days = 0.5, 7, 20
    vals = [float((3 * t) % 17 + 1) for t in range(n_days)]  # non-constant
    rows = [("k", datetime(2024, 1, 1 + t), vals[t]) for t in range(n_days)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        str(r["day"]): r["ewma"]
        for r in relational.ewma_smooth(df, "k", "ts", "v", alpha=alpha, k=k).collect()
    }

    def ref(t: int, depth: int) -> float:
        js = range(min(depth, t + 1))
        num = sum((alpha**j) * vals[t - j] for j in js)
        den = sum(alpha**j for j in js)
        return num / den

    deviations = []
    for t in range(n_days):
        day = str(datetime(2024, 1, 1 + t).date())
        assert got[day] == pytest.approx(ref(t, k), abs=1e-6)
        if t + 1 > k:
            deviations.append(abs(ref(t, k) - ref(t, n_days)))
    bound = (alpha**k / (1 - alpha**k)) * (max(vals) - min(vals))
    assert max(deviations) > 0  # truncation genuinely deviates...
    assert max(deviations) <= bound  # ...but stays inside the tail bound


def test_ewma_smooth_rejects_bad_alpha(spark):
    df = spark.createDataFrame([("k", datetime(2024, 1, 1), 1.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError):
        relational.ewma_smooth(df, "k", "ts", "v", alpha=0.0)
