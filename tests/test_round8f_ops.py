"""Unit/property tests for the round-8 sixth batch: Spearman rank
correlation, Mann-Kendall trend test, Welch's t-test, Gini
concentration, contingency chi-square/Cramér's V, and deterministic
k-fold assignment — each checked against a hand-computed or
scipy-free sequential reference.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.relational import (
    contingency_chi2,
    gini_coefficient,
    mann_kendall,
    spearman_corr,
    welch_ttest,
)
from datapipelines_essentials_python_spark.operators.sampling import (
    kfold_assign,
)


# ------------------------------------------------- spearman


def test_spearman_perfect_monotone_nonlinear(spark):
    """y = x^3 is monotone but nonlinear: Spearman must be exactly 1.0
    (Pearson would be < 1)."""
    rows = [("g", float(x), float(x) ** 3) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = spearman_corr(df, "g", "x", "y").collect()[0]
    assert got["spearman_rho"] == 1.0
    assert got["n"] == 10


def test_spearman_reversal_is_minus_one(spark):
    rows = [("g", float(x), float(-x)) for x in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    assert spearman_corr(df, "g", "x", "y").collect()[0]["spearman_rho"] == -1.0


def test_spearman_ties_average_rank(spark):
    """x = [1,1,2], y = [1,2,3]: average x-ranks are [1.5, 1.5, 3].
    Sequential tie-correct Spearman = 0.866025 (sqrt(3)/2)."""
    rows = [("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = spearman_corr(df, "g", "x", "y").collect()[0]["spearman_rho"]
    assert got == pytest.approx(math.sqrt(3) / 2, abs=1e-6)


def test_spearman_matches_sequential_reference(spark):
    """Deterministic pseudo-random series vs a pure-Python tie-correct
    Spearman (Pearson on average ranks)."""
    xs = [(i * 7919) % 23 for i in range(40)]  # ties guaranteed (mod 23)
    ys = [(i * 104729) % 17 for i in range(40)]
    rows = [("g", float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    expected = num / den
    got = spearman_corr(df, "g", "x", "y").collect()[0]["spearman_rho"]
    assert got == pytest.approx(expected, abs=1e-6)


# ------------------------------------------------- mann-kendall


def _mk_reference(ys):
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    if var18 > 0 and s > 0:
        z = (s - 1.0) / math.sqrt(var18 / 18.0)
    elif var18 > 0 and s < 0:
        z = (s + 1.0) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    return s, var18, z


def test_mann_kendall_monotone_series(spark):
    ys = [10, 20, 30, 40, 50, 60]
    rows = [("k", t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t long, y long")
    got = mann_kendall(df, "k", "t", "y").collect()[0]
    s, var18, z = _mk_reference(ys)
    assert got["s_stat"] == s == 15
    assert got["var18"] == var18
    assert got["mk_z"] == pytest.approx(z, abs=1e-6)
    assert got["trend"] == "increasing"


def test_mann_kendall_ties_and_decrease(spark):
    ys = [50, 50, 40, 40, 30, 20, 20, 10]
    rows = [("k", t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t long, y long")
    got = mann_kendall(df, "k", "t", "y").collect()[0]
    s, var18, z = _mk_reference(ys)
    assert got["s_stat"] == s
    assert got["var18"] == var18
    assert got["mk_z"] == pytest.approx(z, abs=1e-6)
    assert got["trend"] == "decreasing"


def test_mann_kendall_all_ties_flat(spark):
    """Constant series: S = 0, var18 = 0 (every pair tied) -> z = 0,
    flat — the division guard, not a NaN."""
    rows = [("k", t, 7) for t in range(5)]
    df = spark.createDataFrame(rows, "k string, t long, y long")
    got = mann_kendall(df, "k", "t", "y").collect()[0]
    assert got["s_stat"] == 0
    assert got["var18"] == 0
    assert got["mk_z"] == 0.0
    assert got["trend"] == "flat"


# ------------------------------------------------- welch


def test_welch_matches_sequential_reference(spark):
    a = [100, 110, 120, 130, 140]
    b = [200, 220, 240, 190, 260, 210]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = welch_ttest(df, "g", "v").collect()
    assert len(got) == 1
    r = got[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["welch_df"] == pytest.approx(dof, abs=1e-6)
    assert r["mean_a"] == pytest.approx(ma, abs=1e-6)
    assert bool(r["significant"]) == (abs(t) > 1.96)


def test_welch_identical_groups_t_zero(spark):
    rows = [("a", v) for v in [10, 20, 30]] + [("b", v) for v in [10, 20, 30]]
    df = spark.createDataFrame(rows, "g string, v long")
    r = welch_ttest(df, "g", "v").collect()[0]
    assert r["t_stat"] == 0.0
    assert not r["significant"]


def test_welch_singleton_group_excluded(spark):
    """n=1 has no sample variance — the pair is dropped, not NaN'd."""
    rows = [("a", 1), ("b", 2), ("b", 3), ("c", 4), ("c", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    pairs = {(r["group_a"], r["group_b"]) for r in welch_ttest(df, "g", "v").collect()}
    assert pairs == {("b", "c")}


# ------------------------------------------------- gini


def test_gini_uniform_is_near_zero(spark):
    rows = [("g", i, 100) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = gini_coefficient(df, "g", "v", "id").collect()[0]
    # exact rank-form value for equal shares is 0 (2*sum(r)/(n*n) - (n+1)/n)
    assert r["gini"] == 0.0
    assert r["total_value"] == 1000


def test_gini_total_concentration(spark):
    """One member holds everything: rank form gives (n-1)/n for the
    winner-takes-all distribution."""
    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 0), ("g", 4, 1000)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = gini_coefficient(df, "g", "v", "id").collect()[0]
    assert r["gini"] == pytest.approx(3 / 4, abs=1e-6)


def test_gini_matches_sequential_reference(spark):
    vals = [(i * 37) % 100 + 1 for i in range(20)]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    xs = sorted(vals)
    n, sx = len(xs), sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    expected = 2.0 * srx / (n * sx) - (n + 1.0) / n
    r = gini_coefficient(df, "g", "v", "id").collect()[0]
    assert r["gini"] == pytest.approx(expected, abs=1e-6)


# ------------------------------------------------- contingency chi2


def test_contingency_independent_is_zero(spark):
    """Perfectly independent 2x2 (balanced cross): chi2 = 0, V = 0."""
    rows = []
    for a in ("x", "y"):
        for b in ("p", "q"):
            rows += [(a, b)] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    out = contingency_chi2(df, "a", "b").collect()
    assert len(out) == 4
    assert all(r["contrib_micro"] == 0 for r in out)
    assert out[0]["chi2_micro"] == 0
    assert out[0]["cramers_v"] == 0.0
    assert out[0]["dof"] == 1


def test_contingency_perfect_association(spark):
    """Diagonal-only 2x2: chi2 = N, V = 1. The O=0 off-diagonal cells
    MUST be present (they carry half the statistic)."""
    rows = [("x", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    out = contingency_chi2(df, "a", "b").collect()
    assert len(out) == 4  # full grid, not 2 observed cells
    zero_cells = [r for r in out if r["observed"] == 0]
    assert len(zero_cells) == 2
    assert all(r["contrib_micro"] > 0 for r in zero_cells)
    r = out[0]
    assert r["chi2_micro"] == 20 * 1_000_000  # chi2 = N exactly
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)


def test_contingency_matches_sequential_chi2(spark):
    """3x2 with deterministic skew vs a pure-Python chi2 over the full
    grid (micro-quantized the same way)."""
    data = {("a", "p"): 30, ("a", "q"): 10, ("b", "p"): 20,
            ("b", "q"): 25, ("c", "p"): 5, ("c", "q"): 40}
    rows = [(a, b) for (a, b), k in data.items() for _ in range(k)]
    df = spark.createDataFrame(rows, "a string, b string")
    n = sum(data.values())
    na = {a: sum(v for (x, _), v in data.items() if x == a) for a in "abc"}
    nb = {b: sum(v for (_, y), v in data.items() if y == b) for b in "pq"}
    expected_micro = sum(
        (1_000_000 * (data.get((a, b), 0) * n - na[a] * nb[b]) ** 2)
        // (n * na[a] * nb[b])
        for a in "abc"
        for b in "pq"
    )
    out = contingency_chi2(df, "a", "b").collect()
    assert out[0]["chi2_micro"] == expected_micro
    chi2 = expected_micro / 1e6
    v = math.sqrt(chi2 / (n * 1))  # min(3-1, 2-1) = 1
    assert out[0]["cramers_v"] == pytest.approx(v, abs=1e-6)


# ------------------------------------------------- kfold


def test_kfold_matches_md5_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    got = {r["id"]: r["fold"] for r in kfold_assign(df, "id", k=5).collect()}
    for i in range(200):
        h = hashlib.md5(f"kfold|{i}".encode()).hexdigest()
        assert got[i] == int(h[:8], 16) % 5, i


def test_kfold_partitions_every_row_once(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    out = kfold_assign(df, "id", k=7)
    counts = {r["fold"]: r["n"] for r in
              out.groupBy("fold").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 500
    assert set(counts) <= set(range(7))
    # roughly balanced: no fold under half or over double the mean
    for c in counts.values():
        assert 500 / 7 / 2 < c < 500 / 7 * 2


def test_kfold_rejects_k_below_two(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        kfold_assign(df, "id", k=1)
