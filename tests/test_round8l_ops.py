"""Unit/property tests for the round-8 twelfth batch: one-way ANOVA F
and histogram-ranked Kruskal-Wallis H — vs scipy-free sequential
references.
"""

from __future__ import annotations

import pytest

from datapipelines_essentials_python_spark.operators.relational import (
    anova_oneway,
    kruskal_wallis,
)


def _anova_reference(groups):
    k = len(groups)
    all_vals = [v for g in groups for v in g]
    n = len(all_vals)
    grand = sum(all_vals) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum((v - sum(g) / len(g)) ** 2 for g in groups for v in g)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return ssb, ssw, f


def _kw_reference(groups):
    import itertools
    from collections import Counter

    all_vals = sorted(v for g in groups for v in g)
    n = len(all_vals)
    # average ranks with ties
    first = {}
    for i, v in enumerate(all_vals):
        first.setdefault(v, i + 1)
    cnt = Counter(all_vals)
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    h = 12 / (n * (n + 1)) * sum(
        sum(avg_rank[v] for v in g) ** 2 / len(g) for g in groups
    ) - 3 * (n + 1)
    tie = sum(t**3 - t for t in cnt.values())
    return h / (1 - tie / (n**3 - n))


def _mk(spark, groups):
    rows = [(f"g{i}", v) for i, g in enumerate(groups) for v in g]
    return spark.createDataFrame(rows, "g string, v long")


def test_anova_matches_sequential(spark):
    groups = [[10, 12, 14, 16], [20, 22, 24], [11, 13, 15, 17, 19]]
    df = _mk(spark, groups)
    ssb, ssw, f = _anova_reference(groups)
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r["k_groups"] == 3 and r["n"] == 12
    assert r["ssb_micro"] / 1e6 == pytest.approx(ssb, abs=1e-5)
    assert r["ssw_micro"] / 1e6 == pytest.approx(ssw, abs=1e-5)
    assert r["f_stat"] == pytest.approx(f, abs=1e-4)


def test_anova_identical_groups_f_zero(spark):
    groups = [[5, 10, 15], [5, 10, 15], [5, 10, 15]]
    df = _mk(spark, groups)
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r["ssb_micro"] == 0
    assert r["f_stat"] == 0.0


def test_kruskal_matches_sequential_with_ties(spark):
    groups = [
        [1, 2, 2, 3, 5],
        [3, 3, 4, 6, 6, 7],
        [5, 7, 8, 8, 9],
    ]
    df = _mk(spark, groups)
    expected = _kw_reference(groups)
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r["k_groups"] == 3 and r["n"] == 16
    assert r["h_stat"] == pytest.approx(expected, abs=1e-4)


def test_kruskal_shifted_groups_large_h(spark):
    """Completely separated groups: H near its maximum; same-valued
    groups: H ~ 0 (both sides of the discriminative range)."""
    sep = [[1, 2, 3], [11, 12, 13], [21, 22, 23]]
    same = [[7, 7, 7], [7, 7, 7], [7, 7, 7]]
    r_sep = kruskal_wallis(_mk(spark, sep), "g", "v").collect()[0]
    r_same = kruskal_wallis(_mk(spark, same), "g", "v").collect()[0]
    assert r_sep["h_stat"] == pytest.approx(_kw_reference(sep), abs=1e-4)
    assert r_sep["h_stat"] > 7  # chi2(df=2) 5% critical is 5.99
    # all-tied: tie divisor hits 0 -> guarded 0.0
    assert r_same["h_stat"] == 0.0


def test_kruskal_rank_identity_no_ties(spark):
    """No ties: H reduces to the textbook rank-sum formula — checked
    on a permutation where ranks are known exactly."""
    groups = [[10, 40], [20, 50], [30, 60]]
    df = _mk(spark, groups)
    expected = _kw_reference(groups)
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r["tie_t"] == 0
    assert r["h_stat"] == pytest.approx(expected, abs=1e-5)
