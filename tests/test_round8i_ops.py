"""Unit/property tests for the round-8 ninth batch: Mann-Whitney exact
AUC, the calibration/ECE table, and out-of-fold target encoding.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.relational import (
    auc_mann_whitney,
    calibration_table,
)
from datapipelines_essentials_python_spark.operators.sampling import (
    target_encode_oof,
)


# ------------------------------------------------- AUC


def test_auc_perfect_separation(spark):
    rows = [("g", True, 0.9), ("g", True, 0.8), ("g", False, 0.2),
            ("g", False, 0.1)]
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    r = auc_mann_whitney(df, "g", "y", "s").collect()[0]
    assert r["auc"] == 1.0
    assert r["u2"] == 2 * r["n_pos"] * r["n_neg"]


def test_auc_inverted_scores(spark):
    rows = [("g", True, 0.1), ("g", True, 0.2), ("g", False, 0.8),
            ("g", False, 0.9)]
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    assert auc_mann_whitney(df, "g", "y", "s").collect()[0]["auc"] == 0.0


def test_auc_all_tied_is_half(spark):
    """Identical scores: every pos/neg pair gets the 0.5 tie credit."""
    rows = [("g", True, 0.5)] * 3 + [("g", False, 0.5)] * 5
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    assert auc_mann_whitney(df, "g", "y", "s").collect()[0]["auc"] == 0.5


def test_auc_matches_sequential_pair_count(spark):
    """Deterministic mixed scores vs the O(n^2) definition:
    (wins + 0.5*ties) / (n_pos*n_neg)."""
    scores = [((i * 17) % 7) / 7.0 for i in range(24)]
    labels = [(i * 5) % 3 == 0 for i in range(24)]
    rows = [("g", y, s) for y, s in zip(labels, scores)]
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    pos = [s for y, s in zip(labels, scores) if y]
    neg = [s for y, s in zip(labels, scores) if not y]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    expected = (wins + 0.5 * ties) / (len(pos) * len(neg))
    r = auc_mann_whitney(df, "g", "y", "s").collect()[0]
    assert r["auc"] == pytest.approx(expected, abs=1e-6)
    assert r["u2"] == 2 * wins + ties


def test_auc_degenerate_one_class(spark):
    rows = [("g", True, 0.5), ("g", True, 0.7)]
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    r = auc_mann_whitney(df, "g", "y", "s").collect()[0]
    assert r["n_neg"] == 0 and r["auc"] == 0.0


# ------------------------------------------------- calibration


def test_calibration_perfectly_calibrated_bucket(spark):
    """10 rows at conf 0.7, exactly 7 positive: acc == conf, ECE 0."""
    rows = [(i < 7, 700000) for i in range(10)]
    df = spark.createDataFrame(rows, "y boolean, score_micro long")
    out = calibration_table(df, "y", "score_micro").collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 7
    assert r["acc"] == 0.7 and r["conf"] == 0.7
    assert r["ece"] == 0.0


def test_calibration_overconfident_model(spark):
    """Conf 0.9 but only half right: that bucket contributes 0.4 to
    ECE; a second perfect bucket halves the weighted total."""
    rows = [(i < 5, 900000) for i in range(10)] + [
        (i < 2, 200000) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "y boolean, score_micro long")
    out = {r["bucket"]: r for r in
           calibration_table(df, "y", "score_micro").collect()}
    assert out[9]["acc"] == 0.5 and out[9]["conf"] == 0.9
    assert out[2]["acc"] == 0.2 and out[2]["conf"] == 0.2
    # ECE = (10*0.4 + 10*0.0) / 20
    assert out[9]["ece"] == pytest.approx(0.2, abs=1e-6)


def test_calibration_top_edge_clamped(spark):
    """score_micro = 10^6 (probability 1.0) lands in bucket 9, not a
    phantom bucket 10."""
    df = spark.createDataFrame(
        [(True, 1_000_000)], "y boolean, score_micro long"
    )
    out = calibration_table(df, "y", "score_micro").collect()
    assert out[0]["bucket"] == 9


# ------------------------------------------------- OOF target encoding


def _fold_of(i, k=5, salt="kfold"):
    return int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], 16) % k


def test_oof_mean_excludes_own_fold(spark):
    """Per (cat, fold) the encoding equals the mean over the OTHER
    folds, checked against a hashlib replay."""
    rows = [(i, "a" if i % 2 == 0 else "b", (i * 13) % 100)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, cat string, t long")
    got = {(r["category"], r["fold"]): r for r in
           target_encode_oof(df, "id", "cat", "t", k=5).collect()}
    by_cf = {}
    for i, cat, t in rows:
        by_cf.setdefault((cat, _fold_of(i)), []).append(t)
    for (cat, fold), vals in by_cf.items():
        other = [t for (c2, f2), vs in by_cf.items() if c2 == cat
                 and f2 != fold for t in vs]
        exp = sum(other) / len(other)
        assert got[(cat, fold)]["oof_mean"] == pytest.approx(exp, abs=1e-6)
        assert got[(cat, fold)]["n_in_fold"] == len(vals)
        assert got[(cat, fold)]["oof_n"] == len(other)


def test_oof_single_fold_category_falls_back_to_global(spark):
    """A category whose rows all hash into one fold gets the GLOBAL
    mean (no complement exists), never a div-by-zero."""
    rows = [(i, "big", 10) for i in range(100)]
    # find one id and give it a lonely category
    lone_fold = _fold_of(7)
    rows.append((7_000_001, "lonely", 500))
    df = spark.createDataFrame(rows, "id long, cat string, t long")
    got = {(r["category"], r["fold"]): r for r in
           target_encode_oof(df, "id", "cat", "t", k=5).collect()}
    lonely = [v for (c, f), v in got.items() if c == "lonely"]
    assert len(lonely) == 1
    total = 100 * 10 + 500
    assert lonely[0]["oof_n"] == 0
    assert lonely[0]["oof_mean"] == pytest.approx(total / 101, abs=1e-6)
