"""Unit/property tests for the round-8 tenth batch: market-basket
association rules and log-free nDCG@k / MRR retrieval evaluation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.relational import (
    association_rules,
)
from datapipelines_essentials_python_spark.operators.similarity import (
    _ndcg_weights,
    ndcg_at_k,
)


# ------------------------------------------------- association rules


def test_rules_exact_counts_and_lift(spark):
    """4 baskets: {a,b} x3, {a} x1 -> co(a,b)=3, n_a=4, n_b=3, N=4.
    conf(a->b) = 3/4, conf(b->a) = 1, lift = 3*4/(4*3) = 1.0."""
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
            (4, "a")]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {(r["antecedent"], r["consequent"]): r for r in
           association_rules(df, "b", "i", min_pair_count=1).collect()}
    ab, ba = got[("a", "b")], got[("b", "a")]
    assert ab["n_pair"] == 3 and ab["n_antecedent"] == 4
    assert ab["confidence_micro"] == 750000
    assert ba["confidence_micro"] == 1000000
    assert ab["support_micro"] == 750000
    assert ab["lift"] == 1.0 and ba["lift"] == 1.0


def test_rules_positive_association_lift(spark):
    """b appears ONLY with a (and a appears alone too): lift > 1 for
    the pair vs independence."""
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c")]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {(r["antecedent"], r["consequent"]): r for r in
           association_rules(df, "b", "i", min_pair_count=1).collect()}
    # co=2, n_a=3, n_b=2, N=4 -> lift = 2*4/(3*2) = 1.333333
    assert got[("a", "b")]["lift"] == pytest.approx(4 / 3, abs=1e-6)


def test_rules_min_support_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "c"), (2, "d")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = association_rules(df, "b", "i", min_pair_count=2).collect()
    assert out == []


def test_rules_duplicate_item_rows_collapse(spark):
    """Multiple (basket, item) rows collapse to set semantics before
    counting — a basket can't inflate its own pair."""
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "b")]
    df = spark.createDataFrame(rows, "b long, i string")
    got = association_rules(df, "b", "i", min_pair_count=1).collect()
    assert all(r["n_pair"] == 1 for r in got)


# ------------------------------------------------- ndcg / mrr


def test_ndcg_weights_match_log_formula():
    for pos, w in _ndcg_weights(10):
        assert w == round(1_000_000 / math.log2(pos + 1))


def test_ndcg_perfect_ranking(spark):
    """All top-3 relevant and exactly 3 relevant in the corpus:
    DCG == IDCG -> nDCG 1.0, MRR 10^6."""
    rows = [("q", p, True) for p in (1, 2, 3)]
    ranked = spark.createDataFrame(rows, "q string, pos long, rel boolean")
    totals = spark.createDataFrame([("q", 3)], "q string, n long")
    r = ndcg_at_k(ranked, "q", "pos", "rel", totals, k=10).collect()[0]
    assert r["ndcg"] == 1.0
    assert r["mrr_micro"] == 1_000_000
    assert r["dcg_micro"] == r["idcg_micro"]


def test_ndcg_relevant_at_bottom(spark):
    """One relevant doc retrieved at position 10 (of 1 total): nDCG =
    w10/w1, MRR = 10^6 div 10."""
    rows = [("q", p, p == 10) for p in range(1, 11)]
    ranked = spark.createDataFrame(rows, "q string, pos long, rel boolean")
    totals = spark.createDataFrame([("q", 1)], "q string, n long")
    r = ndcg_at_k(ranked, "q", "pos", "rel", totals, k=10).collect()[0]
    w = dict(_ndcg_weights(10))
    assert r["dcg_micro"] == w[10]
    assert r["idcg_micro"] == w[1]
    assert r["ndcg"] == pytest.approx(w[10] / w[1], abs=1e-6)
    assert r["mrr_micro"] == 100_000


def test_ndcg_nothing_relevant(spark):
    rows = [("q", p, False) for p in range(1, 6)]
    ranked = spark.createDataFrame(rows, "q string, pos long, rel boolean")
    totals = spark.createDataFrame([("q", 0)], "q string, n long")
    r = ndcg_at_k(ranked, "q", "pos", "rel", totals, k=10).collect()[0]
    assert r["ndcg"] == 0.0 and r["mrr_micro"] == 0
    assert r["idcg_micro"] == 0


def test_ndcg_idcg_caps_at_k(spark):
    """1000 relevant in the corpus but k=10: IDCG uses the first 10
    weights only."""
    rows = [("q", p, True) for p in range(1, 11)]
    ranked = spark.createDataFrame(rows, "q string, pos long, rel boolean")
    totals = spark.createDataFrame([("q", 1000)], "q string, n long")
    r = ndcg_at_k(ranked, "q", "pos", "rel", totals, k=10).collect()[0]
    assert r["idcg_micro"] == sum(w for _, w in _ndcg_weights(10))
    assert r["ndcg"] == 1.0


def test_ndcg_matches_sequential_float_reference(spark):
    """Mixed relevance vs a float log2 reference: micro-quantization
    keeps the result within 1e-5 of the textbook value."""
    rel = [True, False, True, False, False, True, False, False, False, True]
    rows = [("q", p + 1, rv) for p, rv in enumerate(rel)]
    ranked = spark.createDataFrame(rows, "q string, pos long, rel boolean")
    totals = spark.createDataFrame([("q", 4)], "q string, n long")
    dcg = sum(1 / math.log2(p + 2) for p, rv in enumerate(rel) if rv)
    idcg = sum(1 / math.log2(i + 2) for i in range(4))
    r = ndcg_at_k(ranked, "q", "pos", "rel", totals, k=10).collect()[0]
    assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-5)


def test_ndcg_rejects_large_k(spark):
    ranked = spark.createDataFrame([("q", 1, True)], "q string, pos long, rel boolean")
    totals = spark.createDataFrame([("q", 1)], "q string, n long")
    with pytest.raises(ValueError):
        ndcg_at_k(ranked, "q", "pos", "rel", totals, k=21)
