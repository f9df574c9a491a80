"""Unit/property tests for the round-8 fifteenth batch: PSI drift,
Monroe log-odds distinctive terms, and the Newman-weighted bipartite
projection.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.graph import (
    newman_weighted_projection,
)
from datapipelines_essentials_python_spark.operators.relational import (
    psi_drift,
)
from datapipelines_essentials_python_spark.operators.text import (
    distinctive_terms,
)


# ------------------------------------------------- psi


def test_psi_identical_halves_is_zero(spark):
    """Same distribution in both slices: every term ~0, total 0."""
    rows = [(i, 100 + (i % 5) * 60) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = psi_drift(df, "v", F.col("id") % 2 == 0, [150.0, 250.0]).collect()
    assert all(r["psi_term"] == 0.0 for r in out)
    assert out[0]["psi_total"] == 0.0


def test_psi_shifted_distribution_positive(spark):
    """Reference mass in low buckets, current mass in high buckets:
    PSI total is decisively positive (the retrain signal)."""
    ref = [(2 * i, 100) for i in range(100)]          # even ids: low
    cur = [(2 * i + 1, 400) for i in range(100)]      # odd ids: high
    df = spark.createDataFrame(ref + cur, "id long, v long")
    out = psi_drift(df, "v", F.col("id") % 2 == 0, [150.0, 250.0]).collect()
    assert out[0]["psi_total"] > 0.25


def test_psi_matches_sequential_reference(spark):
    """Laplace-smoothed reference replay with the same 9dp rounding."""
    rows = [(i, (i * 13) % 350) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    edges = [100.0, 200.0]
    out = psi_drift(df, "v", F.col("id") % 3 == 0, edges).collect()

    from collections import Counter

    nb = 3  # buckets 0,1,2
    cnt_ref, cnt_cur = Counter(), Counter()
    for i, v in rows:
        b = sum(1 for e in edges if v >= e)
        (cnt_ref if i % 3 == 0 else cnt_cur)[b] += 1
    buckets = sorted(set(cnt_ref) | set(cnt_cur))
    t_ref = sum(cnt_ref.values()) + len(buckets)
    t_cur = sum(cnt_cur.values()) + len(buckets)
    total = 0.0
    terms = {}
    for b in buckets:
        p = (cnt_ref[b] + 1) / t_ref
        q = (cnt_cur[b] + 1) / t_cur
        terms[b] = round((q - p) * math.log(q / p), 9)
        total += terms[b]
    got = {r["bucket"]: r for r in out}
    for b in buckets:
        assert got[b]["psi_term"] == pytest.approx(terms[b], abs=1e-9)
        assert got[b]["psi_total"] == pytest.approx(total, abs=1e-6)


# ------------------------------------------------- distinctive terms


def test_distinctive_terms_finds_the_marker_word(spark):
    """Source A systematically uses 'zebra'; B never does. 'zebra'
    must top A's list and never appear in B's."""
    a_docs = [("a", f"common words here zebra item{i}") for i in range(20)]
    b_docs = [("b", f"common words here item{i}") for i in range(20)]
    df = spark.createDataFrame(a_docs + b_docs, "src string, text string")
    out = distinctive_terms(df, "src", "text", top_k=3).collect()
    a_top = [r["term"] for r in out if r["group"] == "a" and r["rank"] == 1]
    assert a_top == ["zebra"]
    assert all(r["term"] != "zebra" for r in out if r["group"] == "b")


def test_distinctive_terms_rarity_does_not_win(spark):
    """A one-off typo in A ranks BELOW the systematically-overused
    term — the prior/variance does what TF-IDF can't."""
    a_docs = [("a", "shared filler marker marker") for _ in range(10)]
    a_docs.append(("a", "shared filler qqqq"))  # rare fluke
    b_docs = [("b", "shared filler other") for _ in range(10)]
    df = spark.createDataFrame(a_docs + b_docs, "src string, text string")
    out = {(r["group"], r["term"]): r["rank"]
           for r in distinctive_terms(df, "src", "text", top_k=5).collect()}
    assert out[("a", "marker")] < out[("a", "qqqq")]


def test_distinctive_terms_deterministic_tie_order(spark):
    """Symmetric terms with identical counts tie on z and break
    alphabetically."""
    a_docs = [("a", "xx yy shared") for _ in range(5)]
    b_docs = [("b", "shared other") for _ in range(5)]
    df = spark.createDataFrame(a_docs + b_docs, "src string, text string")
    a_rows = sorted(
        (r["rank"], r["term"])
        for r in distinctive_terms(df, "src", "text", top_k=5).collect()
        if r["group"] == "a" and r["term"] in ("xx", "yy")
    )
    assert [t for _, t in a_rows] == ["xx", "yy"]


# ------------------------------------------------- newman projection


def test_newman_discount_by_basket_size(spark):
    """Pair (1,2) appears in a 2-item basket (weight 10^6) and pair
    (3,4) in a 5-item basket (weight 250000): the focused pair wins
    despite equal co-counts."""
    rows = [(10, 1), (10, 2)] + [(20, i) for i in (3, 4, 5, 6, 7)]
    df = spark.createDataFrame(rows, "k long, p long")
    got = {(r["u"], r["v"]): r["weight_micro"]
           for r in newman_weighted_projection(df, "k", "p").collect()}
    assert got[(1, 2)] == 1_000_000
    assert got[(3, 4)] == 250_000


def test_newman_weights_accumulate(spark):
    """The same pair across three 2-item baskets accumulates 3x10^6
    and n_baskets = 3; singleton baskets contribute nothing."""
    rows = [(k, p) for k in (1, 2, 3) for p in (7, 8)] + [(4, 7)]
    df = spark.createDataFrame(rows, "k long, p long")
    out = newman_weighted_projection(df, "k", "p").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["v"]) == (7, 8)
    assert r["n_baskets"] == 3
    assert r["weight_micro"] == 3_000_000


def test_newman_min_weight_filter(spark):
    rows = [(1, 1), (1, 2)] + [(2, i) for i in range(10, 15)]
    df = spark.createDataFrame(rows, "k long, p long")
    out = newman_weighted_projection(df, "k", "p", min_weight_micro=600_000)
    got = {(r["u"], r["v"]) for r in out.collect()}
    assert got == {(1, 2)}


# ------------------------------------------------- bloom fpr audit


def test_bloom_audit_counts_and_theory(spark):
    """Small filter, disjoint probes: realized FPR is measured against
    set bit positions replayed in Python (md5 family), and the theory
    scalar matches the closed form."""
    import hashlib
    import math

    from datapipelines_essentials_python_spark.operators.relational import (
        bloom_fpr_audit,
    )

    bits_m, k = 256, 3
    member = spark.createDataFrame([(i,) for i in range(0, 100, 2)], "id long")
    probe = spark.createDataFrame([(i,) for i in range(1, 100, 2)], "id long")
    r = bloom_fpr_audit(member, probe, "id", "id",
                        num_bits=bits_m, num_hashes=k).collect()[0]

    def pos(seed, key):
        h = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()
        return int(h[:8], 16) % bits_m

    bitset = {pos(s, i) for s in range(k) for i in range(0, 100, 2)}
    fps = sum(
        1 for i in range(1, 100, 2)
        if all(pos(s, i) in bitset for s in range(k))
    )
    assert r["n_member"] == 50 and r["n_probe"] == 50
    assert r["bits_set"] == len(bitset)
    assert r["n_false_positive"] == fps
    assert r["fpr_micro"] == (fps * 1_000_000) // 50
    theory = (1 - math.exp(-k * 50 / bits_m)) ** k
    assert r["theory_fpr"] == pytest.approx(theory, abs=1e-6)


def test_bloom_audit_excludes_members_from_probe(spark):
    """Probes that ARE members never count as false positives."""
    from datapipelines_essentials_python_spark.operators.relational import (
        bloom_fpr_audit,
    )

    member = spark.createDataFrame([(i,) for i in range(20)], "id long")
    r = bloom_fpr_audit(member, member, "id", "id",
                        num_bits=64, num_hashes=2).collect()[0]
    assert r["n_probe"] == 0
    assert r["n_false_positive"] == 0


# ------------------------------------------------- zipf fit


def test_zipf_exact_power_law(spark):
    """counts = 1000 / rank exactly: slope -1, r2 ~ 1."""
    from datapipelines_essentials_python_spark.operators.text import zipf_fit

    words = []
    for rank in range(1, 21):
        cnt = 1024 // rank
        words += [f"w{rank:02d}"] * cnt
    df = spark.createDataFrame([("s", " ".join(words))], "src string, text string")
    r = zipf_fit(df, "src", "text", top_n=20).collect()[0]
    assert r["n_terms_fit"] == 20
    assert r["zipf_slope"] == pytest.approx(-1.0, abs=0.05)
    assert r["r2"] > 0.99


def test_zipf_flat_distribution_slope_zero(spark):
    """Every term equally common: slope ~ 0, the templated-source
    signature."""
    from datapipelines_essentials_python_spark.operators.text import zipf_fit

    words = [f"t{i}" for i in range(30)] * 10
    df = spark.createDataFrame([("s", " ".join(words))], "src string, text string")
    r = zipf_fit(df, "src", "text", top_n=30).collect()[0]
    assert r["zipf_slope"] == pytest.approx(0.0, abs=1e-6)
