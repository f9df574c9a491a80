"""Unit/property tests for the round-8 seventeenth batch: grid-cell
DBSCAN and the difference-in-differences estimator.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.relational import (
    diff_in_diff,
    grid_dbscan,
)


# ------------------------------------------------- grid dbscan


def test_dbscan_two_separated_blobs(spark):
    """Two dense blobs far apart -> two clusters with the right point
    mass; a lone point elsewhere is noise (absent)."""
    blob_a = [(i, 1.0 + (i % 3) * 0.01, 1.0 + (i // 3) * 0.01)
              for i in range(9)]
    blob_b = [(100 + i, 8.0 + (i % 3) * 0.01, 8.0 + (i // 3) * 0.01)
              for i in range(9)]
    lone = [(999, 5.0, 5.0)]
    df = spark.createDataFrame(blob_a + blob_b + lone,
                               "pid long, x double, y double")
    out = grid_dbscan(df, "pid", "x", "y", eps=0.5, min_pts=3).collect()
    assert len(out) == 2
    assert sorted(r["n_points"] for r in out) == [9, 9]


def test_dbscan_diagonal_adjacency_merges(spark):
    """Core cells touching only DIAGONALLY still merge (8-neighborhood,
    not 4): points in cells (0,0) and (1,1)."""
    a = [(i, 0.1, 0.1) for i in range(5)]
    b = [(10 + i, 1.1, 1.1) for i in range(5)]
    df = spark.createDataFrame(a + b, "pid long, x double, y double")
    out = grid_dbscan(df, "pid", "x", "y", eps=1.0, min_pts=3).collect()
    assert len(out) == 1
    assert out[0]["n_cells"] == 2
    assert out[0]["n_points"] == 10


def test_dbscan_min_pts_gate(spark):
    """A 2-point cell never becomes core at min_pts=3."""
    df = spark.createDataFrame(
        [(1, 0.1, 0.1), (2, 0.15, 0.12)], "pid long, x double, y double"
    )
    assert grid_dbscan(df, "pid", "x", "y", eps=1.0, min_pts=3).collect() == []


def test_dbscan_long_chain_converges(spark):
    """A 60-cell chain of core cells is ONE cluster — the pointer-
    jumping requirement (min-label propagation would need 60 rounds)."""
    rows = []
    for c in range(60):
        for j in range(3):
            rows.append((c * 10 + j, c + 0.5, 0.5))
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    out = grid_dbscan(df, "pid", "x", "y", eps=1.0, min_pts=3).collect()
    assert len(out) == 1
    assert out[0]["n_cells"] == 60
    assert out[0]["n_points"] == 180


# ------------------------------------------------- diff in diff


def _did_reference(cells):
    means = {k: sum(v) / len(v) for k, v in cells.items()}
    did = (means[("t", "post")] - means[("t", "pre")]) - (
        means[("c", "post")] - means[("c", "pre")]
    )
    se2 = 0.0
    for v in cells.values():
        m = sum(v) / len(v)
        var = sum((x - m) ** 2 for x in v) / (len(v) - 1)
        se2 += var / len(v)
    return did, math.sqrt(se2)


def test_did_recovers_planted_effect(spark):
    """Treatment gains +50 in post while control gains +10: DiD = 40,
    matching the sequential reference with its SE."""
    cells = {
        ("t", "pre"): [100, 110, 120, 130],
        ("t", "post"): [155, 165, 175, 185],  # +55 raw, +50 vs control drift
        ("c", "pre"): [200, 210, 220, 230],
        ("c", "post"): [215, 225, 235, 245],  # +15
    }
    rows = []
    for (t, p), vals in cells.items():
        rows += [(t == "t", p == "post", v) for v in vals]
    df = spark.createDataFrame(rows, "t boolean, p boolean, v long")
    r = diff_in_diff(df, F.col("t"), F.col("p"), "v").collect()[0]
    did, se = _did_reference(cells)
    assert r["did"] == pytest.approx(did, abs=1e-6)
    assert r["se"] == pytest.approx(se, abs=1e-6)
    assert r["did"] == pytest.approx(40.0, abs=1e-6)
    assert bool(r["significant"]) == (abs(did / se) > 1.96)


def test_did_placebo_is_zero(spark):
    """Identical trends in both arms: DiD exactly 0, not significant."""
    rows = []
    for t in (True, False):
        rows += [(t, False, v) for v in (10, 20, 30)]
        rows += [(t, True, v) for v in (40, 50, 60)]
    df = spark.createDataFrame(rows, "t boolean, p boolean, v long")
    r = diff_in_diff(df, F.col("t"), F.col("p"), "v").collect()[0]
    assert r["did"] == 0.0
    assert not r["significant"]
    assert r["n_t_pre"] == 3 and r["n_c_post"] == 3


# ------------------------------------------------- cache hit curve


def test_cache_hit_exact_shares(spark):
    """Keys with counts 50/30/20: top-1 covers 50%, top-2 80%,
    top-k>n covers 100%."""
    from datapipelines_essentials_python_spark.operators.relational import (
        cache_hit_curve,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: r for r in cache_hit_curve(df, "k", [1, 2, 10]).collect()}
    assert got[1]["hit_micro"] == 500_000
    assert got[2]["hit_micro"] == 800_000
    assert got[10]["hit_micro"] == 1_000_000
    assert got[1]["n_keys_total"] == 3


def test_cache_hit_count_tie_breaks_by_key(spark):
    """Counts tie: rank order is (count DESC, key ASC), so top-1 is
    the alphabetically first of the tied keys — deterministic."""
    from datapipelines_essentials_python_spark.operators.relational import (
        cache_hit_curve,
    )

    rows = [("zz",)] * 10 + [("aa",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: r for r in cache_hit_curve(df, "k", [1]).collect()}
    assert got[1]["covered_accesses"] == 10
    assert got[1]["hit_micro"] == 500_000


# ------------------------------------------------- char entropy


def test_char_entropy_degenerate_vs_natural(spark):
    """'aaaa…' has entropy 0 (flagged); varied text clears the 2.0
    threshold; exact two-symbol half-half gives exactly 1 bit."""
    from datapipelines_essentials_python_spark.operators.text import (
        char_entropy,
    )

    rows = [
        (1, "a" * 64),
        (2, "ab" * 32),
        (3, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in char_entropy(df, "id", "text").collect()}
    assert got[1]["char_entropy"] == 0.0 and got[1]["is_low_entropy"]
    assert got[2]["char_entropy"] == pytest.approx(1.0, abs=1e-6)
    assert got[2]["is_low_entropy"]
    assert got[3]["char_entropy"] > 3.5 and not got[3]["is_low_entropy"]


def test_char_entropy_matches_sequential(spark):
    """Pseudo-random text vs a pure-Python fold with the same 9dp term
    rounding."""
    import math
    from collections import Counter
    from decimal import Decimal

    from datapipelines_essentials_python_spark.operators.text import (
        char_entropy,
    )

    txt = "".join(chr(97 + (i * 7) % 13) for i in range(500))
    df = spark.createDataFrame([(1, txt)], "id long, text string")
    c = Counter(txt)
    n = sum(c.values())
    total = Decimal(0)
    for cnt in c.values():
        p = cnt / n
        total += Decimal(str(round(p * (math.log(p) / math.log(2.0)), 9)))
    r = char_entropy(df, "id", "text").collect()[0]
    assert r["char_entropy"] == pytest.approx(-float(total), abs=1e-9)
    assert r["n_distinct_chars"] == 13


# ------------------------------------------------- wilson / EB


def test_wilson_matches_closed_form(spark):
    """7 of 10: interval matches the textbook Wilson formula and
    contains the point estimate; tighter than [0,1]."""
    from datapipelines_essentials_python_spark.operators.relational import (
        wilson_intervals,
    )

    rows = [("g", i < 7) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, y boolean")
    r = wilson_intervals(df, "g", F.col("y")).collect()[0]
    p, n, z = 0.7, 10, 1.96
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert r["ci_low"] == pytest.approx((center - half) / denom, abs=1e-6)
    assert r["ci_high"] == pytest.approx((center + half) / denom, abs=1e-6)
    assert r["ci_low"] < 0.7 < r["ci_high"]


def test_wilson_extreme_rates_stay_in_bounds(spark):
    """0-of-5 and 5-of-5: the Wilson interval stays inside [0, 1] and
    is NOT degenerate (the naive interval collapses to a point)."""
    from datapipelines_essentials_python_spark.operators.relational import (
        wilson_intervals,
    )

    rows = [("zero", False)] * 5 + [("one", True)] * 5
    df = spark.createDataFrame(rows, "g string, y boolean")
    got = {r["group"]: r for r in
           wilson_intervals(df, "g", F.col("y")).collect()}
    assert 0.0 <= got["zero"]["ci_low"] and got["zero"]["ci_high"] > 0.0
    assert got["one"]["ci_low"] < 1.0 and got["one"]["ci_high"] <= 1.0


def test_eb_shrinks_small_groups_more(spark):
    """A 2-of-3 segment shrinks toward the corpus mean far more than a
    400-of-1000 one with the same raw direction."""
    from datapipelines_essentials_python_spark.operators.relational import (
        eb_shrunk_rates,
    )

    rows = []
    rows += [("tiny", i < 2) for i in range(3)]          # 0.667 raw
    rows += [("big", i < 400) for i in range(1000)]      # 0.4 raw
    rows += [("mid1", i < 30) for i in range(100)]       # 0.3
    rows += [("mid2", i < 50) for i in range(100)]       # 0.5
    rows += [("mid3", i < 45) for i in range(100)]       # 0.45
    df = spark.createDataFrame(rows, "g string, y boolean")
    got = {r["group"]: r for r in
           eb_shrunk_rates(df, "g", F.col("y")).collect()}
    tiny_shift = abs(got["tiny"]["shrunk_rate"] - got["tiny"]["raw_rate"])
    big_shift = abs(got["big"]["shrunk_rate"] - got["big"]["raw_rate"])
    assert tiny_shift > big_shift
    assert got["tiny"]["alpha"] > 0 and got["tiny"]["beta"] > 0
    # posterior stays between raw rate and prior mean
    mu = sum(v["raw_rate"] for v in got.values()) / len(got)
    lo, hi = sorted((got["tiny"]["raw_rate"], mu))
    assert lo - 1e-6 <= got["tiny"]["shrunk_rate"] <= hi + 1e-6


def test_eb_degenerate_prior_falls_back(spark):
    """All groups identical rates: prior variance 0 -> raw rates pass
    through unshrunk."""
    from datapipelines_essentials_python_spark.operators.relational import (
        eb_shrunk_rates,
    )

    rows = [(g, i < 5) for g in ("a", "b", "c") for i in range(10)]
    df = spark.createDataFrame(rows, "g string, y boolean")
    for r in eb_shrunk_rates(df, "g", F.col("y")).collect():
        assert r["shrunk_rate"] == r["raw_rate"] == 0.5
        assert r["alpha"] == 0.0
