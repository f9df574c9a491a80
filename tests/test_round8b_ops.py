"""Unit tests for the round-8 second batch: C4-style boilerplate-segment
removal, per-group MinHash similarity, deterministic random walks, and
the per-domain token-budget allocator.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import graph
from datapipelines_essentials_python_spark.operators.chunking import (
    boilerplate_segments,
)
from datapipelines_essentials_python_spark.operators.dedup import (
    group_minhash_similarity,
)
from datapipelines_essentials_python_spark.operators.sampling import token_budget


# -------------------------------------------------- boilerplate_segments


def test_boilerplate_removes_all_occurrences_including_first(spark):
    """A 2-token segment present in 3 docs is removed from EVERY doc —
    the first occurrence too, which is exactly what span_dedup (keep
    first) cannot do."""
    df = spark.createDataFrame(
        [
            (1, "copy right unique one"),
            (2, "copy right unique two"),
            (3, "copy right unique three"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_segments(df, block_size=2, min_docs=3).collect()
    }
    assert out[1]["text_clean"] == "unique one"
    assert out[2]["text_clean"] == "unique two"
    assert out[3]["text_clean"] == "unique three"
    assert all(r["n_blocks_removed"] == 1 for r in out.values())


def test_boilerplate_below_threshold_survives(spark):
    """Document frequency 2 < min_docs=3: nothing is removed."""
    df = spark.createDataFrame(
        [(1, "copy right a b"), (2, "copy right c d")],
        "doc_id long, text string",
    )
    out = boilerplate_segments(df, block_size=2, min_docs=3).collect()
    assert all(r["n_blocks_removed"] == 0 for r in out)
    assert {r["text_clean"] for r in out} == {"copy right a b", "copy right c d"}


def test_boilerplate_fully_removed_doc_keeps_its_row(spark):
    """A document that is 100% boilerplate survives as an empty
    text_clean row — identity is never dropped (unlike span_dedup)."""
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x y"), (4, "x y extra word")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_segments(df, block_size=2, min_docs=3).collect()
    }
    assert out[1]["text_clean"] == ""
    assert out[1]["n_blocks_removed"] == 1
    assert out[4]["text_clean"] == "extra word"


def test_boilerplate_distinct_doc_count_not_occurrence_count(spark):
    """3 occurrences inside ONE doc is df=1, not boilerplate: the rule
    counts distinct documents, not repeats."""
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_segments(df, block_size=2, min_docs=3).collect()
    }
    assert out[1]["n_blocks_removed"] == 0
    assert out[1]["text_clean"] == "x y x y x y"


def test_boilerplate_validates_min_docs(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_segments(df, min_docs=1)


# ---------------------------------------------- group_minhash_similarity


def test_group_minhash_identical_groups_estimate_one(spark):
    """Two groups with the same shingle set agree on every signature
    component: jaccard_est == 1.0."""
    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps"),
            ("b", "the quick brown fox jumps"),
            ("c", "completely different words here entirely"),
        ],
        "source string, text string",
    )
    rows = {
        (r["grp_a"], r["grp_b"]): r
        for r in group_minhash_similarity(df, num_hashes=16).collect()
    }
    assert rows[("a", "b")]["n_equal"] == 16
    assert rows[("a", "b")]["jaccard_est"] == 1.0
    # disjoint shingle sets: estimator near 0 (collisions possible but
    # vanishingly unlikely in a 2^31 space)
    assert rows[("a", "c")]["jaccard_est"] < 0.5


def test_group_minhash_merge_equals_union(spark):
    """Mergeability: a group split across many doc rows signs the same
    as the same text in one row — min over the union = min of mins."""
    split = spark.createDataFrame(
        [("g", "alpha beta gamma delta"), ("g", "delta epsilon zeta eta"),
         ("h", "alpha beta gamma delta delta epsilon zeta eta")],
        "source string, text string",
    )
    rows = group_minhash_similarity(split, num_hashes=16).collect()
    # g's shingles ⊃ h's shingles minus the cross-boundary ones; the two
    # groups share most shingles so the estimate must be high, and the
    # test pins the MERGE property: the pair estimate is deterministic.
    [r] = rows
    assert r["grp_a"] == "g" and r["grp_b"] == "h"
    assert r["n_equal"] >= 10  # shared shingle mass dominates


def test_group_minhash_pair_count_is_choose_2(spark):
    df = spark.createDataFrame(
        [(f"s{i}", "w1 w2 w3 w4") for i in range(4)],
        "source string, text string",
    )
    assert group_minhash_similarity(df, num_hashes=8).count() == 6


# ------------------------------------------------------- random_walks


def _expected_walk(edges, start, walk_len, seed="walk"):
    """Sequential replay of the deterministic draw."""
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    path = [start]
    cur = start
    for t in range(1, walk_len + 1):
        nxt = min(
            adj[cur],
            key=lambda d: (
                hashlib.md5(f"{seed}|{t}|{cur}|{d}".encode()).hexdigest(),
                d,
            ),
        )
        path.append(nxt)
        cur = nxt
    return path


def test_random_walks_replay_sequential_reference(spark):
    """Every walk matches a sequential Python replay of the keyed-hash
    draw — the determinism contract that makes the oracle possible."""
    e = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    edges = spark.createDataFrame(e, "src long, dst long")
    out = graph.random_walks(edges, walk_len=3, seed="walk").collect()
    walks: dict[int, dict[int, int]] = {}
    for r in out:
        walks.setdefault(r["start"], {})[r["step"]] = r["node"]
    for start in (1, 2, 3, 4):
        expect = _expected_walk(e, start, 3)
        got = [walks[start][t] for t in range(4)]
        assert got == expect, f"walk from {start}: {got} != {expect}"


def test_random_walks_row_count_and_step_zero(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = graph.random_walks(edges, walk_len=2).collect()
    assert len(out) == 9  # 3 nodes x (2 steps + step 0)
    starts = {r["node"] for r in out if r["step"] == 0}
    assert starts == {1, 2, 3}


def test_random_walks_validates_len(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="walk_len"):
        graph.random_walks(edges, walk_len=0)


# ------------------------------------------------------- token_budget


def test_token_budget_allocates_by_temperatured_token_mass(spark):
    """16:1 token mass at α=0.5 → 4:1 temperatured weights: the big
    domain gets 0.8 of the budget, the small one 0.2 — and epochs says
    the small domain repeats (alloc > its own tokens)."""
    df = spark.createDataFrame(
        [("big", " ".join(["w"] * 16))] + [("small", "w")],
        "source string, text string",
    )
    rows = {r["domain"]: r for r in token_budget(
        df, target_tokens=1000, sqrt_passes=1
    ).collect()}
    assert rows["big"]["n_tokens"] == 16 and rows["small"]["n_tokens"] == 1
    assert math.isclose(rows["big"]["q_temp"], 0.8, abs_tol=1e-6)
    assert rows["big"]["alloc_tokens"] == 800
    assert rows["small"]["alloc_tokens"] in (199, 200)  # floor of 0.2*1000
    assert rows["small"]["epochs"] > 100  # tiny domain repeats heavily
    assert math.isclose(rows["big"]["epochs"], 50.0, rel_tol=1e-4)


def test_token_budget_alpha_one_half_squared(spark):
    """sqrt_passes=2 (α=0.25) flattens further: the 16:1 mass becomes
    2:1 weights."""
    df = spark.createDataFrame(
        [("big", " ".join(["w"] * 16))] + [("small", "w")],
        "source string, text string",
    )
    rows = {r["domain"]: r for r in token_budget(
        df, target_tokens=900, sqrt_passes=2
    ).collect()}
    assert math.isclose(rows["big"]["q_temp"], 2 / 3, abs_tol=1e-6)
    assert math.isclose(rows["small"]["q_temp"], 1 / 3, abs_tol=1e-6)


def test_token_budget_validates_args(spark):
    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError, match="sqrt_passes"):
        token_budget(df, sqrt_passes=0)
    with pytest.raises(ValueError, match="target_tokens"):
        token_budget(df, target_tokens=0)


# ---------------------------------------------------- neighbor_jaccard


def test_neighbor_jaccard_values(spark):
    """Path 1-2-3 plus pendant 3-4: the non-adjacent pair (1,3) shares
    center 2; deg(1)=1, deg(3)=2 → jac = 1/(1+2-1) = 0.5."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rows = {(r["u"], r["v"]): r for r in graph.neighbor_jaccard(edges).collect()}
    assert rows[(1, 3)]["common_neighbors"] == 1
    assert rows[(1, 3)]["jac_micro"] == 500000
    # (2,4) shares center 3: deg(2)=2, deg(4)=1 → 1/(2+1-1) = 0.5
    assert rows[(2, 4)]["jac_micro"] == 500000
    # adjacent pairs never appear
    assert (1, 2) not in rows and (2, 3) not in rows


def test_neighbor_jaccard_discounts_hub_endpoints(spark):
    """Two nodes joined through a hub AND through each other's dense
    neighborhoods: Jaccard is common/union, so a pair with many
    non-shared neighbors ranks below a pair whose neighborhoods
    coincide — the endpoint normalization AA does not have."""
    # a-b share their ONLY neighbor w (jac = 1.0);
    # c-d share w too but each has 3 extra private neighbors
    rows = [(100, 1), (101, 1)]  # a=100, b=101, w=1
    rows += [(200, 1), (201, 1)]  # c=200, d=201
    rows += [(200, 10), (200, 11), (200, 12)]
    rows += [(201, 20), (201, 21), (201, 22)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = {(r["u"], r["v"]): r["jac_micro"]
           for r in graph.neighbor_jaccard(edges, top_n=100).collect()}
    assert out[(100, 101)] == 1000000
    assert out[(200, 201)] == 142857  # 1/7 — the private mass dilutes
    assert out[(100, 101)] > out[(200, 201)]


def test_neighbor_jaccard_max_degree_caps_centers_not_endpoints(spark):
    """Hub center above the cap is dropped from wedge enumeration —
    pairs whose ONLY center is the hub vanish — while pairs through
    small centers keep scoring with TRUE endpoint degrees."""
    hub_edges = [(1000, i) for i in range(1, 6)]  # hub deg 5
    hub_edges += [(6, 7), (7, 8)]  # path: center 7 deg 2
    edges = spark.createDataFrame(hub_edges, "src long, dst long")
    uncapped = {
        (r["u"], r["v"]) for r in graph.neighbor_jaccard(edges, top_n=100).collect()
    }
    assert (3, 4) in uncapped  # leaf pair via the hub center
    capped = {
        (r["u"], r["v"]): r
        for r in graph.neighbor_jaccard(edges, top_n=100, max_degree=4).collect()
    }
    # every pair among the hub's leaves had ONLY the hub as center -> gone
    assert all(not (u in range(1, 6) and v in range(1, 6)) for u, v in capped)
    # (6,8) via center 7 survives: deg(6)=deg(8)=1, common=1 -> jac 1.0
    assert capped[(6, 8)]["jac_micro"] == 1000000


def test_neighbor_jaccard_validates_top_n(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="top_n"):
        graph.neighbor_jaccard(edges, top_n=0)
