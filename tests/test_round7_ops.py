"""Unit tests for the round-7 continuation operators: degree-ordered
triangle counting, reciprocal-rank fusion, Jensen-Shannon source
divergence, the exact rolling median, and the group-aware embargoed
temporal split.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import (
    graph,
    relational,
    similarity,
    text,
)
from datapipelines_essentials_python_spark.operators.sampling import (
    embargoed_group_split,
    hash_fraction,
)


# ---------------------------------------------------------------- triangles


def test_triangle_counts_single_triangle_with_pendant(spark):
    """Triangle {1,2,3} plus pendant edge 3-4: members count 1 triangle
    each, the pendant counts 0, clustering = 2T/(d(d-1))."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {r["node"]: r for r in graph.triangle_counts(edges).collect()}
    assert {n: r["triangles"] for n, r in out.items()} == {1: 1, 2: 1, 3: 1, 4: 0}
    assert out[3]["degree"] == 3
    assert out[3]["clustering"] == pytest.approx(2 * 1 / (3 * 2), abs=1e-6)
    assert out[1]["clustering"] == 1.0  # deg 2, 1 triangle
    assert out[4]["clustering"] == 0.0  # deg 1 -> defined as 0


def test_triangle_counts_k4_and_normalization(spark):
    """K4 has 4 triangles, 3 per node — and duplicated, reversed, and
    self-loop edges must not change the count."""
    base = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = base + [(b, a) for a, b in base] + [(2, 2), (0, 1), (0, 1)]
    edges = spark.createDataFrame(noisy, "src long, dst long")
    rows = graph.triangle_counts(edges).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["degree"] == 3
        assert r["triangles"] == 3
        assert r["clustering"] == 1.0


def test_triangle_counts_triangle_free_graph(spark):
    """A 4-cycle (square) has zero triangles everywhere."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    rows = graph.triangle_counts(edges).collect()
    assert all(r["triangles"] == 0 for r in rows)
    assert all(r["clustering"] == 0.0 for r in rows)


# ----------------------------------------------------------------- RRF fuse


def test_rrf_fuse_known_scores(spark):
    """lex=[10,20], dense=[20,30]: doc 20 fuses both lists and wins;
    micro scores are the 6-dp-rounded reciprocal sums."""
    lex = spark.createDataFrame([(10, 1), (20, 2)], "id long, rank int")
    dense = spark.createDataFrame([(20, 1), (30, 2)], "id long, rank int")
    out = {
        r["id"]: r
        for r in similarity.rrf_fuse(
            {"lex": lex, "dense": dense}, id_col="id", k0=60, topk=10
        ).collect()
    }
    assert out[20]["rrf_micro"] == 16129 + 16393  # round(1/62,6)+round(1/61,6)
    assert out[10]["rrf_micro"] == 16393
    assert out[30]["rrf_micro"] == 16129
    assert out[20]["fused_rank"] == 1
    assert out[10]["fused_rank"] == 2
    assert out[30]["fused_rank"] == 3
    assert out[10]["dense_rank"] == 0 and out[30]["lex_rank"] == 0
    assert out[20]["lex_rank"] == 2 and out[20]["dense_rank"] == 1


def test_rrf_fuse_ties_break_by_id_and_topk_truncates(spark):
    """Docs present in exactly one list at the same rank tie on score and
    order by id; topk cuts the fused list."""
    lex = spark.createDataFrame([(5, 1), (9, 2)], "id long, rank int")
    dense = spark.createDataFrame([(7, 1), (8, 2)], "id long, rank int")
    rows = similarity.rrf_fuse(
        {"lex": lex, "dense": dense}, id_col="id", topk=3
    ).collect()
    assert [r["id"] for r in sorted(rows, key=lambda r: r["fused_rank"])] == [
        5,
        7,
        8,
    ]


# ------------------------------------------------------------ JS divergence


def test_js_divergence_identical_groups_is_zero(spark):
    """Two groups with the same distribution match the corpus -> JSD 0
    (up to per-term 6-dp rounding)."""
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], "source string, text string"
    )
    rows = text.js_divergence_by_group(df, "text", "source").collect()
    assert {r["source"] for r in rows} == {"a", "b"}
    for r in rows:
        assert abs(r["jsd_micro"]) <= 5  # rounding slack: <=1 micro/term
        assert r["n_tokens"] == 3 and r["n_terms"] == 3


def test_js_divergence_disjoint_vocabulary(spark):
    """Equal-sized groups with disjoint vocab: JSD vs the pooled corpus is
    ln(4/3)/2 + (0.5*ln(2/3) + 0.5*ln2)/2 = 0.215762 nats."""
    df = spark.createDataFrame(
        [("a", "x x y y"), ("b", "u u v v")], "source string, text string"
    )
    rows = text.js_divergence_by_group(df, "text", "source").collect()
    for r in rows:
        assert r["jsd_micro"] == pytest.approx(215762, abs=5)


# ------------------------------------------------------------ rolling median


def test_rolling_median_gap_shrinks_frame(spark):
    """RANGE frame is value-based: day 10 is out of reach of days 1-3, so
    its frame is itself; day 2's even frame interpolates the midpoint."""
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 5.0), ("a", 3, 2.0), ("a", 10, 10.0)],
        "k string, day_num int, v double",
    )
    out = {
        r["day_num"]: r["med"]
        for r in relational.rolling_median(
            df, "k", "day_num", "v", preceding=2, out_col="med"
        ).collect()
    }
    assert out == {1: 1.0, 2: 3.0, 3: 2.0, 10: 10.0}


def test_rolling_median_partitions_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 9.0), ("b", 2, 100.0)],
        "k string, day_num int, v double",
    )
    out = {
        (r["k"], r["day_num"]): r["rolling_median"]
        for r in relational.rolling_median(df, "k", "day_num", "v").collect()
    }
    assert out[("a", 2)] == 5.0
    assert out[("b", 2)] == 100.0


# ------------------------------------------------------------- embargo split


def _split_events(spark):
    # 10 users x 20 days, one event per user-day at noon
    rows = [
        (u, datetime(2024, 1, d + 1, 12, 0, 0))
        for u in range(10)
        for d in range(20)
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_embargo_split_partitions_and_leakproofness(spark):
    ev = _split_events(spark)
    tagged = embargoed_group_split(
        ev, "user_id", "ts", group_frac=0.3, test_frac=0.2, embargo_days=2
    )
    assert tagged.count() == ev.count()  # a partition, nothing dropped
    by_split = {
        r["split"]: r
        for r in tagged.groupBy("split")
        .agg(
            F.collect_set("user_id").alias("users"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .collect()
    }
    assert set(by_split) == {"train", "test", "embargo", "purged"}
    # group-level leakproofness: train and test share no user
    assert not set(by_split["train"]["users"]) & set(by_split["test"]["users"])
    # temporal leakproofness: last train ts at least embargo before first test ts
    gap = by_split["test"]["lo"] - by_split["train"]["hi"]
    assert gap.total_seconds() >= 2 * 86400


def test_embargo_split_held_groups_match_hash_draw(spark):
    ev = _split_events(spark)
    held = {
        r["user_id"]
        for r in ev.select("user_id")
        .distinct()
        .where(hash_fraction(F.col("user_id"), "embargo") < 0.3)
        .collect()
    }
    tagged = embargoed_group_split(
        ev, "user_id", "ts", group_frac=0.3, test_frac=0.2, embargo_days=2
    )
    test_users = {
        r["user_id"] for r in tagged.where("split = 'test'").collect()
    }
    train_users = {
        r["user_id"] for r in tagged.where("split = 'train'").collect()
    }
    assert test_users <= held
    assert not train_users & held


# ------------------------------------------------------------ graph batch 2


def test_personalized_pagerank_two_node_chain(spark):
    """1→2 with seed {1}: hand-unrolled two iterations — the dangling
    node's mass teleports back to the SEED, not uniformly."""
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(edges, seeds, iterations=2).collect()
    }
    # iter1: r1 = 0.15, r2 = 0.85 (all seed mass walks to 2)
    # iter2: r1 = 0.15 + 0.85*0.85 (dangling r2 -> seed) = 0.8725
    #        r2 = 0.85 * 0.15 = 0.1275
    assert out[1] == pytest.approx(0.8725, abs=1e-6)
    assert out[2] == pytest.approx(0.1275, abs=1e-6)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-6)


def test_personalized_pagerank_unreachable_stays_zero(spark):
    """A component disjoint from the seeds holds zero rank — mass never
    diffuses corpus-wide the way uniform-teleport PageRank does."""
    edges = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(edges, seeds, iterations=2).collect()
    }
    assert out[3] == 0.0 and out[4] == 0.0
    assert out[1] + out[2] == pytest.approx(1.0, abs=1e-6)


def test_butterfly_counts_shared_pair(spark):
    """Two suppliers sharing two parts form exactly one butterfly; a
    third sharing only one part forms none but is still a co-partner."""
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)],
        "src long, dst long",
    )
    out = {r["node"]: r for r in graph.butterfly_counts(edges).collect()}
    assert {n: r["butterflies"] for n, r in out.items()} == {1: 1, 2: 1, 3: 0}
    assert out[1]["copartners"] == 2 and out[3]["copartners"] == 2
    assert out[1]["degree"] == 2 and out[3]["degree"] == 1


def test_butterfly_counts_hot_right_cap(spark):
    """max_right_degree drops a celebrity right node BEFORE the pair
    expansion: with the hub part capped away, no co-pairs remain."""
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11), (2, 12)],
        "src long, dst long",
    )
    out = {
        r["node"]: r
        for r in graph.butterfly_counts(edges, max_right_degree=2).collect()
    }
    assert all(r["butterflies"] == 0 for r in out.values())
    assert all(r["copartners"] == 0 for r in out.values())
    # degrees are computed on the CAPPED graph (consistent denominator)
    assert out[1]["degree"] == 1 and out[2]["degree"] == 1


def test_degree_assortativity_path_is_minus_one(spark):
    """A 3-node path is perfectly disassortative (r = −1): ends attach
    to the middle, never to each other."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = graph.degree_assortativity(edges).collect()
    assert all(r["assortativity"] == -1.0 for r in rows)
    hist = {r["bucket_log2"]: r["n_nodes"] for r in rows}
    assert hist == {0: 2, 1: 1}  # two degree-1 ends, one degree-2 middle
