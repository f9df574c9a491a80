"""As-of and range joins (operators/asof.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.asof import as_of_join, range_join


def ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 09:00:00"), 100.0),
            ("A", ts("2024-01-01 10:00:00"), 110.0),
            ("B", ts("2024-01-01 09:30:00"), 50.0),
        ],
        "k string, qts timestamp, price double",
    )


@pytest.fixture
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01 09:30:00")),  # matches 09:00 quote
            (2, "A", ts("2024-01-01 10:00:00")),  # equal ts → inclusive match
            (3, "A", ts("2024-01-01 08:00:00")),  # before any quote → NULL
            (4, "B", ts("2024-01-01 12:00:00")),  # matches B 09:30
            (5, "C", ts("2024-01-01 12:00:00")),  # key with no quotes → NULL
        ],
        "id long, k string, tts timestamp",
    )


def test_as_of_join_backward_inclusive(spark, trades, quotes):
    out = as_of_join(trades, quotes, ["k"], "tts", "qts", ["price"])
    got = {r["id"]: r["asof_price"] for r in out.collect()}
    assert got == {1: 100.0, 2: 110.0, 3: None, 4: 50.0, 5: None}
    assert out.count() == trades.count()  # left-join semantics: no row loss


def test_as_of_join_tolerance(spark, trades, quotes):
    out = as_of_join(
        trades, quotes, ["k"], "tts", "qts", ["price"], tolerance_seconds=3600
    )
    got = {r["id"]: r["asof_price"] for r in out.collect()}
    assert got[1] == 100.0  # 30 min old: fresh enough
    assert got[4] is None  # 2.5 h old quote exceeds tolerance


def test_range_join_boundaries(spark):
    rows = spark.createDataFrame(
        [(1, 0.0), (2, 49.99), (3, 50.0), (4, 149.0), (5, -5.0), (6, 200.0)],
        "id long, v double",
    )
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 300.0, "high")],
        "lo double, hi double, tier string",
    )
    out = {r["id"]: r["tier"] for r in range_join(rows, tiers, "v", "lo", "hi", 50.0).collect()}
    # hi-exclusive: 50.0 goes to mid, not low; -5 matches nothing
    assert out == {1: "low", 2: "low", 3: "mid", 4: "mid", 6: "high"}


def test_range_join_overlapping_ranges(spark):
    rows = spark.createDataFrame([(1, 10.0)], "id long, v double")
    tiers = spark.createDataFrame(
        [(0.0, 20.0, "a"), (5.0, 15.0, "b")], "lo double, hi double, tier string"
    )
    out = {r["tier"] for r in range_join(rows, tiers, "v", "lo", "hi", 10.0).collect()}
    assert out == {"a", "b"}  # overlapping ranges both match


def test_interval_overlap_join_exact(spark):
    from datapipelines_essentials_python_spark.operators.asof import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 20.0, 30.0), ("c", 5.0, 25.0)],
        "lid string, lo_a double, hi_a double",
    )
    right = spark.createDataFrame(
        [("x", 8.0, 12.0), ("y", 40.0, 50.0), ("z", 0.0, 100.0)],
        "rid string, lo_b double, hi_b double",
    )
    out = interval_overlap_join(
        left, right, "lo_a", "hi_a", "lo_b", "hi_b", bucket_size=10.0
    )
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    # brute-force truth: overlap iff lo_a < hi_b and lo_b < hi_a
    lrows = [("a", 0.0, 10.0), ("b", 20.0, 30.0), ("c", 5.0, 25.0)]
    rrows = [("x", 8.0, 12.0), ("y", 40.0, 50.0), ("z", 0.0, 100.0)]
    want = sorted(
        (l[0], r[0])
        for l in lrows
        for r in rrows
        if l[1] < r[2] and r[1] < l[2]
    )
    assert pairs == want
    # spanning interval z pairs once with everything (no bucket duplicates)
    assert pairs.count(("a", "z")) == 1


def test_as_of_join_forward_direction(spark):
    from datapipelines_essentials_python_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [("a", 5.0), ("a", 10.0), ("a", 25.0)], "k string, ts double"
    )
    right = spark.createDataFrame(
        [("a", 6.0, 1), ("a", 10.0, 2), ("a", 20.0, 3)],
        "k string, rts double, v int",
    )
    out = {
        r["ts"]: r
        for r in as_of_join(
            left, right, ["k"], "ts", "rts", ["v"], direction="forward"
        ).collect()
    }
    assert out[5.0]["asof_v"] == 1    # earliest at-or-after 5 → 6
    assert out[10.0]["asof_v"] == 2   # inclusive: equal ts matches
    assert out[25.0]["asof_v"] is None  # nothing after 25
    # forward tolerance: match farther than 3s away is nulled
    tol = {
        r["ts"]: r
        for r in as_of_join(
            left, right, ["k"], "ts", "rts", ["v"],
            direction="forward", tolerance_seconds=3,
        ).collect()
    }
    assert tol[5.0]["asof_v"] == 1 and tol[10.0]["asof_v"] == 2


@pytest.fixture
def dup_quotes(spark):
    """Two right rows at the SAME (key, ts) — violates the uniqueness
    contract; values chosen so max-resolution is distinguishable."""
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 09:00:00"), 100.0, "stale"),
            ("A", ts("2024-01-01 09:00:00"), 120.0, "fresh"),
            ("B", ts("2024-01-01 09:30:00"), 50.0, "only"),
        ],
        "k string, qts timestamp, price double, src string",
    )


def test_as_of_join_assert_unique_raises(spark, trades, dup_quotes):
    with pytest.raises(ValueError, match="duplicate"):
        as_of_join(
            trades, dup_quotes, ["k"], "tts", "qts", ["price"],
            assert_unique=True,
        )


def test_as_of_join_assert_unique_passes_on_clean_input(spark, trades, quotes):
    out = as_of_join(
        trades, quotes, ["k"], "tts", "qts", ["price"], assert_unique=True
    )
    got = {r["id"]: r["asof_price"] for r in out.collect()}
    assert got == {1: 100.0, 2: 110.0, 3: None, 4: 50.0, 5: None}


def test_as_of_join_tie_break_resolves_deterministically(
    spark, trades, dup_quotes
):
    """tie_break keeps the (key, ts)-duplicate with the max tie column, so
    duplicated right input yields ONE deterministic answer, not whichever
    duplicate the sort left last."""
    out = as_of_join(
        trades, dup_quotes, ["k"], "tts", "qts", ["price", "src"],
        tie_break="price",
    )
    got = {r["id"]: (r["asof_price"], r["asof_src"]) for r in out.collect()}
    assert got[1] == (120.0, "fresh")  # max price wins, its src rides along
    assert got[4] == (50.0, "only")
    assert got[3] == (None, None)
    # stable across repeated evaluation (re-collect the same plan)
    again = {r["id"]: (r["asof_price"], r["asof_src"]) for r in out.collect()}
    assert again == got
