"""Unit/property tests for the round-8 eleventh batch: two-level
sequence-gap audit and funnel conversion-delay quantiles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.relational import (
    conversion_delay_quantiles,
    sequence_gaps,
)


# ------------------------------------------------- sequence gaps


def _gaps_reference(ids, min_len=1):
    s = sorted(set(ids))
    out = []
    for a, b in zip(s, s[1:]):
        if b - a > 1 and (b - 1) - (a + 1) + 1 >= min_len:
            out.append((a + 1, b - 1, b - a - 1))
    return sorted(out)


def test_gaps_simple_ranges(spark):
    ids = [1, 2, 5, 6, 10]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = sorted(
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in sequence_gaps(df, "id").collect()
    )
    assert got == [(3, 4, 2), (7, 9, 3)]


def test_gaps_cross_block_boundary(spark):
    """A gap spanning block boundaries (block_size=8: ids 6 and 17 are
    in blocks 0 and 2) must come out as ONE range from the summary
    pass — including the wholly-missing block 1."""
    df = spark.createDataFrame([(6,), (17,)], "id long")
    got = [(r["gap_start"], r["gap_end"], r["gap_len"])
           for r in sequence_gaps(df, "id", block_size=8).collect()]
    assert got == [(7, 16, 10)]


def test_gaps_match_sequential_any_blocksize(spark):
    """Randomized sparse ids: the two-level result equals the global
    single-pass reference for several block sizes (the split between
    internal and boundary gaps is invisible in the union)."""
    ids = sorted({(i * 37) % 501 for i in range(120)})
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    want = _gaps_reference(ids)
    for bs in (4, 16, 64, 1000):
        got = sorted(
            (r["gap_start"], r["gap_end"], r["gap_len"])
            for r in sequence_gaps(df, "id", block_size=bs).collect()
        )
        assert got == want, f"block_size={bs}"


def test_gaps_min_len_filter(spark):
    ids = [1, 3, 10]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = [(r["gap_start"], r["gap_end"])
           for r in sequence_gaps(df, "id", min_gap_len=3).collect()]
    assert got == [(4, 9)]


def test_gaps_contiguous_is_empty(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    assert sequence_gaps(df, "id").collect() == []


# ------------------------------------------------- conversion delay


def _mk_events(spark, rows):
    df = spark.createDataFrame(
        rows, "user long, etype string, sec long"
    )
    return df.withColumn("ts", F.col("sec").cast("timestamp"))


def test_conversion_basic_delays(spark):
    """Three converted users with delays 10/20/30 s in one cohort:
    p50 = 20 s (lower median); p90 index = ((3-1)*9) div 10 + 1 = 2 ->
    also 20 s (lower empirical quantile, numpy method='lower'); mean
    exact."""
    rows = []
    for u, d in ((1, 10), (2, 20), (3, 30)):
        rows += [(u, "signup", 1000), (u, "purchase", 1000 + d)]
    df = _mk_events(spark, rows)
    out = conversion_delay_quantiles(
        df, "user", "etype", "ts", "signup", "purchase",
        lambda ts: F.lit("all"),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_converted"] == 3
    assert r["p50_delay_us"] == 20_000_000
    assert r["p90_delay_us"] == 20_000_000
    assert r["mean_delay_us"] == 20_000_000


def test_conversion_requires_purchase_after_signup(spark):
    """A purchase BEFORE the first signup doesn't convert; a later one
    does; users with only one of the two types are excluded."""
    rows = [
        (1, "purchase", 500), (1, "signup", 1000),   # excluded: to < from
        (2, "signup", 1000), (2, "purchase", 1600),  # converts, 600 s
        (3, "signup", 1000),                          # no purchase
        (4, "purchase", 900),                         # no signup
    ]
    df = _mk_events(spark, rows)
    out = conversion_delay_quantiles(
        df, "user", "etype", "ts", "signup", "purchase",
        lambda ts: F.lit("all"),
    ).collect()
    assert len(out) == 1
    assert out[0]["n_converted"] == 1
    assert out[0]["p50_delay_us"] == 600_000_000


def test_conversion_first_events_win(spark):
    """Multiple signups/purchases: the FIRST signup and FIRST later
    purchase define the delay (second purchase ignored)."""
    rows = [
        (1, "signup", 100), (1, "signup", 200),
        (1, "purchase", 150), (1, "purchase", 900),
    ]
    df = _mk_events(spark, rows)
    out = conversion_delay_quantiles(
        df, "user", "etype", "ts", "signup", "purchase",
        lambda ts: F.lit("all"),
    ).collect()
    # first signup 100, first purchase 150 -> 50 s
    assert out[0]["p50_delay_us"] == 50_000_000
