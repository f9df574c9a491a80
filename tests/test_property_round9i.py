"""Round-9 property batch I: randomized invariants for the round-10
rotation-pool PLANNING/EVAL operators, each checked against a
driver-side pure-Python reference — calibration_table (reliability +
ECE), association_rules, range_partition_plan (equi-depth boundaries),
cache_hit_curve, interarrival_quantiles.

Same conventions as test_property_round9.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import relational as rel


def _close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=0.0, abs_tol=tol)


# ---------------------------------------------------------- calibration_table


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.booleans(),
            st.integers(min_value=0, max_value=1_000_000),
        ),
        min_size=1,
        max_size=25,
    ),
    n_buckets=st.sampled_from([5, 10]),
)
def test_calibration_table_matches_reference(spark, rows, n_buckets):
    """Micro-integer bucketing (score=1.0 folds into the top bucket),
    exact integer ECE numerator, per-bucket acc/conf double shapes."""
    df = spark.createDataFrame(rows, "y boolean, score_micro long")
    out = rel.calibration_table(df, "y", "score_micro", n_buckets).collect()

    per = {}
    for y, s in rows:
        b = min((s * n_buckets) // 1_000_000, n_buckets - 1)
        st_ = per.setdefault(b, [0, 0, 0])  # n, n_pos, conf_micro
        st_[0] += 1
        st_[1] += 1 if y else 0
        st_[2] += s
    ece_num = sum(abs(np * 1_000_000 - cm) for _, np, cm in per.values())
    n_tot = len(rows)
    got = {r["bucket"]: r for r in out}
    assert set(got) == set(per)
    for b, (n, np, cm) in per.items():
        r = got[b]
        assert (r["n"], r["n_pos"]) == (n, np)
        # 2e-6: Spark rounds doubles HALF_UP, Python HALF_EVEN — at an
        # exact half-way 6th decimal the two differ by exactly 1e-6
        assert _close(r["acc"], round(np / n, 6), tol=2e-6)
        assert _close(r["conf"], round(cm / (n * 1_000_000.0), 6), tol=2e-6)
        assert _close(r["ece"], round(ece_num / (n_tot * 1_000_000.0), 6), tol=2e-6)


# ---------------------------------------------------------- association_rules


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["i1", "i2", "i3", "i4"]),
        ),
        min_size=1,
        max_size=30,
    ),
    min_pair=st.sampled_from([1, 2]),
)
def test_association_rules_matches_reference(spark, pairs, min_pair):
    """Directed rules both ways per qualifying unordered pair; exact
    micro support/confidence; lift = co·N/(n_a·n_b)."""
    df = spark.createDataFrame(pairs, "b int, i string")
    out = rel.association_rules(df, "b", "i", min_pair).collect()

    baskets = {}
    for b, i in set(pairs):
        baskets.setdefault(b, set()).add(i)
    item_n = {}
    for items in baskets.values():
        for i in items:
            item_n[i] = item_n.get(i, 0) + 1
    n = len(baskets)
    co = {}
    for items in baskets.values():
        s = sorted(items)
        for ai in range(len(s)):
            for bi in range(ai + 1, len(s)):
                co[(s[ai], s[bi])] = co.get((s[ai], s[bi]), 0) + 1
    want = {}
    for (x, y), c in co.items():
        if c < min_pair:
            continue
        for ante, cons in ((x, y), (y, x)):
            na, nc = item_n[ante], item_n[cons]
            want[(ante, cons)] = (
                c,
                na,
                (c * 1_000_000) // n,
                (c * 1_000_000) // na,
                round(c * n / (na * nc), 6),
            )
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_pair"],
            r["n_antecedent"],
            r["support_micro"],
            r["confidence_micro"],
            r["lift"],
        )
        for r in out
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g[:4] == w[:4], (k, g, w)
        assert _close(g[4], w[4]), (k, g[4], w[4])


# ------------------------------------------------------- range_partition_plan


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=30
    ),
    n_parts=st.sampled_from([2, 3, 4]),
)
def test_range_partition_plan_matches_reference(spark, keys, n_parts):
    """Boundary i is the smallest key whose cumulative count reaches
    (i·n) div P, with the realized cumulative rows attached."""
    df = spark.createDataFrame([(k,) for k in keys], "k int")
    out = rel.range_partition_plan(df, "k", n_parts).collect()

    counts = {}
    for k in keys:
        counts[k] = counts.get(k, 0) + 1
    n = len(keys)
    cum = []
    run = 0
    for k in sorted(counts):
        run += counts[k]
        cum.append((k, run))
    want = {}
    for b in range(1, n_parts):
        target = (b * n) // n_parts
        key, at = next((k, c) for k, c in cum if c >= target)
        want[b] = (target, key, at)
    got = {
        r["bucket"]: (r["target_rows"], r["boundary_key"], r["rows_at_or_below"])
        for r in out
    }
    assert got == want


# ------------------------------------------------------------ cache_hit_curve


@settings(max_examples=8, deadline=None)
@given(
    accesses=st.lists(
        st.integers(min_value=0, max_value=8), min_size=1, max_size=40
    ),
    ks=st.sets(
        st.integers(min_value=1, max_value=12), min_size=1, max_size=3
    ),
)
def test_cache_hit_curve_matches_reference(spark, accesses, ks):
    """LFU pinning of the top-k keys (count DESC, key ASC rank order):
    covered mass and truncating hit_micro per requested k, k beyond
    the key count covering everything."""
    df = spark.createDataFrame([(a,) for a in accesses], "key int")
    out = rel.cache_hit_curve(df, "key", sorted(ks)).collect()

    counts = {}
    for a in accesses:
        counts[a] = counts.get(a, 0) + 1
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = len(accesses)
    got = {r["k"]: r for r in out}
    assert set(got) == ks
    for k in ks:
        covered = sum(c for _, c in order[:k])
        r = got[k]
        assert r["n_keys_total"] == len(counts)
        assert r["covered_accesses"] == covered
        assert r["total_accesses"] == total
        assert r["hit_micro"] == (covered * 1_000_000) // total


# ----------------------------------------------------- interarrival_quantiles


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),
            st.sampled_from(["view", "buy"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=2,
        max_size=25,
    )
)
def test_interarrival_quantiles_matches_reference(spark, events):
    """Gaps between consecutive events within each (user, type) series,
    profiled per type: lower-empirical p50/p90 at integer rank
    indexes, truncating-division mean."""
    epoch = dt.datetime(2024, 1, 1)
    rows = [
        (u, t, epoch + dt.timedelta(seconds=s), i)
        for i, (u, t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "u string, t string, ts timestamp, id long")
    out = rel.interarrival_quantiles(df, ["u", "t"], "t", "ts", "id").collect()

    series = {}
    for u, t, ts, i in rows:
        series.setdefault((u, t), []).append((ts, i))
    gaps_by_group = {}
    for (u, t), evs in series.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        for a, b in zip(evs, evs[1:]):
            gap = int((b[0] - a[0]).total_seconds() * 1_000_000)
            gaps_by_group.setdefault(t, []).append(gap)
    want = {}
    for t, gaps in gaps_by_group.items():
        gaps.sort()
        n = len(gaps)
        i50 = (n - 1) // 2
        i90 = ((n - 1) * 9) // 10
        want[t] = (n, gaps[i50], gaps[i90], sum(gaps) // n)
    got = {
        r["group"]: (r["n_gaps"], r["p50_gap_us"], r["p90_gap_us"], r["mean_gap_us"])
        for r in out
    }
    assert got == want
