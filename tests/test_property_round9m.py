"""Round-9 property batch M: randomized invariants for the remaining
round-10 rotation-pool operators — conversion_delay_quantiles,
fd_violations, feature_hash_tf (hashlib twin), substring_dup_profile,
distinctive_terms (Monroe log-odds), and with_hilbert_key (bijection +
unit-step adjacency, the defining Hilbert-curve properties).

Same conventions as test_property_round9.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.dq.engine import fd_violations
from datapipelines_essentials_python_spark.functions.hashing import (
    with_hilbert_key,
)
from datapipelines_essentials_python_spark.operators import relational as rel
from datapipelines_essentials_python_spark.operators.chunking import (
    feature_hash_tf,
    substring_dup_profile,
)
from datapipelines_essentials_python_spark.operators.text import (
    distinctive_terms,
)


def _close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=0.0, abs_tol=tol)


# --------------------------------------------------- conversion_delay_quantiles


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["signup", "purchase", "view"]),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_conversion_delay_matches_reference(spark, events):
    """First-from → first-LATER-to delays per cohort; non-converters
    (no purchase strictly after first signup) drop out; lower-empirical
    quantiles and truncating-div mean."""
    epoch = dt.datetime(2024, 1, 1)
    rows = [
        (u, t, epoch + dt.timedelta(seconds=s)) for u, t, s in events
    ]
    df = spark.createDataFrame(rows, "u long, t string, ts timestamp")
    out = rel.conversion_delay_quantiles(
        df, "u", "t", "ts", "signup", "purchase", lambda ts: F.lit(0).cast("long")
    ).collect()

    first = {}
    for u, t, s in events:
        if t in ("signup", "purchase"):
            d = first.setdefault(u, {})
            d[t] = min(d.get(t, s), s)
    delays = sorted(
        (d["purchase"] - d["signup"]) * 1_000_000
        for d in first.values()
        if "signup" in d and "purchase" in d and d["purchase"] > d["signup"]
    )
    if not delays:
        assert out == []
        return
    n = len(delays)
    assert len(out) == 1
    r = out[0]
    assert r["n_converted"] == n
    assert r["p50_delay_us"] == delays[(n - 1) // 2]
    assert r["p90_delay_us"] == delays[((n - 1) * 9) // 10]
    assert r["mean_delay_us"] == sum(delays) // n


# ----------------------------------------------------------------- fd_violations


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_fd_violations_matches_reference(spark, rows):
    """Per dependency A→B: distinct-A count, keys with ≥2 images, and
    the worst key's image count — zero violations iff the FD holds."""
    df = spark.createDataFrame(rows, "a int, b int")
    out = {
        (r["determinant"], r["dependent"]): (
            r["n_keys"],
            r["n_violating_keys"],
            r["max_images"],
        )
        for r in fd_violations(df, [("a", "b"), ("b", "a")]).collect()
    }
    for det, dep in (("a", "b"), ("b", "a")):
        images = {}
        for row in rows:
            k = row[0] if det == "a" else row[1]
            v = row[1] if det == "a" else row[0]
            images.setdefault(k, set()).add(v)
        want = (
            len(images),
            sum(1 for s in images.values() if len(s) > 1),
            max(len(s) for s in images.values()),
        )
        assert out[(det, dep)] == want, ((det, dep), out[(det, dep)], want)


# --------------------------------------------------------------- feature_hash_tf


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    ),
    buckets=st.sampled_from([4, 64]),
)
def test_feature_hash_tf_matches_md5_reference(spark, docs, buckets):
    """bucket = first-8-hex(md5(token)) mod B, counted per (doc,
    bucket) — replayed with hashlib; total tf mass equals token count."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = feature_hash_tf(df, "text", "doc_id", num_buckets=buckets).collect()
    want = {}
    for i, toks in enumerate(docs):
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % buckets
            want[(i, b)] = want.get((i, b), 0) + 1
    got = {(r["doc_id"], r["bucket"]): r["tf"] for r in out}
    assert got == want


# --------------------------------------------------------- substring_dup_profile


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=14
        ),
        min_size=1,
        max_size=5,
    ),
    window=st.sampled_from([3, 4]),
    stride=st.sampled_from([1, 2]),
)
def test_substring_dup_profile_matches_reference(spark, docs, window, stride):
    """A window is duplicated when its exact token text occurs ≥2 times
    corpus-wide (any document, or twice in one); tail windows
    participate as-is."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_dup_profile(
        df, "text", "doc_id", window=window, stride=stride
    ).collect()

    def windows(toks):
        res = []
        i = 0
        while i < len(toks):
            res.append(" ".join(toks[i : i + window]))
            i += stride
        return res

    all_wins = {}
    per_doc = {}
    for i, toks in enumerate(docs):
        ws = windows(toks)
        per_doc[i] = ws
        for w in ws:
            all_wins[w] = all_wins.get(w, 0) + 1
    got = {r["doc_id"]: r for r in out}
    assert set(got) == set(per_doc)
    for i, ws in per_doc.items():
        n_dup = sum(1 for w in ws if all_wins[w] >= 2)
        r = got[i]
        assert r["n_windows"] == len(ws)
        assert r["n_dup_windows"] == n_dup
        assert _close(r["dup_ratio"], round(n_dup / len(ws), 6), tol=2e-6)


# ------------------------------------------------------------ distinctive_terms


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.lists(
                st.sampled_from(["red", "blue", "green", "dog"]),
                min_size=1,
                max_size=10,
            ),
        ),
        min_size=2,
        max_size=6,
    )
)
def test_distinctive_terms_matches_reference(spark, docs):
    """Monroe log-odds z-scores with the corpus-share Dirichlet prior,
    top-k by (z DESC, term ASC) — requires both groups present so the
    rest-of-corpus masses are non-degenerate."""
    groups = {g for g, _ in docs}
    if len(groups) < 2:
        docs = docs + [("g2" if "g1" in groups else "g1", ["dog"])]
    rows = [(g, " ".join(toks)) for g, toks in docs]
    df = spark.createDataFrame(rows, "g string, text string")
    out = distinctive_terms(df, "g", "text", alpha_micro=10_000, top_k=50).collect()

    y = {}
    for g, toks in docs:
        for t in toks:
            y[(g, t)] = y.get((g, t), 0) + 1
    y_w = {}
    n_g = {}
    for (g, t), c in y.items():
        y_w[t] = y_w.get(t, 0) + c
        n_g[g] = n_g.get(g, 0) + c
    n_all = sum(y_w.values())
    scale = 10_000 / 1_000_000.0
    for r in out:
        g, t = r["group"], r["term"]
        y_gw = y[(g, t)]
        a_w = scale * y_w[t]
        a0 = scale * n_all
        y_rest = y_w[t] - y_gw
        nrest = n_all - n_g[g]
        delta = (
            math.log(y_gw + a_w)
            - math.log(n_g[g] + a0 - y_gw - a_w)
            - math.log(y_rest + a_w)
            + math.log(nrest + a0 - y_rest - a_w)
        )
        var = 1.0 / (y_gw + a_w) + 1.0 / (y_rest + a_w)
        z = delta / math.sqrt(var)
        assert r["n_in_group"] == y_gw
        assert r["n_rest"] == y_rest
        assert _close(r["z_score"], round(z, 6), tol=2e-6), (g, t)


# ------------------------------------------------------------- with_hilbert_key


def test_hilbert_key_is_bijective_with_unit_steps(spark):
    """The two defining Hilbert-curve properties on the full 16×16
    grid: hkey is a bijection onto [0, 256) and consecutive keys are
    GRID NEIGHBORS (Manhattan distance exactly 1) — any rotation or
    reflection bug breaks adjacency somewhere."""
    bits = 4
    n = 1 << bits
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x int, y int")
    out = with_hilbert_key(df, "x", "y", bits=bits).collect()
    by_key = {r["hkey"]: (r["x"], r["y"]) for r in out}
    assert sorted(by_key) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_key[d], by_key[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_key[d], by_key[d + 1])
