"""Round-5 property tests: invariants for the operators changed or added
this round (pack_chunk_spans two-level packing, as_of_join tie-break).

Same conventions as test_property.py — bounded examples, one shared Spark
session, each property batched into O(1) Spark jobs per example.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.asof import as_of_join
from datapipelines_essentials_python_spark.operators.text import pack_chunk_spans


def _python_pack(docs, budget):
    """Driver-side reference: lay docs end-to-end in id order, cut every
    `budget` tokens, emit (id, chunk_id, chunk_tokens, carried_in)."""
    out = []
    pos = 0
    for doc_id, n in docs:
        if n <= 0:
            continue
        start, end = pos, pos + n
        first, last = start // budget, (end - 1) // budget
        for c in range(first, last + 1):
            lo = max(start, c * budget)
            hi = min(end, (c + 1) * budget)
            out.append((doc_id, c, hi - lo, start < c * budget))
        pos = end
    return sorted(out)


@settings(max_examples=15, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    budget=st.integers(min_value=1, max_value=17),
    parts=st.integers(min_value=1, max_value=5),
)
def test_pack_chunk_spans_matches_reference_packing(spark, counts, budget, parts):
    """The two-level distributed offsets reproduce the sequential
    concat-and-chunk layout exactly, for ANY rank_partitions — i.e. the
    per-range prefix-offset join composes into the true global offsets."""
    rows = [(i, "w " * n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_tokens"], r["carried_in"])
        for r in pack_chunk_spans(
            df, "doc_id", budget_tokens=budget, rank_partitions=parts
        ).collect()
    )
    want = _python_pack([(i, n) for i, n in enumerate(counts)], budget)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=30), min_size=2, max_size=20),
    budget=st.integers(min_value=2, max_value=11),
)
def test_pack_chunk_spans_chunk_invariants(spark, counts, budget):
    """Every chunk except the stream tail holds exactly `budget` tokens;
    per-document span tokens sum back to the document's token count."""
    rows = [(i, "w " * n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = pack_chunk_spans(df, "doc_id", budget_tokens=budget).collect()
    per_chunk = {}
    per_doc = {}
    for r in spans:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + r["chunk_tokens"]
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["chunk_tokens"]
    last = max(per_chunk)
    for cid, tot in per_chunk.items():
        if cid != last:
            assert tot == budget, (cid, tot)
    assert per_chunk[last] <= budget
    assert per_doc == {i: n for i, n in enumerate(counts)}


@settings(max_examples=10, deadline=None)
@given(
    dup_vals=st.lists(
        st.integers(min_value=-100, max_value=100), min_size=2, max_size=8, unique=True
    ),
    left_ts=st.integers(min_value=0, max_value=20),
)
def test_asof_tie_break_is_input_order_invariant(spark, dup_vals, left_ts):
    """With duplicate (key, ts) right rows, tie_break picks the struct-max
    row regardless of the physical order the duplicates arrive in."""
    left = spark.createDataFrame([(1, left_ts)], "k long, ts long")
    results = []
    for order in (dup_vals, list(reversed(dup_vals))):
        right = spark.createDataFrame(
            [(1, 5, v) for v in order], "k long, ts long, v long"
        ).repartition(4)
        out = as_of_join(
            left, right, ["k"], "ts", "ts", ["v"], tie_break="v"
        ).collect()
        assert len(out) == 1
        results.append(out[0]["asof_v"])
    expected = max(dup_vals) if left_ts >= 5 else None
    assert results[0] == results[1] == expected


def _brute_pareto(points):
    return sorted(
        (c, g)
        for c, g in points
        if not any(
            c2 <= c and g2 >= g and (c2 < c or g2 > g) for c2, g2 in points
        )
    )


@settings(max_examples=12, deadline=None)
@given(
    points=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=6),
)
def test_pareto_frontier_matches_not_exists_definition(spark, points, parts):
    """The two-level prefix-max sweep equals the O(n²) dominance
    definition for ANY point set (ties, duplicates, collinear runs) and
    ANY range-partition count."""
    from datapipelines_essentials_python_spark.operators.relational import (
        pareto_frontier_2d,
    )

    df = spark.createDataFrame(
        [(i, float(c), g) for i, (c, g) in enumerate(points)],
        "id long, cost double, gain long",
    )
    got = sorted(
        (r["cost"], r["gain"])
        for r in pareto_frontier_2d(
            df, "cost", "gain", rank_partitions=parts
        ).collect()
    )
    # _brute_pareto keeps one entry per surviving INPUT row; collapse to
    # distinct frontier points first, then expand by input multiplicity
    # (equal duplicates are mutually non-dominating and all survive).
    want = [
        (float(c), g)
        for c, g in sorted(set(_brute_pareto(points)))
        for _ in range(points.count((c, g)))
    ]
    assert got == sorted(want)


@settings(max_examples=10, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=15
    ),
    k=st.integers(min_value=1, max_value=9),
)
def test_ewma_matches_sequential_reference(spark, values, k):
    """The windowed EWMA equals the driver-side truncated-EWMA recurrence
    for any series length and window depth (head renormalization
    included). Values are integer-valued doubles so the comparison is
    exact up to the operator's 6-dp round."""
    from datetime import datetime

    from datapipelines_essentials_python_spark.operators.relational import (
        ewma_smooth,
    )

    rows = [
        ("k", datetime(2024, 1 + i // 28, 1 + i % 28), float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        str(r["day"]): r["ewma"]
        for r in ewma_smooth(df, "k", "ts", "v", alpha=0.5, k=k).collect()
    }
    assert len(got) == len(values)
    for t in range(len(values)):
        num = den = 0.0
        for j in range(min(k, t + 1)):
            num += values[t - j] * 0.5**j
            den += 0.5**j
        day = rows[t][1].strftime("%Y-%m-%d")
        assert got[day] == round(num / den, 6), (t, k)


@settings(max_examples=10, deadline=None)
@given(
    states=st.lists(
        st.sampled_from("abc"), min_size=2, max_size=30
    ),
    n_keys=st.integers(min_value=1, max_value=3),
)
def test_transition_counts_match_sequential_reference(spark, states, n_keys):
    """Pair counts equal a driver-side scan of each key's sequence, and
    row probabilities sum to 1 per from_state."""
    from datapipelines_essentials_python_spark.operators.relational import (
        transition_counts,
    )

    rows = [(str(i % n_keys), i, s) for i, s in enumerate(states)]
    df = spark.createDataFrame(rows, "u string, seq long, s string")
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_counts(df, "u", ["seq"], "s").collect()
    }
    want = {}
    seqs = {}
    for u, _, s in rows:
        seqs.setdefault(u, []).append(s)
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want
