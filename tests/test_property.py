"""Property-based tests (hypothesis) — the working replacement for the
reference's broken MockupData randomized-testing intent (SURVEY §5).

Each property runs a bounded number of examples against one shared Spark
session; examples are batched into single DataFrames where possible so a
property costs O(1) Spark jobs, not O(examples).
"""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.expr.filter_dsl import compile_filter
from datapipelines_essentials_python_spark.functions.durations import (
    iso_duration_to_seconds,
    seconds_to_iso_duration,
)
from datapipelines_essentials_python_spark.operators.sampling import hash_fraction

_SECONDS = st.one_of(
    st.integers(min_value=0, max_value=10**6),
    st.floats(min_value=0, max_value=10**6, allow_nan=False, allow_infinity=False),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_SECONDS, min_size=1, max_size=30))
def test_iso_duration_roundtrip(spark, values):
    """format → parse recovers the seconds (to microsecond precision,
    matching the golden output's 6-decimal format)."""
    df = spark.createDataFrame([(float(v),) for v in values], "secs double")
    out = df.select(
        "secs",
        iso_duration_to_seconds(seconds_to_iso_duration(F.col("secs"))).alias("rt"),
    ).collect()
    for r in out:
        assert math.isclose(
            round(r["secs"], 6), r["rt"], rel_tol=0, abs_tol=1e-6
        ), (r["secs"], r["rt"])


_CMP_VALUES = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=20, deadline=None)
@given(
    op=st.sampled_from(["eq", "ne", "gt", "lt", "gte", "lte"]),
    pivot=_CMP_VALUES,
    data=st.lists(_CMP_VALUES, min_size=1, max_size=50),
)
def test_filter_dsl_matches_python_semantics(spark, op, pivot, data):
    """The compiled DSL predicate selects exactly the rows Python would."""
    py_ops = {
        "eq": lambda a: a == pivot,
        "ne": lambda a: a != pivot,
        "gt": lambda a: a > pivot,
        "lt": lambda a: a < pivot,
        "gte": lambda a: a >= pivot,
        "lte": lambda a: a <= pivot,
    }
    df = spark.createDataFrame([(i, v) for i, v in enumerate(data)], "i long, v long")
    got = sorted(
        r["i"] for r in df.where(compile_filter("v", f"{op}({pivot})")).collect()
    )
    want = sorted(i for i, v in enumerate(data) if py_ops[op](v))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    frac=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    salt=st.text(alphabet="abcxyz", max_size=5),
)
def test_hash_fraction_deterministic_and_bounded(spark, frac, salt):
    """hash_fraction is stable across evaluations and uniform on [0, 1);
    the same (id, salt) always lands on the same side of any threshold."""
    df = spark.range(0, 200).withColumn("h", hash_fraction("id", salt))
    rows = {r["id"]: r["h"] for r in df.collect()}
    rows2 = {r["id"]: r["h"] for r in df.collect()}
    assert rows == rows2
    assert all(0.0 <= h < 1.0 for h in rows.values())
    kept = {i for i, h in rows.items() if h < frac}
    kept2 = {
        r["id"]
        for r in df.where(hash_fraction("id", salt) < frac).collect()
    }
    assert kept == kept2


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=30),
            st.integers(min_value=1, max_value=30),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_star_components_equal_propagation(spark, edges):
    """Pointer-jumping and min-label propagation must agree on ANY graph."""
    from datapipelines_essentials_python_spark.operators import dedup

    nodes = spark.createDataFrame([(i,) for i in range(1, 31)], "id long")
    e = spark.createDataFrame(
        edges or [(1, 1)], "id_a long, id_b long"  # empty lists need a schema row
    )
    prop = {
        r["id"]: r["component"]
        for r in dedup.connected_components(e, nodes=nodes).collect()
    }
    star = {
        r["id"]: r["component"]
        for r in dedup.connected_components_star(e, nodes=nodes).collect()
    }
    assert star == prop


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab @.-0123456789xyz"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=10,
    )
)
def test_pii_redact_idempotent(spark, texts):
    """Redacting already-redacted text finds nothing and changes nothing."""
    from datapipelines_essentials_python_spark.operators.text import pii_redact

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select(pii_redact("text").alias("r")).select(
        F.col("r.text").alias("text")
    )
    twice = once.select(pii_redact("text").alias("r")).select(
        F.col("r.n_email").alias("e"),
        F.col("r.n_phone").alias("p"),
        F.col("r.n_ip").alias("i"),
        F.col("r.text").alias("text2"),
    )
    joined = once.collect(), twice.collect()
    for o, t in zip(*joined):
        assert (t["e"], t["p"], t["i"]) == (0, 0, 0)
        assert t["text2"] == o["text"]


@settings(max_examples=10, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=2, max_size=6),
    shares=st.lists(
        st.integers(min_value=1, max_value=10), min_size=2, max_size=6
    ),
)
def test_mixture_rates_never_upsamples_and_hits_shares(spark, counts, shares):
    """Waterfilling invariants: every rate ≤ 1; at least one targeted
    domain keeps all its rows (the binding constraint); kept counts are
    proportional to target shares up to flooring."""
    from datapipelines_essentials_python_spark.operators.sampling import mixture_rates

    k = min(len(counts), len(shares))
    counts, shares = counts[:k], shares[:k]
    tot_share = sum(shares)
    targets = {f"d{i}": shares[i] / tot_share for i in range(k)}
    rows = [(f"d{i}",) for i in range(k) for _ in range(counts[i])]
    df = spark.createDataFrame(rows, "domain string")
    out = {r["domain"]: r for r in mixture_rates(df, "domain", targets).collect()}
    assert all(r["rate"] <= 1.0 for r in out.values())
    assert all(r["n_keep"] <= r["n_rows"] for r in out.values())
    # the binding domain (min count/share) keeps everything (rate 1 up to
    # the round(…,6) applied to the rate)
    binding = min(range(k), key=lambda i: counts[i] / targets[f"d{i}"])
    assert out[f"d{binding}"]["rate"] >= 0.999999


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0, max_value=100, allow_nan=False), min_size=2, max_size=60
    )
)
def test_chi2_drift_nonnegative_and_mass_conserving(spark, vals):
    """Chi-square drift invariants on arbitrary data: contributions are
    never negative, per-slice bucket counts sum to the slice sizes, and
    shares sum to 1 per slice."""
    from datapipelines_essentials_python_spark.operators.relational import chi2_drift

    rows = [(float(v), i % 2 == 0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v double, ref boolean")
    out = chi2_drift(df, "v", F.col("ref"), [25.0, 50.0, 75.0]).collect()
    n_ref = sum(r["n_ref"] for r in out)
    n_cur = sum(r["n_cur"] for r in out)
    assert n_ref == sum(1 for _, is_ref in rows if is_ref)
    assert n_cur == sum(1 for _, is_ref in rows if not is_ref)
    assert all(r["chi2_contrib"] >= 0.0 for r in out)
    if n_ref:
        assert abs(sum(r["p_ref"] for r in out) - 1.0) < 1e-4


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.floats(min_value=0.5, max_value=40, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
    rights=st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.floats(min_value=0.5, max_value=40, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
    bucket=st.sampled_from([5.0, 10.0, 25.0]),
)
def test_interval_overlap_join_matches_brute_force(spark, lefts, rights, bucket):
    """Bucketized interval join returns EXACTLY the brute-force overlap
    set, each pair once, for arbitrary intervals and bucket widths."""
    from datapipelines_essentials_python_spark.operators.asof import (
        interval_overlap_join,
    )

    lrows = [(i, lo, lo + w) for i, (lo, w) in enumerate(lefts)]
    rrows = [(i, lo, lo + w) for i, (lo, w) in enumerate(rights)]
    l = spark.createDataFrame(lrows, "lid long, lo_a double, hi_a double")
    r = spark.createDataFrame(rrows, "rid long, lo_b double, hi_b double")
    out = interval_overlap_join(l, r, "lo_a", "hi_a", "lo_b", "hi_b", bucket)
    got = sorted((x["lid"], x["rid"]) for x in out.collect())
    want = sorted(
        (li, ri)
        for li, llo, lhi in lrows
        for ri, rlo, rhi in rrows
        if llo < rhi and rlo < lhi
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(
            # letters cover real entity spellings (lt/gt/amp/nbsp/quot) so
            # tag-soup around entity-SHAPED text is exercised; '&' itself is
            # excluded because HTML entity decoding is inherently not
            # idempotent (&amp;lt; -> &lt; -> < is CORRECT unescaping) —
            # entity behavior is pinned exactly in
            # test_strip_markup_single_level_decode below.
            alphabet=st.sampled_from(list("abclmtgnopqsu <>/;\"=1\n\t")),
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_strip_markup_idempotent_on_entity_free_text(spark, texts):
    """Stripping already-stripped ENTITY-FREE text is a no-op — tags and
    whitespace collapse are idempotent; only entity decoding is not."""
    from datapipelines_essentials_python_spark.operators.text import strip_markup

    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    out = df.select(
        strip_markup("raw").alias("once"),
    ).select("once", strip_markup(F.col("once")).alias("twice"))
    for r in out.collect():
        assert r["once"] == r["twice"], (r["once"], r["twice"])


def test_strip_markup_single_level_decode(spark):
    """Standard decode order: &amp; is decoded LAST, so nested entities
    decode exactly ONE level per pass (&amp;lt; -> &lt;, never straight to
    '<'), and a second pass decodes the next level — documented
    non-idempotence of real HTML unescaping."""
    from datapipelines_essentials_python_spark.operators.text import strip_markup

    rows = [
        ("&amp;lt;", "&lt;"),
        ("&amp;amp;", "&amp;"),
        ("&amp;gt;b", "&gt;b"),
        ("a &amp; b", "a & b"),
        ("&lt;p&gt;", "<p>"),
        ("x&nbsp;&quot;y&quot;", 'x "y"'),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "raw string")
    got = [r["s"] for r in df.select(strip_markup("raw").alias("s")).collect()]
    assert got == [want for _, want in rows]
