"""Round-9 property tests, fourth batch: the curation tail the sixth
driver rotation gated — n-gram novelty, the per-domain token budget,
and character entropy — vs pure-Python references.
"""

from __future__ import annotations

import math
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from datapipelines_essentials_python_spark.operators import sampling
from datapipelines_essentials_python_spark.operators.chunking import (
    ngram_novelty,
)
from datapipelines_essentials_python_spark.operators.text import char_entropy


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z"]), min_size=0, max_size=10
        ),
        min_size=1,
        max_size=4,
    )
)
def test_ngram_novelty_matches_reference(spark, docs):
    """novelty = share of the doc's DISTINCT windows whose minimum
    containing doc id is this doc; short docs report (0, 0, 1.0)."""
    w = 3
    corpus = {i: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_novel"], r["novelty_ratio"])
        for r in ngram_novelty(df, "text", "doc_id", window=w).collect()
    }
    # reference
    win_sets = {
        i: {tuple(t[s : s + w]) for s in range(len(t) - w + 1)}
        for i, t in corpus.items()
    }
    first = {}
    for i in sorted(corpus):
        for win in win_sets[i]:
            first.setdefault(win, i)
    for i in corpus:
        nw = len(win_sets[i])
        nn = sum(1 for win in win_sets[i] if first[win] == i)
        ratio = round(nn / nw, 6) if nw > 0 else 1.0
        assert got[i] == (nw, nn, ratio), (i, got[i], (nw, nn, ratio))


@settings(max_examples=8, deadline=None)
@given(
    domains=st.dictionaries(
        st.sampled_from(["d1", "d2", "d3"]),
        st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=6
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_token_budget_matches_reference(spark, domains):
    """Counts exact; q_temp shares sum to ~1; alloc = floor(target*q);
    epochs = alloc/n_tokens; sqrt temperature flattens shares (smallest
    domain's share rises vs raw)."""
    rows = [
        (d, " ".join(toks)) for d, docs in domains.items() for toks in docs
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    target = 1000
    out = {
        r["domain"]: r
        for r in sampling.token_budget(
            df, "source", "text", target_tokens=target, sqrt_passes=1
        ).collect()
    }
    assert set(out) == set(domains)
    want_tokens = {
        d: sum(len(t) for t in docs) for d, docs in domains.items()
    }
    total = sum(want_tokens.values())
    masses = {d: math.sqrt(n / total) for d, n in want_tokens.items()}
    z = float(sum(Decimal(str(round(m, 12))) for m in masses.values()))
    for d, docs in domains.items():
        r = out[d]
        assert r["n_docs"] == len(docs)
        assert r["n_tokens"] == want_tokens[d]
        q = masses[d] / z
        assert abs(r["q_temp"] - round(q, 6)) <= 2e-6
        assert abs(r["alloc_tokens"] - math.floor(target * q)) <= 1
        assert (
            abs(r["epochs"] - round(r["alloc_tokens"] / r["n_tokens"], 6))
            <= 1e-6
        )
    assert abs(sum(r["q_temp"] for r in out.values()) - 1.0) <= 1e-5


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abcz019 ", min_size=1, max_size=30),
        min_size=1,
        max_size=4,
    )
)
def test_char_entropy_matches_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["id"]: r for r in char_entropy(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        counts = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = sum(counts.values())
        terms = Decimal(0)
        for c in counts.values():
            p = c / n
            terms += Decimal(str(round(p * (math.log(p) / math.log(2.0)), 9)))
        want = -float(terms)
        r = out[i]
        assert r["n_chars"] == n
        assert r["n_distinct_chars"] == len(counts)
        # 9dp-term rounding boundary: allow one ulp per distinct char
        assert abs(r["char_entropy"] - want) <= 1e-9 * (len(counts) + 1)
        # invariants: 0 <= H <= log2(distinct)
        assert -1e-9 <= r["char_entropy"] <= math.log2(len(counts)) + 1e-6
