"""Round-9 property batch L: randomized invariants for the round-10
rotation-pool TEXT operators, each checked against a driver-side
pure-Python reference — normalize_text, strip_markup, and
logit_quality_score (rational-squash linear model).

Inputs are restricted to ASCII (Java's regex \\s is ASCII-only while
Python's is Unicode-aware — the operators' portability contract is
ASCII-safe classes, so the tests stay inside it).

Same conventions as test_property_round9.py — bounded examples, one
shared Spark session, O(1) Spark jobs per example.
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.text import (
    LANG_PROFILES,
    logit_quality_score,
    normalize_text,
    strip_markup,
)


def _close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=0.0, abs_tol=tol)


# -------------------------------------------------------------- normalize_text


def _py_normalize(s: str, lowercase: bool = True) -> str:
    s = re.sub(r"[\x00-\x1f\x7f]", " ", s)
    if lowercase:
        s = s.lower()
    s = re.sub(r"[ \t\n\x0b\f\r]+", " ", s)
    return s.strip(" \t\n\x0b\f\r")


_ASCII_MESSY = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ09 .,!") + ["\t", "\n", "\x00", "\x07", "\x1f", "\x7f"]
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(_ASCII_MESSY, min_size=1, max_size=8))
def test_normalize_text_matches_reference(spark, texts):
    """Control chars → space, lowercase, whitespace-run collapse, trim —
    and the pass is idempotent (normalize∘normalize = normalize)."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    out = df.select(
        "i",
        normalize_text("t").alias("norm"),
        normalize_text(normalize_text("t")).alias("norm2"),
    ).collect()
    got = {r["i"]: (r["norm"], r["norm2"]) for r in out}
    for i, t in enumerate(texts):
        want = _py_normalize(t)
        assert got[i] == (want, want), (t, got[i], want)


# ---------------------------------------------------------------- strip_markup


def _py_strip_markup(s: str) -> str:
    s = re.sub(r"(?si)<script[^>]*>.*?</script>", " ", s)
    s = re.sub(r"(?si)<style[^>]*>.*?</style>", " ", s)
    s = re.sub(r"<[^>]+>", " ", s)
    for ent, repl in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        s = s.replace(ent, repl)
    s = re.sub(r"[ \t\n\x0b\f\r]+", " ", s)
    return s.strip(" \t\n\x0b\f\r")


_MARKUP_PIECE = st.sampled_from(
    [
        "plain words",
        "<b>bold</b>",
        "<script>var x=1;</script>",
        "<script type='t'>\nmulti\nline\n</script>",
        "<style>.c{color:red}</style>",
        "<a href='x'>link</a>",
        "&amp;lt;",
        "&lt;tag&gt;",
        "&quot;q&quot;",
        "a&nbsp;b",
        "<div class='c'>",
        "</div>",
        "\n\t",
        "5 < 6 but x > y",
    ]
)


@settings(max_examples=10, deadline=None)
@given(pieces=st.lists(_MARKUP_PIECE, min_size=1, max_size=6))
def test_strip_markup_matches_reference(spark, pieces):
    """Script/style blocks drop wholesale, tags strip, the five
    entities decode ONE level (&amp; last), whitespace collapses."""
    text = " ".join(pieces)
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(strip_markup("t").alias("s")).collect()[0]["s"]
    assert got == _py_strip_markup(text), (text, got)


# --------------------------------------------------------- logit_quality_score


@settings(max_examples=10, deadline=None)
@given(
    words=st.lists(
        st.sampled_from(
            ["the", "of", "and", "cat", "zebra", "Analysis", "xx", "a"]
        ),
        min_size=1,
        max_size=15,
    ),
    w_tok=st.sampled_from([0.0, 0.01]),
    w_stop=st.sampled_from([-1.5, 2.0]),
)
def test_logit_quality_score_matches_reference(spark, words, w_tok, w_stop):
    """Feature extraction (rounded to 6), fixed-order dot product, and
    the rational squash all replay in pure Python arithmetic."""
    text = " ".join(words)
    weights = {
        "n_tokens": w_tok,
        "stopword_ratio": w_stop,
        "avg_token_len": 0.25,
        "uniq_token_ratio": 1.0,
    }
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(
        logit_quality_score("t", weights, bias=-0.5).alias("s")
    ).collect()[0]["s"]

    toks = [w.lower() for w in words]
    n = len(toks)
    stop = set(LANG_PROFILES["en"])
    feats = {
        "n_tokens": float(n),
        "avg_token_len": round(sum(len(t) for t in toks) / n, 6),
        "stopword_ratio": round(sum(1 for t in toks if t in stop) / n, 6),
        "uniq_token_ratio": round(len(set(toks)) / n, 6),
    }
    z = -0.5
    for name in sorted(weights):
        z = z + weights[name] * feats[name]
    want = 0.5 + 0.5 * z / (1.0 + abs(z))
    assert _close(got, want, tol=1e-5), (text, got, want)
