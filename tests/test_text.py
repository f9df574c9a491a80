"""Text analysis operators (driver-mandated)."""

from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import text


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("The  quick   brown fox",), ("",)], "text string")
    out = df.select(
        text.token_count("text").alias("n"),
        text.bpe_ish_token_count("text").alias("b"),
    ).collect()
    assert out[0]["n"] == 4 and out[1]["n"] == 0
    assert out[0]["b"] == 4


def test_bpe_ish_counts_punctuation(spark):
    df = spark.createDataFrame([("don't stop! 123 times.",)], "text string")
    # don + ' + t + stop + ! + 123 + times + . = 8
    assert df.select(text.bpe_ish_token_count("text")).collect()[0][0] == 8


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog went to a house in paris",),
            ("el perro es un animal que vive en la casa",),
            ("der hund und die katze von dem haus ist da",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(text.detect_language("text")).collect()]
    assert out == ["en", "es", "de", "und"]


def test_quality_metrics(spark):
    df = spark.createDataFrame([("the cat sat",)], "text string")
    row = text.quality_metrics(df, "text").collect()[0]
    assert row["n_tokens"] == 3
    assert row["uniq_token_ratio"] == 1.0
    assert abs(row["stopword_ratio"] - 1 / 3) < 1e-6


def test_fingerprint_stability_and_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "totally other words here now ok yes no")],
        "id int, text string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", text.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_ngram_repetition(spark):
    from datapipelines_essentials_python_spark.operators.text import ngram_repetition

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z w"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in ngram_repetition(df, "doc_id").collect()}
    # doc 1 bigrams: ab, ba, ab, ba, ab → top 'a b'=3 of 5
    assert out[1]["n_ngrams"] == 5 and out[1]["top_cnt"] == 3
    assert abs(out[1]["top_frac"] - 0.6) < 1e-9
    # doc 2: all bigrams distinct
    assert out[2]["top_cnt"] == 1
    # doc 3: < n tokens → no rows (empty gram array explodes to nothing)
    assert 3 not in out


def test_pack_documents(spark):
    from datapipelines_essentials_python_spark.operators.text import pack_documents

    # 4 docs of 3 tokens each, budget 5: cumulative starts 0,3,6,9 → packs 0,0,1,1
    df = spark.createDataFrame(
        [(i, "w w w", "en") for i in range(4)], "doc_id long, text string, lang string"
    )
    out = {r["doc_id"]: r["pack_id"] for r in pack_documents(
        df, "doc_id", budget_tokens=5, shard_col="lang"
    ).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1}


def test_pack_documents_sharded_independent(spark):
    from datapipelines_essentials_python_spark.operators.text import pack_documents

    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "a b", "fr"), (3, "a b", "en"), (4, "a b", "fr")],
        "doc_id long, text string, lang string",
    )
    rows = pack_documents(df, "doc_id", budget_tokens=3, shard_col="lang").collect()
    packs = {(r["lang"], r["doc_id"]): r["pack_id"] for r in rows}
    # each shard packs independently from position 0
    assert packs[("en", 1)] == 0 and packs[("en", 3)] == 0
    assert packs[("fr", 2)] == 0 and packs[("fr", 4)] == 0


def test_pack_chunk_spans_splits_straddlers(spark):
    from datapipelines_essentials_python_spark.operators.text import (
        pack_chunk_spans,
    )

    # tokens: doc0=3, doc1=4, doc2=2; budget 5 → stream of 9 tokens cut at
    # 5: doc1 straddles (2 tokens in chunk 0, 2 carried into chunk 1).
    df = spark.createDataFrame(
        [(0, "w w w", "en"), (1, "w w w w", "en"), (2, "w w", "en")],
        "doc_id long, text string, lang string",
    )
    rows = pack_chunk_spans(
        df, "doc_id", budget_tokens=5, shard_col="lang"
    ).collect()
    spans = {(r["doc_id"], r["chunk_id"]): r for r in rows}
    assert len(rows) == 4  # doc1 emitted twice
    assert spans[(0, 0)]["chunk_tokens"] == 3 and not spans[(0, 0)]["carried_in"]
    assert spans[(1, 0)]["chunk_tokens"] == 2 and not spans[(1, 0)]["carried_in"]
    assert spans[(1, 1)]["chunk_tokens"] == 2 and spans[(1, 1)]["carried_in"]
    assert spans[(2, 1)]["chunk_tokens"] == 2 and not spans[(2, 1)]["carried_in"]


def test_pack_chunk_spans_full_chunk_invariant(spark):
    from datapipelines_essentials_python_spark.operators.text import (
        pack_chunk_spans,
    )

    # ragged doc lengths over two shards; every non-final chunk per shard
    # must hold exactly `budget` tokens, and per-doc span tokens must sum
    # to the doc's token count. rank_partitions=3 exercises the two-level
    # offset path with multiple range partitions.
    rows_in = [
        (i, " ".join(["w"] * (1 + (i * 7) % 13)), "en" if i % 3 else "fr")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, text string, lang string")
    out = pack_chunk_spans(
        df, "doc_id", budget_tokens=16, shard_col="lang", rank_partitions=3
    ).collect()
    by_chunk: dict = {}
    by_doc: dict = {}
    for r in out:
        by_chunk.setdefault((r["lang"], r["chunk_id"]), 0)
        by_chunk[(r["lang"], r["chunk_id"])] += r["chunk_tokens"]
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["chunk_tokens"]
    expected_tokens = {i: 1 + (i * 7) % 13 for i in range(40)}
    assert by_doc == expected_tokens
    for lang in ("en", "fr"):
        chunks = sorted(k[1] for k in by_chunk if k[0] == lang)
        assert chunks == list(range(len(chunks)))  # contiguous from 0
        total = sum(expected_tokens[i] for i in range(40)
                    if (("en" if i % 3 else "fr") == lang))
        for c in chunks[:-1]:
            assert by_chunk[(lang, c)] == 16
        assert by_chunk[(lang, chunks[-1])] == total - 16 * (len(chunks) - 1)


def test_pack_chunk_spans_head_matches_pack_documents(spark):
    from datapipelines_essentials_python_spark.operators.text import (
        pack_chunk_spans,
        pack_documents,
    )

    # the head span's chunk_id is exactly pack_documents' pack_id (same
    # budget): both are floor(tokens_before / budget).
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (2 + i % 5)), "en") for i in range(25)],
        "doc_id long, text string, lang string",
    )
    heads = {
        r["doc_id"]: r["chunk_id"]
        for r in pack_chunk_spans(
            df, "doc_id", budget_tokens=7, shard_col="lang"
        ).collect()
        if not r["carried_in"]
    }
    packs = {
        r["doc_id"]: r["pack_id"]
        for r in pack_documents(
            df, "doc_id", budget_tokens=7, shard_col="lang"
        ).collect()
    }
    assert heads == packs


def test_pii_redact_sequential_counts(spark):
    from datapipelines_essentials_python_spark.operators.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org, call 555-123-4567, host 10.0.0.1"),
            (2, "clean text with no pii at all"),
            (3, "ip only 192.168.1.255 here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["red"] for r in df.select("id", pii_redact("text").alias("red")).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (2, 1, 1)
    assert "<EMAIL>" in out[1]["text"] and "<PHONE>" in out[1]["text"] and "<IP>" in out[1]["text"]
    assert "a@b.com" not in out[1]["text"] and "555-123-4567" not in out[1]["text"]
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ip"]) == (0, 0, 0)
    assert out[2]["text"] == "clean text with no pii at all"
    assert out[3]["n_ip"] == 1 and "<IP>" in out[3]["text"]


def test_contamination_ratio(spark):
    from datapipelines_essentials_python_spark.operators.text import contamination

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),   # shares shingles with eval
            (2, "totally unrelated words entirely here now"),
            (3, "the quick brown fox jumps high"),   # the eval doc itself
        ],
        "doc_id long, text string",
    )
    ev = docs.where("doc_id = 3")
    out = {r["id"]: r for r in contamination(docs, ev).collect()}
    assert out[3]["ratio"] == 1.0           # eval doc fully contaminated
    assert out[1]["ratio"] == 1.0           # identical text → full overlap
    assert out[2]["n_contaminated"] == 0 and out[2]["ratio"] == 0.0


def test_contamination_strategies_agree(spark):
    from datapipelines_essentials_python_spark.operators.text import contamination

    docs = spark.createDataFrame(
        [(i, f"common prefix words here plus tail {i} {i+1} {i+2}") for i in range(20)],
        "doc_id long, text string",
    )
    ev = docs.where("doc_id % 5 = 0")
    a = sorted(map(tuple, contamination(docs, ev, strategy="broadcast_array").collect()))
    b = sorted(map(tuple, contamination(docs, ev, strategy="join").collect()))
    assert a == b


def test_normalize_text(spark):
    from datapipelines_essentials_python_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello\t\x07WORLD  \n\nfoo\x1f bar  ")], "id long, text string"
    )
    out = df.select(normalize_text("text").alias("n")).head()["n"]
    assert out == "hello world foo bar"
    # idempotent: normalizing a normalized string is a no-op
    df2 = spark.createDataFrame([(1, out)], "id long, text string")
    assert df2.select(normalize_text("text").alias("n")).head()["n"] == out


def test_normalize_text_preserves_case_when_asked(spark):
    from datapipelines_essentials_python_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, " A  B ")], "id long, text string")
    assert (
        df.select(normalize_text("text", lowercase=False).alias("n")).head()["n"]
        == "A B"
    )


def test_build_vocab_coverage_monotone(spark):
    from datapipelines_essentials_python_spark.operators.text import build_vocab

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "id long, text string"
    )
    rows = build_vocab(df, "text").orderBy("rank").collect()
    assert [r["token"] for r in rows] == ["a", "b", "c", "d"]
    assert [r["cnt"] for r in rows] == [4, 3, 1, 1]
    assert [r["cum_cnt"] for r in rows] == [4, 7, 8, 9]
    assert all(r["total_cnt"] == 9 for r in rows)
    # ties (c=1, d=1) broken by token order
    assert rows[2]["token"] < rows[3]["token"]


def test_tfidf_top_terms_ranks_distinctive_terms_first(spark):
    from datapipelines_essentials_python_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common common zebra zebra zebra"),
            (2, "common common common yak"),
            (3, "common plain words"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    top = {r["id"]: r["term"] for r in out}
    # the doc-unique term beats the corpus-wide one despite lower tf
    assert top[1] == "zebra" and top[2] == "yak"
    assert all(r["rank"] == 1 for r in out)


def test_bloom_contamination_superset_of_exact(spark):
    """Bloom hits can only over-count the exact check (one-sided error),
    and eval members themselves always come back fully hit."""
    from datapipelines_essentials_python_spark.operators.text import (
        bloom_contamination,
        contamination,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    exact = {
        r["id"]: r["n_contaminated"]
        for r in contamination(docs, ev, "doc_id", "text").collect()
    }
    bloom = {
        r["id"]: (r["n_shingles"], r["n_bloom_hits"], r["ratio"])
        for r in bloom_contamination(docs, ev, "doc_id", "text").collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, (n_sh, n_hits, ratio) in bloom.items():
        assert n_hits >= exact[doc_id]  # never a false negative
    for r in ev.select("doc_id").collect():
        n_sh, n_hits, ratio = bloom[r["doc_id"]]
        assert n_hits == n_sh and (ratio == 1.0 or n_sh == 0)


def test_bloom_contamination_tiny_filter_over_flags_only(spark):
    """With a deliberately tiny bit space every probe collides -> all
    documents are fully flagged, demonstrating the error is one-sided."""
    from datapipelines_essentials_python_spark.operators.text import (
        bloom_contamination,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "zz yy xx ww vv")], "doc_id long, text string"
    )
    ev = docs.where(F.col("doc_id") == 1)
    out = {r["id"]: r["ratio"] for r in
           bloom_contamination(docs, ev, "doc_id", "text", m_bits=1).collect()}
    assert out[1] == 1.0 and out[2] == 1.0


def test_bigram_logprob_score(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in text.bigram_logprob_score(df, "doc_id").collect()}
    # corpus bigrams: doc1 → (a b),(b a),(a b); doc2 → (a b)
    # counts: c("a b")=3, c("b a")=1; unigrams: a=3, b=3, x=1, V=3
    lp_ab = round(math.log2((3 + 1) / (3 + 3)), 4)
    lp_ba = round(math.log2((1 + 1) / (3 + 3)), 4)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_logprob_micro"] == round((2 * lp_ab + lp_ba) * 1_000_000)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["sum_logprob_micro"] == round(lp_ab * 1_000_000)
    assert 3 not in out  # single-token docs have no bigrams


def test_strip_markup_recovers_text(spark):
    df = spark.createDataFrame(
        [
            ('<html><p class="x">hello <b>world</b></p>'
             "<script>var a = '<p>';</script>&amp; done</html>",),
            ("plain   text  unchanged",),
            ("<style>p { color: red }</style>tail",),
        ],
        "raw string",
    )
    out = [r[0] for r in df.select(text.strip_markup("raw")).collect()]
    assert out[0] == "hello world & done"
    assert out[1] == "plain text unchanged"
    assert out[2] == "tail"


def test_logit_quality_score_bounded_and_monotone(spark):
    df = spark.createDataFrame(
        [("the the the the of and to a in is",), ("zzz qqq xxx yyy www vvv",)],
        "text string",
    )
    w = {"stopword_ratio": 2.0}
    scores = [
        r[0]
        for r in df.select(text.logit_quality_score("text", w, bias=-1.0)).collect()
    ]
    assert all(0.0 <= s <= 1.0 for s in scores)
    # all-stopword doc must outscore the no-stopword doc under a positive
    # stopword weight
    assert scores[0] > scores[1]


def test_logit_quality_rejects_unknown_feature(spark):
    df = spark.createDataFrame([("x",)], "text string")
    try:
        df.select(text.logit_quality_score("text", {"nope": 1.0}))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_pack_chunk_spans_rejects_nonpositive_budget(spark):
    import pytest as _pytest

    from datapipelines_essentials_python_spark.operators.text import (
        pack_chunk_spans,
    )

    df = spark.createDataFrame([(0, "w", "en")], "doc_id long, text string, lang string")
    with _pytest.raises(ValueError, match="budget_tokens"):
        pack_chunk_spans(df, "doc_id", budget_tokens=0)


def test_build_vocab_correct_with_exchange_reuse_disabled(spark):
    """Regression for the round-4 advice item: the two-level ranking must
    not depend on Catalyst exchange reuse for its two branches to see one
    __pid assignment — the eager localCheckpoint pins the partitioning.
    Verified by disabling reuse outright and checking exact global ranks
    over a vocab spread across several range partitions."""
    from datapipelines_essentials_python_spark.operators.text import build_vocab

    words = [f"w{i:03d}" for i in range(60)]
    # w000 appears 61 times, w001 60, ... -> distinct counts, known order
    rows = [(i, " ".join([w] * (61 - i))) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, text string")
    prev = spark.conf.get("spark.sql.exchangeReuseEnabled", "true")
    try:
        spark.conf.set("spark.sql.exchangeReuseEnabled", "false")
        got = build_vocab(df, "text", rank_partitions=7).orderBy("rank").collect()
    finally:
        spark.conf.set("spark.sql.exchangeReuseEnabled", prev)
    assert [r["token"] for r in got] == words
    assert [r["rank"] for r in got] == list(range(1, 61))
    counts = [61 - i for i in range(60)]
    assert [r["cnt"] for r in got] == counts
    cum = 0
    for r, c in zip(got, counts):
        cum += c
        assert r["cum_cnt"] == cum
    assert all(r["total_cnt"] == sum(counts) for r in got)


def test_bm25_scores_match_python_reference(spark):
    """BM25 micro-unit scores equal a driver-side Okapi computation on a
    tiny corpus (k1=1.2, b=0.75, Robertson +1 idf, 6-dp per-term round)."""
    import math

    from datapipelines_essentials_python_spark.operators.text import bm25_scores

    corpus = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "cats and dogs",
    }
    df = spark.createDataFrame(list(corpus.items()), "id long, text string")
    q = spark.createDataFrame([("the",), ("sat",), ("cat",)], "term string")
    got = {
        r["id"]: (r["n_terms"], r["dl"], r["score_micro"])
        for r in bm25_scores(df, "id", q).collect()
    }

    docs = {i: t.split() for i, t in corpus.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, toks in docs.items():
        dl = len(toks)
        total = 0
        n_terms = 0
        for term in ("the", "sat", "cat"):
            tf = toks.count(term)
            if tf == 0:
                continue
            n_terms += 1
            idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
            tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            total += round(idf * tfn, 6)
        if n_terms:
            want[i] = (n_terms, dl, int(round(total * 1000000)))
    assert got == want


def test_script_profile_counts_and_dominance(spark):
    """Range-exact per-script character counts; dominant letter script
    by max with SCRIPT_RANGES-order tie-break; digits never dominate."""
    rows = [
        (1, "hello мир 123"),       # 5 latin, 3 cyrillic, 3 digits
        (2, "你好世界"),             # 4 cjk
        (3, "... 42"),              # no letters at all
        (4, "αβ ab"),               # 2 greek, 2 latin → tie → latin (order)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r.asDict() for r in text.script_profile(df, "id", "text").collect()}
    assert (out[1]["latin"], out[1]["cyrillic"], out[1]["digit"]) == (5, 3, 3)
    assert out[1]["dominant_script"] == "latin"
    assert out[1]["latin_ratio"] == 0.625
    assert (out[2]["cjk"], out[2]["dominant_script"]) == (4, "cjk")
    assert out[2]["latin_ratio"] == 0.0
    assert out[3]["dominant_script"] == "none"
    assert out[3]["digit"] == 2
    assert out[4]["dominant_script"] == "latin"  # tie broken by range order
    for r in out.values():
        assert r["n_chars"] == len(rows[r["id"] - 1][1])
