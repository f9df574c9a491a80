"""Token-window chunking / span dedup / heavy hitters / feature hashing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import chunking


def test_chunk_documents_windows(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunking.chunk_documents(
            df, chunk_size=3, stride=2
        ).collect()
    }
    # doc 1: 7 tokens → starts 0,2,4,6
    assert rows[(1, 0)]["chunk_text"] == "a b c"
    assert rows[(1, 1)]["chunk_text"] == "c d e"
    assert rows[(1, 2)]["chunk_text"] == "e f g"
    assert rows[(1, 3)]["chunk_text"] == "g" and rows[(1, 3)]["n_tokens"] == 1
    # doc 2: one token, one chunk; doc 3: empty → no chunks
    assert rows[(2, 0)]["chunk_text"] == "x"
    assert {k[0] for k in rows} == {1, 2}


def test_chunk_documents_validates_args(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, stride=0)


def test_span_dedup_keeps_first_occurrence(spark):
    # doc 1: blocks "a b", "c d"; doc 2: "c d" (dup), "e f";
    # doc 3 entirely duplicate blocks → disappears
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d e f"), (3, "a b e f")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in chunking.span_dedup(df, block_size=2).collect()
    }
    assert out[1]["text_clean"] == "a b c d"
    assert out[1]["n_blocks_total"] == 2 and out[1]["n_blocks_kept"] == 2
    assert out[2]["text_clean"] == "e f"
    assert out[2]["n_blocks_total"] == 2 and out[2]["n_blocks_kept"] == 1
    assert 3 not in out


def test_heavy_hitters_bigrams_order_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z")], "doc_id long, text string"
    )
    rows = chunking.heavy_hitters_bigrams(df, k=2).collect()
    # "a b" appears 3x; tie between "b a" and "b c" (1x) broken asc
    assert [(r["bigram"], r["cnt"]) for r in rows] == [("a b", 3), ("b a", 1)]


def test_feature_hash_tf_matches_manual_md5(spark):
    df = spark.createDataFrame([(7, "Hello hello world")], "doc_id long, text string")
    out = {
        r["bucket"]: r["tf"]
        for r in chunking.feature_hash_tf(df, num_buckets=64).collect()
    }

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    expected: dict[int, int] = {}
    for t in ["hello", "hello", "world"]:
        expected[bucket(t)] = expected.get(bucket(t), 0) + 1
    assert out == expected


def test_feature_hash_tf_bounded_buckets(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2}") for i in range(50)],
        "doc_id long, text string",
    )
    out = chunking.feature_hash_tf(df, num_buckets=8)
    assert out.agg(F.max("bucket")).collect()[0][0] <= 7
    assert out.agg(F.min("bucket")).collect()[0][0] >= 0


def test_substring_dup_profile(spark):
    """A passage repeated across docs is caught wherever it starts (not
    only on block boundaries); unique docs profile at dup_ratio 0."""
    from datapipelines_essentials_python_spark.operators.chunking import (
        substring_dup_profile,
    )

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "intro words here " + boiler),       # passage at offset 3
        (2, boiler + " trailing tail content"),  # same passage at offset 0
        (3, "completely different text with no repeats at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in substring_dup_profile(df, window=4, stride=1).collect()
    }
    # the shared 12-token passage yields shared 4-token windows in both
    # docs despite the 3-token offset (stride 1 realigns)
    assert out[1]["n_dup_windows"] >= 8
    assert out[2]["n_dup_windows"] >= 8
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_ratio"] == 0.0
    for r in out.values():
        assert 0.0 <= r["dup_ratio"] <= 1.0
        assert r["n_dup_windows"] <= r["n_windows"]
