"""Token-window chunking and span-level dedup for training-data pipelines.

Beyond-reference surface (driver mandate): the chunk/window primitives a
RAG-or-pretraining corpus pipeline needs — overlapping token-window
chunking (context windows for embedding/indexing), non-overlapping block
("span") dedup in the C4 style (drop repeated spans corpus-wide, keep the
first occurrence, reassemble documents), corpus heavy-hitter n-grams, and
the hashing-trick term-frequency vectorizer.

Scale notes (100 TB):

- every operator is a narrow projection + higher-order array functions —
  per-row work rides the parquet scan inside WholeStageCodegen, no Python;
- ``chunk_documents`` explodes ~n_tokens/stride rows per doc, a bounded
  blow-up chosen by the caller, and keeps only (id, chunk) columns;
- ``span_dedup`` shuffles once on the block text (the dedup key) and once
  on the doc id (reassembly) — both map-side combinable;
- ``heavy_hitters_bigrams`` is one partial-agg shuffle; top-k is a
  driver-sized result (k rows);
- ``feature_hash_tf`` is explode→groupBy(id, bucket): the bucket space is
  fixed (``num_buckets``), so state per doc is bounded regardless of
  vocabulary size — the point of the hashing trick.

All hashing is md5-derived (deterministic, portable), so DuckDB oracles
replicate the exact algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens


def _toks(text_col: str) -> Column:
    return tokens(text_col)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunks: starts at 0, stride, 2·stride, …
    while start < n_tokens; the last chunk may be shorter.

    Returns (id, chunk_id, start, chunk_text, n_tokens). Documents with
    zero tokens yield no chunks.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    with_toks = df.select(
        F.col(id_col), _toks(text_col).alias("toks")
    ).withColumn("n", F.size("toks"))
    starts = F.when(
        F.col("n") > 0, F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = with_toks.select(
        F.col(id_col), F.col("toks"), F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("start"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_size: int = 8,
    materialize: bool = True,
) -> DataFrame:
    """C4-style span dedup: split each document into non-overlapping
    ``block_size``-token blocks, drop every block whose text already
    occurred earlier in the corpus (first occurrence wins, ordered by
    (id, block index)), and reassemble the surviving blocks per document.

    Returns (id, text_clean, n_blocks_total, n_blocks_kept). A document
    whose every block is a repeat disappears from the output (it is a
    full duplicate at block granularity).

    Two shuffle keys at scale: the block text (first-occurrence via a
    combinable min(struct) agg — skew-immune on repeated boilerplate
    blocks) and the doc id (per-doc total window + reassembly agg, both
    riding one id exchange; the window's group is bounded by the doc's
    own block count).
    """
    blocks = chunk_documents(
        df, text_col=text_col, id_col=id_col, chunk_size=block_size, stride=block_size
    ).select(id_col, F.col("chunk_id").alias("block_idx"), F.col("chunk_text"))
    if materialize:
        # Round-9 (guide §2.3/§2.4): the block table feeds the
        # first-occurrence agg AND the marking join; their exchanges
        # carry different payloads, so exchange reuse cannot dedup them
        # and the tokenize+chunk projection ran twice. One block-text-
        # keyed pinned materialization runs it once; both consumers ride
        # the layout with zero further exchanges.
        from datapipelines_essentials_python_spark.utils.repartition import (
            pinned_checkpoint,
        )

        blocks = pinned_checkpoint(blocks, "chunk_text")
    # first occurrence = min (id, block_idx) per block text — combinable
    # agg with map-side partials instead of a row_number window, so a
    # boilerplate block repeated 10^6 times never sorts on one partition
    # (the exact_substring_dedup discipline); the join back on the block
    # text rides the same exchange.
    first = blocks.groupBy("chunk_text").agg(
        F.min(F.struct(F.col(id_col), F.col("block_idx"))).alias("__first")
    )
    w_doc = Window.partitionBy(id_col)
    marked = blocks.join(first, "chunk_text").withColumn(
        "n_blocks_total", F.count(F.lit(1)).over(w_doc)
    )
    kept = marked.where(
        (F.col(id_col) == F.col(f"__first.{id_col}"))
        & (F.col("block_idx") == F.col("__first.block_idx"))
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("block_idx", "chunk_text"))
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("text_clean"),
        F.max("n_blocks_total").alias("n_blocks_total"),
        F.count(F.lit(1)).cast("long").alias("n_blocks_kept"),
    )
    return reassembled


def heavy_hitters_bigrams(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Corpus-wide top-k adjacent-token bigrams with a total order
    (count desc, bigram asc). One partial-agg shuffle; k-row result."""
    # adjacent pairs via zip_with over a shifted slice: the shorter side
    # pads with null → null bigram → filtered. ~15× faster than an
    # element_at lambda over sequence(), which re-evaluates the token
    # split per element (no CSE inside lambda bodies).
    pre = df.select(_toks(text_col).alias("tk"))
    bigrams = F.zip_with(
        F.col("tk"),
        F.expr("slice(tk, 2, size(tk))"),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        pre.select(F.explode(bigrams).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(k)
    )


def feature_hash_tf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Hashing-trick term frequencies: token → md5-derived bucket in
    [0, num_buckets), counted per (id, bucket). Sparse long-format output
    (id, bucket, tf) — bounded per-doc state regardless of vocabulary."""
    tok = df.select(F.col(id_col), F.explode(_toks(text_col)).alias("t"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
        % num_buckets
    )
    return (
        tok.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def substring_dup_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    stride: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Rolling-window substring-duplication profile — the overlapping-span
    complement of :func:`span_dedup` (which only sees ``block_size``-aligned
    repeats). Approximates suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") with
    overlapping ``window``-token hashes every ``stride`` tokens: a repeated
    passage is caught wherever it starts, not only on block boundaries.

    A window is *duplicated* when its exact token text occurs ≥2 times
    anywhere in the corpus (other documents or elsewhere in the same one —
    both are training-data repetition). Tail windows shorter than
    ``window`` participate as-is, so short documents behave like exact
    dedup candidates.

    Returns (id, n_windows, n_dup_windows, dup_ratio) per document — the
    signal used to drop or trim boilerplate-heavy documents.

    Scale shape: windows are a narrow posexplode projection; corpus window
    counts are ONE agg keyed on the md5 of the window text (fixed 32-char
    key instead of a ~100-char string — smaller shuffle, same exact
    grouping for profiling purposes), joined back on the same key (rides
    the same exchange), then one doc-keyed agg. No windows over the corpus.
    """
    wins = chunk_documents(
        df, text_col=text_col, id_col=id_col, chunk_size=window, stride=stride
    ).select(id_col, F.md5(F.col("chunk_text")).alias("__wkey"))
    if materialize:
        # Round-9 (guide §2.3/§2.4): same double-consumer shape as
        # span_dedup/exact_substring_dedup — the chunk+md5 projection
        # fed both the count agg and the join; pin it keyed on __wkey
        # so it runs once and both consumers ride the layout.
        from datapipelines_essentials_python_spark.utils.repartition import (
            pinned_checkpoint,
        )

        wins = pinned_checkpoint(wins, "__wkey")
    counts = wins.groupBy("__wkey").agg(F.count(F.lit(1)).alias("__c"))
    return (
        wins.join(counts, "__wkey")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.when(F.col("__c") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.col("n_dup_windows").cast("double")
                / F.col("n_windows").cast("double"),
                6,
            ),
        )
    )


def exact_substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_size: int = 8,
    materialize: bool = True,
) -> DataFrame:
    """Remove duplicated SPANS (not documents): Lee et al. 2022's
    ExactSubstr behavior approximated at sliding-window granularity —
    the upgrade over :func:`span_dedup` the r7 verdict asked for.
    ``span_dedup`` drops repeated non-overlapping blocks, which misses a
    duplicated passage straddling a block boundary; here EVERY
    ``window_size``-token window (stride 1) is fingerprinted corpus-wide,
    the FIRST occurrence of each window (ordered by ``(id, start)``) is
    kept, and every token covered by any LATER occurrence is removed
    from its document. Documents keep their identity — a fully-duplicated
    document survives as an empty ``text_clean`` with the removal
    accounted, unlike ``span_dedup``'s row drop.

    Spark-first shape (three shuffles, no Python):

    1. windows: one projection — ``sequence(0, n−w)`` posexploded over
       the token array, window text via ``slice`` + ``array_join``,
       fingerprinted with ``md5`` so the corpus-wide shuffle key is a
       fixed 32-byte hash, never the w-token text (the stride-1 blow-up
       is ~w× the corpus; hashing keeps the shuffle payload flat);
    2. first-occurrence marking: one fingerprint-keyed
       ``min(struct(id, start))`` — a combinable agg (map-side partials,
       skew-immune on boilerplate hot keys; a ranking window would sort
       one hot partition) — every non-first occurrence marks its covered
       interval ``[start, start+w)`` for removal;
    3. reassembly: removal starts collect per doc (one keyed agg), are
       sorted and FOLDED INTO DISJOINT INTERVALS (``array_sort`` +
       ``aggregate`` — overlapping/adjacent ``[s, s+w)`` spans merge),
       then a per-token ``filter(toks, (t, i) -> ¬∃ [lo,hi): lo ≤ i <
       hi)`` over the merged intervals. Merging bounds the per-token
       predicate by the number of DISJOINT duplicated regions, not raw
       removal count: a fully-duplicated 10k-token document has ~10k
       removal starts but ONE merged interval, so reassembly is
       O(tokens) instead of the O(tokens × removals) ≈ 10⁸ lambda
       evaluations the unmerged form would evaluate in one row —
       and boilerplate-heavy corpora are exactly where this runs.

    The true ExactSubstr uses a corpus suffix array; the window
    approximation trades sub-window precision (duplicates shorter than
    ``window_size`` tokens survive; removal granularity is the union of
    covering windows) for a shuffle-native plan that needs no global
    ordered structure — the standard scale concession. All hashing is
    md5, replayed exactly by the DuckDB oracle.

    → ``(id, text_clean, n_tokens_total, n_tokens_removed)``.
    """
    if window_size < 2:
        raise ValueError(
            f"exact_substring_dedup needs window_size >= 2, got {window_size}"
        )
    w = int(window_size)
    base = df.select(
        F.col(id_col), _toks(text_col).alias("toks")
    ).withColumn("n", F.size("toks"))
    starts = F.when(
        F.col("n") >= w,
        F.sequence(F.lit(0), F.col("n") - F.lit(w), F.lit(1)),
    ).otherwise(F.array().cast("array<int>"))
    wins = base.select(
        F.col(id_col), F.explode(starts).alias("start"), "toks"
    ).select(
        F.col(id_col),
        "start",
        F.md5(
            F.array_join(F.slice(F.col("toks"), F.col("start") + 1, w), " ")
        ).alias("fp"),
    )
    if materialize:
        # Round-9 (guide §2.3/§2.4): the window table feeds the
        # first-occurrence agg AND the marking join — two consumers
        # whose exchanges carry different payloads, so exchange reuse
        # cannot dedup them and the per-window md5 projection ran TWICE
        # (event log: two full-width 1.9 s + 1.1 s hashing stages). One
        # fp-keyed pinned materialization runs the hashing once and
        # both consumers ride its layout with zero further exchanges.
        from datapipelines_essentials_python_spark.utils.repartition import (
            pinned_checkpoint,
        )

        wins = pinned_checkpoint(wins, "fp")
    # first occurrence = min (id, start) per fingerprint — a COMBINABLE
    # agg with map-side partials, deliberately not a row_number window:
    # a boilerplate fingerprint repeated 10^6 times partial-aggregates
    # instead of sorting one hot partition (the skew note in SCALE.md).
    first = wins.groupBy("fp").agg(
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("__first")
    )
    removed = (
        wins.join(first, "fp")
        .where(
            (F.col(id_col) != F.col(f"__first.{id_col}"))
            | (F.col("start") != F.col("__first.start"))
        )
        .groupBy(id_col)
        .agg(F.collect_list("start").alias("rm"))
    )
    rm = F.coalesce(F.col("rm"), F.array().cast("array<int>"))
    # fold the SORTED starts into disjoint [lo, hi) intervals: starts
    # are uniform-width spans, so after sorting, s extends the last
    # interval iff s <= last.hi (adjacency merges too — coverage is
    # contiguous either way); otherwise it opens a new interval. The
    # fold is O(starts × merged) array work per doc, and merged is 1
    # for the fully-duplicated worst case.
    iv_t = "array<struct<lo:int,hi:int>>"
    merged = F.aggregate(
        F.array_sort(rm),
        F.array().cast(iv_t),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["hi"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["lo"].alias("lo"),
                        (s + F.lit(w)).cast("int").alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        s.cast("int").alias("lo"),
                        (s + F.lit(w)).cast("int").alias("hi"),
                    )
                ),
            )
        ),
    )
    # materialize the merged intervals as a column so the per-token
    # lambda tests against the computed array, not a re-evaluated fold
    staged = base.join(removed, id_col, "left").withColumn("__iv", merged)
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.col("__iv"), lambda v: (v["lo"] <= i) & (i < v["hi"])
        ),
    )
    return staged.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text_clean"),
        F.col("n").cast("long").alias("n_tokens_total"),
        (F.col("n") - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


def window_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    stride: int = 1,
    distinct: bool = True,
) -> DataFrame:
    """DISTINCT per-document window fingerprints → ``(id, fp)``: every
    ``window``-token window at the given stride, md5-hashed (fixed-width
    shuffle key), deduplicated within the document — the shared
    projection under :func:`ngram_novelty` and the streaming novelty
    admission (one fingerprint definition, two execution modes). Docs
    shorter than ``window`` emit no rows. ``distinct=False`` returns the
    raw (possibly duplicated) rows so a batch caller can establish its
    own fp-keyed layout first and let the dedup ride it (round 9)."""
    w = int(window)
    base = df.select(F.col(id_col), _toks(text_col).alias("toks")).withColumn(
        "n", F.size("toks")
    )
    starts = F.when(
        F.col("n") >= w,
        F.sequence(F.lit(0), F.col("n") - F.lit(w), F.lit(int(stride))),
    ).otherwise(F.array().cast("array<int>"))
    out = base.select(
        F.col(id_col), F.explode(starts).alias("start"), "toks"
    ).select(
        F.col(id_col),
        F.md5(
            F.array_join(F.slice(F.col("toks"), F.col("start") + 1, w), " ")
        ).alias("fp"),
    )
    return out.distinct() if distinct else out


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    stride: int = 1,
    materialize: bool = True,
) -> DataFrame:
    """Per-document n-gram NOVELTY against the rest of the corpus in
    ``id_col`` order: the fraction of a document's ``window``-token
    windows whose first corpus-wide occurrence is in THIS document —
    the dataset-curation dual of :func:`substring_dup_profile` (that
    one asks "how much of me is repeated anywhere"; this one asks "how
    much of me is new given everything admitted before me"), the
    streaming-admission signal for dedup-aware corpus growth.

    A window is novel for document ``d`` when ``d`` is the MINIMUM doc
    id containing its fingerprint; ties within a document count once
    (novelty is over DISTINCT windows of the doc, so a doc repeating
    its own fresh phrase five times still scores it as one novel
    window out of its distinct-window total).

    Spark-first shape, deliberately window-free: first-occurrence
    assignment is ``min(id)`` per fingerprint — a combinable agg, NOT a
    ``row_number`` over the fingerprint (min is skew-immune: a
    boilerplate fingerprint repeated 10^6 times partial-aggregates
    map-side instead of sorting one hot partition). One distinct
    (doc, fp) projection, one fp-keyed min, one join riding the same
    exchange, one doc-keyed agg. md5 fingerprints keep the shuffle key
    fixed-width (the :func:`substring_dup_profile` discipline).

    → ``(id, n_windows, n_novel, novelty_ratio)`` per document, where
    ``n_windows`` counts the doc's DISTINCT windows; docs shorter than
    ``window`` have no windows and report ``(0, 0, 1.0)`` — a short
    unique snippet is all-new by convention.
    """
    if window < 2:
        raise ValueError(f"ngram_novelty needs window >= 2, got {window}")
    if stride < 1:
        raise ValueError(f"ngram_novelty needs stride >= 1, got {stride}")
    # Round-9 (guide §2.4): one fp-keyed pinned materialization of the
    # RAW window rows; the per-doc distinct (grouping keys ⊇ fp), the
    # first-occurrence agg (keyed fp) and the reassociation join (keyed
    # fp) ALL ride its layout — one exchange of the window table instead
    # of three ((id, fp) distinct + both consumer exchanges).
    if materialize:
        from datapipelines_essentials_python_spark.utils.repartition import (
            pinned_checkpoint,
        )

        raw = window_fingerprints(
            df, text_col=text_col, id_col=id_col, window=window,
            stride=stride, distinct=False,
        )
        wins = pinned_checkpoint(raw, "fp").distinct()
    else:
        wins = window_fingerprints(
            df, text_col=text_col, id_col=id_col, window=window, stride=stride
        )
    first = wins.groupBy("fp").agg(F.min(id_col).alias("__first"))
    per_doc = (
        wins.join(first, "fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(
                F.when(F.col(id_col) == F.col("__first"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return df.select(F.col(id_col)).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_windows"), F.lit(0).cast("long")).alias(
            "n_windows"
        ),
        F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
        F.when(
            F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_windows").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(1.0))
        .alias("novelty_ratio"),
    )


def boilerplate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_size: int = 8,
    min_docs: int = 3,
) -> DataFrame:
    """C4's OTHER line rule: remove every segment that occurs in at least
    ``min_docs`` DISTINCT documents — boilerplate (headers, footers,
    license blurbs, navigation chrome) is repeated across many pages, so
    ALL its occurrences go, including the first (C4 §2.2 "any line
    appearing more than twice in the corpus"; reference has no corpus-wide
    text ops — beyond-reference LLM-pipeline surface). Complements
    :func:`span_dedup`, which keeps first occurrences and therefore
    cannot remove boilerplate at its source, and
    :func:`exact_substring_dedup`, whose first-occurrence-keep has the
    same blind spot. Segments here are the same non-overlapping
    ``block_size``-token blocks as ``span_dedup`` (documents are
    single-line in this corpus, so the "line" granularity is a token
    block).

    Spark-first shape, two shuffle keys:

    1. document frequency: one block-text-keyed
       ``count(DISTINCT id)`` — two-phase with map-side partials, so the
       very hot keys this operator exists to find (a footer repeated in
       10^6 docs) partial-aggregate instead of sorting one partition;
    2. reassembly: blocks left-anti the flagged set on the block text
       (riding the same exchange), then one id-keyed sorted-collect. The
       flagged set is df-thresholded and therefore far smaller than the
       corpus — AQE will broadcast it when it fits.

    Documents keep their identity: a fully-boilerplate document survives
    as an empty ``text_clean`` with the removal accounted (unlike
    ``span_dedup``'s row drop), so downstream joins never lose keys.

    → ``(id, text_clean, n_blocks_total, n_blocks_removed)``.
    """
    if min_docs < 2:
        raise ValueError(f"boilerplate_segments needs min_docs >= 2, got {min_docs}")
    blocks = chunk_documents(
        df, text_col=text_col, id_col=id_col,
        chunk_size=block_size, stride=block_size,
    ).select(id_col, F.col("chunk_id").alias("block_idx"), "chunk_text")
    flagged = (
        blocks.groupBy("chunk_text")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") >= F.lit(int(min_docs)))
        .select("chunk_text")
    )
    kept = blocks.join(flagged, "chunk_text", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("block_idx", "chunk_text"))),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("__clean"),
        F.count(F.lit(1)).cast("long").alias("__n_kept"),
    )
    totals = blocks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks_total")
    )
    return totals.join(reassembled, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__clean"), F.lit("")).alias("text_clean"),
        F.col("n_blocks_total"),
        (
            F.col("n_blocks_total") - F.coalesce(F.col("__n_kept"), F.lit(0))
        ).cast("long").alias("n_blocks_removed"),
    )
