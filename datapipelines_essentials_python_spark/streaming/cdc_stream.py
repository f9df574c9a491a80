"""Streaming CDC + event-time aggregation.

Optional upgrade path over the reference's batch CDC (SURVEY.md §2.9):
``withWatermark`` + ``dropDuplicates`` for late/duplicate events and a
``foreachBatch`` merge that reuses the exact batch ``merge_cdc`` operator —
one CDC implementation, two execution modes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + sums over an event
    stream — the standard late-data-tolerant streaming aggregate."""
    windowed = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration, slide or window_duration),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    return windowed.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        key_col,
        "n",
        "total_value",
    )


def streaming_cdc_upsert(
    stream: DataFrame,
    pk_cols: list[str],
    order_cols: list[str],
    ts_col: str,
    sink: Callable[[DataFrame, int], None],
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
    query_name: str = "cdc_upsert",
) -> StreamingQuery:
    """Streaming flavor of the batch CDC pipeline: watermark + exact-key
    dedup inside the engine's state store, then ``foreachBatch`` hands each
    micro-batch to ``sink(batch_df, epoch_id)`` — typically a closure over
    :func:`operators.cdc.merge_cdc` against the serving store."""
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicates(pk_cols + [ts_col])
    writer = deduped.writeStream.queryName(query_name).foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_scd2_maintain(
    stream: DataFrame,
    pk_cols: list[str],
    tracked_cols: list[str],
    ts_col: str,
    load_dim: Callable[[], DataFrame],
    sink: Callable[[DataFrame, int], None],
    load_date_fn: Callable[[DataFrame, int], str] | None = None,
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
    query_name: str = "scd2_maintain",
) -> StreamingQuery:
    """Keep a type-2 dimension fresh from a change stream: each micro-batch
    is collapsed to latest-per-key, then applied to the served dimension via
    the batch :func:`operators.cdc.scd2_merge` — one SCD2 implementation,
    two execution modes (the contract the other wrappers here keep).

    A micro-batch is a PARTIAL snapshot (only changed keys appear), so the
    merge runs with ``close_deletes=False``: keys absent from the batch
    keep their current row. Deletes must arrive as explicit tombstone
    rows handled by the caller's ``sink``.

    ``load_dim`` returns the current dimension (pk + tracked +
    effective_from/effective_to/is_current); ``sink`` receives the merged
    dimension per epoch and persists it. ``load_date_fn`` maps a batch to
    its effective date — default: the max ``ts_col`` date in the batch
    (one scalar aggregate per micro-batch).
    """
    from datapipelines_essentials_python_spark.operators.cdc import (
        scd2_merge,
        snapshot,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if load_date_fn is not None:
            load_date = load_date_fn(batch_df, epoch_id)
        else:
            load_date = str(
                batch_df.agg(F.max(F.col(ts_col).cast("date"))).collect()[0][0]
            )
        latest = snapshot(batch_df, pk_cols, [ts_col]).select(
            *pk_cols, *tracked_cols
        )
        merged = scd2_merge(
            load_dim(),
            latest,
            pk_cols,
            tracked_cols,
            load_date=load_date,
            close_deletes=False,
        )
        sink(merged, epoch_id)

    deduped = stream.withWatermark(ts_col, watermark).dropDuplicates(
        pk_cols + [ts_col]
    )
    writer = deduped.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_incremental_dedup(
    stream: DataFrame,
    corpus_fps: DataFrame,
    id_col: str,
    text_col: str,
    sink: Callable[[DataFrame, int], None],
    ngram: int = 3,
    keep: int = 4,
    checkpoint_dir: str | None = None,
    query_name: str = "incremental_dedup",
) -> StreamingQuery:
    """Streaming corpus admission: each micro-batch of documents is
    fingerprinted and deduped against the historical corpus via the batch
    ``dedup.incremental_dedup`` operator — one algorithm, two execution
    modes (the same contract ``streaming_cdc_upsert`` keeps with
    ``merge_cdc``).

    ``corpus_fps`` is the served fingerprint table: pass a DataFrame with
    either a precomputed ``fp`` column or raw ``text_col`` (fingerprints
    are derived). The sink receives only the ADMITTED rows per batch
    (with their ``fp``), so the caller can append them to both the corpus
    store and the fingerprint table.

    At scale the per-batch cost is batch-sized: the corpus side is a
    fingerprint-only projection (one narrow column), and the anti-join
    broadcasts whichever side is smaller.
    """
    from datapipelines_essentials_python_spark.operators.dedup import (
        incremental_dedup,
    )

    if "fp" in corpus_fps.columns:
        corpus = corpus_fps
    else:
        corpus = corpus_fps.select(text_col)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if "fp" in corpus.columns:
            from pyspark.sql import Window
            from datapipelines_essentials_python_spark.operators.text import (
                fingerprint,
            )

            batch_fp = batch_df.withColumn(
                "fp", fingerprint(text_col, ngram=ngram, keep=keep)
            )
            fresh = batch_fp.join(corpus.select("fp").distinct(), "fp", "left_anti")
            w = Window.partitionBy("fp").orderBy(F.col(id_col))
            admitted = (
                fresh.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            admitted = incremental_dedup(
                batch_df, corpus, id_col, text_col, ngram=ngram, keep=keep
            )
        sink(admitted, epoch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_hll_profile(
    stream: DataFrame,
    item_col: str,
    group_cols: list[str],
    load_registers: Callable[[], DataFrame | None],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    query_name: str = "hll_profile",
) -> StreamingQuery:
    """Keep a distinct-count profile fresh from a stream: each micro-batch
    is sketched (``sketches.hll_registers``) and merged into the served
    register table with the LOSSLESS per-register max
    (``sketches.hll_merge``) — per-epoch cost is O(batch + m registers),
    never O(history), and the merged profile equals the one a full rescan
    would produce (the property the ``hll_incremental`` query
    correctness-gates).

    ``load_registers`` returns the current register table (or None on
    first batch); ``sink`` receives the merged registers per epoch and
    persists them. Estimate on read with ``sketches.hll_estimate``.
    """
    from datapipelines_essentials_python_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_regs = hll_registers(batch_df, item_col, group_cols)
        served = load_registers()
        merged = (
            batch_regs
            if served is None
            else hll_merge(served, batch_regs, group_cols)
        )
        sink(merged, epoch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_drift_monitor(
    stream: DataFrame,
    value_col: str,
    edges: list[float],
    load_counts: Callable[[], DataFrame | None],
    sink: Callable[[DataFrame, int], None],
    reference_counts: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "drift_monitor",
) -> StreamingQuery:
    """Keep a distribution-drift profile fresh from a stream: per micro-
    batch, histogram the batch into the fixed ``edges`` buckets and ADD
    the counts into the served bucket table (counts are a linear sketch,
    so per-epoch cost is O(batch + buckets), never O(history), and the
    maintained counts equal a full rescan's — same lossless-merge
    property the ``hll_incremental`` query gates).

    When ``reference_counts`` (bucket, n_ref) is given, each epoch's sink
    payload also carries the chi-square divergence columns of
    ``relational.chi2_drift`` against that frozen reference — the
    streaming version of the batch drift detector: alert when
    Σ chi2_contrib crosses a threshold.

    ``load_counts`` returns the current (bucket, n_cur) table or None on
    first batch; ``sink`` persists the merged table per epoch.
    """

    def _bucketize(df: DataFrame) -> DataFrame:
        v = F.col(value_col).cast("double")
        bucket = F.lit(0)
        for i, e in enumerate(edges):
            bucket = F.when(v >= F.lit(float(e)), F.lit(i + 1)).otherwise(bucket)
        # NULL values get the dedicated -1 bucket (the batch
        # psi_drift/chi2_drift missingness discipline), not a silent
        # fall-through into bucket 0.
        bucket = F.when(v.isNull(), F.lit(-1)).otherwise(bucket)
        return df.select(bucket.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).cast("long").alias("n_cur")
        )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_counts = _bucketize(batch_df)
        served = load_counts()
        if served is not None:
            merged = (
                served.unionByName(batch_counts)
                .groupBy("bucket")
                .agg(F.sum("n_cur").cast("long").alias("n_cur"))
            )
        else:
            merged = batch_counts
        if reference_counts is not None:
            ref_tot = reference_counts.agg(
                F.sum("n_ref").cast("double").alias("tot_ref")
            )
            cur_tot = merged.agg(F.sum("n_cur").cast("double").alias("tot_cur"))
            p = F.col("n_ref").cast("double") / F.col("tot_ref")
            q = F.coalesce(F.col("n_cur"), F.lit(0)).cast("double") / F.col("tot_cur")
            merged = (
                reference_counts.join(merged, "bucket", "full_outer")
                .crossJoin(F.broadcast(ref_tot))
                .crossJoin(F.broadcast(cur_tot))
                .select(
                    "bucket",
                    F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
                    F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
                    F.round(
                        F.when(p > 0, (q - p) * (q - p) / p).otherwise(F.lit(0.0)), 6
                    ).alias("chi2_contrib"),
                )
            )
        sink(merged, epoch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_cms_topk(
    stream: DataFrame,
    item_col: str,
    load_sketch: Callable[[], DataFrame | None],
    sink: Callable[[DataFrame, int], None],
    depth: int = 4,
    width: int = 64,
    checkpoint_dir: str | None = None,
    query_name: str = "cms_topk",
) -> StreamingQuery:
    """Keep a frequency sketch fresh from a stream: each micro-batch is
    sketched (``sketches.cms_build``) and ADDED into the served sketch
    (``sketches.cms_merge`` — CMS is linear, so per-batch sketches sum to
    the full-history sketch exactly). Per-epoch cost is O(batch +
    depth·width), never O(history); estimate heavy hitters on read with
    ``sketches.cms_estimate`` over candidate items.

    ``load_sketch`` returns the current sketch rows (or None on first
    batch); ``sink`` persists the merged sketch per epoch.
    """
    from datapipelines_essentials_python_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_sketch = cms_build(batch_df, item_col, depth=depth, width=width)
        served = load_sketch()
        merged = batch_sketch if served is None else cms_merge(served, batch_sketch)
        sink(merged, epoch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_histogram_profile(
    stream: DataFrame,
    value_col: str,
    group_cols: list[str],
    load_bins: Callable[[], DataFrame | None],
    sink: Callable[[DataFrame, int], None],
    n_bins: int = 256,
    lo: float = 0.0,
    hi: float = 1.0,
    checkpoint_dir: str | None = None,
    query_name: str = "histogram_profile",
) -> StreamingQuery:
    """Keep a quantile profile fresh from a stream: each micro-batch is
    binned (``sketches.value_histogram``) and ADDED into the served bin
    table (``sketches.histogram_merge`` — histograms are linear, so
    per-batch sketches sum to the full-history sketch exactly). Per-epoch
    cost is O(batch + bins·groups), never O(history); read quantiles off
    the served table with ``sketches.histogram_quantile``. The batch
    twin is the ``histogram_quantiles`` registry query.

    ``load_bins`` returns the current bin table (or None on first batch);
    ``sink`` persists the merged bins per epoch.
    """
    from datapipelines_essentials_python_spark.operators.sketches import (
        histogram_merge,
        value_histogram,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_bins = value_histogram(
            batch_df, group_cols, value_col, n_bins=n_bins, lo=lo, hi=hi
        )
        served = load_bins()
        merged = (
            batch_bins
            if served is None
            else histogram_merge(served, batch_bins, group_cols)
        )
        sink(merged, epoch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def idempotent_sink(
    process: Callable[[DataFrame, int], None],
    load_committed: Callable[[], set[int]],
    mark_committed: Callable[[int], None],
) -> Callable[[DataFrame, int], None]:
    """Exactly-once wrapper for ``foreachBatch`` sinks: Structured
    Streaming guarantees at-least-once delivery of (batch, epoch_id) —
    after a crash between sink write and checkpoint commit, the SAME
    epoch replays. Wrapping the sink with an epoch-id commit log turns
    that into exactly-once: replayed epochs are skipped.

    ``load_committed`` returns the set of already-committed epoch ids
    (from any transactional store); ``mark_committed`` records one —
    the caller makes write+mark atomic (same transaction / same file
    rename) for true exactly-once.
    """

    def _wrapped(batch_df: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) in load_committed():
            return
        process(batch_df, epoch_id)
        mark_committed(int(epoch_id))

    return _wrapped


def streaming_quality_admission(
    stream: DataFrame,
    text_col: str,
    weights: dict[str, float],
    sink: Callable[[DataFrame, int], None],
    bias: float = 0.0,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
    query_name: str = "quality_admission",
) -> StreamingQuery:
    """Streaming corpus admission through the frozen-weight logistic
    quality gate (``text.logit_quality_score``) — the streaming twin of
    training_pipeline_v3's gate stage: each micro-batch is scored with
    the SAME narrow Column expression the batch pipeline uses (one
    implementation, two execution modes) and only rows at/above the
    threshold reach the sink, with the score attached for audit."""
    from datapipelines_essentials_python_spark.operators.text import (
        logit_quality_score,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = batch_df.withColumn(
            "quality_score",
            F.round(logit_quality_score(text_col, weights, bias=bias), 6),
        )
        sink(scored.where(F.col("quality_score") >= threshold), epoch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_transition_profile(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    load_state: Callable[[], tuple[DataFrame | None, DataFrame | None]],
    sink: Callable[[DataFrame, DataFrame, int], None],
    tie_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "transition_profile",
) -> StreamingQuery:
    """Maintain the Markov transition-count matrix from an event stream —
    the streaming twin of ``relational.transition_counts``.

    Transition counts are NOT purely additive across micro-batches: the
    last event a key emitted in batch N pairs with its first event in
    batch N+1. So the served state is TWO tables — the (from_state,
    to_state, n) count matrix and a per-key ``last_state`` row — and each
    epoch adds (a) the in-batch lag pairs and (b) the boundary pairs from
    joining the served last-state with each key's first in-batch event,
    then replaces the key's last-state with its final in-batch event.

    Per-epoch cost is O(batch + |states|² + |keys touched|) — never
    O(history). Contract (same as the CDC/SCD2 streams): each key's
    events arrive in event-time order across batches; in-batch order is
    restored by the lag window. Under that contract, count maintenance
    is rescan-equivalent (asserted in tests). The matrix stores raw
    counts; row probabilities are a vocabulary-bounded window at read
    time, exactly as the batch twin computes them.

    ``load_state`` returns ``(counts_df | None, last_df | None)``;
    ``sink`` persists ``(counts, last_state, epoch_id)``.
    """
    from pyspark.sql import Window

    ties = tie_cols or []

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy(key_col).orderBy(ts_col, *ties)
        in_batch = (
            batch_df.select(
                F.col(key_col).alias("__k"),
                F.lag(F.col(state_col)).over(w).alias("from_state"),
                F.col(state_col).alias("to_state"),
            )
            .where(F.col("from_state").isNotNull())
            .groupBy("from_state", "to_state")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        order = F.struct(*[F.col(c) for c in (ts_col, *ties)], F.col(state_col))
        ends = batch_df.groupBy(F.col(key_col).alias("key")).agg(
            F.min(order).getField(state_col).alias("__first"),
            F.max(order).getField(state_col).alias("__last"),
        )
        served_counts, served_last = load_state()
        if served_last is not None:
            boundary = (
                served_last.join(ends, "key")
                .select(
                    F.col("last_state").alias("from_state"),
                    F.col("__first").alias("to_state"),
                )
                .groupBy("from_state", "to_state")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
            )
            in_batch = in_batch.unionByName(boundary)
        if served_counts is not None:
            in_batch = in_batch.unionByName(served_counts)
        counts = in_batch.groupBy("from_state", "to_state").agg(
            F.sum("n").cast("long").alias("n")
        )
        new_last = ends.select("key", F.col("__last").alias("last_state"))
        if served_last is not None:
            new_last = (
                served_last.join(ends, "key", "left_anti")
                .unionByName(new_last)
            )
        sink(counts, new_last, epoch_id)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_novelty_admission(
    stream: DataFrame,
    seen_fps_path: str,
    id_col: str,
    text_col: str,
    sink: Callable[[DataFrame, int], None],
    window: int = 8,
    novelty_floor: float = 0.5,
    checkpoint_dir: str | None = None,
    query_name: str = "novelty_admission",
) -> StreamingQuery:
    """Streaming novelty-gated corpus admission — the streaming twin of
    ``chunking.ngram_novelty``: each micro-batch's documents are scored
    by the fraction of their DISTINCT ``window``-token fingerprints
    never seen before (neither in the served store nor in an
    earlier-id document of the same batch), and only docs at/above
    ``novelty_floor`` reach the sink (with the novelty columns attached
    for audit). One fingerprint definition — ``chunking.window_
    fingerprints`` — two execution modes, the ``streaming_cdc_upsert`` /
    ``merge_cdc`` contract.

    ``seen_fps_path`` is a parquet directory holding one ``fp`` string
    column: ALL fingerprints ever seen (admitted or not — novelty is
    "new to the corpus stream", not "new to the kept set", which is
    what makes the streaming result REPLAYABLE: it equals the batch
    ``ngram_novelty`` over the concatenated input whenever arrival
    order matches ``id_col`` order, regardless of the gate). The store
    is re-read at each batch and appended after scoring — a nonexistent
    path starts empty. At scale the store is a narrow single-column
    table: the per-batch cost is one anti-join of batch fingerprints
    against it (Bloom/DPP-prunable) plus batch-sized aggregation.
    """
    from pyspark.sql.utils import AnalysisException
    from datapipelines_essentials_python_spark.operators.chunking import (
        window_fingerprints,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fps = window_fingerprints(
            batch_df, text_col=text_col, id_col=id_col, window=window
        ).localCheckpoint(eager=True)
        try:
            seen = spark.read.parquet(seen_fps_path).select("fp").distinct()
        except AnalysisException:
            seen = spark.createDataFrame([], "fp string")
        unseen = fps.join(seen, "fp", "left_anti")
        first = unseen.groupBy("fp").agg(F.min(id_col).alias("__first"))
        novel = (
            unseen.join(first, "fp")
            .where(F.col(id_col) == F.col("__first"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
        )
        totals = fps.groupBy(id_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_windows")
        )
        scored = (
            batch_df.join(totals, id_col, "left")
            .join(novel, id_col, "left")
            .select(
                "*",
                F.coalesce(F.col("n_windows"), F.lit(0).cast("long")).alias(
                    "__nw"
                ),
                F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias(
                    "__nn"
                ),
            )
            .drop("n_windows", "n_novel")
            .select(
                "*",
                F.col("__nw").alias("n_windows"),
                F.col("__nn").alias("n_novel"),
                F.when(
                    F.col("__nw") > 0,
                    F.round(
                        F.col("__nn").cast("double")
                        / F.col("__nw").cast("double"),
                        6,
                    ),
                )
                .otherwise(F.lit(1.0))
                .alias("novelty_ratio"),
            )
            .drop("__nw", "__nn")
        )
        sink(
            scored.where(F.col("novelty_ratio") >= F.lit(novelty_floor)),
            epoch_id,
        )
        # grow the store AFTER scoring: every fingerprint of this batch
        # is "seen" for later batches, admitted or not
        fps.select("fp").distinct().write.mode("append").parquet(seen_fps_path)

    writer = stream.writeStream.queryName(query_name).foreachBatch(_process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
