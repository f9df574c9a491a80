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
