"""Structured Streaming upgrade path (SURVEY.md §2.9 note).

The reference has no streaming; its incremental story is batch hash-diff
CDC. This package is the natural Structured Streaming packaging of the same
semantics, kept separate so batch parity stays reference-faithful.
"""

from datapipelines_essentials_python_spark.streaming.cdc_stream import (
    streaming_cdc_upsert,
    windowed_event_counts,
)

__all__ = ["streaming_cdc_upsert", "windowed_event_counts"]
