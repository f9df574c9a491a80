"""Streaming window/dedup/join operators over watermarked event time.

Beyond-reference surface (driver mandate, SURVEY §2.9 extension): the three
remaining Structured Streaming shapes a production event pipeline needs —
bounded-state exact dedup, native gap-based session windows, and a
stream-stream interval join — all expressed with built-in operators so the
state store, watermark eviction, and micro-batch planning stay inside the
engine (no Python in the hot path).

Scale notes (100 TB/day stream):

- ``dropDuplicatesWithinWatermark`` keeps state only for ``watermark`` of
  event time per key — the unbounded-state trap of plain streaming
  ``dropDuplicates`` is the #1 OOM cause in long-running dedup jobs;
- session windows shuffle on the group key; hot keys are state-store skew —
  pre-filter bot traffic before sessionizing;
- a stream-stream join buffers BOTH sides in the state store; the interval
  condition plus watermarks bound that buffer to
  ``watermark + interval`` of event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Bounded-state streaming exact dedup: one output row per key, with
    state evicted once the watermark passes — the streaming twin of the
    batch ``dedup.exact_dedup`` (same contract: arbitrary key columns).

    Uses ``dropDuplicatesWithinWatermark`` so two copies of a key arriving
    within the watermark window dedup, and the key's state is dropped
    afterwards (plain ``dropDuplicates`` on a stream keeps every key ever
    seen — unbounded state).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_session_windows(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native gap-based session windows on a stream: sessions close when no
    event arrives for ``gap`` (event time), emitted once the watermark
    passes the session end.

    Exactly the operator the batch ``session_window_agg`` query runs — one
    implementation, two execution modes (the engine merges overlapping
    per-event intervals in the state store incrementally).
    """
    win = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with an event-time interval
    bound: right events within ``[left_ts, left_ts + within]`` — the
    attribution shape (click → purchase within an hour).

    Both inputs must be streams; columns are disambiguated with ``l_`` /
    ``r_`` prefixes. The interval condition + both watermarks let the
    engine evict join state, keeping the buffer bounded at
    ``watermark + within`` of event time per side.
    """
    l = left.withWatermark(left_ts, watermark).select(
        [F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, watermark).select(
        [F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
