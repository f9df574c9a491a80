"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond-reference surface (driver mandate): arbitrary per-key state kept in
Spark's state store across micro-batches, with Arrow-batched Python hooks —
the escape hatch when watermarked built-in aggregations can't express the
semantics (running ML feature state, custom session logic, per-entity
counters that outlive any window).

Scale notes: state lives in the executor state store partitioned by the
group key — size it like any keyed aggregation (hot keys are state-store
skew); always configure a timeout or watermark-driven eviction in
production so state is bounded; the Python hook sees one key at a time with
Arrow batches, so per-key memory is bounded by the micro-batch, not the
stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running totals maintained across micro-batches: for every
    key, emit the cumulative (n_events, total_value) after each batch that
    touches it — the minimal "custom stateful operator" shape
    (outputMode=update).

    Unlike a windowed aggregate, the state never resets: this is the
    lifetime-counter / feature-store-refresh pattern.
    """
    out_schema = f"{key_col} long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update_totals(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update_totals,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_session_counts(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Custom session windows with processing-time timeout: events extend
    the key's open session; when no event arrives for ``gap_ms`` the state
    times out and the closed session is emitted (session_events, spanning
    first→last event time). The classic applyInPandasWithState example —
    semantics the built-in window functions cannot express incrementally.
    """
    out_schema = f"{key_col} long, session_events long, first_ts timestamp, last_ts timestamp"
    state_schema = "n long, first_ts timestamp, last_ts timestamp"

    def track_sessions(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_events": [n],
                    "first_ts": [first_ts],
                    "last_ts": [last_ts],
                }
            )
            return
        n, first_ts, last_ts = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            lo, hi = pdf[ts_col].min(), pdf[ts_col].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n, first_ts, last_ts))
        state.setTimeoutDuration(gap_ms)
        return
        yield  # pragma: no cover — generator marker

    return stream.groupBy(key_col).applyInPandasWithState(
        track_sessions,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
