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
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n_events long, total_value double"
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
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, session_events long, "
        "first_ts timestamp, last_ts timestamp"
    )
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


def streaming_mad_control_chart(
    stream: DataFrame,
    key_col: str = "key",
    day_col: str = "day_idx",
    value_col: str = "v",
    preceding: int = 6,
    k_num: int = 3,
) -> DataFrame:
    """Streaming twin of ``relational.rolling_mad_anomaly``: the robust
    |x − median| > k·MAD control chart maintained INCREMENTALLY — per
    key the state is just the trailing ``preceding + 1`` (day, value)
    pairs, so a day's anomaly verdict is emitted the moment its row
    arrives instead of waiting for a batch rescan of the series.

    Replayability CONTRACT (the ``streaming_novelty_admission``
    discipline): input rows are pre-aggregated one per (key, day) and
    arrive in day order per key — then the emitted rows equal the batch
    operator over the concatenated input, decision for decision (the
    rescan-equivalence test pins it). The decision is the same pure
    BIGINT ×2/×4 two-middle arithmetic — no float anywhere, so batch
    and stream can never diverge by rounding.

    State is bounded by construction: entries older than
    ``max_day − preceding`` can never enter a future frame (in-order
    arrival) and are evicted every batch — ≤ ``preceding + 1`` pairs
    per key, whatever the stream's length.

    → update-mode rows ``(key, day, v, med_x2, mad_x4, is_anomaly)``.
    """
    # key type derived from the input schema (not hardcoded) so
    # non-string keys work — the streaming_staleness_monitor fix.
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {day_col} long, {value_col} long, "
        "med_x2 long, mad_x4 long, is_anomaly boolean"
    )
    state_schema = "days array<long>, vals array<long>"

    def _decide(frame_vals: list[int], x: int) -> tuple[int, int, bool]:
        arr = sorted(frame_vals)
        n = len(arr)
        lo, hi = (n - 1) // 2, n // 2
        med_x2 = arr[lo] + arr[hi]
        dev = sorted(abs(2 * v - med_x2) for v in arr)
        mad_x4 = dev[lo] + dev[hi]
        return med_x2, mad_x4, 2 * abs(2 * x - med_x2) > k_num * mad_x4

    def chart(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        days, vals = ([list(c) for c in state.get] if state.exists else ([], []))
        out: list[tuple[int, int, int, int, bool]] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        for _, row in rows.sort_values(day_col).iterrows():
            d, x = int(row[day_col]), int(row[value_col])
            days.append(d)
            vals.append(x)
            frame = [v for dd, v in zip(days, vals) if d - preceding <= dd <= d]
            med_x2, mad_x4, flag = _decide(frame, x)
            out.append((d, x, med_x2, mad_x4, flag))
            # evict state that can never enter a future frame
            keep = [i for i, dd in enumerate(days) if dd >= d - preceding]
            days = [days[i] for i in keep]
            vals = [vals[i] for i in keep]
        state.update((days, vals))
        if out:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out),
                    day_col: [o[0] for o in out],
                    value_col: [o[1] for o in out],
                    "med_x2": [o[2] for o in out],
                    "mad_x4": [o[3] for o in out],
                    "is_anomaly": [o[4] for o in out],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        chart,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_staleness_monitor(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts_us",
    threshold_us: int = 300_000_000,
) -> DataFrame:
    """Heartbeat / staleness monitor: per key, the gap to the PREVIOUS
    event and a ``is_stale`` flag when it exceeds the threshold — the
    dead-man's-switch every feed-freshness SLA wants evaluated the
    moment a late heartbeat finally arrives, not at the next batch
    rescan. The streaming twin of the batch lag-window gap computation
    (``relational.interarrival_quantiles``' first stage).

    Replayability CONTRACT (the ``streaming_mad_control_chart``
    discipline): rows arrive in ``ts`` order per key; then the emitted
    rows equal the batch ``lag`` over the concatenated input, gap for
    gap (rescan-equivalence pinned by test). All integer microseconds
    — nothing to diverge by rounding.

    State is ONE BIGINT per key (the last-seen timestamp) — the
    smallest possible stateful operator, bounded at any stream length.

    → update-mode rows ``(key, ts_us, gap_us, is_stale)``; the first
    event of a key has a NULL gap and is never stale.
    """
    # Derive the key field's type from the input schema — a hardcoded
    # `string` would break non-string keys (e.g. BIGINT device ids) at
    # runtime despite the generic key_col parameter.
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {ts_col} long, gap_us long, is_stale boolean"
    )
    state_schema = "last_ts long"

    def monitor(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_out: list[int] = []
        gaps: list[int | None] = []
        stale: list[bool] = []
        for t in sorted(int(t) for t in rows[ts_col]):
            gap = None if last is None else t - last
            ts_out.append(t)
            gaps.append(gap)
            stale.append(gap is not None and gap > threshold_us)
            last = t
        state.update((last,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ts_out),
                ts_col: ts_out,
                "gap_us": pd.array(gaps, dtype="Int64"),
                "is_stale": stale,
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        monitor,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
