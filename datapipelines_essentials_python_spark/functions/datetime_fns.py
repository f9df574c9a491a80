"""Datetime helpers.

Capability parity (SURVEY.md §2.8 F4/F13/F14):

- ``datetimeToGMT`` / ``zoneDatetimeToGMTZone`` pytz row UDFs
  (``ETL.py:22-45``) → native ``to_utc_timestamp``;
- ``Utilities.py:373-379`` strptime wrapper returning None on failure →
  ``to_date`` / ``try_to_timestamp`` (null-on-fail matches the reference);
- ``Utilities.py:382-407`` driver-side backfill date-range windows → both a
  driver-side list helper and a distributed ``F.sequence`` variant.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


DEFAULT_ZONE = "America/Los_Angeles"  # the reference's hard-coded zone (ETL.py:22-28)


def to_gmt(col: Column | str, fmt: str | None = None, zone: str = DEFAULT_ZONE) -> Column:
    """Interpret a local-zone timestamp (optionally parsed with ``fmt``) as
    UTC. Native replacement for ``datetimetogmt`` / ``zonedatetimetogmt``."""
    c = _as_col(col)
    ts = F.to_timestamp(c, fmt) if fmt else c.cast("timestamp")
    return F.to_utc_timestamp(ts, zone)


def to_date_safe(col: Column | str, fmt: str = "M/d/yyyy") -> Column:
    """Pattern-parse to date, NULL on failure (reference Utilities.py:373-379
    returns None on strptime failure)."""
    return F.try_to_timestamp(_as_col(col).cast("string"), F.lit(fmt)).cast("date")


def date_ranges(
    start: date | str, end: date | str, interval_days: int
) -> list[dict[str, str]]:
    """Driver-side backfill windows (parity: Utilities.py:382-407): list of
    ``{'startDate': d0, 'endDate': d1}`` windows covering [start, end]."""
    if isinstance(start, str):
        start = datetime.strptime(start, "%Y-%m-%d").date()
    if isinstance(end, str):
        end = datetime.strptime(end, "%Y-%m-%d").date()
    if interval_days <= 0:
        raise ValueError("interval_days must be positive")
    out = []
    cur = start
    while cur <= end:
        nxt = min(cur + timedelta(days=interval_days - 1), end)
        out.append({"startDate": cur.isoformat(), "endDate": nxt.isoformat()})
        cur = nxt + timedelta(days=1)
    return out


def date_sequence(start: Column | str, end: Column | str, interval_days: int = 1) -> Column:
    """Distributed date-range generation: array of dates via ``F.sequence``."""
    return F.sequence(
        _as_col(start).cast("date"),
        _as_col(end).cast("date"),
        F.expr(f"INTERVAL {int(interval_days)} DAY"),
    )
