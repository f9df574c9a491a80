"""ISO-8601 duration arithmetic + difficulty bucketing — fully native.

Capability parity (SURVEY.md §2.8 F5/F6, §2.4 A3):

- reference parses/adds ISO durations with the ``isodate`` package in row
  UDFs (``helpers.py:99-145``) and averages them by collecting lists into a
  Python UDF (``recipe_tasks.py:162-176``);
- reference buckets recipes into easy/medium/hard in a struct-returning row
  UDF (``recipe_tasks.py:157-160, 206-239``).

Here durations are normalized **once at the edge** to a numeric seconds
column; all arithmetic (sum/avg/add) is then plain columnar math inside
whole-stage codegen, and the exact ``isodate.duration_isoformat`` text shape
(``PT2H43M37.105263S`` / ``P0D`` — golden file
``resources/data/recipes/output/task2/part-*.csv``) is reproduced natively
on the way out.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# PnDTnHnMnS with fractional seconds; weeks/months/years are not used by the
# reference's data (recipe times) and are rejected to NULL like other junk.
_D = r"^P(?:(\d+(?:\.\d+)?)D)?(?:T(?:(\d+(?:\.\d+)?)H)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)S)?)?$"


def iso_duration_to_seconds(col: Column | str) -> Column:
    """Parse ``PnDTnHnMnS`` → seconds (DOUBLE).

    NULL/blank/'PT'/'P' → 0.0 (the reference treats empty cook/prep times as
    zero, ``recipe_tasks.py:206-239``); malformed text → NULL.
    """
    s = F.trim(_as_col(col).cast("string"))
    # regexp_extract yields '' for absent groups; try_cast maps that to NULL
    # (plain cast would throw under ANSI mode, the Spark 4 default)
    part = lambda i: F.coalesce(F.regexp_extract(s, _D, i).try_cast("double"), F.lit(0.0))  # noqa: E731
    parsed = part(1) * 86400 + part(2) * 3600 + part(3) * 60 + part(4)
    return (
        F.when(s.isNull() | (s == "") | (s == "PT") | (s == "P"), F.lit(0.0))
        .when(s.rlike(_D), parsed)
        .otherwise(F.lit(None).cast("double"))
    )


def seconds_to_iso_duration(col: Column | str) -> Column:
    """Format seconds → ISO-8601 duration text, matching
    ``isodate.duration_isoformat``: zero → ``P0D``; otherwise
    ``PT[nH][nM][n[.ffffff]S]`` with zero components omitted and fractional
    seconds trimmed of trailing zeros (golden: ``PT7M5.086705S``)."""
    total = F.round(_as_col(col).cast("double"), 6)
    hours = F.floor(total / 3600).cast("long")
    minutes = F.floor((total - hours * 3600) / 60).cast("long")
    secs = F.round(total - hours * 3600 - minutes * 60, 6)

    # seconds text: 6-decimal fixed, then strip trailing zeros / dot
    sec_txt = F.regexp_replace(
        F.regexp_replace(F.format_number(secs, 6), ",", ""), r"\.?0+$", ""
    )
    h_part = F.when(hours > 0, F.concat(hours.cast("string"), F.lit("H"))).otherwise(F.lit(""))
    m_part = F.when(minutes > 0, F.concat(minutes.cast("string"), F.lit("M"))).otherwise(F.lit(""))
    s_part = F.when(secs > 0, F.concat(sec_txt, F.lit("S"))).otherwise(F.lit(""))
    return (
        F.when(total.isNull(), F.lit(None).cast("string"))
        .when(total == 0, F.lit("P0D"))
        .otherwise(F.concat(F.lit("PT"), h_part, m_part, s_part))
    )


def add_iso_durations(*cols: Column | str) -> Column:
    """Sum ISO duration strings → ISO duration string (parity:
    ``add_iso_time_duration``, ``helpers.py:120-145``)."""
    total: Column | None = None
    for c in cols:
        secs = iso_duration_to_seconds(c)
        total = secs if total is None else (total + secs)
    if total is None:
        raise ValueError("add_iso_durations needs at least one column")
    return seconds_to_iso_duration(total)


def difficulty(total_seconds: Column | str) -> Column:
    """Reference difficulty buckets over cook+prep total seconds
    (``recipe_tasks.py:206-239``): <30m easy, 30-60m (inclusive) medium,
    >60m hard; NULL (unparseable) → 'invalid'."""
    t = _as_col(total_seconds).cast("double")
    return (
        F.when(t.isNull(), F.lit("invalid"))
        .when(t < 1800, F.lit("easy"))
        .when(t <= 3600, F.lit("medium"))
        .otherwise(F.lit("hard"))
    )


def total_time_and_difficulty(cook: Column | str, prep: Column | str) -> Column:
    """Struct ``(total_time, difficulty)`` — native replacement for the
    struct-returning row UDF at ``recipe_tasks.py:157-160``."""
    total = iso_duration_to_seconds(cook) + iso_duration_to_seconds(prep)
    return F.struct(
        seconds_to_iso_duration(total).alias("total_time"),
        total.alias("total_seconds"),
        difficulty(total).alias("difficulty"),
    )
