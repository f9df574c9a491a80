"""Null/blank handling — one coherent semantic.

The reference ships three inconsistent null/empty helpers (``ETL.py:82-87``
returns a stripped string or None; ``helpers.py:37-52`` returns bool;
``nullString`` differs again) plus a ``udfNvl`` row UDF (``ETL.py:48-53``)
defaulting null/blank to ``'-'``. This module defines the single semantic
(SURVEY.md §7.5) as native predicates/expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def is_null_or_blank(col: Column | str) -> Column:
    """True when the value is NULL or trims to ''. Replaces the reference's
    ``isnullorempty`` UDF family (``ETL.py:82-87``, ``helpers.py:37-52``)."""
    c = _as_col(col)
    return c.isNull() | (F.trim(c.cast("string")) == F.lit(""))


def nvl(col: Column | str, default: object = "-") -> Column:
    """Null/blank → ``default``, else trimmed value.

    Replaces ``udfNvl`` (``ETL.py:48-53``) and the metadata ``nvl`` UDF with
    per-column default argument (``tests/resources/meta.csv`` rows 7-12).
    """
    c = _as_col(col)
    return F.when(is_null_or_blank(c), F.lit(default)).otherwise(F.trim(c.cast("string")))


def null_between(col: Column | str, lower: Column | str, upper: Column | str) -> Column:
    """Null-tolerant BETWEEN (doc-only reference extension, APIDOC.MD:60-230):
    an open bound (NULL) is treated as unbounded."""
    c, lo, hi = _as_col(col), _as_col(lower), _as_col(upper)
    return F.when(lo.isNull() & hi.isNull(), F.lit(False)).otherwise(
        (lo.isNull() | (c >= lo)) & (hi.isNull() | (c <= hi)) & c.isNotNull()
    )
