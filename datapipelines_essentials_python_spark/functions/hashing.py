"""Row hashing and salting.

Capability parity (SURVEY.md §2.8 F8/F9):

- the reference computes ``hashlib.md5`` over whole XML documents on the
  driver and injects the digest back into the text
  (``change_data_capture.py:9-15``) — here the digest is a distributed
  column expression over a canonical row payload;
- salted repartition keys ``concat_ws('~', cols, floor(rand()*n))``
  (``utils/spark.py:142-147``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(df_or_cols: DataFrame | list[str], exclude: set[str] | None = None) -> list[str]:
    cols = df_or_cols.columns if isinstance(df_or_cols, DataFrame) else list(df_or_cols)
    exclude = exclude or set()
    return sorted(c for c in cols if c not in exclude)


def row_hash_md5(df: DataFrame, columns: list[str] | None = None) -> Column:
    """md5 over a canonical JSON of the (sorted) selected columns.

    Sorted column order makes the digest stable under projection reordering
    — the reference's whole-file md5 was sensitive to raw byte layout.
    NULL fields are kept in the JSON (``ignoreNullFields=false``) so two
    rows differing only in which nullable column is NULL never collide.
    """
    cols = sorted(columns) if columns else _cols(df)
    return F.md5(
        F.to_json(
            F.struct(*[F.col(c) for c in cols]), {"ignoreNullFields": "false"}
        )
    )


def row_hash_xxhash64(df: DataFrame, columns: list[str] | None = None) -> Column:
    """64-bit xxhash over the selected columns — cheaper than md5 for CDC
    change detection at 100 TB (no string materialization)."""
    cols = sorted(columns) if columns else _cols(df)
    return F.xxhash64(*[F.col(c) for c in cols])


def salted_key(columns: list[str], num_buckets: int, sep: str = "~") -> Column:
    """Composite repartition key with a random salt bucket appended
    (parity: ``spark.py:142-147``). Prefer AQE skew handling for joins; this
    remains useful to spread skewed *writes*."""
    salt = F.floor(F.rand() * num_buckets).cast("string")
    return F.concat_ws(sep, *[F.col(c).cast("string") for c in columns], salt)


def zorder_key(x, y, bits: int = 10):
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    non-negative integer columns — the space-filling-curve sort key used
    to cluster data files on two dimensions at once, so min/max pruning
    works for predicates on EITHER column after
    ``sortWithinPartitions(zorder_key(...))`` + write.

    Pure integer arithmetic (shift/mod/multiply) → deterministic and
    portable to any SQL engine.
    """
    from pyspark.sql import functions as F

    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        xbit = F.shiftright(xc, b).bitwiseAND(F.lit(1))
        ybit = F.shiftright(yc, b).bitwiseAND(F.lit(1))
        key = key + xbit * F.lit(2 ** (2 * b)) + ybit * F.lit(2 ** (2 * b + 1))
    return key
