"""Code→value lookups.

Capability parity (SURVEY.md §2.8 F3): reference ``udfLookups``
(``ETL.py:56-69``) splits ``;``-separated code strings, maps each code
through a Python dict, and rejoins. Implemented here two ways, both
JVM-side:

- :func:`lookup_codes` — map literal + ``F.transform`` over the split array
  (no shuffle, no Python; right for small in-config code tables);
- :func:`lookup_join` — broadcast join against a lookup DataFrame (right
  when the code table is data, not config — still shuffle-free via
  broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lookup_codes(
    col: Column | str,
    mapping: dict[str, str],
    sep: str = ";",
    default: str | None = None,
) -> Column:
    """Split ``col`` on ``sep``, map each code via ``mapping``, rejoin.

    Unknown codes keep their original value unless ``default`` is given —
    the reference keeps originals (``ETL.py:63-66``).
    """
    items = []
    for k, v in mapping.items():
        items.extend([F.lit(str(k)), F.lit(str(v))])
    m = F.create_map(*items) if items else F.create_map()
    fallback = (lambda x: F.lit(default)) if default is not None else (lambda x: x)
    return F.concat_ws(
        sep,
        F.transform(
            F.split(_as_col(col).cast("string"), sep),
            lambda x: F.coalesce(F.element_at(m, x), fallback(x)),
        ),
    )


def lookup_join(
    df: DataFrame,
    lookup: DataFrame,
    code_col: str,
    lookup_key: str,
    lookup_value: str,
    out_col: str | None = None,
) -> DataFrame:
    """Scalar code→value via broadcast left join; keeps original on miss."""
    out_col = out_col or code_col
    lk = F.broadcast(
        lookup.select(
            F.col(lookup_key).alias("__lk_key"), F.col(lookup_value).alias("__lk_val")
        ).dropDuplicates(["__lk_key"])
    )
    joined = df.join(lk, df[code_col] == lk["__lk_key"], "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("__lk_val"), F.col(code_col).cast("string"))
    ).drop("__lk_key", "__lk_val")
