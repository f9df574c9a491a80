"""Repartitioning helpers.

Capability parity (SURVEY.md §2.13 X3): reference
``data_frame_repartition`` (``utils/spark.py:119-147``) supports coalesce(n),
repartition(cols), and salted repartition. AQE supersedes most manual uses
for joins/aggs (SURVEY §4); these remain for *write* layout control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.functions.hashing import salted_key


def data_frame_repartition(
    df: DataFrame,
    num_partitions: int | None = None,
    columns: list[str] | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """coalesce | repartition(cols) | salted repartition, one entry point.

    - only ``num_partitions``: ``coalesce`` (narrow, no shuffle);
    - only ``columns``: hash repartition by columns;
    - ``columns`` + ``salt_buckets``: repartition by a salted composite key
      (spreads hot keys across ``salt_buckets`` partitions — useful when one
      partition-by value dominates a write).
    """
    if columns and salt_buckets:
        key = salted_key(columns, salt_buckets)
        return df.repartition(*( [num_partitions] if num_partitions else [] ), key)
    if columns:
        cols = [F.col(c) for c in columns]
        if num_partitions:
            return df.repartition(num_partitions, *cols)
        return df.repartition(*cols)
    if num_partitions:
        return df.coalesce(num_partitions)
    return df
