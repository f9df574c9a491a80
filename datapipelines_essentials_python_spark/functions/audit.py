"""Audit columns appended at read time.

Capability parity (SURVEY.md §2.8 F7): the reference appends
``reverse(split(input_file_name(),'/'))[0] AS file_name`` and a driver-time
``CAST('<now>' AS TIMESTAMP) AS spark_timestamp`` via selectExpr strings
(``change_data_capture.py:33-42``; config
``clinical_trial.json.audit_columns_definition``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_audit_columns(
    df: DataFrame,
    file_name_col: str = "file_name",
    timestamp_col: str = "spark_timestamp",
    batch_id: str | None = None,
) -> DataFrame:
    """Append source-file name, load timestamp, and optional batch id.

    ``current_timestamp()`` is per-query-constant in Spark, which matches
    the reference's driver-side '<now>' literal semantics.
    """
    out = df.withColumn(
        file_name_col, F.element_at(F.split(F.input_file_name(), "/"), -1)
    ).withColumn(timestamp_col, F.current_timestamp())
    if batch_id is not None:
        out = out.withColumn("batch_id", F.lit(batch_id))
    return out
