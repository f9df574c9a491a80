"""DDL generation from DataFrame schemas.

Capability parity: reference Hive DDL emitters ``MetaModel.py:401-451``
(target/source ``CREATE [EXTERNAL] TABLE`` from metadata rows) and
``Mapper.py:35-59`` (from a DataFrame schema, skipping pathologically wide
fields). Emitted as modern ``USING <format>`` DDL rather than
``STORED AS`` Hive syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Reference skips any field whose type string exceeds this (Mapper.py:50-53);
# kept as a guard against unbounded nested types blowing up metastores.
MAX_TYPE_STRING = 100_000


def create_table_ddl(
    df: DataFrame,
    table: str,
    database: str | None = None,
    fmt: str = "parquet",
    location: str | None = None,
    partition_by: list[str] | None = None,
    external: bool = False,
) -> str:
    """Emit ``CREATE TABLE`` DDL matching ``df``'s schema."""
    qualified = f"{database}.{table}" if database else table
    cols = []
    for field in df.schema.fields:
        type_str = field.dataType.simpleString()
        if len(type_str) > MAX_TYPE_STRING:
            continue
        cols.append(f"  `{field.name}` {type_str.upper()}")
    body = ",\n".join(cols)
    kind = "CREATE EXTERNAL TABLE" if external and location else "CREATE TABLE IF NOT EXISTS"
    ddl = f"{kind} {qualified} (\n{body}\n) USING {fmt.upper()}"
    if partition_by:
        ddl += f"\nPARTITIONED BY ({', '.join(partition_by)})"
    if location:
        ddl += f"\nLOCATION '{location}'"
    return ddl
