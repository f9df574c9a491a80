"""Bucketed table layout: pre-shuffled, co-located joins.

The single biggest join optimization at 100 TB is not doing the shuffle at
all. Writing both sides of a recurring join ``bucketBy(N, key)`` (hash-
partitioned into a fixed number of files per partition, optionally sorted
within each bucket) lets every later equi-join / aggregation on that key run
with ZERO exchange: Spark matches bucket i of the left table to bucket i of
the right and sort-merge-joins in place. One write-time shuffle is amortized
over every subsequent read — the batch analogue of an index.

Reference parity: the reference writes Hive tables partitioned by load date
(`src/com/vitthalmirji/datapipelines/clinical_trial/clinical_trial_etl.py`
saveAsTable calls); bucketing is the scale-up of that layout decision to
join keys, expressed with the same ``DataFrameWriter`` surface.

Sizing rule of thumb: pick ``num_buckets`` so that table_size / num_buckets
≈ 128-512 MB (one comfortable task input). Both sides of a co-located join
must agree on bucket count and key; assert that with
:func:`assert_cobucketed` before relying on the zero-exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sort_cols`` additionally sorts rows inside each bucket file, which
    upgrades later merge joins and gives min/max pruning inside buckets.
    ``partition_by`` composes: partition dirs first (coarse pruning), then
    buckets within each partition (join co-location).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *cols)
    if sort_cols is not None:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    if partition_by is not None:
        pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*pb)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_columns) of a catalog table, or None if the
    table is not bucketed. Reads DESCRIBE EXTENDED — catalog-portable."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r["col_name"].strip(): (r["data_type"] or "").strip() for r in rows}
    n = info.get("Num Buckets")
    cols = info.get("Bucket Columns")
    if not n:
        return None
    parsed = [c.strip(" `") for c in cols.strip("[]").split(",")] if cols else []
    return int(n), parsed


def assert_cobucketed(spark: SparkSession, left: str, right: str) -> None:
    """Raise unless ``left`` and ``right`` are bucketed with the same count
    (same-key joins between them then plan with zero exchange)."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    if ls is None or rs is None:
        raise ValueError(
            f"not bucketed: {left if ls is None else right} — co-located "
            "join requires both sides written with write_bucketed"
        )
    if ls[0] != rs[0]:
        raise ValueError(
            f"bucket counts differ: {left}={ls[0]} {right}={rs[0]} — Spark "
            "only aligns equal bucket counts (or exact multiples with "
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled)"
        )
