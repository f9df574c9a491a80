"""Source adapter for the driver's TPC-H-ish testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``/root/testdata/sf*/``.

Normalization applied here (and nowhere else):

- ``events.ts`` arrives as TIMESTAMP(NANOS) parquet; Spark reads it as
  long (``nanosAsLong``) and we truncate ns → µs exactly as DuckDB does
  (integer DIV, not float division — ns epoch values exceed 2^53 and would
  lose precision through a double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (they are fixed
# size: 5 regions / 25 nations); bigger dims are left to AQE's runtime
# broadcast decision.
ALWAYS_BROADCAST = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES, register_views: bool = False
) -> dict[str, DataFrame]:
    out = {}
    for name in names:
        out[name] = load_table(spark, sf_dir, name)
        if register_views:
            out[name].createOrReplaceTempView(name)
    return out
