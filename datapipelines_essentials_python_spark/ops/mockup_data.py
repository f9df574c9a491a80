"""Deterministic synthetic schema/row generation for tests.

Capability parity (SURVEY.md §2.13 X7): the reference's ``MockupData``
random generator is a non-functional stub (``utils/MockupData.py:57-58``
returns ``Optional[Any]()``). This is the working replacement: seeded,
schema-driven generation producing either a plain row list or a Spark
DataFrame — used with hypothesis-style property tests in our suite.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCALARS = (
    T.IntegerType,
    T.LongType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
    T.StringType,
    T.DateType,
    T.TimestampType,
)


def random_schema(
    rng: random.Random, n_cols: int = 5, allow_nested: bool = True, depth: int = 0
) -> T.StructType:
    fields = []
    for i in range(n_cols):
        roll = rng.random()
        if allow_nested and depth < 2 and roll < 0.15:
            dtype: T.DataType = T.ArrayType(T.StringType())
        elif allow_nested and depth < 2 and roll < 0.25:
            dtype = random_schema(rng, rng.randint(1, 3), allow_nested, depth + 1)
        else:
            dtype = rng.choice(SCALARS)()
        fields.append(T.StructField(f"c{depth}_{i}", dtype, nullable=True))
    return T.StructType(fields)


def _value_for(rng: random.Random, dtype: T.DataType, null_rate: float):
    if rng.random() < null_rate:
        return None
    if isinstance(dtype, T.IntegerType):
        return rng.randint(-(2 ** 31), 2 ** 31 - 1)
    if isinstance(dtype, T.LongType):
        return rng.randint(-(2 ** 53), 2 ** 53)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return round(rng.uniform(-1e6, 1e6), 6)
    if isinstance(dtype, T.BooleanType):
        return rng.random() < 0.5
    if isinstance(dtype, T.StringType):
        n = rng.randint(0, 12)
        return "".join(rng.choices(string.ascii_lowercase + " ", k=n))
    if isinstance(dtype, T.DateType):
        return (datetime(2020, 1, 1) + timedelta(days=rng.randint(0, 1500))).date()
    if isinstance(dtype, T.TimestampType):
        return datetime(2020, 1, 1, tzinfo=timezone.utc) + timedelta(
            seconds=rng.randint(0, 10 ** 8)
        )
    if isinstance(dtype, T.ArrayType):
        return [
            _value_for(rng, dtype.elementType, 0.0)
            for _ in range(rng.randint(0, 4))
        ]
    if isinstance(dtype, T.StructType):
        return tuple(_value_for(rng, f.dataType, null_rate) for f in dtype.fields)
    raise TypeError(f"unsupported type {dtype}")


def generate_rows(
    schema: T.StructType, n_rows: int, seed: int = 42, null_rate: float = 0.1
) -> list[tuple]:
    rng = random.Random(seed)
    return [
        tuple(_value_for(rng, f.dataType, null_rate) for f in schema.fields)
        for _ in range(n_rows)
    ]


def generate_dataframe(
    spark: SparkSession,
    schema: T.StructType | None = None,
    n_rows: int = 100,
    seed: int = 42,
    null_rate: float = 0.1,
) -> DataFrame:
    """Seeded random DataFrame; same (schema, n_rows, seed) → same data."""
    if schema is None:
        schema = random_schema(random.Random(seed))
    return spark.createDataFrame(generate_rows(schema, n_rows, seed, null_rate), schema)
