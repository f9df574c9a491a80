"""Distributed zip-archive ingestion.

Capability parity (SURVEY.md §2.1 S10/S11): the reference unpacks zips with
driver-side helpers over ``binaryFiles`` RDD tuples and name filtering by
prefix/suffix/contains (``Utilities.py:184-236``), and its clinical-trial
ingest downloads+unzips inside an RDD ``foreach`` (``clinical_trial_etl.py:19-50``).

Here the ``binaryFile`` data source streams archives to executors and an
Arrow-batched ``mapInPandas`` unpacks members — lazy, distributed, and
memory-bounded (one archive at a time per task). Audit columns (member
hash, source path) are emitted inline so downstream CDC (SURVEY §2.9)
needs no re-read.
"""

from __future__ import annotations

import hashlib
import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ZIP_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("archive_path", T.StringType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("member_bytes", T.LongType(), False),
        T.StructField("member_md5", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def read_zip_members(
    spark: SparkSession,
    path: str,
    prefix: str | None = None,
    suffix: str | None = None,
    contains: str | None = None,
) -> DataFrame:
    """Read every member of every zip under ``path`` as one row.

    Name filters mirror the reference's prefix/suffix/contains trio
    (``Utilities.py:208-223``); they are applied inside the executor before
    any member is decompressed, so filtered members cost only a directory
    read.
    """
    archives = spark.read.format("binaryFile").load(path)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for apath, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for name in zf.namelist():
                        if name.endswith("/"):
                            continue
                        base = name.rsplit("/", 1)[-1]
                        if prefix and not base.startswith(prefix):
                            continue
                        if suffix and not base.endswith(suffix):
                            continue
                        if contains and contains not in base:
                            continue
                        data = zf.read(name)
                        rows.append(
                            (
                                apath,
                                name,
                                len(data),
                                hashlib.md5(data).hexdigest(),
                                data,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ZIP_MEMBER_SCHEMA.fields]
            )

    return archives.select("path", "content").mapInPandas(
        _extract, schema=ZIP_MEMBER_SCHEMA
    )
