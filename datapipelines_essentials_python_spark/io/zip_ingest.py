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
import os
import zipfile
from collections.abc import Callable, Iterator

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


FETCH_AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("dest_path", T.StringType(), True),
        T.StructField("fetched_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

LAND_AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("landed_path", T.StringType(), True),
        T.StructField("members_written", T.IntegerType(), True),
        T.StructField("landed_bytes", T.LongType(), True),
        T.StructField("landed_md5", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


FETCH_TIMEOUT_S = 60


def _default_opener(url: str) -> bytes:
    """Fetch one URL to bytes with stdlib urllib (handles http/https/file).

    Module-level so it pickles cleanly to executors; tests inject
    ``file://`` URLs and this opener stays fully offline. The timeout
    turns a hung server into an ``ok=false`` audit row instead of an
    indefinitely stalled executor task (and with it, a stalled stage).
    """
    from urllib.request import urlopen

    with urlopen(url, timeout=FETCH_TIMEOUT_S) as resp:  # noqa: S310 - scheme chosen by caller
        return resp.read()


def _sanitize_url_name(url: str) -> str:
    """Filesystem-safe name derived from the URL's last path segment —
    same character substitutions as the reference's ``url_suffix``
    (``clinical_trial_etl.py:21-23``)."""
    tail = str(url).rstrip("/").split("/")[-1]
    for ch in ("=", "?", ".", "-", "&", "%"):
        tail = tail.replace(ch, "_")
    return tail or "download"


def _dest_names(urls: list[str]) -> list[str]:
    """One filesystem-safe dest name PER URL, collision-free.

    ``_sanitize_url_name`` keys on the URL's last segment only, so two
    URLs differing only in directory (``.../a/data.zip`` vs
    ``.../b/data.zip``) would land on the same dest file — parallel
    tasks clobbering each other while both audit rows report ``ok=true``
    with md5s that no longer describe what's on disk. Names that would
    collide get an 8-hex md5 of the FULL url appended; unique names keep
    the reference-compatible bare form (so existing fixtures/paths are
    unchanged). Driver-side, O(n) over the url list.
    """
    bare = [_sanitize_url_name(u) for u in urls]
    seen: dict[str, int] = {}
    for b in bare:
        seen[b] = seen.get(b, 0) + 1
    return [
        b
        if seen[b] == 1
        else f"{b}_{hashlib.md5(str(u).encode('utf-8')).hexdigest()[:8]}"
        for u, b in zip(urls, bare)
    ]


def fetch_urls(
    spark: SparkSession,
    urls: list[str],
    dest_dir: str,
    opener: Callable[[str], bytes] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Download ``urls`` ON THE EXECUTORS into ``dest_dir`` and return a
    per-URL audit DataFrame (SURVEY §2.1 S10).

    Capability parity: the reference parallelizes per-URL download with
    ``sc.parallelize(urls).foreach(download_files_to_s3)``
    (``clinical_trial_etl.py:128-140``, per-URL body ``:19-50``). Here the
    fetch is an RDD ``mapPartitions`` so each attempt also EMITS an audit
    row (url, dest, bytes, md5, ok, error) instead of printing — failures
    surface as data, not lost stdout, and the ingest can anti-join the
    audit to retry only failures.

    ``dest_dir`` must be executor-visible (shared mount / object-store
    fuse on a real cluster; any local dir on local[N]). ``opener`` is an
    injectable ``url -> bytes`` transport (default: stdlib urllib) so
    tests run against ``file://`` fixtures with zero network. One URL is
    fetched at a time per task and streamed straight to disk — executor
    memory holds one payload max, whatever the corpus size.
    """
    fetch = opener or _default_opener
    n = partitions or min(len(urls), 32) or 1
    tagged = list(zip(urls, _dest_names(list(urls))))

    def _fetch_partition(it: Iterator[tuple]) -> Iterator[tuple]:
        os.makedirs(dest_dir, exist_ok=True)
        for url, name in it:
            dest = os.path.join(dest_dir, name)
            try:
                data = fetch(url)
                with open(dest, "wb") as f:
                    f.write(data)
                yield (
                    url,
                    dest,
                    len(data),
                    hashlib.md5(data).hexdigest(),
                    True,
                    None,
                )
            except Exception as exc:  # audit row, not task failure
                yield (url, None, None, None, False, f"{type(exc).__name__}: {exc}")

    rdd = spark.sparkContext.parallelize(tagged, n).mapPartitions(
        _fetch_partition
    )
    return spark.createDataFrame(rdd, FETCH_AUDIT_SCHEMA)


def fetch_and_land_zips(
    spark: SparkSession,
    urls: list[str],
    landing_dir: str,
    member_suffix: str = ".xml",
    opener: Callable[[str], bytes] | None = None,
    decorate: Callable[[str, str], str] | None = None,
    partitions: int | None = None,
    root_tag: str | None = "archive",
) -> DataFrame:
    """Distributed HTTP→zip→landing ingest: each executor task fetches one
    archive, extracts the ``member_suffix`` members, concatenates them
    into ONE landed file under ``landing_dir/<zip_stem>/``, and emits an
    audit row — the reference's ``download_files_to_s3`` leg
    (``clinical_trial_etl.py:19-50``: download, filter ``.xml`` members,
    write "one big XML" per archive, upload to the landing prefix).

    ``decorate(member_name, text) -> text`` is the injectable per-member
    rewrite hook standing in for the reference's
    ``append_audit_attributes_to_xml``; the engine's default pipeline
    leaves payloads untouched and computes audit columns at scan time
    instead (``pipelines/clinical_trial.py:with_study_audit``).
    """
    fetch = opener or _default_opener
    n = partitions or min(len(urls), 32) or 1
    tagged = list(zip(urls, _dest_names(list(urls))))

    def _land_partition(it: Iterator[tuple]) -> Iterator[tuple]:
        for url, stem in it:
            out_dir = os.path.join(landing_dir, stem)
            dest = os.path.join(out_dir, f"{stem}{member_suffix}")
            try:
                data = fetch(url)
                os.makedirs(out_dir, exist_ok=True)
                members = 0
                digest = hashlib.md5()
                total = 0
                with zipfile.ZipFile(io.BytesIO(data)) as zf, open(
                    dest, "w", encoding="utf-8"
                ) as out:
                    # one synthetic root per landed file: rowTag scanning
                    # needs a single well-formed document (StAX rejects
                    # multiple roots); root_tag=None restores raw concat
                    if root_tag:
                        out.write(f"<{root_tag}>\n")
                    for name in zf.namelist():
                        if name.endswith("/") or not name.endswith(member_suffix):
                            continue
                        text = zf.read(name).decode("utf-8")
                        # drop the per-member XML prolog: a concatenated
                        # landing file may carry at most one declaration,
                        # and Spark 4's built-in XML source rejects
                        # mid-document `<?xml?>` (the reference's
                        # spark-xml tolerated it; the landing contract —
                        # one rowTag-scannable file per archive — is the
                        # same either way)
                        stripped = text.lstrip("\ufeff \t\r\n")  # BOM too
                        if stripped.startswith("<?xml") and "?>" in stripped:
                            text = stripped.split("?>", 1)[1].lstrip("\r\n")
                        if decorate is not None:
                            text = decorate(name, text)
                        out.write(text)
                        digest.update(text.encode("utf-8"))
                        total += len(text.encode("utf-8"))
                        members += 1
                    if root_tag:
                        out.write(f"</{root_tag}>\n")
                yield (url, dest, members, total, digest.hexdigest(), True, None)
            except Exception as exc:
                # a mid-write failure must not leave a partial landed file:
                # consumers read the landing dir by glob, so anything on
                # disk is treated as successfully landed
                try:
                    os.remove(dest)
                except OSError:
                    pass
                yield (url, None, None, None, None, False, f"{type(exc).__name__}: {exc}")

    rdd = spark.sparkContext.parallelize(tagged, n).mapPartitions(
        _land_partition
    )
    return spark.createDataFrame(rdd, LAND_AUDIT_SCHEMA)
