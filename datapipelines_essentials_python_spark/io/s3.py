"""Driver-side S3 object-store helpers (SURVEY §2.1 S9).

Capability parity: the reference's boto3 utilities
(``src/com/vitthalmirji/utils/Utilities.py:68-148``) — list/put/delete
objects, create/delete buckets and "directories", upload/download — used by
its clinical-trial ETL for landing-zone housekeeping.

Fixes over the reference:

- the moto endpoint ``http://127.0.0.1:5000`` was hardcoded into every
  call site; here the client (or an ``endpoint_url``) is injected once;
- ``delete_s3_file`` actually deleted a whole directory prefix
  (``Utilities.py:112-116`` filters on ``directory_name``, ignoring the
  file path argument) — here it deletes exactly the one key;
- ``list_s3_files`` used unpaginated ``list_objects`` (1000-key cap, a
  real truncation bug on any production landing zone); here listing
  paginates.

Scale note: these are CONTROL-PLANE calls (a few per job, from the
driver). The data plane never goes through boto3 — executors read/write
``s3a://`` URIs via the readers/writers modules, so object bytes flow
directly between S3 and the cluster.

boto3 is imported lazily: environments without it (like this container)
can still construct the store with any client exposing the small
``list_objects_v2 / put_object / delete_objects / upload_file /
download_file / create_bucket / delete_bucket`` surface (moto, a fake, or
the real thing).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any


class S3ObjectStore:
    """Thin, testable wrapper over an injected S3 client."""

    def __init__(self, client: Any | None = None, endpoint_url: str | None = None):
        if client is None:
            try:
                import boto3  # noqa: PLC0415 — optional dependency
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "boto3 is not installed; pass an explicit `client` "
                    "(moto, a fake, or a boto3 client built elsewhere)"
                ) from exc
            kwargs = {"endpoint_url": endpoint_url} if endpoint_url else {}
            client = boto3.client("s3", **kwargs)
        self.client = client

    # ---- listing ---------------------------------------------------------
    def list_files(
        self,
        bucket: str,
        prefix: str = "",
        files_only: bool = False,
        file_extension: str | None = None,
    ) -> list[str]:
        """All keys under ``prefix`` (paginated — no 1000-key truncation).

        ``files_only`` drops directory markers; ``file_extension`` filters
        by suffix (parity: ``list_s3_files``, ``Utilities.py:76-91``).
        """
        keys: list[str] = []
        token: str | None = None
        while True:
            kwargs = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            keys.extend(o["Key"] for o in resp.get("Contents", []))
            if not resp.get("IsTruncated"):
                break
            token = resp.get("NextContinuationToken")
        if files_only:
            keys = [k for k in keys if not k.endswith("/")]
            if file_extension is not None:
                keys = [k for k in keys if k.endswith(file_extension)]
        return keys

    # ---- object writes ---------------------------------------------------
    def put_string(self, content: str | bytes, key: str, bucket: str) -> None:
        body = content.encode("utf-8") if isinstance(content, str) else content
        self.client.put_object(Body=body, Bucket=bucket, Key=key)

    def create_directory(self, bucket: str, directory: str) -> None:
        self.client.put_object(Bucket=bucket, Key=f"{directory.strip('/')}/")

    def upload_file(self, local_path: str, bucket: str, prefix: str | None = None) -> str:
        name = Path(local_path).name
        key = f"{prefix.rstrip('/')}/{name}" if prefix else name
        self.client.upload_file(Filename=str(local_path), Bucket=bucket, Key=key)
        return key

    def download_file(self, bucket: str, key: str, local_path: str) -> None:
        self.client.download_file(Bucket=bucket, Key=key, Filename=str(local_path))

    # ---- deletes ---------------------------------------------------------
    def delete_file(self, bucket: str, key: str) -> None:
        """Delete exactly one object (the reference's version deleted the
        whole directory prefix — ``Utilities.py:112-116``)."""
        self.client.delete_objects(
            Bucket=bucket, Delete={"Objects": [{"Key": key}]}
        )

    def delete_directory(self, bucket: str, directory: str) -> int:
        """Delete every key under ``directory`` in batches of 1000 (the
        delete_objects API limit). Returns the number of keys deleted."""
        prefix = f"{directory.rstrip('/')}/" if directory.strip("/") else ""
        keys = self.list_files(bucket, prefix=prefix)
        for i in range(0, len(keys), 1000):
            batch = [{"Key": k} for k in keys[i : i + 1000]]
            self.client.delete_objects(Bucket=bucket, Delete={"Objects": batch})
        return len(keys)

    # ---- buckets ---------------------------------------------------------
    def create_bucket(self, bucket: str) -> None:
        self.client.create_bucket(Bucket=bucket.rstrip("/"))

    def delete_bucket(self, bucket: str, force: bool = False) -> None:
        if force:
            self.delete_directory(bucket, "")
        self.client.delete_bucket(Bucket=bucket)


class InMemoryS3Client:
    """Protocol-compatible in-memory stand-in for the boto3 S3 client
    surface :class:`S3ObjectStore` uses — lets the helpers be tested in
    environments without boto3/moto (this container has neither)."""

    def __init__(self, page_size: int = 1000):
        self.buckets: dict[str, dict[str, bytes]] = {}
        self.page_size = page_size

    def create_bucket(self, Bucket: str) -> None:
        self.buckets.setdefault(Bucket, {})

    def delete_bucket(self, Bucket: str) -> None:
        if self.buckets.get(Bucket):
            raise ValueError("BucketNotEmpty")
        self.buckets.pop(Bucket, None)

    def put_object(self, Bucket: str, Key: str, Body: bytes = b"") -> None:
        self.buckets[Bucket][Key] = bytes(Body)

    def list_objects_v2(
        self,
        Bucket: str,
        Prefix: str = "",
        ContinuationToken: str | None = None,
    ) -> dict:
        keys = sorted(k for k in self.buckets[Bucket] if k.startswith(Prefix))
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start : start + self.page_size]
        truncated = start + self.page_size < len(keys)
        resp: dict = {"Contents": [{"Key": k} for k in page], "IsTruncated": truncated}
        if truncated:
            resp["NextContinuationToken"] = str(start + self.page_size)
        return resp

    def delete_objects(self, Bucket: str, Delete: dict) -> None:
        for obj in Delete["Objects"]:
            self.buckets[Bucket].pop(obj["Key"], None)

    def upload_file(self, Filename: str, Bucket: str, Key: str) -> None:
        self.buckets[Bucket][Key] = Path(Filename).read_bytes()

    def download_file(self, Bucket: str, Key: str, Filename: str) -> None:
        Path(Filename).write_bytes(self.buckets[Bucket][Key])
