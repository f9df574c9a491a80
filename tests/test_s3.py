"""S3 object-store helpers (SURVEY §2.1 S9) over the in-memory fake client
(boto3 is not installed in this container; the store takes any client with
the same method surface)."""

import pytest

from datapipelines_essentials_python_spark.io.s3 import InMemoryS3Client, S3ObjectStore


@pytest.fixture
def store():
    s = S3ObjectStore(client=InMemoryS3Client(page_size=3))
    s.create_bucket("landing")
    return s


def test_put_list_filter(store):
    store.create_directory("landing", "raw/day=1")
    for i in range(5):
        store.put_string(f"row {i}", f"raw/day=1/f{i}.xml", "landing")
    store.put_string("x", "raw/day=1/notes.txt", "landing")

    # pagination exercised: page_size=3 < 7 keys
    everything = store.list_files("landing", prefix="raw/")
    assert len(everything) == 7  # 6 files + directory marker
    files = store.list_files("landing", prefix="raw/", files_only=True)
    assert len(files) == 6
    xmls = store.list_files(
        "landing", prefix="raw/", files_only=True, file_extension=".xml"
    )
    assert xmls == [f"raw/day=1/f{i}.xml" for i in range(5)]


def test_delete_file_is_single_object(store):
    # the reference's delete_s3_file dropped the whole prefix; ours must not
    store.put_string("a", "stage/a.json", "landing")
    store.put_string("b", "stage/b.json", "landing")
    store.delete_file("landing", "stage/a.json")
    assert store.list_files("landing", prefix="stage/") == ["stage/b.json"]


def test_delete_directory_batches(store):
    for i in range(7):
        store.put_string("x", f"audit/f{i}", "landing")
    assert store.delete_directory("landing", "audit") == 7
    assert store.list_files("landing", prefix="audit/") == []


def test_upload_download_roundtrip(store, tmp_path):
    src = tmp_path / "chunk.zip"
    src.write_bytes(b"\x50\x4b")
    key = store.upload_file(str(src), "landing", prefix="zips")
    assert key == "zips/chunk.zip"
    dst = tmp_path / "back.zip"
    store.download_file("landing", key, str(dst))
    assert dst.read_bytes() == b"\x50\x4b"


def test_bucket_lifecycle(store):
    store.create_bucket("tmp")
    store.put_string("x", "k", "tmp")
    with pytest.raises(ValueError):
        store.delete_bucket("tmp")
    store.delete_bucket("tmp", force=True)


def test_missing_boto3_raises_helpfully():
    try:
        import boto3  # noqa: F401

        pytest.skip("boto3 present in this environment")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="boto3"):
        S3ObjectStore()
