"""Distributed zip ingestion (io/zip_ingest.py; SURVEY §2.1 S10/S11)."""

import hashlib
import zipfile

from datapipelines_essentials_python_spark.io.zip_ingest import read_zip_members


def _make_zip(path, members: dict[str, bytes]):
    with zipfile.ZipFile(path, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)


def test_read_zip_members(spark, tmp_path):
    _make_zip(tmp_path / "a.zip", {"x/one.xml": b"<a>1</a>", "two.txt": b"hello"})
    _make_zip(tmp_path / "b.zip", {"three.xml": b"<b>2</b>"})
    out = read_zip_members(spark, str(tmp_path)).collect()
    by_member = {r["member_name"]: r for r in out}
    assert set(by_member) == {"x/one.xml", "two.txt", "three.xml"}
    row = by_member["x/one.xml"]
    assert bytes(row["content"]) == b"<a>1</a>"
    assert row["member_bytes"] == 8
    assert row["member_md5"] == hashlib.md5(b"<a>1</a>").hexdigest()
    assert row["archive_path"].endswith("a.zip")


def test_member_filters(spark, tmp_path):
    _make_zip(
        tmp_path / "c.zip",
        {"doc_1.xml": b"x", "doc_2.xml": b"y", "readme.txt": b"z", "img_1.png": b"p"},
    )
    sfx = read_zip_members(spark, str(tmp_path), suffix=".xml")
    assert {r["member_name"] for r in sfx.collect()} == {"doc_1.xml", "doc_2.xml"}
    pfx = read_zip_members(spark, str(tmp_path), prefix="img")
    assert {r["member_name"] for r in pfx.collect()} == {"img_1.png"}
    ctn = read_zip_members(spark, str(tmp_path), contains="read")
    assert {r["member_name"] for r in ctn.collect()} == {"readme.txt"}
