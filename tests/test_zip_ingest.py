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


# ---- S10: distributed URL fetch (executor-side, injectable transport) ----

import hashlib as _hl
import os

import pytest

from datapipelines_essentials_python_spark.io.zip_ingest import (
    fetch_and_land_zips,
    fetch_urls,
)

CHUNK_ZIP = "/root/reference/resources/data/clinical_trial/data/chunk1.zip"


def test_fetch_urls_executor_side(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(b"alpha")
    (src / "b.bin").write_bytes(b"beta-beta")
    dest = str(tmp_path / "landed")
    urls = [f"file://{src}/a.bin", f"file://{src}/b.bin"]
    audit = fetch_urls(spark, urls, dest).collect()
    by_url = {r["url"]: r for r in audit}
    assert all(r["ok"] for r in audit)
    a = by_url[urls[0]]
    assert a["fetched_bytes"] == 5
    assert a["content_md5"] == _hl.md5(b"alpha").hexdigest()
    # the bytes really landed on disk under the sanitized name
    with open(a["dest_path"], "rb") as f:
        assert f.read() == b"alpha"
    assert os.path.dirname(a["dest_path"]) == dest


def test_fetch_urls_failure_becomes_audit_row(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "ok.bin").write_bytes(b"fine")
    urls = [f"file://{src}/ok.bin", f"file://{src}/missing.bin"]
    audit = fetch_urls(spark, urls, str(tmp_path / "d")).collect()
    by_url = {r["url"]: r for r in audit}
    assert by_url[urls[0]]["ok"] is True
    bad = by_url[urls[1]]
    assert bad["ok"] is False and bad["error"] and bad["dest_path"] is None


def test_fetch_urls_injectable_opener(spark, tmp_path):
    def opener(url):  # custom transport — proves injection, no urllib
        return f"payload-for:{url}".encode()

    audit = fetch_urls(
        spark, ["scheme://x/one", "scheme://x/two?v=3"], str(tmp_path / "d"), opener
    ).collect()
    assert {r["fetched_bytes"] for r in audit} == {
        len(b"payload-for:scheme://x/one"),
        len(b"payload-for:scheme://x/two?v=3"),
    }
    # '?' and '=' sanitized out of dest names (reference url_suffix rule)
    for r in audit:
        base = os.path.basename(r["dest_path"])
        assert "?" not in base and "=" not in base


def test_fetch_and_land_zips_local_fixture(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _make_zip(
        src / "chunkA.zip",
        {"s/one.xml": b"<doc>1</doc>", "s/two.xml": b"<doc>2</doc>", "n.txt": b"no"},
    )
    landing = str(tmp_path / "landing")
    audit = fetch_and_land_zips(
        spark, [f"file://{src}/chunkA.zip"], landing, member_suffix=".xml", root_tag=None
    ).collect()
    assert len(audit) == 1 and audit[0]["ok"]
    row = audit[0]
    assert row["members_written"] == 2
    with open(row["landed_path"], encoding="utf-8") as f:
        assert f.read() == "<doc>1</doc><doc>2</doc>"


def test_fetch_and_land_zips_decorate_hook(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _make_zip(src / "c.zip", {"a.xml": b"<r/>"})

    def decorate(name, text):  # reference append_audit_attributes_to_xml slot
        return f"<!--{name}-->{text}"

    audit = fetch_and_land_zips(
        spark, [f"file://{src}/c.zip"], str(tmp_path / "l"), decorate=decorate, root_tag=None
    ).collect()
    with open(audit[0]["landed_path"], encoding="utf-8") as f:
        assert f.read() == "<!--a.xml--><r/>"


def test_fetch_urls_colliding_basenames_land_separately(spark, tmp_path):
    """Two URLs differing only in directory must NOT clobber one dest file;
    each audit md5 must describe the bytes actually on disk."""
    src = tmp_path / "src"
    (src / "a").mkdir(parents=True)
    (src / "b").mkdir()
    (src / "a" / "data.bin").write_bytes(b"from-a")
    (src / "b" / "data.bin").write_bytes(b"from-b-longer")
    urls = [f"file://{src}/a/data.bin", f"file://{src}/b/data.bin"]
    audit = fetch_urls(spark, urls, str(tmp_path / "d")).collect()
    by_url = {r["url"]: r for r in audit}
    dests = {r["dest_path"] for r in audit}
    assert len(dests) == 2, "colliding basenames must get distinct dest files"
    for url, payload in zip(urls, [b"from-a", b"from-b-longer"]):
        row = by_url[url]
        with open(row["dest_path"], "rb") as f:
            on_disk = f.read()
        assert on_disk == payload
        assert row["content_md5"] == _hl.md5(on_disk).hexdigest()


def test_fetch_and_land_zips_flaky_transport(spark, tmp_path):
    """One URL raising mid-fetch yields an ok=false audit row WITHOUT
    failing the partition; the healthy archive lands and proceeds, and the
    failure leaves no partial file behind (glob consumers must not see it)."""
    src = tmp_path / "src"
    src.mkdir()
    _make_zip(src / "good.zip", {"a.xml": b"<doc>ok</doc>"})
    good_url = f"file://{src}/good.zip"
    bad_url = "flaky://server/bad.zip"

    def opener(url):
        if url == bad_url:
            raise TimeoutError("simulated hung server")
        with open(url.removeprefix("file://"), "rb") as f:
            return f.read()

    landing = tmp_path / "landing"
    audit = fetch_and_land_zips(
        spark, [good_url, bad_url], str(landing), opener=opener, root_tag=None
    ).collect()
    by_url = {r["url"]: r for r in audit}
    assert by_url[good_url]["ok"] is True
    bad = by_url[bad_url]
    assert bad["ok"] is False and "TimeoutError" in bad["error"]
    assert bad["landed_path"] is None
    # only the healthy archive's file exists under the landing dir
    landed_files = [
        os.path.join(r, f) for r, _, fs in os.walk(landing) for f in fs
    ]
    assert len(landed_files) == 1 and landed_files[0].endswith("good_zip.xml")


def test_fetch_and_land_zips_corrupt_archive_no_partial_file(spark, tmp_path):
    """A payload that fails AFTER the dest file is opened (not a zip) must
    remove the partial file so directory-glob readers skip it."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "notazip.zip").write_bytes(b"this is not a zip archive")
    landing = tmp_path / "landing"
    audit = fetch_and_land_zips(
        spark, [f"file://{src}/notazip.zip"], str(landing), root_tag=None
    ).collect()
    assert audit[0]["ok"] is False and "BadZipFile" in audit[0]["error"]
    leftover = [f for _, _, fs in os.walk(landing) for f in fs]
    assert leftover == []


def test_fetch_and_land_zips_midwrite_failure_removes_partial(spark, tmp_path):
    """Failure AFTER some members are already written (second member is
    invalid UTF-8) must remove the half-written landed file."""
    src = tmp_path / "src"
    src.mkdir()
    _make_zip(src / "half.zip", {"a.xml": b"<ok/>", "b.xml": b"\xff\xfe\x00bad"})
    landing = tmp_path / "landing"
    audit = fetch_and_land_zips(
        spark, [f"file://{src}/half.zip"], str(landing), root_tag=None
    ).collect()
    assert audit[0]["ok"] is False and "UnicodeDecodeError" in audit[0]["error"]
    leftover = [f for _, _, fs in os.walk(landing) for f in fs]
    assert leftover == []


def test_ingest_from_urls_fetch_runs_exactly_once(spark, tmp_path):
    """The returned audit DF is materialized (localCheckpoint) inside
    ingest_from_urls: re-collecting it, or acting on the studies DF, must
    NOT re-run the side-effecting download job (ADVICE r4). Fetch calls
    are counted via an on-disk ledger visible across executor workers."""
    from datapipelines_essentials_python_spark.pipelines import clinical_trial as ct

    src = tmp_path / "src"
    src.mkdir()
    _make_zip(src / "c1.zip", {"a.xml": b"<clinical_study><id_info><nct_id>N1</nct_id></id_info></clinical_study>"})
    _make_zip(src / "c2.zip", {"b.xml": b"<clinical_study><id_info><nct_id>N2</nct_id></id_info></clinical_study>"})
    ledger = tmp_path / "calls"
    ledger.mkdir()

    def opener(url):
        # one ledger file per call; unique name per (url, attempt)
        import uuid

        (ledger / f"{uuid.uuid4().hex}").write_text(url)
        with open(url.removeprefix("file://"), "rb") as f:
            return f.read()

    urls = [f"file://{src}/c1.zip", f"file://{src}/c2.zip"]
    studies, audit = ct.ingest_from_urls(
        spark, urls, str(tmp_path / "landing"), "2020-04-03 00:00:00", opener=opener
    )
    calls_after_ingest = len(list(ledger.iterdir()))
    assert calls_after_ingest == 2  # one fetch per URL, already materialized
    audit.collect()
    audit.collect()
    assert studies.count() == 2
    assert len(list(ledger.iterdir())) == calls_after_ingest, (
        "later actions on audit/studies must not re-download"
    )


def test_ingest_from_urls_partial_failure_proceeds(spark, tmp_path):
    """One failing URL: landed subset is read, audit carries the failure."""
    from datapipelines_essentials_python_spark.pipelines import clinical_trial as ct

    src = tmp_path / "src"
    src.mkdir()
    _make_zip(src / "ok.zip", {"a.xml": b"<clinical_study><id_info><nct_id>N1</nct_id></id_info></clinical_study>"})

    def opener(url):
        if "missing" in url:
            raise ConnectionError("refused")
        with open(url.removeprefix("file://"), "rb") as f:
            return f.read()

    studies, audit = ct.ingest_from_urls(
        spark,
        [f"file://{src}/ok.zip", "http://host/missing.zip"],
        str(tmp_path / "landing"),
        "2020-04-03 00:00:00",
        opener=opener,
    )
    assert studies.count() == 1
    rows = {r["url"]: r for r in audit.collect()}
    assert rows[f"file://{src}/ok.zip"]["ok"] is True
    assert rows["http://host/missing.zip"]["ok"] is False


@pytest.mark.skipif(not os.path.isfile(CHUNK_ZIP), reason="reference fixtures absent")
def test_fetch_and_land_reference_chunk_readable_as_xml(spark, tmp_path):
    """E2E over the reference's real archive: executor-side fetch of
    chunk1.zip -> one big landed XML -> Spark XML source parses all 15
    studies (the reference's landing contract, clinical_trial_etl.py:19-50)."""
    landing = str(tmp_path / "landing")
    audit = fetch_and_land_zips(
        spark, [f"file://{CHUNK_ZIP}"], landing, member_suffix=".xml"
    ).collect()
    assert audit[0]["ok"] and audit[0]["members_written"] == 15
    studies = (
        spark.read.format("xml")
        .option("rowTag", "clinical_study")
        .load(audit[0]["landed_path"])
    )
    assert studies.count() == 15
    assert "id_info" in studies.columns
