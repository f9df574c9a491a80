"""Clinical-trial XML E2E over the reference's REAL shipped resources.

Replays the reference's flagship lifecycle
(``clinical_trial_etl.py:128-246``) on its actual fixtures:

- ``resources/data/clinical_trial/data/chunk1.zip`` (15 clinicaltrials.gov
  study XMLs) ingested through the engine's distributed zip reader;
- audit columns + hash-diff CDC over two snapshots (10 files staged, then
  all 15 with one modified study) on the reference's pk/order keys;
- the active snapshot flattened to ``xmltable_*`` tables;
- the reference's SHIPPED ``sponsors.sql`` executed VERBATIM over those
  flattened views, asserted row-identical to the engine's DataFrame plan
  AND to an independent ElementTree parse of the raw XML.
"""

import os
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.io.readers import read_data
from datapipelines_essentials_python_spark.io.zip_ingest import read_zip_members
from datapipelines_essentials_python_spark.pipelines import clinical_trial as ct

REF_DIR = "/root/reference/resources/data/clinical_trial"
CHUNK_ZIP = f"{REF_DIR}/data/chunk1.zip"
SPONSORS_SQL = f"{REF_DIR}/sql/transformations/sponsors.sql"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(CHUNK_ZIP), reason="reference fixtures not present"
)

T1, T2 = "2020-04-03 00:00:00", "2020-04-04 00:00:00"


@pytest.fixture(scope="module")
def batches(spark, tmp_path_factory):
    """batch1 = first 10 studies; batch2 = all 15, one title modified."""
    members = read_zip_members(spark, CHUNK_ZIP, suffix=".xml").collect()
    assert len(members) == 15
    members = sorted(members, key=lambda r: r["member_name"])

    root = tmp_path_factory.mktemp("ct")
    b1, b2 = root / "batch1", root / "batch2"
    b1.mkdir(), b2.mkdir()
    modified = members[0]["member_name"].rsplit("/", 1)[-1]
    for i, m in enumerate(members):
        name = m["member_name"].rsplit("/", 1)[-1]
        content = bytes(m["content"])
        if i < 10:
            (b1 / name).write_bytes(content)
        if i == 0:
            content = content.replace(
                b"<brief_title>", b"<brief_title>REVISED: ", 1
            )
        (b2 / name).write_bytes(content)
    return str(b1), str(b2), modified


def test_clinical_trial_cdc_flatten_sponsors(spark, batches):
    b1_dir, b2_dir, modified = batches
    xml_opts = {"rowTag": "clinical_study"}

    # one inferred schema for both batches so the payload hash is
    # schema-stable (the reference reads all landing dirs in one pass);
    # batch2's files are a superset of batch1's, so its schema covers both
    schema = read_data(spark, "xml", b2_dir, options=xml_opts).schema

    staged = ct.with_study_audit(
        read_data(spark, "xml", b1_dir, schema=schema, options=xml_opts), T1
    )
    incoming = ct.with_study_audit(
        read_data(spark, "xml", b2_dir, schema=schema, options=xml_opts), T2
    )

    # ---- CDC: 5 brand-new studies + 1 revised study = 6 delta rows
    delta, active = ct.study_cdc(staged, incoming)
    assert delta.count() == 6
    assert active.count() == 15
    revised = active.where(F.col("xml_file_name") == modified)
    assert revised.count() == 1
    row = revised.select("brief_title", "spark_timestamp").collect()[0]
    assert row["brief_title"].startswith("REVISED: ")
    assert str(row["spark_timestamp"]).startswith("2020-04-04")
    # untouched staged studies keep their original batch timestamp
    assert (
        active.where(F.col("spark_timestamp") == F.lit(T1).cast("timestamp")).count()
        == 9
    )

    # ---- flatten: reference view names + cascaded pk/ts on every child
    flat = ct.flatten_study(active)
    for view in (
        "xmltable",
        "xmltable_sponsors",
        "xmltable_sponsors_lead_sponsor",
        "xmltable_sponsors_collaborator",
    ):
        assert view in flat.tables, f"missing flattened table {view}"
    lead = flat.tables["xmltable_sponsors_lead_sponsor"]
    for col in ("pk_nct_id", "spark_ts", "surrogate_id_xmltable_sponsors"):
        assert col in lead.columns

    # ---- the reference's shipped sponsors.sql, executed VERBATIM
    ct.register_views(flat)
    with open(SPONSORS_SQL) as f:
        ref_sql = f.read()
    ref_rows = sorted(map(tuple, spark.sql(ref_sql).collect()))

    # engine's DataFrame twin: row-identical
    df_rows = sorted(map(tuple, ct.sponsors(flat.tables).collect()))
    assert df_rows == ref_rows

    # ---- independent oracle: ElementTree over the raw batch-2 XML
    expected = []
    for name in os.listdir(b2_dir):
        tree = ET.parse(os.path.join(b2_dir, name))
        nct = tree.findtext("id_info/nct_id")
        for kind, tag in (("lead", "lead_sponsor"), ("collaborator", "collaborator")):
            for sp in tree.findall(f"sponsors/{tag}"):
                expected.append(
                    (nct, sp.findtext("agency_class"), kind, sp.findtext("agency"))
                )
    assert sorted(r[:4] for r in ref_rows) == sorted(expected)


def test_ingest_from_urls_full_lifecycle(spark, tmp_path):
    """S10 end-to-end on the reference's real archive: file:// fetch on
    executors -> landed XML -> studies DataFrame with audit columns ->
    CDC snapshot, mirroring clinical_trial_etl.py:107-212."""
    studies, audit = ct.ingest_from_urls(
        spark, [f"file://{CHUNK_ZIP}"], str(tmp_path / "landing"), T1
    )
    rows = audit.collect()
    assert len(rows) == 1 and rows[0]["ok"] and rows[0]["members_written"] == 15
    assert studies.count() == 15
    for col in ("xml_file_name", "hashcode", "spark_timestamp", "pk_nct_id"):
        assert col in studies.columns
    # lifecycle continues: initial-load CDC over the ingested batch
    delta, active = ct.study_cdc(None, studies)
    assert active.count() == 15
    assert delta.count() == 15
