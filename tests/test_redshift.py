"""Redshift COPY/UNLOAD adapter (SURVEY §2.1 S12) — option-merging parity
with the reference's vendored expectations
(tests/aws_test/test_mocked_redshift.py:52-71)."""

import pytest

from datapipelines_essentials_python_spark.io.redshift import (
    add_default_copy_options,
    combine_copy_options,
    copy_statement,
    unload_statement,
)


def test_add_default_copy_options_reference_parity():
    assert add_default_copy_options() == [
        "DATEFORMAT 'auto'",
        "COMPUPDATE ON",
        "TRUNCATECOLUMNS",
    ]
    assert add_default_copy_options(["DATEFORMAT 'other'", "NULL AS 'blah'"]) == [
        "DATEFORMAT 'other'",
        "NULL AS 'blah'",
        "COMPUPDATE ON",
        "TRUNCATECOLUMNS",
    ]


def test_combine_copy_options_reference_parity():
    assert combine_copy_options(add_default_copy_options()) == (
        "DATEFORMAT 'auto' COMPUPDATE ON TRUNCATECOLUMNS"
    )


def test_copy_statement_parquet_and_csv():
    stmt = copy_statement("ingest.t", "s3://b/stage/", iam_role="arn:aws:iam::1:role/r")
    assert stmt == (
        "COPY ingest.t FROM 's3://b/stage/' IAM_ROLE 'arn:aws:iam::1:role/r' "
        "FORMAT AS PARQUET"
    )
    csv_stmt = copy_statement(
        "ingest.t", "s3://b/stage/", iam_role="r", file_format="CSV"
    )
    assert "DATEFORMAT 'auto' COMPUPDATE ON TRUNCATECOLUMNS" in csv_stmt


def test_copy_statement_credential_validation():
    with pytest.raises(ValueError):
        copy_statement("t", "s3://b/")
    with pytest.raises(ValueError):
        copy_statement("t", "s3://b/", iam_role="r", access_key="a", secret_key="s")
    stmt = copy_statement("t", "s3://b/", access_key="a", secret_key="s")
    assert "aws_access_key_id=a" in stmt


def test_unload_statement_escapes_quotes():
    stmt = unload_statement("SELECT * FROM t WHERE x = 'y'", "s3://b/out/", "role")
    assert "('SELECT * FROM t WHERE x = ''y''')" in stmt
    assert stmt.endswith("PARALLEL ON")
    assert "PARALLEL OFF" in unload_statement("q", "s3://b/", "r", parallel=False)
