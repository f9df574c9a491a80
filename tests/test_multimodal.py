"""Multimodal binary-column plumbing (driver-mandated; decode stubbed)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators import multimodal as mm


@pytest.fixture
def media(spark):
    rows = [
        (1, "image", b"fake-image-bytes"),
        (2, "video", b"fake-video-bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, content binary")
    return df.select(
        "media_id",
        "media_type",
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(F.col("media_type") == "video", F.lit(3500)).cast("long").alias("duration_ms"),
        "content",
    )


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"x", "image")


def test_extract_features_with_fake_decoder(spark, media):
    out = mm.extract_features(media, decoder=mm.fake_features).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == len(b"fake-image-bytes")
    assert by_id[1]["sha256"] == hashlib.sha256(b"fake-image-bytes").hexdigest()
    assert len(by_id[1]["features"]) == mm.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in by_id[1]["features"])
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in mm.extract_features(media, decoder=mm.fake_features).collect()}
    assert again[1] == by_id[1]["features"]


def test_extract_features_default_decoder_fails_loudly(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.extract_features(media).collect()


def test_frame_sample_plan(spark, media):
    frames = mm.frame_sample_plan(media, every_ms=1000).collect()
    # only the video row; 3500ms at 1000ms → ts 0,1000,2000,3000
    assert {r["frame_ts_ms"] for r in frames} == {0, 1000, 2000, 3000}
    assert {r["media_id"] for r in frames} == {2}


def test_documents_as_media_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    media = mm.documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == [f.name for f in mm.MEDIA_SCHEMA.fields]


def test_chunk_text_media(spark):
    from datapipelines_essentials_python_spark.operators.multimodal import chunk_text_media
    import hashlib

    df = spark.createDataFrame(
        [(1, "a" * 600), (2, "short"), (3, "")],
        "media_id long, text string",
    )
    rows = chunk_text_media(df, chunk_chars=256).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [r["n_chars"] for r in sorted(by_id[1], key=lambda r: r["chunk_index"])] == [256, 256, 88]
    assert len(by_id[2]) == 1 and by_id[2][0]["n_bytes"] == 5
    # empty payload still yields one (empty) chunk
    assert len(by_id[3]) == 1 and by_id[3][0]["sha256"] == hashlib.sha256(b"").hexdigest()


def test_parse_image_header_png_jpeg():
    import struct

    from datapipelines_essentials_python_spark.operators.multimodal import (
        parse_image_header,
    )

    # minimal PNG: signature + IHDR with 640x480
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x02\x00\x00\x00"
    )
    assert parse_image_header(png) == ("png", 640, 480)

    # minimal JPEG: SOI + APP0 stub + SOF0 with 1024x768 (h then w)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", 768, 1024
    ) + b"\x03" + b"\x00" * 9
    jpeg = b"\xff\xd8" + app0 + sof0
    assert parse_image_header(jpeg) == ("jpeg", 1024, 768)

    assert parse_image_header(b"notanimage") == ("unknown", 0, 0)
    assert parse_image_header(b"") == ("unknown", 0, 0)


def test_image_header_stats_distributed(spark):
    import struct

    from datapipelines_essentials_python_spark.operators.multimodal import (
        image_header_stats,
    )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 320, 200)
        + b"\x08\x02\x00\x00\x00"
    )
    rows = [(1, bytearray(png)), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in image_header_stats(df).collect()}
    assert out[1]["format"] == "png" and out[1]["width"] == 320
    assert out[1]["height"] == 200 and out[1]["n_bytes"] == len(png)
    assert out[2]["format"] == "unknown" and out[2]["n_bytes"] == 4


def test_parse_image_header_jpeg_padding_and_sos():
    """Spec-legal 0xFF fill bytes before markers are skipped, and the scan
    stops at SOS/EOI instead of misreading entropy-coded data."""
    import struct

    from datapipelines_essentials_python_spark.operators.multimodal import (
        parse_image_header,
    )

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 600, 800) + b"\x03" + b"\x00" * 9
    )
    # padding runs of 0xFF before both segments
    padded = b"\xff\xd8" + b"\xff\xff\xff" + app0[1:] + b"\xff\xff" + sof0[1:]
    assert parse_image_header(padded) == ("jpeg", 800, 600)

    # SOS before any SOF: stop cleanly (no bogus read of entropy data)
    sos = b"\xff\xda" + struct.pack(">H", 12) + b"\x03" + b"\x00" * 9
    entropy = b"\xff\xc0\x99\x99" * 4  # SOF-looking bytes INSIDE scan data
    no_sof = b"\xff\xd8" + app0 + sos + entropy + b"\xff\xd9"
    assert parse_image_header(no_sof) == ("unknown", 0, 0)

    # EOI immediately: unknown, not a crash
    assert parse_image_header(b"\xff\xd8\xff\xd9") == ("unknown", 0, 0)
