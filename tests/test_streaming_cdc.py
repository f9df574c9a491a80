"""Streaming CDC upsert: watermark+dedup → foreachBatch merge reusing the
batch merge_cdc operator (streaming/cdc_stream.py)."""

from datetime import datetime

from datapipelines_essentials_python_spark.operators.cdc import merge_cdc, with_hashcode
from datapipelines_essentials_python_spark.streaming.cdc_stream import streaming_cdc_upsert


def test_streaming_cdc_upsert_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "id long, val string, ts timestamp"
    rows = [
        (1, "a", datetime(2024, 1, 1, 10, 0, 0)),
        (1, "a", datetime(2024, 1, 1, 10, 0, 0)),  # exact dup → deduped in-stream
        (2, "b", datetime(2024, 1, 1, 10, 1, 0)),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    # serving store seeded with an older version of id=1 and an id=3
    store = {"df": with_hashcode(
        spark.createDataFrame(
            [(1, "old", datetime(2024, 1, 1, 9, 0, 0)), (3, "c", datetime(2024, 1, 1, 9, 0, 0))],
            schema,
        ),
        ["id", "val"],
    )}
    merged_batches = []

    def sink(batch_df, epoch_id):
        delta = merge_cdc(
            store["df"], with_hashcode(batch_df, ["id", "val"]), ["id"], order_cols=["ts"]
        )
        merged_batches.append({(r["id"], r["val"]) for r in delta.collect()})

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_cdc_upsert(
        stream,
        pk_cols=["id"],
        order_cols=["ts"],
        ts_col="ts",
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="t_cdc",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(merged_batches) >= 1
    all_delta = set().union(*merged_batches)
    # id=1 changed vs store, id=2 is new, id=3 untouched
    assert all_delta == {(1, "a"), (2, "b")}


def test_streaming_incremental_dedup_admits_only_new(spark, tmp_path):
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_incremental_dedup,
    )

    src = str(tmp_path / "docs_src")
    schema = "doc_id long, text string"
    batch_rows = [
        (11, "alpha beta gamma delta epsilon"),   # dup of corpus → dropped
        (13, "totally fresh new document text"),
        (15, "totally fresh new document text"),  # dup within batch → dropped
        (17, "another brand new unique doc here"),
    ]
    spark.createDataFrame(batch_rows, schema).write.mode("overwrite").parquet(src)

    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        schema,
    )
    admitted = []

    def sink(batch_df, epoch_id):
        admitted.extend(r["doc_id"] for r in batch_df.collect())

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_incremental_dedup(
        stream,
        corpus,
        "doc_id",
        "text",
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(admitted) == [13, 17]


def test_streaming_incremental_dedup_precomputed_fps(spark, tmp_path):
    from datapipelines_essentials_python_spark.operators.text import fingerprint
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_incremental_dedup,
    )

    src = str(tmp_path / "docs_src2")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(21, "alpha beta gamma delta epsilon"), (23, "never seen before text")],
        schema,
    ).write.mode("overwrite").parquet(src)

    # corpus served as a fingerprint-only table (the scale shape)
    corpus_fps = (
        spark.createDataFrame([(0, "alpha beta gamma delta epsilon")], schema)
        .select(fingerprint("text").alias("fp"))
    )
    admitted = []

    def sink(batch_df, epoch_id):
        admitted.extend(r["doc_id"] for r in batch_df.collect())

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_incremental_dedup(
        stream, corpus_fps, "doc_id", "text", sink,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert admitted == [23]
