"""Structured Streaming upgrade path (SURVEY §2.9 extension)."""

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.streaming.cdc_stream import windowed_event_counts


def test_windowed_event_counts_memory_sink(spark, sf_dir, tmp_path):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "stream_src")
    # stage a small deterministic slice of events as the stream source
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(200)
        .write.mode("overwrite").parquet(src)
    )
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, window_duration="10 minutes", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM win_counts")
        assert out.count() > 0
        assert set(out.columns) == {"window_start", "window_end", "event_type", "n", "total_value"}
        total = out.agg(F.sum("n")).collect()[0][0]
        assert total == 200
    finally:
        q.stop()
