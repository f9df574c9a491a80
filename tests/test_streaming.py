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


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    from datapipelines_essentials_python_spark.streaming.stateful import (
        stateful_running_totals,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "stateful_src")
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(300)
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stateful_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["n_events"], round(r["total_value"], 4))
            for r in spark.sql("SELECT * FROM running_totals").collect()
        }
        want = {
            r["user_id"]: (r["n"], round(r["tv"], 4))
            for r in batch.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_stateful_session_counts_emits_on_timeout(spark, sf_dir, tmp_path):
    """Timeout-driven session closure, bounded wall-clock: availableNow
    keeps evaluating processing-time timeouts after the data batch, so
    closed sessions appear in the sink within the wait window."""
    import time

    from datapipelines_essentials_python_spark.streaming.stateful import (
        stateful_session_counts,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "sess_src")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .where(F.col("user_id") < 5)
        .limit(50)
        .write.mode("overwrite").parquet(src)
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stateful_session_counts(stream, gap_ms=1_000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = 0
        while time.time() < deadline and rows < 1:
            q.awaitTermination(5)
            if q.exception() is not None:
                raise AssertionError(q.exception())
            rows = spark.sql("SELECT * FROM sessions_out").count()
        assert q.exception() is None
        assert rows >= 1  # at least one session closed via timeout
    finally:
        q.stop()
