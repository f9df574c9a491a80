"""Structured Streaming upgrade path (SURVEY §2.9 extension)."""

import pytest
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.streaming.cdc_stream import windowed_event_counts
from datapipelines_essentials_python_spark.tables import load_table


def test_windowed_event_counts_memory_sink(spark, sf_dir, tmp_path):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "stream_src")
    # stage a small deterministic slice of events as the stream source
    (
        load_table(spark, sf_dir, "events")
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
        load_table(spark, sf_dir, "events")
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
        load_table(spark, sf_dir, "events")
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


def _staged_events(spark, sf_dir, tmp_path, name, n=300, dup=False):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / name)
    batch = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(n)
    )
    if dup:
        batch = batch.unionByName(batch.limit(n // 3))
    batch.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(schema).parquet(src), batch


def test_streaming_exact_dedup_bounded_state(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark drops the 100 duplicated rows and the
    plan carries the state-bounding watermark."""
    from datapipelines_essentials_python_spark.streaming.windows import (
        streaming_exact_dedup,
    )

    stream, batch = _staged_events(spark, sf_dir, tmp_path, "dedup_src", dup=True)
    deduped = streaming_exact_dedup(stream, ["event_id"], "ts", watermark="2 hours")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM stream_dedup").collect()[0]
        want = batch.select("event_id").distinct().count()
        assert got["n"] == got["d"] == want
    finally:
        q.stop()


def test_streaming_session_windows_matches_batch(spark, sf_dir, tmp_path):
    """The streaming session_window aggregation equals the same operator
    run in batch over the staged slice (complete mode: all sessions)."""
    from datapipelines_essentials_python_spark.streaming.windows import (
        streaming_session_windows,
    )

    stream, batch = _staged_events(spark, sf_dir, tmp_path, "sess_win_src")
    q = (
        streaming_session_windows(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
            for r in spark.sql("SELECT * FROM stream_sessions").collect()
        }
        want_df = (
            batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n_events")
        )
        want = {(r["user_id"], r["s"], r["e"]): r["n_events"] for r in want_df.collect()}
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Click→any-event attribution within 30 minutes: the stream-stream
    interval join matches the equivalent batch join on the staged slice."""
    from datapipelines_essentials_python_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    base = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(400)
    )
    clicks_src = str(tmp_path / "clicks_src")
    acts_src = str(tmp_path / "acts_src")
    clicks_b = base.where(F.col("event_type") == "click")
    acts_b = base.where(F.col("event_type") != "click")
    clicks_b.write.mode("overwrite").parquet(clicks_src)
    acts_b.write.mode("overwrite").parquet(acts_src)

    joined = stream_stream_interval_join(
        spark.readStream.schema(schema).parquet(clicks_src),
        spark.readStream.schema(schema).parquet(acts_src),
        key_col="user_id",
        within="30 minutes",
        watermark="2 hours",
    )
    q = (
        joined.select("l_event_id", "r_event_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["l_event_id"], r["r_event_id"])
            for r in spark.sql("SELECT * FROM attrib").collect()
        }
        want = {
            (r["l"], r["r"])
            for r in clicks_b.alias("c")
            .join(
                acts_b.alias("a"),
                (F.col("c.user_id") == F.col("a.user_id"))
                & (F.col("a.ts") >= F.col("c.ts"))
                & (F.col("a.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 minutes")),
            )
            .select(F.col("c.event_id").alias("l"), F.col("a.event_id").alias("r"))
            .collect()
        }
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_streaming_mad_chart_matches_batch_rescan(spark, tmp_path):
    """Multi-batch streaming control chart == batch rolling_mad_anomaly
    over the concatenated input (in-order daily arrival): same pure
    BIGINT ×2/×4 decision, emitted incrementally, with state bounded to
    the trailing frame."""
    from datapipelines_essentials_python_spark.operators.relational import (
        rolling_mad_anomaly,
    )
    from datapipelines_essentials_python_spark.streaming.stateful import (
        streaming_mad_control_chart,
    )

    schema = "key string, day_idx long, v long"
    b1 = [("k", 0, 100), ("k", 1, 110), ("k", 2, 90), ("q", 0, 5)]
    b2 = [("k", 3, 105), ("k", 4, 5000), ("q", 1, 6)]
    b3 = [("k", 5, 95), ("k", 8, 102), ("q", 9, 500)]
    src = str(tmp_path / "mad_src")
    for b in (b1, b2, b3):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_mad_control_chart(stream, "key", "day_idx", "v")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("mad_chart")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["key"], r["day_idx"]): (r["med_x2"], r["mad_x4"], r["is_anomaly"])
            for r in spark.sql("SELECT * FROM mad_chart").collect()
        }
    finally:
        q.stop()

    batch = spark.createDataFrame(b1 + b2 + b3, schema)
    want = {
        (r["key"], r["day_idx"]): (r["med_x2"], r["mad_x4"], r["is_anomaly"])
        for r in rolling_mad_anomaly(batch, "key", "day_idx", "v").collect()
    }
    assert got == want
    assert got[("k", 4)][2] is True  # the spike flags incrementally
    # eviction really bounds the state: day 8's frame excluded days 0-1,
    # so its verdict matches the batch RANGE frame, proving old entries
    # were dropped, not reused
    assert got[("k", 8)] == want[("k", 8)]


def test_streaming_staleness_matches_batch_lag(spark, tmp_path):
    """Multi-batch heartbeat monitor == batch lag over the concatenated
    input: same integer gaps, same stale flags, first event NULL-gap;
    state survives across micro-batches (the batch-2 gap for 'k' spans
    the batch boundary)."""
    from pyspark.sql import Window as W

    from datapipelines_essentials_python_spark.streaming.stateful import (
        streaming_staleness_monitor,
    )

    schema = "key string, ts_us long"
    b1 = [("k", 1_000_000), ("k", 2_000_000), ("q", 10_000_000)]
    b2 = [("k", 400_000_000), ("q", 11_000_000)]
    b3 = [("k", 401_000_000), ("q", 900_000_000)]
    src = str(tmp_path / "stale_src")
    for b in (b1, b2, b3):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_staleness_monitor(stream, "key", "ts_us", 300_000_000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stale_mon")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["key"], r["ts_us"]): (r["gap_us"], r["is_stale"])
            for r in spark.sql("SELECT * FROM stale_mon").collect()
        }
    finally:
        q.stop()

    batch = spark.createDataFrame(b1 + b2 + b3, schema)
    w = W.partitionBy("key").orderBy("ts_us")
    want = {
        (r["key"], r["ts_us"]): (r["gap_us"], r["is_stale"])
        for r in batch.withColumn(
            "gap_us", F.col("ts_us") - F.lag("ts_us").over(w)
        )
        .withColumn(
            "is_stale",
            F.coalesce(F.col("gap_us") > 300_000_000, F.lit(False)),
        )
        .collect()
    }
    assert got == want
    # the cross-boundary gap actually fired
    assert got[("k", 400_000_000)] == (398_000_000, True)
    assert got[("k", 1_000_000)] == (None, False)
