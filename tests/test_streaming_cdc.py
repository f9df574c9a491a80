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


def test_streaming_scd2_maintain(spark, tmp_path):
    from datetime import date
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_scd2_maintain,
    )

    src = str(tmp_path / "scd2_src")
    schema = "k long, attr string, ts timestamp"
    batch = [
        (1, "v1-old", datetime(2024, 3, 1, 9, 0, 0)),
        (1, "v1-new", datetime(2024, 3, 1, 10, 0, 0)),  # latest per key wins
        (4, "fresh", datetime(2024, 3, 1, 10, 0, 0)),
    ]
    spark.createDataFrame(batch, schema).write.mode("overwrite").parquet(src)

    dim_schema = (
        "k long, attr string, effective_from date, effective_to date, "
        "is_current boolean"
    )
    dim = spark.createDataFrame(
        [
            (1, "v0", date(2020, 1, 1), date(9999, 12, 31), True),
            (2, "keep", date(2020, 1, 1), date(9999, 12, 31), True),
        ],
        dim_schema,
    )
    result = {}

    def sink(merged, epoch_id):
        result["rows"] = {
            (r["k"], r["attr"], r["is_current"]): r for r in merged.collect()
        }

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_scd2_maintain(
        stream,
        pk_cols=["k"],
        tracked_cols=["attr"],
        ts_col="ts",
        load_dim=lambda: dim,
        sink=sink,
        checkpoint_dir=str(tmp_path / "scd2_ckpt"),
        query_name="t_scd2",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = result["rows"]
    # key 1: old row closed at batch date, new row opened with LATEST value
    assert rows[(1, "v0", False)]["effective_to"] == date(2024, 3, 1)
    assert rows[(1, "v1-new", True)]["effective_from"] == date(2024, 3, 1)
    assert (1, "v1-old", True) not in rows
    # key 2 absent from batch: stays current (partial snapshot, no delete)
    assert (2, "keep", True) in rows
    # key 4: inserted
    assert rows[(4, "fresh", True)]["effective_to"] == date(9999, 12, 31)
    assert len(rows) == 4


def test_streaming_hll_profile_matches_full_rescan(spark, tmp_path):
    from datapipelines_essentials_python_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_hll_profile,
    )

    src = str(tmp_path / "hll_src")
    schema = "g string, user_id long"
    batch_rows = [("a", i) for i in range(200, 400)] + [("b", i) for i in range(50)]
    spark.createDataFrame(batch_rows, schema).write.mode("overwrite").parquet(src)

    history = spark.createDataFrame(
        [("a", i) for i in range(300)], schema  # overlaps batch on 200-299
    )
    served = {"regs": hll_registers(history, "user_id", ["g"])}
    out = {}

    def sink(merged, epoch_id):
        out["est"] = {
            r["g"]: r["hll_est"]
            for r in hll_estimate(merged, ["g"]).collect()
        }

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_hll_profile(
        stream,
        item_col="user_id",
        group_cols=["g"],
        load_registers=lambda: served["regs"],
        sink=sink,
        checkpoint_dir=str(tmp_path / "hll_ckpt"),
        query_name="t_hll",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # merged streaming profile must equal a full rescan of history ∪ batch
    full = spark.createDataFrame(
        [("a", i) for i in range(400)] + [("b", i) for i in range(50)], schema
    )
    expect = {
        r["g"]: r["hll_est"]
        for r in hll_estimate(
            hll_registers(full, "user_id", ["g"]), ["g"]
        ).collect()
    }
    assert out["est"] == expect


def test_streaming_drift_monitor_matches_full_rescan(spark, tmp_path):
    from pyspark.sql import functions as F
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_drift_monitor,
    )

    src = str(tmp_path / "drift_src")
    schema = "v double"
    # two files → two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame([(float(x),) for x in (5, 15, 25)], schema).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame([(float(x),) for x in (35, 45, 5)], schema).write.mode(
        "append"
    ).parquet(src)

    reference = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 10)], "bucket int, n_ref long"
    )
    state = {"counts": None}

    def sink(merged, epoch_id):
        state["counts"] = spark.createDataFrame(
            merged.select("bucket", "n_cur").collect(), "bucket int, n_cur long"
        )
        state["last"] = {r["bucket"]: r.asDict() for r in merged.collect()}

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_drift_monitor(
        stream,
        value_col="v",
        edges=[10.0, 20.0, 30.0],
        load_counts=lambda: state["counts"],
        sink=sink,
        reference_counts=reference,
        checkpoint_dir=str(tmp_path / "drift_ckpt"),
        query_name="t_drift",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # maintained counts must equal one full histogram over all rows
    # values: 5,5 → b0; 15 → b1; 25 → b2; 35,45 → b3
    final = state["last"]
    assert {b: r["n_cur"] for b, r in final.items()} == {0: 2, 1: 1, 2: 1, 3: 2}
    # chi2 columns present and reference mass carried through
    assert all(r["n_ref"] == 10 for r in final.values())
    assert all(r["chi2_contrib"] >= 0.0 for r in final.values())


def test_streaming_cms_topk_matches_full_rescan(spark, tmp_path):
    from datapipelines_essentials_python_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_cms_topk,
    )

    src = str(tmp_path / "cms_src")
    schema = "item string"
    spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 3, schema
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [("a",)] * 5 + [("c",)] * 7, schema
    ).write.mode("append").parquet(src)

    state = {"sketch": None}

    def sink(merged, epoch_id):
        state["sketch"] = spark.createDataFrame(
            merged.collect(), "row_idx int, bucket long, cnt long"
        )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = streaming_cms_topk(
        stream,
        item_col="item",
        load_sketch=lambda: state["sketch"],
        sink=sink,
        checkpoint_dir=str(tmp_path / "cms_ckpt"),
        query_name="t_cms",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # streaming-maintained sketch must estimate EXACTLY like one built
    # from a full rescan (linearity), for every observed item
    items = spark.createDataFrame([("a",), ("b",), ("c",)], schema)
    full = spark.createDataFrame([("a",)] * 15 + [("b",)] * 3 + [("c",)] * 7, schema)
    got = {
        r["item"]: r["cms_est"]
        for r in cms_estimate(state["sketch"], items, "item").collect()
    }
    want = {
        r["item"]: r["cms_est"]
        for r in cms_estimate(cms_build(full, "item"), items, "item").collect()
    }
    assert got == want
    # CMS never under-counts
    assert got["a"] >= 15 and got["b"] >= 3 and got["c"] >= 7


def test_idempotent_sink_skips_replayed_epochs(spark):
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        idempotent_sink,
    )

    committed, writes = set(), []
    wrapped = idempotent_sink(
        process=lambda df, eid: writes.append((eid, df.count())),
        load_committed=lambda: committed,
        mark_committed=committed.add,
    )
    df = spark.range(3)
    wrapped(df, 0)
    wrapped(df, 1)
    wrapped(df, 0)  # crash-replay of epoch 0 → must be a no-op
    assert writes == [(0, 3), (1, 3)]
    assert committed == {0, 1}


def test_streaming_quality_admission_matches_batch_gate(spark, tmp_path):
    from pyspark.sql import functions as F
    from datapipelines_essentials_python_spark.operators.text import (
        logit_quality_score,
    )
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_quality_admission,
    )

    src = str(tmp_path / "adm_src")
    schema = "doc_id long, text string"
    rows = [
        (1, "the cat and the dog went to a house in the town"),
        (2, "zzz qqq xxx yyy"),
        (3, "the the the of of and and to to a a in in is is"),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    w = {"stopword_ratio": 2.0, "uniq_token_ratio": 1.0}
    got = {}

    def sink(df, eid):
        got.update({r["doc_id"]: r["quality_score"] for r in df.collect()})

    q = streaming_quality_admission(
        spark.readStream.schema(schema).parquet(src),
        text_col="text",
        weights=w,
        sink=sink,
        bias=-1.0,
        threshold=0.5,
        checkpoint_dir=str(tmp_path / "adm_ckpt"),
        query_name="t_adm",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # streaming admission ≡ the batch gate on the same rows
    batch = (
        spark.createDataFrame(rows, schema)
        .withColumn(
            "quality_score",
            F.round(logit_quality_score("text", w, bias=-1.0), 6),
        )
        .where(F.col("quality_score") >= 0.5)
    )
    want = {r["doc_id"]: r["quality_score"] for r in batch.collect()}
    assert got == want and len(want) > 0


def test_streaming_histogram_profile_matches_full_rescan(spark, tmp_path):
    from datapipelines_essentials_python_spark.operators.sketches import (
        histogram_quantile,
        value_histogram,
    )
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_histogram_profile,
    )

    src = str(tmp_path / "hist_src")
    schema = "g string, v double"
    batch1 = [("a", float(i)) for i in range(50)] + [("b", 5.0)] * 10
    batch2 = [("a", float(i)) for i in range(50, 100)] + [("b", 95.0)] * 10
    spark.createDataFrame(batch1, schema).write.mode("overwrite").parquet(src)
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)

    state = {"bins": None}

    def sink(merged, epoch_id):
        state["bins"] = spark.createDataFrame(
            merged.collect(), "g string, bin int, cnt long"
        )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = streaming_histogram_profile(
        stream,
        value_col="v",
        group_cols=["g"],
        load_bins=lambda: state["bins"],
        sink=sink,
        n_bins=64,
        lo=0.0,
        hi=100.0,
        checkpoint_dir=str(tmp_path / "hist_ckpt"),
        query_name="t_hist",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # streaming-maintained bins must equal a full-rescan histogram
    # (linearity), and therefore yield identical quantile estimates
    full = spark.createDataFrame(batch1 + batch2, schema)
    full_bins = value_histogram(full, ["g"], "v", 64, 0.0, 100.0)
    got = {(r["g"], r["bin"]): r["cnt"] for r in state["bins"].collect()}
    want = {(r["g"], r["bin"]): r["cnt"] for r in full_bins.collect()}
    assert got == want
    est_s = {
        (r["g"], r["q"]): r["est"]
        for r in histogram_quantile(state["bins"], ["g"], [0.5, 0.9], 64, 0.0, 100.0).collect()
    }
    est_f = {
        (r["g"], r["q"]): r["est"]
        for r in histogram_quantile(full_bins, ["g"], [0.5, 0.9], 64, 0.0, 100.0).collect()
    }
    assert est_s == est_f


def test_streaming_transition_profile_matches_full_rescan(spark, tmp_path):
    """Transition counts are NOT batch-additive: u1's sequence spans the
    batch boundary (…→c | c→d→…), so the maintained matrix must add the
    boundary pair from the served last-state table. The final counts must
    equal the batch twin run over the full history."""
    from datapipelines_essentials_python_spark.operators.relational import (
        transition_counts,
    )
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_transition_profile,
    )

    src = str(tmp_path / "trans_src")
    schema = "user string, seq long, state string"
    batch1 = [("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u2", 1, "a")]
    batch2 = [("u1", 4, "d"), ("u1", 5, "b"), ("u2", 2, "b"), ("u3", 1, "x")]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    import time

    time.sleep(1.1)  # distinct mtimes -> deterministic file-batch order
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    state = {"counts": None, "last": None}

    def sink(counts, last, epoch_id):
        state["counts"] = spark.createDataFrame(
            counts.collect(), "from_state string, to_state string, n long"
        )
        state["last"] = spark.createDataFrame(
            last.collect(), "key string, last_state string"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_transition_profile(
        stream,
        key_col="user",
        ts_col="seq",
        state_col="state",
        load_state=lambda: (state["counts"], state["last"]),
        sink=sink,
        checkpoint_dir=str(tmp_path / "trans_ckpt"),
        query_name="t_trans",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_counts(full, "user", ["seq"], "state").collect()
    }
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in state["counts"].collect()
    }
    assert got == want
    assert ("c", "d") in got  # the cross-batch boundary pair specifically
    last = {r["key"]: r["last_state"] for r in state["last"].collect()}
    assert last == {"u1": "b", "u2": "b", "u3": "x"}


def test_streaming_novelty_admission_matches_batch_rescan(spark, tmp_path):
    """Multi-batch streaming novelty == batch ngram_novelty over the
    concatenated input (arrival order == id order): the seen-fp store
    carries first-occurrence across micro-batches, and within a batch
    the min-id doc claims the window."""
    from datapipelines_essentials_python_spark.operators.chunking import (
        ngram_novelty,
    )
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_novelty_admission,
    )

    schema = "doc_id long, text string"
    b1 = [
        (1, "w1 w2 w3 w4 tail one"),
        (2, "w1 w2 w3 w4 other suffix"),   # shares windows with doc 1
    ]
    b2 = [
        (3, "w1 w2 w3 w4 tail one"),       # full repeat of doc 1 -> low novelty
        (4, "completely fresh phrasing never seen anywhere"),
    ]
    src = str(tmp_path / "nov_src")
    # two files -> maxFilesPerTrigger=1 forces two micro-batches in order
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    scored = {}

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            scored[r["doc_id"]] = (
                r["n_windows"], r["n_novel"], r["novelty_ratio"],
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_novelty_admission(
        stream,
        seen_fps_path=str(tmp_path / "nov_fps"),
        id_col="doc_id",
        text_col="text",
        sink=sink,
        window=3,
        novelty_floor=0.0,    # admit all -> sink sees every score
        checkpoint_dir=str(tmp_path / "nov_ckpt"),
        query_name="t_nov",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = spark.createDataFrame(b1 + b2, schema)
    expect = {
        r["doc_id"]: (r["n_windows"], r["n_novel"], r["novelty_ratio"])
        for r in ngram_novelty(full, window=3).collect()
    }
    # Files may arrive as one batch per file but order by name — the
    # writes above land lexicographically ordered, so ids arrive in
    # order; the equality below is the whole contract.
    assert scored == expect
    assert scored[3][2] < 0.5  # the repeat scored as mostly stale


def test_streaming_novelty_admission_gate_filters(spark, tmp_path):
    from datapipelines_essentials_python_spark.streaming.cdc_stream import (
        streaming_novelty_admission,
    )

    schema = "doc_id long, text string"
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),          # exact repeat -> novelty 0
        (3, "x y z p q r"),
    ]
    src = str(tmp_path / "nov2_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    admitted = []

    def sink(batch_df, epoch_id):
        admitted.extend(r["doc_id"] for r in batch_df.collect())

    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_novelty_admission(
        stream,
        seen_fps_path=str(tmp_path / "nov2_fps"),
        id_col="doc_id",
        text_col="text",
        sink=sink,
        window=3,
        novelty_floor=0.5,
        checkpoint_dir=str(tmp_path / "nov2_ckpt"),
        query_name="t_nov2",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(admitted) == [1, 3]
