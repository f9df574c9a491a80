"""Physical-plan assertions: the properties that make queries scale.

Checks the *plans*, not just the results: filters and column pruning must
reach the parquet scan, fixed-size dims must broadcast, and nothing in the
headline relational path may fall out of the JVM into row-at-a-time Python.
"""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_dsl_pushdown(spark):
    plan = plan_of(entry_mod.queries()["filter_dsl_scan"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # every DSL predicate lands in the scan
    for frag in ("EqualTo(l_returnflag,R)", "GreaterThanOrEqual(l_quantity,30.0)"):
        assert frag in plan, f"missing pushed filter {frag}"
    # column pruning: untouched wide columns never read
    assert "l_extendedprice" not in plan


def test_q1_prunes_and_pushes(spark):
    plan = plan_of(entry_mod.queries()["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "l_partkey" not in plan  # pruned
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan


def test_q5_broadcasts_dims(spark):
    plan = plan_of(entry_mod.queries()["q5_nation_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_no_python_in_relational_headline(spark):
    qs = entry_mod.queries()
    for name in (
        "q3_top_revenue_orders", "q6_revenue_delta", "q13_custdist",
        "q14_promo_revenue", "q17_small_qty_revenue", "q18_large_orders",
        "agg_dispatch", "window_functions", "cdc_merge", "sessionize",
        "events_by_day", "having_clause", "corr_stats", "histogram_profile",
        "stratified_sample_docs", "lang_id", "text_quality", "token_stats",
        "doc_fingerprint", "simhash_fp",
        "q9_product_profit", "q11_important_parts", "q12_shipping_delay",
        "q16_supplier_count", "q20_excess_shippers", "pii_scrub",
        "decontamination", "dq_file_completeness",
    ):
        plan = plan_of(qs[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} fell back to Python UDFs"
        assert "ArrowEvalPython" not in plan, f"{name} uses Python (Arrow) unexpectedly"


def test_q17_broadcasts_peragg(spark):
    # the decorrelated per-part aggregate must broadcast back to the fact
    plan = plan_of(entry_mod.queries()["q17_small_qty_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_q6_single_scan_no_join(spark):
    plan = plan_of(entry_mod.queries()["q6_revenue_delta"](spark, SF_DIR))
    assert "Join" not in plan
    # one table only (formatted explain prints each node twice: tree + detail)
    assert "lineitem.parquet" in plan
    for other in ("orders.parquet", "customer.parquet", "part.parquet"):
        assert other not in plan


def test_zorder_layout_is_narrow(spark):
    # pure per-row bit arithmetic after a pruned scan: no shuffle at all
    plan = plan_of(entry_mod.queries()["zorder_layout"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_bloom_join_semi_joins(spark):
    plan = plan_of(entry_mod.queries()["bloom_join_orders"](spark, SF_DIR))
    assert plan.count("LeftSemi") >= 3  # one per hash function
    assert "BatchEvalPython" not in plan


def test_training_pipeline_stays_jvm_side(spark):
    for name in ("training_pipeline_e2e", "training_pipeline_v2"):
        plan = plan_of(entry_mod.queries()[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_weighted_sample_is_pure_narrow(spark):
    # importance sampling must be a scan-speed filter: zero exchanges
    plan = plan_of(entry_mod.queries()["weighted_sample_docs"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_q21_uses_semi_and_anti_joins(spark):
    # EXISTS → LeftSemi, NOT EXISTS → LeftAnti; no cartesian fallbacks
    plan = plan_of(entry_mod.queries()["q21_waiting_suppliers"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_q2_broadcasts_dims(spark):
    # supplier/nation/region chain and the part filter must broadcast
    plan = plan_of(entry_mod.queries()["q2_min_cost_supplier"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_q4_is_semi_join(spark):
    plan = plan_of(entry_mod.queries()["q4_priority_exists"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan


def test_neardup_queries_are_equi_joins(spark):
    # the two former all-pairs baselines must stay on their bucketed paths:
    # an equi-join (lang block / SRP bucket), never a cartesian product
    qs = entry_mod.queries()
    for name in ("ngram_jaccard", "embedding_neardup"):
        plan = plan_of(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, f"{name} degraded to all-pairs"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} degraded to all-pairs"


def test_ols_single_aggregation(spark):
    plan = plan_of(entry_mod.queries()["ols_fit"](spark, SF_DIR))
    # one scan, one partial+final hash aggregate pair, nothing else heavy
    assert "HashAggregate" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_text_normalize_is_pure_narrow(spark):
    # normalization is a scan-speed projection: no exchange, no Python
    plan = plan_of(entry_mod.queries()["text_normalize"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_new_curation_queries_stay_jvm_side(spark):
    qs = entry_mod.queries()
    for name in (
        "vocab_coverage",
        "tfidf_top_terms",
        "incremental_dedup",
        "curriculum_bins",
        "domain_balance",
        "global_shuffle_order",
    ):
        plan = plan_of(qs[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_sql_api_revenue_matches_dataframe_plan_shape(spark):
    # the SQL front door compiles to the same physical strategy the
    # DataFrame API gets: broadcast dim joins, partial hash aggregation
    plan = plan_of(entry_mod.queries()["sql_api_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan


def test_curriculum_bins_broadcasts_boundaries(spark):
    # the quantile boundary table is a 1-row broadcast, not a sort or a
    # single-partition ntile window
    plan = plan_of(entry_mod.queries()["curriculum_bins"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan


def test_incremental_dedup_is_anti_join(spark):
    plan = plan_of(entry_mod.queries()["incremental_dedup"](spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_single_shuffle_join(spark):
    plan = plan_of(entry_mod.queries()["snapshot_diff"](spark, SF_DIR))
    # full-outer on the key: sort-merge join, no cartesian/nested-loop
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_rolling_mean_aggregates_before_window(spark):
    plan = plan_of(entry_mod.queries()["rolling_events_7d"](spark, SF_DIR))
    # the RANGE window must run over the daily PRE-AGGREGATE (keys × days),
    # never over raw events: HashAggregate appears below the Window
    assert "HashAggregate" in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_iqr_broadcasts_bounds(spark):
    plan = plan_of(entry_mod.queries()["iqr_outlier_events"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_bloom_decontamination_broadcasts_filter(spark):
    """The bloom filter is a single-row BITMAP (map of 64-bit words)
    broadcast into a one-pass probe projection: one BroadcastExchange, no
    shuffle join, no shingle explode on the corpus side, JVM-side only."""
    plan = plan_of(entry_mod.queries()["decontamination_bloom"](spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    # the corpus side must NOT explode its shingles: the only Generate
    # (explode) nodes belong to the tiny eval side feeding the bitmap —
    # 2 nodes (shingles, bit pairs), each printed twice by formatted explain
    assert plan.count("Generate") <= 4


def test_semantic_dedup_no_python_no_cartesian(spark):
    """Cluster-scoped pairs: the only nested-loop is the broadcast centroid
    assignment (the IVF pattern); no unbounded CartesianProduct, no Python."""
    plan = plan_of(entry_mod.queries()["semantic_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_scd2_merge_stays_jvm_no_cartesian(spark):
    """SCD2: one full-outer pk join for the current slice; history rides a
    union. Nothing may fall to Python or a cartesian."""
    plan = plan_of(entry_mod.queries()["scd2_merge"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Union" in plan


def test_incremental_agg_merges_not_recomputes(spark):
    """The merge is agg(base) ⟗ agg(delta): two partial-agg chains and one
    key join — no window, no Python."""
    plan = plan_of(entry_mod.queries()["incremental_agg"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 4  # partial+final per side
    assert "FullOuter" in plan
    assert "BatchEvalPython" not in plan


def test_data_skipping_is_one_aggregation(spark):
    """Zone-map stats are a single partial-agg shuffle over the scan."""
    plan = plan_of(entry_mod.queries()["data_skipping_plan"](spark, SF_DIR))
    assert plan.count("Exchange") <= 2
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_cms_sketch_broadcasts(spark):
    """The CMS sketch (≤ d·w counters) must broadcast into the estimate
    join; everything stays JVM-side."""
    plan = plan_of(entry_mod.queries()["cms_topk"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_hll_fixed_register_state(spark):
    """HLL reduces to groupBy over (group, idx ≤ 256): hash aggregates
    only, no window, no Python."""
    plan = plan_of(entry_mod.queries()["hll_distinct"](spark, SF_DIR))
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_winsorize_broadcasts_bounds(spark):
    """Per-key bounds table is tiny → broadcast back; clamp is narrow."""
    plan = plan_of(entry_mod.queries()["winsorize_events"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_grouped_split_assignment_is_narrow(spark):
    """Split assignment is one md5 per row: the only exchange belongs to
    the reporting aggregate, none to the assignment itself."""
    plan = plan_of(entry_mod.queries()["grouped_split_docs"](spark, SF_DIR))
    assert plan.count("Exchange") <= 2
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_span_dedup_two_keyed_shuffles(spark):
    """Span dedup: one shuffle keyed on block text (dedup window), one on
    the doc id (reassembly) — and no Python anywhere."""
    plan = plan_of(entry_mod.queries()["span_dedup"](spark, SF_DIR))
    assert "Window" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_round3b_queries_stay_jvm_side(spark):
    qs = entry_mod.queries()
    for name in (
        "logistic_quality",
        "strip_markup",
        "mixture_weights",
        "drift_chi2",
        "hard_negatives",
        "knn_label_accuracy",
    ):
        plan = plan_of(qs[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} fell back to Python UDFs"
        assert "ArrowEvalPython" not in plan, f"{name} uses Python unexpectedly"


def test_logistic_quality_is_pure_narrow(spark):
    # classifier inference must be a scan→project pipeline: no exchange
    plan = plan_of(entry_mod.queries()["logistic_quality"](spark, SF_DIR))
    assert "Exchange" not in plan
    # column pruning: only doc_id+text read
    assert "ReadSchema" in plan and "source" not in plan.split("ReadSchema")[1][:200]


def test_drift_chi2_single_agg_pass(spark):
    # one bucket-keyed aggregation; totals via a window over the tiny
    # post-agg bucket table — the detector must NOT rescan the corpus
    plan = plan_of(entry_mod.queries()["drift_chi2"](spark, SF_DIR))
    assert plan.count("(1) Scan parquet") == 1 and "(2) Scan parquet" not in plan
    assert "Window" in plan


def test_mixture_weights_single_scan(spark):
    plan = plan_of(entry_mod.queries()["mixture_weights"](spark, SF_DIR))
    # the waterfilling budget must reuse the counts agg (window over the
    # tiny domain table), not re-aggregate the corpus in a second branch
    assert plan.count("(1) Scan parquet") == 1 and "(2) Scan parquet" not in plan
    assert "Window" in plan


def test_hard_negatives_broadcasts_queries_and_hoists_norms(spark):
    plan = plan_of(entry_mod.queries()["hard_negatives"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    # norms hoisted: the corpus-side projection computes c_norm BELOW the
    # join (aggregate fold appears in a Project, not only above the join)
    assert "BatchEvalPython" not in plan


def test_training_pipeline_v3_stays_jvm_side_and_scans_once_per_pass(spark):
    df = entry_mod.queries()["training_pipeline_v3"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the gate projection is persisted: the raw-docs scan appears for the
    # raw counts; kept-side branches must read the InMemoryRelation
    assert "InMemoryTableScan" in plan
    for dep in getattr(df, "_sg_persisted", ()):
        dep.unpersist()


def test_plan_report_utility(spark):
    from datapipelines_essentials_python_spark.utils.planaudit import plan_report

    rep = plan_report(entry_mod.queries()["q5_nation_revenue"](spark, SF_DIR))
    assert rep.n_scans >= 3  # lineitem + orders + customer (+ dims)
    assert rep.n_broadcasts >= 1
    assert not rep.python_eval and not rep.cartesian
    assert rep.read_schemas  # pruned schemas captured
    assert rep.problems() == []

    # a deliberately bad plan is flagged (disable broadcast so the cross
    # join cannot hide behind a BroadcastNestedLoopJoin)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = spark.range(10).crossJoin(
            spark.range(10).withColumnRenamed("id", "b")
        )
        bad_rep = plan_report(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert bad_rep.cartesian and any("cartesian" in p for p in bad_rep.problems())


def test_asof_forward_uses_running_frame(spark):
    """Forward as-of must mirror by descending sort with the running
    unboundedPreceding..0 frame — an unbounded-FOLLOWING frame has no
    running-state processor in Spark and is O(n^2) per key (the round-3
    scale-killer, VERDICT r03 item 1)."""
    plan = plan_of(entry_mod.queries()["asof_join_forward"](spark, SF_DIR)).lower()
    assert "unboundedpreceding" in plan
    assert "unboundedfollowing" not in plan


def test_build_vocab_two_level_rank(spark):
    """Vocabulary ranking is range-partitioned two-level: every window spec
    is partitioned (by the range-partition id), never a single-partition
    global window over the vocabulary. The range exchange itself is only
    visible pre-materialization (the production path eagerly
    localCheckpoints it so both consumers provably share ONE partitioning
    — ADVICE r04), so the shape is asserted via the inspection hook and
    the checkpoint's presence via the production plan."""
    import re

    from datapipelines_essentials_python_spark.operators.text import build_vocab
    from datapipelines_essentials_python_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    lazy_plan = plan_of(build_vocab(docs, "text", top_k=50, materialize=False))
    assert "rangepartitioning(cnt" in lazy_plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", lazy_plan)
    assert specs, "expected ranking window specs in the vocab plan"
    for spec in specs:
        assert "__pid" in spec, f"unpartitioned window spec: {spec}"

    # production path: the ranked stage reads a pinned (checkpointed) RDD,
    # and its windows stay __pid-partitioned
    prod_plan = plan_of(entry_mod.queries()["vocab_coverage"](spark, SF_DIR))
    assert "existingrdd" in prod_plan.lower()
    prod_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", prod_plan)
    assert prod_specs
    for spec in prod_specs:
        assert "__pid" in spec, f"unpartitioned window spec: {spec}"


def test_pack_chunk_spans_two_level_offsets(spark):
    """Chunk-span packing never funnels a shard through one partition:
    the running token offset is range-partitioned two-level (same scheme
    as build_vocab), so every window spec is partitioned by the range
    partition id, and the production path pins the range exchange with an
    eager localCheckpoint before the two consumers branch."""
    import re

    from datapipelines_essentials_python_spark.operators.text import (
        pack_chunk_spans,
    )
    from datapipelines_essentials_python_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    lazy_plan = plan_of(
        pack_chunk_spans(docs, "doc_id", shard_col="lang", materialize=False)
    )
    assert "rangepartitioning(__shard" in lazy_plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", lazy_plan)
    assert specs, "expected running-sum window specs in the packing plan"
    for spec in specs:
        assert "__pid" in spec, f"unpartitioned window spec: {spec}"

    prod_plan = plan_of(entry_mod.queries()["pack_chunk_spans"](spark, SF_DIR))
    assert "existingrdd" in prod_plan.lower()
    prod_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", prod_plan)
    assert prod_specs
    for spec in prod_specs:
        assert "__pid" in spec, f"unpartitioned window spec: {spec}"


def test_minhash_candidates_single_exchange(spark):
    """LSH candidate generation runs off ONE (band, bucket) exchange:
    the single-pass bucket-size window (VERDICT r05 item 4 — sizes every
    bucket in the same pass for both the ≥2 pre-filter and the
    ``max_bucket`` cap) is PARTITIONED by (band, bucket), and the
    collect_list aggregate reuses the window's own hash partitioning, so
    exactly one corpus-sized exchange carries the banded rows. Asserted
    on the operator directly: the registry query returns the
    session-cached pairs table, whose plan is an InMemoryTableScan by
    design."""
    import re

    from datapipelines_essentials_python_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from datapipelines_essentials_python_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    plan = plan_of(out)
    # the bucket-size window is partitioned — never a global sort
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the single-pass bucket-size window spec"
    for spec in specs:
        assert "band" in spec and "bucket" in spec, (
            f"bucket-size window not keyed on (band, bucket): {spec}"
        )
    # ... and it shares ONE exchange with the collect_list aggregate:
    # exactly one hashpartitioning exchange keyed on the band columns
    band_exchanges = [
        part
        for part in re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        if "band" in part and "bucket" in part
    ]
    assert len(band_exchanges) == 1, (
        f"expected one (band, bucket) exchange, saw {len(band_exchanges)}"
    )
    from datapipelines_essentials_python_spark.operators import dedup

    dedup.release(out)


def test_ngram_indexed_join_is_equi_not_cartesian(spark):
    """The inverted-index Jaccard must reach the corpus through an
    equi-join on the shingle posting key — never a cartesian/nested-loop
    pair enumeration (the shape that made the brute variant unbenchable at
    the 10x tier)."""
    from datapipelines_essentials_python_spark.operators.dedup import (
        ngram_jaccard_pairs_indexed,
    )
    from datapipelines_essentials_python_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(
        ngram_jaccard_pairs_indexed(
            docs, "doc_id", "text", n=3, threshold=0.5, block_col="lang"
        )
    )
    low = plan.lower()
    assert "cartesianproduct" not in low
    assert "broadcastnestedloopjoin" not in low
    assert "g_a" in plan and "g_b" in plan  # posting key is a join key


def test_bm25_broadcasts_stats_and_has_no_window(spark):
    """BM25 scoring is pure keyed aggregation: the corpus stats (1-row)
    and query-term table arrive via broadcast, and the plan contains no
    window at all (no global sort, no per-doc ranking inside the
    operator)."""
    plan = plan_of(entry_mod.queries()["bm25_retrieval"](spark, SF_DIR))
    low = plan.lower()
    assert "broadcast" in low
    assert "windowspecdefinition" not in low
    # the only global sort is the final top-10 TakeOrdered, not a full sort
    assert "takeordered" in low or "sort" not in low.split("limit")[0]


def test_histogram_quantiles_windows_are_group_partitioned(spark):
    """Histogram-quantile windows run over the bin table (<= n_bins rows
    per group), partitioned by the group column — never a partition-less
    window over raw events."""
    import re

    plan = plan_of(entry_mod.queries()["histogram_quantiles"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected cumulative-count window specs"
    for spec in specs:
        assert "event_type" in spec, f"unpartitioned window spec: {spec}"


def test_rfm_segmentation_has_no_window_and_broadcasts_bounds(spark):
    """RFM scoring must never rank globally: the plan contains NO window
    at all — quartile boundaries and the corpus max-date arrive as
    broadcast 1-row joins, scores are per-row comparisons."""
    plan = plan_of(entry_mod.queries()["rfm_segmentation"](spark, SF_DIR))
    low = plan.lower()
    assert "windowspecdefinition" not in low
    assert low.count("broadcast") >= 2  # gmax row + boundary row


def test_pareto_frontier_windows_are_range_partitioned(spark):
    """The skyline sweep's prefix-max windows run per range partition
    (__pid) — never a partition-less window over the distinct-cost set."""
    import re

    plan = plan_of(entry_mod.queries()["pareto_frontier"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the per-range prefix-max window"
    for spec in specs:
        assert "__pid" in spec, f"unpartitioned window spec: {spec}"


def test_transition_and_trigram_windows_are_key_partitioned(spark):
    """Sequence-mining lags partition by the journey key (user_id) and the
    matrix normalizer by from_state (a vocabulary-bounded table) — no
    window spec anywhere is partition-less."""
    import re

    for q in ("transition_matrix", "event_trigrams"):
        plan = plan_of(entry_mod.queries()[q](spark, SF_DIR))
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, f"{q}: expected lag window specs"
        for spec in specs:
            assert "user_id" in spec or "from_state" in spec, (
                f"{q}: unpartitioned window: {spec}"
            )


def test_ewma_single_window_pass(spark):
    """All k-1 lags evaluate in ONE WindowExec pass (same spec), keyed by
    event_type — one shuffle for the daily agg, one sort per key group."""
    import re

    plan = plan_of(entry_mod.queries()["ewma_daily"](spark, SF_DIR))
    # exactly one Window node in the details section (all lag frames
    # share the spec and evaluate in one pass)
    n_window_nodes = len(re.findall(r"^\(\d+\) Window\b", plan, re.M))
    assert n_window_nodes == 1, plan
    # and it is keyed, not global
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "key" in spec, f"unpartitioned window spec: {spec}"


def test_boilerplate_removal_no_window_no_cartesian(spark):
    """Boilerplate removal is aggs + hash joins only: the df-count is a
    combinable count-distinct (no ranking window anywhere — hot
    boilerplate keys must partial-aggregate), and nothing degenerates
    into a cartesian product."""
    plan = plan_of(entry_mod.queries()["boilerplate_removal"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "PythonEval" not in plan.replace("BatchEvalPython", "PythonEval"), plan


def test_source_minhash_matrix_no_window_bounded_joins(spark):
    """The signature fold is agg-only (map-side MIN partials); the pair
    compare is an equi-join on the component index — never cartesian,
    never a window."""
    plan = plan_of(entry_mod.queries()["source_minhash_matrix"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_random_walk_hops_argmin_is_agg_not_window(spark):
    """Every per-step argmin is a combinable min(struct) AGGREGATE —
    zero Window nodes in the whole 3-step plan (a ranking window would
    sort each frontier hub's candidates on one partition)."""
    plan = plan_of(entry_mod.queries()["random_walk_hops"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_link_prediction_jaccard_top_is_take_ordered(spark):
    """The bounded top-N is TakeOrderedAndProject (driver-sized k), not
    a global sort of the candidate pairs."""
    plan = plan_of(entry_mod.queries()["link_prediction_jaccard"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_token_budget_scalars_are_broadcast(spark):
    """Both normalizing scalars (total tokens, decimal mass sum) join
    back as broadcast 1-row builds — no shuffle exchange keyed on the
    domain table for a 2-scalar enrichment."""
    plan = plan_of(entry_mod.queries()["token_budget_plan"](spark, SF_DIR))
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_harmonic_centrality_joins_and_aggs_only(spark):
    """The landmark BFS is frontier joins + (lm, node)-keyed min folds —
    no ranking window, no cartesian, nothing in row-Python."""
    plan = plan_of(entry_mod.queries()["harmonic_centrality"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_theil_sen_pair_join_is_keyed_not_cartesian(spark):
    """The C(n,2) pair expansion is an equi-join on the series key with
    a residual t1 < t2 filter — a hash join, never CartesianProduct —
    and the median is a combinable percentile AGGREGATE, not a window."""
    plan = plan_of(entry_mod.queries()["theil_sen_trend"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cusum_windows_are_keyed(spark):
    """Both the running sum and the rank-1 pick are PARTITIONED windows
    over pre-aggregated daily rows — an unpartitioned window would pull
    the whole series onto one task at 100 TB."""
    import re

    plan = plan_of(entry_mod.queries()["cusum_changepoint"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the cusum plan"
    for spec in specs:
        assert "key" in spec, f"unpartitioned window spec: {spec}"


def test_skyline_two_arrow_phases_no_cartesian(spark):
    """The skyline is exactly two Arrow mapInPandas phases (local sweep,
    global sweep over candidates) — dominance never becomes a pairwise
    join, and the part dim broadcasts into the lineitem agg."""
    plan = plan_of(entry_mod.queries()["skyline_parts"](spark, SF_DIR))
    # formatted plans list each node twice (tree + detail) — count details
    assert plan.count(") MapInPandas") == 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_rolling_mad_window_is_keyed_range_frame(spark):
    """One keyed RANGE-frame window over pre-aggregated daily rows; the
    med/MAD array math is per-row expression work, no second shuffle."""
    import re

    plan = plan_of(entry_mod.queries()["rolling_mad_anomaly"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected a window spec in the rolling-mad plan"
    for spec in specs:
        assert "key" in spec, f"unpartitioned window spec: {spec}"
    assert "specifiedwindowframe(RangeFrame" in plan, plan


def test_token_entropy_aggs_only(spark):
    """Entropy is two keyed aggregates and one join — no window, no
    cartesian, no Python in the hot path."""
    plan = plan_of(entry_mod.queries()["source_token_entropy"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_dow_fences_broadcast_no_window(spark):
    """Percentile fences are a combinable AGGREGATE per (key, dow) cell
    joined back by broadcast — no window, no shuffle of the daily rows
    beyond the one daily agg."""
    plan = plan_of(entry_mod.queries()["dow_outlier_days"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_hilbert_rides_the_scan(spark):
    """The Hilbert key is stacked narrow projections riding the scan —
    ZERO exchanges, zero windows, zero Python; the event_id filter is
    pushed into the parquet scan."""
    plan = plan_of(entry_mod.queries()["hilbert_layout"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "LessThan(event_id,2000)" in plan, plan


def test_salton_shares_the_wedge_plan(spark):
    """Salton cosine runs the same wedge-by-center machinery as
    neighbor_jaccard: hash joins + keyed aggs only."""
    plan = plan_of(entry_mod.queries()["link_prediction_salton"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cheapest_route_joins_and_min_folds_only(spark):
    """Min-plus relaxation is frontier joins + combinable min folds —
    no window, no cartesian, nothing in row-Python."""
    plan = plan_of(entry_mod.queries()["cheapest_route_3hop"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_streaks_windows_are_keyed_no_self_join(spark):
    """Gaps-and-islands: keyed windows over pre-aggregated daily rows,
    never the day-vs-day-1 self-join."""
    import re

    plan = plan_of(entry_mod.queries()["activity_streaks"](spark, SF_DIR))
    assert "Join" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected a window spec in the streaks plan"
    for spec in specs:
        assert "key" in spec, f"unpartitioned window spec: {spec}"


def test_fd_check_is_aggs_only(spark):
    plan = plan_of(entry_mod.queries()["fd_check"](spark, SF_DIR))
    assert "HashAggregate" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_spearman_windows_are_keyed(spark):
    """The rank windows run over the per-(group, value) AGGREGATE, not
    the raw rows (round 9): every windowspec is partitioned by the
    group key, and each window's input has already passed a
    HashAggregate (the per-value count) — windowing the raw table on a
    low-cardinality group key sorts the corpus on as many tasks as
    there are groups, which AQE cannot split."""
    import re

    plan = plan_of(entry_mod.queries()["spearman_qty_price"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the spearman plan"
    for spec in specs:
        assert "gk#" in spec, f"unpartitioned window spec: {spec}"
    # ranks attach back via value-keyed joins, never a cartesian
    assert "Join" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_mann_kendall_pair_join_is_keyed_not_cartesian(spark):
    """The C(n,2) pair expansion is an equi-join on the series key with
    a residual t1 < t2 filter (the theil_sen shape) — a hash join over
    pre-aggregated monthly rows, never CartesianProduct."""
    plan = plan_of(
        entry_mod.queries()["mann_kendall_nation_trend"](spark, SF_DIR)
    )
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_welch_pairs_ride_post_agg_summaries(spark):
    """The corpus is touched by ONE moment aggregation; the g1 < g2
    pair join runs on the post-agg summary table (broadcast-sized), so
    the only non-equi join is a BroadcastNestedLoopJoin over group
    summaries — no cartesian, no window, no row-Python."""
    plan = plan_of(entry_mod.queries()["welch_ttest_sources"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_gini_window_is_keyed(spark):
    """The rank window partitions by nation — the per-group sort is the
    whole cost model, and it must never collapse to one task."""
    import re

    plan = plan_of(entry_mod.queries()["gini_revenue_by_nation"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected a window spec in the gini plan"
    for spec in specs:
        assert "n_name" in spec, f"unpartitioned window spec: {spec}"
    assert "CartesianProduct" not in plan, plan


def test_contingency_margins_broadcast_total_is_cell_window(spark):
    """One corpus-sized (a,b) count; margins and the full grid are
    broadcast-sized; the chi2 total is a window over GRID-cardinality
    rows (bounded categories), which is the one place an unpartitioned
    window is the right plan."""
    plan = plan_of(
        entry_mod.queries()["contingency_priority_status"](spark, SF_DIR)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") >= 1, plan


def test_kfold_is_pure_projection(spark):
    """Fold assignment adds ZERO shuffles beyond the balance rollup's
    one exchange — the md5 fold id is scan-speed column work."""
    plan = plan_of(entry_mod.queries()["kfold_balance"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_kendall_tau_rides_cell_histogram(spark):
    """The corpus is touched only by keyed aggregations — the pair
    'join' is cells x cells on the post-agg histogram (broadcast-
    sized), so no cartesian, no window, no row-Python anywhere."""
    plan = plan_of(
        entry_mod.queries()["kendall_tau_qty_discount"](spark, SF_DIR)
    )
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_interarrival_windows_are_keyed(spark):
    """Both the per-series lag and the per-group rank/count windows are
    PARTITIONED — no global sort of the gap table."""
    import re

    plan = plan_of(entry_mod.queries()["interarrival_profile"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the interarrival plan"
    for spec in specs:
        assert ("user_id" in spec) or ("group" in spec) or (
            "event_type" in spec
        ), f"unpartitioned window spec: {spec}"
    assert "CartesianProduct" not in plan, plan


def test_trend_break_windows_keyed_single_moment_pass(spark):
    """The cusum windows stay keyed and the two segment fits come from
    ONE conditional aggregation — the plan has no second daily scan
    for the after-segment."""
    import re

    plan = plan_of(entry_mod.queries()["trend_break_fit"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the trend-break plan"
    for spec in specs:
        assert "key" in spec or "event_type" in spec, (
            f"unpartitioned window spec: {spec}"
        )
    assert "CartesianProduct" not in plan, plan


def test_simpson_is_two_keyed_aggs(spark):
    """Identical shape contract to the entropy operator: explode ->
    (group, token) agg -> group agg; no window, no join back, no
    Python."""
    plan = plan_of(
        entry_mod.queries()["simpson_diversity_sources"](spark, SF_DIR)
    )
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Generate" in plan, plan  # the explode


def test_rich_club_broadcasts_thresholds(spark):
    """Degrees come from keyed aggs; per-threshold counting is
    broadcast non-equi joins of the tiny k list — no cartesian, no
    window, no Python."""
    plan = plan_of(entry_mod.queries()["rich_club_parts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_range_partition_cumwalk_is_post_agg(spark):
    """The corpus is touched by one keyed count; the unpartitioned
    cumulative window runs over the DISTINCT-KEY table only (the
    documented bounded-cardinality contract)."""
    import re

    plan = plan_of(entry_mod.queries()["range_partition_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the window consumes an aggregated child, never the raw scan:
    # node ids are assigned bottom-up, so every Window id must exceed
    # some HashAggregate id (an aggregate sits beneath it)
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_peak_concurrency_sweep_is_keyed(spark):
    """Both the running-sum and the peak windows partition by the
    group key — the sweep never funnels all days into one task."""
    import re

    plan = plan_of(
        entry_mod.queries()["peak_concurrency_daily"](spark, SF_DIR)
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the sweep plan"
    for spec in specs:
        assert "group" in spec or "day" in spec, (
            f"unpartitioned window spec: {spec}"
        )
    assert "CartesianProduct" not in plan, plan


def test_weighted_median_windows_keyed_post_agg(spark):
    """Cumulative-weight windows partition by the group and run over
    the per-value aggregated table (agg precedes window in the plan)."""
    import re

    plan = plan_of(entry_mod.queries()["weighted_median_price"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the weighted-median plan"
    for spec in specs:
        assert "group" in spec or "l_returnflag" in spec, (
            f"unpartitioned window spec: {spec}"
        )
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_auc_is_one_rank_window_no_pair_join(spark):
    """The rank identity replaces the positives x negatives join, and
    (round 9) the rank window runs over the per-(group, score)
    aggregate, never the raw rows: keyed windows fed by a
    HashAggregate below them, no join at all, no Python."""
    import re

    plan = plan_of(entry_mod.queries()["auc_en_quality"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected rank window specs in the AUC plan"
    for spec in specs:
        assert "group#" in spec, f"unpartitioned window spec: {spec}"
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_calibration_total_rides_bucket_window(spark):
    """One corpus-sized bucket agg; the ECE total is a window over
    bucket-cardinality rows (the documented bounded unpartitioned
    case), with the numerator already BIGINT-quantized."""
    import re

    plan = plan_of(entry_mod.queries()["quality_calibration"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_target_encode_complements_are_post_agg(spark):
    """Corpus cost is the one (cat, fold) agg; the complement windows
    run over the encoding table (agg ids below window ids)."""
    import re

    plan = plan_of(entry_mod.queries()["target_encode_segment"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_association_rules_stay_keyed(spark):
    """Pair counts ride the basket equi-join (bounded fan-out) and
    item/basket totals are keyed aggs; nothing cartesian, nothing
    Python; the 1-row basket total broadcasts."""
    plan = plan_of(
        entry_mod.queries()["association_rules_events"](spark, SF_DIR)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ndcg_weight_tables_broadcast(spark):
    """The position-discount and IDCG lookup tables are broadcast-side
    joins; the only windows are the per-query ranking windows."""
    import re

    plan = plan_of(entry_mod.queries()["ndcg_bm25_langmatch"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the per-query ranking windows"
    for spec in specs:
        assert "query" in spec, f"unpartitioned window spec: {spec}"


def test_sequence_gaps_internal_window_is_blocked(spark):
    """The corpus-sized lag window partitions by the id block; only
    the block-SUMMARY pass (block-cardinality rows) runs
    unpartitioned."""
    import re

    plan = plan_of(entry_mod.queries()["orderkey_gaps"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the gaps plan"
    blocked = [s for s in specs if "block" in s]
    assert blocked, f"no block-partitioned window found: {specs}"


def test_conversion_delay_windows_keyed(spark):
    """The rank/count windows partition by the cohort over one row per
    converted user; the corpus is collapsed by the user-keyed
    conditional agg first (agg ids below window ids)."""
    import re

    plan = plan_of(entry_mod.queries()["signup_purchase_delay"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_anova_is_single_moment_pass(spark):
    """One group-keyed corpus agg; no window over raw rows, no join,
    no Python — the F statistic folds on group-cardinality rows."""
    plan = plan_of(entry_mod.queries()["anova_doc_length"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_kruskal_has_no_global_rank_window(spark):
    """The histogram-rank trick: the only window is the cumulative
    walk over the VALUE HISTOGRAM (post-agg — agg ids below window
    ids); raw rows are never globally ranked."""
    import re

    plan = plan_of(entry_mod.queries()["kruskal_doc_length"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_siegel_double_median_is_aggregated(spark):
    """Both median levels are combinable percentile AGGREGATES over
    the keyed pair join — no window, no cartesian (the theil_sen
    shape, one level deeper)."""
    plan = plan_of(entry_mod.queries()["siegel_trend"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_delta_audit_lag_is_keyed_no_float_log(spark):
    """One keyed lag window over pre-aggregated daily rows; bit widths
    come from bin() string length — the plan contains no log call."""
    import re

    plan = plan_of(entry_mod.queries()["delta_audit_events"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("key" in s or "event_type" in s for s in specs), specs
    assert "LOG(" not in plan.upper(), plan


def test_psi_totals_ride_bucket_window(spark):
    """Single corpus pass (one conditional bucket agg); totals and the
    PSI sum are windows over bucket-cardinality rows with the term
    already decimal-quantized."""
    import re

    plan = plan_of(entry_mod.queries()["psi_doc_length_drift"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_distinctive_terms_vocab_bounded(spark):
    """Two vocab-bounded keyed aggs + broadcast totals + one keyed
    top-k window; never cartesian, never Python."""
    import re

    plan = plan_of(
        entry_mod.queries()["distinctive_terms_sources"](spark, SF_DIR)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("group" in s or "source" in s for s in specs), specs


def test_newman_projection_is_keyed_pair_join(spark):
    """Per-basket discounts join back on the basket key (equi-join)
    and the pair expansion is the bounded-fan-out affinity shape —
    no cartesian, no window."""
    plan = plan_of(entry_mod.queries()["weighted_affinity_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_bloom_audit_is_semi_joins_and_scalars(spark):
    """The probe pass is k broadcast left-semi joins against the bit
    table; all counts are 1-row broadcast scalars — no cartesian data
    product, no Python."""
    plan = plan_of(entry_mod.queries()["bloom_fpr_calibration"](spark, SF_DIR))
    assert plan.count("LeftSemi") >= 3, plan
    assert "BatchEvalPython" not in plan, plan


def test_zipf_rank_window_is_keyed(spark):
    """The top-N rank window partitions by the source over the
    vocab-bounded (group, term) counts (agg below window), and the
    OLS fold is aggregate-only after it."""
    import re

    plan = plan_of(entry_mod.queries()["zipf_fit_sources"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("group" in s or "source" in s for s in specs), specs
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert min(agg_ids) < min(win_ids), plan


def test_grid_dbscan_adjacency_is_equi_join(spark):
    """The 8-neighborhood is a broadcast offset explode + equi-join on
    shifted cell coords — never a spatial cross product; the corpus is
    collapsed by the cell-keyed count first."""
    plan = plan_of(entry_mod.queries()["geo_hotspot_clusters"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_did_is_single_conditional_pass(spark):
    """All four cells' moments come from ONE aggregation over the
    event scan — no join of four subqueries, no window."""
    plan = plan_of(entry_mod.queries()["did_weekend_premium"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "events.parquet" in plan
    # two scans only (moments + the 1-row date range); formatted plans
    # print each node twice (tree + detail)
    assert plan.count("Scan parquet") <= 4, plan


def test_cache_hit_rank_is_post_agg(spark):
    """One key-keyed count collapses the accesses; the rank window and
    k joins run over the distinct-key table (agg ids below window)."""
    import re

    plan = plan_of(entry_mod.queries()["cache_hit_curve_users"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    win_ids = [int(i) for i in re.findall(r"Window \((\d+)\)", plan)]
    agg_ids = [int(i) for i in re.findall(r"HashAggregate \((\d+)\)", plan)]
    assert win_ids and agg_ids, plan
    assert min(agg_ids) < min(win_ids), plan


def test_char_entropy_is_keyed_aggs_only(spark):
    """Char explode -> (doc, char) agg -> doc fold: no window, no
    join back beyond the totals equi-join, no Python, and the explode
    is the generate node."""
    plan = plan_of(entry_mod.queries()["char_entropy_gibberish"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Generate" in plan, plan


def test_wilson_single_conditional_agg(spark):
    """One corpus-sized conditional count; intervals are scalar shapes
    on the group table — no window, no join, no Python."""
    plan = plan_of(entry_mod.queries()["wilson_en_rate"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_eb_prior_is_one_broadcast_scalar(spark):
    """The MoM prior fit runs over the group-rate table and comes back
    as a 1-row broadcast — the corpus is scanned once."""
    plan = plan_of(entry_mod.queries()["eb_shrunk_en_rate"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Scan parquet") <= 4, plan


def test_exact_substring_dedup_shuffle_count_and_jvm(spark):
    """The round-9 interval-merge reassembly is pure projection work:
    the plan keeps exactly the two aggregation exchanges (fingerprint
    first-occurrence, per-doc removal collect) plus joins — no new
    shuffle, no Python, and the interval fold shows up as an aggregate
    expression inside a Project, evaluated once per row."""
    plan = plan_of(
        entry_mod.queries()["exact_substring_dedup"](spark, SF_DIR)
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # shuffle budget: fingerprint agg + removal-collect agg (plus AQE
    # broadcast exchanges, which are not hash-partition shuffles)
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 3, f"{n_shuffles} hash exchanges:\n{plan}"
