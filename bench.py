"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized with the noop sink (full execution, no driver
collect, no disk write) — measures plan execution, not result transfer.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datapipelines_essentials_python_spark import get_or_create_spark_session  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

# Headline set: the engine spine (scan/filter/join/agg/window/CDC) + the
# scale-path LLM-data operators. Brute-force O(N²) baselines are excluded
# on purpose — bench runs the algorithms you'd actually run at 100 TB.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "filter_dsl_scan",
    "agg_dispatch",
    "window_latest_order",
    "top_k_per_group",
    "cdc_merge",
    "word_count",
    "exact_dedup",
    "json_flatten",
    "sessionize",
    "events_by_day",
    "lang_id",
    "text_quality",
    "token_stats",
    "doc_fingerprint",
    "minhash_lsh",
    "simhash_fp",
    "embedding_topk",
    "multimodal_features",
    "q6_revenue_delta",
    "q13_custdist",
    "q14_promo_revenue",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "semi_join_returned",
    "stratified_sample_docs",
    "unigram_lm_quality",
    "dedup_components",
    "ivf_ann",
    "simhash_neardup",
    "histogram_profile",
    "corr_stats",
    "repetition_stats",
    "quality_filter",
    "q15_top_suppliers",
    "q19_disjunctive",
    "q22_dormant_rich",
    "media_chunks",
    "pack_sequences",
    "hopping_window_agg",
    "salted_join_events",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_customers",
    "funnel_conversion",
    "cohort_retention",
    "bloom_join_orders",
    "zorder_layout",
    "cube_agg",
    "flatten_deep",
    "training_pipeline_e2e",
    "ols_fit",
    # round 2: the SRP-bucketed near-dup path, multi-probe IVF, and the
    # rule-1013 completeness check. (ngram_jaccard joined the set in
    # round 5 once the inverted-index rewrite removed its per-block
    # quadratic verification; see the round-5 block at the end.)
    "embedding_neardup",
    "ivf_ann_nprobe2",
    "dq_file_completeness",
    # round 2: the remaining TPC-H-shaped queries (full 22-query suite)
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q9_product_profit",
    "q11_important_parts",
    "q12_shipping_delay",
    "q16_supplier_count",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    # round 2: PII scrubbing + benchmark decontamination + exact quantiles
    "pii_scrub",
    "decontamination",
    "quantile_profile",
    "training_pipeline_v2",
    "gap_fill_events",
    # round 2: curation slate (normalization, vocab/TF-IDF, incremental
    # dedup, curriculum, domain balance, epoch shuffle, SQL front door,
    # k-means training step)
    "text_normalize",
    "vocab_coverage",
    "tfidf_top_terms",
    "incremental_dedup",
    "curriculum_bins",
    "domain_balance",
    "global_shuffle_order",
    "sql_api_revenue",
    "kmeans_step",
    # round 2: reconciliation audit + time-series/robust-stats profile
    "snapshot_diff",
    "rolling_events_7d",
    "iqr_outlier_events",
    # round 2: iterative training step (two chained Lloyd rounds)
    "kmeans_two_step",
    # round 3: bounded-memory bloom decontamination + SemDeDup-style
    # cluster-scoped embedding dedup — the scale paths of decontamination
    # and embedding_neardup respectively
    "decontamination_bloom",
    "semantic_dedup",
    # round 3: warehouse-freshness ops (SCD2 history, materialized-view
    # delta merge, zone-map skipping), deterministic sketches (CMS/HLL),
    # and the chunk/span/split/winsorize curation slate
    "scd2_merge",
    "incremental_agg",
    "data_skipping_plan",
    "cms_topk",
    "hll_distinct",
    "chunk_documents",
    "span_dedup",
    "substring_dup_profile",
    "heavy_hitters",
    "feature_hash_tf",
    "group_quantiles",
    "grouped_split_docs",
    "winsorize_events",
    "dq_profile",
    "compaction_plan",
    "bigram_lm_quality",
    "pq_ann",
    "hll_incremental",
    "rag_retrieval",
    "source_overlap_matrix",
    # round 3: quality-classifier inference, boilerplate strip, mixture
    # planner, drift detection, contrastive mining + kNN label gauge
    "logistic_quality",
    "strip_markup",
    "mixture_weights",
    "drift_chi2",
    "hard_negatives",
    "knn_label_accuracy",
    "dedup_keep_best",
    "skew_profile_events",
    # round 3: engine-surface slate — semi-structured JSON extraction,
    # grouping sets, window navigation, null-safe join, fuzzy matching,
    # per-row vector diagnostics
    "json_props_extract",
    "grouping_sets_agg",
    "window_navigation",
    "null_safe_join",
    "fuzzy_match_names",
    "vector_stats",
    "training_pipeline_v3",
    "interval_join_sessions",
    "percent_rank_quality",
    "cdc_changed_columns",
    "fuzzy_join_suppliers",
    "quality_percentile_gate",
    "geo_nearby_customers",
    "unpivot_metrics",
    "event_lift",
    "asof_join_forward",
    "asof_join_tolerance",
    "scd2_point_in_time",
    "dau_wau",
    "first_touch_attribution",
    "session_conversion",
    "top_terms_per_source",
    "mad_outliers",
    "dataset_card",
    "url_canonicalize",
    "dup_cluster_histogram",
    "split_leakage_audit",
    "dense_rank_ties",
    "time_rollup",
    "sliding_count_1h",
    "funnel_within_1h",
    # round 5: ngram_jaccard joins the set — the inverted-index rewrite
    # removed the per-block quadratic array-compare (intersections come
    # from a posting-join count), so it now has a benchable scale shape;
    # pq_ann_refined adds the k-means-refined codebook variant.
    "ngram_jaccard",
    "pq_ann_refined",
    # round 5: concat-and-chunk packing (two-level offsets) and the IVF
    # multi-probe recall gauge.
    "pack_chunk_spans",
    "ann_recall_ivf",
    "asof_join_tiebreak",
    "histogram_quantiles",
    "bm25_retrieval",
    "fixed_size_sample_docs",
    "debounce_events",
    # round 5 (late block): Markov transitions, time-weighted mean,
    # linear gap fill, Pareto frontier sweep, PMI collocations.
    "transition_matrix",
    "time_weighted_avg",
    "interpolate_daily",
    "pareto_frontier",
    "pmi_collocations",
    # round 5 (final block): RFM segmentation, autocorrelation, Benford
    # profiling, trigram paths, truncated EWMA.
    "rfm_segmentation",
    "autocorr_daily",
    "benford_prices",
    "event_trigrams",
    "ewma_daily",
    "pagerank_parts",
    "pagerank_engagement",
    # round-7 additions
    "hits_supply_graph",
    "containment_pairs",
    "script_mix",
    "triangle_count",
    "rrf_fusion",
    "js_divergence_sources",
    "rolling_median_7d",
    "embargo_split",
    "ppr_seed_expansion",
    "butterfly_count",
    "graph_degree_stats",
    # round-8 additions
    "kcore_nodes",
    "lpa_communities",
    "exact_substring_dedup",
    "ktruss_edges",
    "link_prediction_aa",
    "ngram_novelty",
    "bfs_reach_3hop",
    "boilerplate_removal",
    "source_minhash_matrix",
    "random_walk_hops",
    "token_budget_plan",
    "link_prediction_jaccard",
    "training_pipeline_v4",
    # round-8 third batch
    "harmonic_centrality",
    "theil_sen_trend",
    "cusum_changepoint",
    "skyline_parts",
    "rolling_mad_anomaly",
    "source_token_entropy",
    "dow_outlier_days",
    "hilbert_layout",
    "link_prediction_salton",
    "dedup_threshold_sweep",
    "cheapest_route_3hop",
    "activity_streaks",
    "fd_check",
    "spearman_qty_price",
    "mann_kendall_nation_trend",
    "welch_ttest_sources",
    "gini_revenue_by_nation",
    "contingency_priority_status",
    "kfold_balance",
    "kendall_tau_qty_discount",
    "interarrival_profile",
    "trend_break_fit",
    "simpson_diversity_sources",
    "rich_club_parts",
    "range_partition_audit",
    "peak_concurrency_daily",
    "weighted_median_price",
    "auc_en_quality",
    "quality_calibration",
    "target_encode_segment",
    "association_rules_events",
    "ndcg_bm25_langmatch",
    "orderkey_gaps",
    "signup_purchase_delay",
    "anova_doc_length",
    "kruskal_doc_length",
    "siegel_trend",
    "delta_audit_events",
    "trimmed_mean_price",
    "mode_quantity",
    "psi_doc_length_drift",
    "distinctive_terms_sources",
    "weighted_affinity_pairs",
    "bloom_fpr_calibration",
    "zipf_fit_sources",
    "geo_hotspot_clusters",
    "did_weekend_premium",
    "cache_hit_curve_users",
    "char_entropy_gibberish",
    "wilson_en_rate",
    "eb_shrunk_en_rate",
]


def current_round() -> int | None:
    """The round currently being built, inferred from VERDICT.md's header
    ("# VERDICT — round N" → currently building N+1). The judge writes
    VERDICT strictly AFTER the driver's bench run, so throughout round
    N+1 — including the driver's own bench invocation — the header still
    reads N. (CORRECTNESS_r{N} is NOT a safe source: the r4 driver wrote
    it minutes BEFORE running bench, so it already names the in-flight
    round at bench time.)"""
    import re

    root = Path(__file__).resolve().parent
    try:
        head = (root / "VERDICT.md").read_text()[:200]
    except OSError:
        return None
    m = re.search(r"round\s+(\d+)", head)
    return int(m.group(1)) + 1 if m else None


def load_prior_bench(sf) -> tuple[str, dict[str, float]] | None:
    """Latest parseable bench from a PRIOR round at the same sf →
    (tag, per-query seconds).

    Prefers the committed full-detail snapshots (BENCH_FULL_r{N}.json,
    written by this script and committed per round — immune to the
    driver's 2000-char stdout-tail truncation) and falls back to the
    driver's own BENCH_r{N}.json records; unparseable/crashed rounds are
    skipped so the comparison is always against a real prior.

    Snapshots tagged with the current round (or later) are EXCLUDED:
    when the driver runs bench after this round's BENCH_FULL_r{N} is
    already committed, comparing against it would be a vacuous
    self-vs-self diff (r4 verdict item 1) — the guard must compare
    against the last round that actually shipped.
    """
    import re

    cur = current_round()
    best: tuple[int, str, dict[str, float]] | None = None
    root = Path(__file__).resolve().parent
    # FULL first: at equal round number the strict > keeps the first seen
    for p in list(root.glob("BENCH_FULL_r*.json")) + list(root.glob("BENCH_r*.json")):
        m = re.match(r"BENCH(?:_FULL)?_r(\d+)\.json", p.name)
        if not m:
            continue
        if cur is not None and int(m.group(1)) >= cur:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        # the driver records {n, rc, sf, parsed: <our JSON line>, ...};
        # a crashed round records {"parsed": null} — skip, don't crash
        data = data.get("parsed") or data
        # require a NON-EMPTY query map: a driver record whose stdout tail
        # was truncated parses with "queries": {} — preferring it over an
        # older full snapshot makes the guard a vacuous 0-shared-query
        # diff (observed with BENCH_r06.json shadowing BENCH_FULL_r05)
        if not isinstance(data, dict) or data.get("sf") != sf or not data.get("queries"):
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, p.name, data["queries"])
    return (best[1], best[2]) if best else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_or_create_spark_session(app_name="bench")

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    # Warm the JVM, codegen (incl. the decimal hash-agg path the headline
    # queries lean on), and the parquet read path (footer decode, datasource
    # init) so the first timed query doesn't absorb one-time session costs.
    spark.range(1000).count()
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet")
        .groupBy("r_name")
        .agg(F.sum(F.col("r_regionkey").cast("decimal(18,4)")).cast("double").alias("s"))
        .collect()
    )

    def run_once(name: str) -> float:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        # free blocks a query deliberately persisted (LSH signatures,
        # centroid assignments) so 85 queries don't accumulate cache
        for dep in getattr(df, "_sg_persisted", ()):
            dep.unpersist()
        elapsed = round(time.time() - t0, 3)
        # Round-9, OUTSIDE the timed region (the timing methodology is
        # unchanged — same timed actions as every prior round): drop the
        # Python references to this query's DataFrames and collect, so
        # py4j releases the JVM-side plans and the ContextCleaner can
        # unpersist the iterative queries' localCheckpoint RDD blocks.
        # Without it, 240 queries accumulate checkpoint blocks in the
        # 4g driver heap for the whole run (cleanup otherwise waits on
        # an incidental full GC) and the later loop-heavy queries read
        # 1.5-2.5 s above their isolated profiles.
        del df
        gc.collect()
        # let the ContextCleaner's async unpersists land BEFORE the next
        # query's timer starts (they otherwise steal cycles inside the
        # next timed region): one JVM GC to surface the newly
        # unreferenced RDDs, then a tiny settle action as a barrier.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.range(1).count()
        return elapsed

    # One UNTIMED run of the first headline query: the range/region
    # warmup above doesn't exercise the real scan→agg pipeline, so the
    # first timed query was absorbing whole-stage-codegen JIT cost —
    # the probe's start/end pair then read ~2x "drift" every round
    # (r8: 1.72→1.03, two r9 pre-fix runs: 1.43→0.77, 1.96→0.88) and
    # the window verdict said "degraded" even on an idle machine,
    # conflating JVM warm-up with ambient noise. Standard warmup
    # iteration; all queries share the JIT'd code paths.
    run_once(HEADLINE[0])

    for name in HEADLINE:
        timings[name] = run_once(name)

    # Noise probe: re-run the first headline query at the END of the pass.
    # This VM's IO-wait noise swings absolute seconds ±30%; the start/end
    # pair lets a reader separate machine drift from plan regressions.
    noise_probe = {
        "first_query": HEADLINE[0],
        "start_sec": timings[HEADLINE[0]],
        "end_sec": run_once(HEADLINE[0]),
    }
    # Window verdict (VERDICT r07 item 8): BENCH_FULL_r07 recorded a
    # co-resident session whose own probe showed ~2x start-vs-end drift,
    # and its 221 s total was nearly misread as a regression. Adjudicate
    # the window IN the record so a reader never has to: >1.5x drift in
    # either direction between the probe pair marks the whole run's
    # absolute seconds as untrustworthy (compare per-query ratios to a
    # steady round instead).
    _ps, _pe = noise_probe["start_sec"], noise_probe["end_sec"]
    _drift = max(_ps, _pe) / max(min(_ps, _pe), 1e-9)
    window_verdict = "degraded" if _drift > 1.5 else "steady"

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # ---- regression guard: per-query delta vs the latest recorded round.
    # Self-adjudicating (VERDICT r05 item 2): a first-pass flag can be VM
    # noise (this machine's IO-wait swings absolute seconds ±30%, and the
    # start of a run is measurably slower than its end — see noise_probe),
    # so every flagged query is RE-TIMED once at end-of-run steady state
    # and only retime-confirmed regressions survive into
    # ``regressions_vs_prior``. First-pass flags that the retime cleared
    # are preserved in ``noise_cleared`` so the adjudication is auditable,
    # not silent. Human-readable report goes to stderr; stdout stays ONE
    # JSON line.
    regressions: dict[str, dict[str, float]] = {}
    noise_cleared: dict[str, dict[str, float]] = {}
    prior = load_prior_bench(sf_val)
    if prior:
        tag, prev = prior
        suspects: dict[str, float] = {}
        for name, now in timings.items():
            if name not in prev:
                continue
            ratio = round(now / prev[name], 2) if prev[name] > 0 else 1.0
            if ratio > 1.5 and now - prev[name] > 0.3:
                suspects[name] = ratio
        for name in suspects:
            # Two steady-state retimes; the decision value is their MAX
            # (ADVICE r06): one noisy-FAST sample can no longer reclassify
            # a real regression as noise — clearing needs BOTH retimes
            # under the threshold. The recorded ratio is computed from the
            # same value the confirmation decision used.
            retimes = [run_once(name), run_once(name)]
            decide = max(retimes)
            entry = {
                "prev": prev[name],
                "now": timings[name],
                "retimes": retimes,
                "ratio": round(decide / prev[name], 2)
                if prev[name] > 0
                else 1.0,
            }
            confirmed = (
                decide / prev[name] > 1.5 and decide - prev[name] > 0.3
                if prev[name] > 0
                else False
            )
            (regressions if confirmed else noise_cleared)[name] = entry
        prev_total = round(sum(v for k, v in prev.items() if k in timings), 3)
        print(
            f"[bench] vs {tag}: total {prev_total}s -> "
            f"{round(sum(v for k, v in timings.items() if k in prev), 3)}s "
            f"on {len([k for k in timings if k in prev])} shared queries; "
            f"{len(suspects)} first-pass flag(s) >1.5x, "
            f"{len(regressions)} retime-confirmed, "
            f"{len(noise_cleared)} cleared as noise",
            file=sys.stderr,
        )
        for name, e in regressions.items():
            print(
                f"  CONFIRMED {name}: {e['prev']}s -> {e['now']}s "
                f"(retimes {e['retimes']})",
                file=sys.stderr,
            )
        for name, e in noise_cleared.items():
            print(
                f"  noise    {name}: {e['prev']}s -> {e['now']}s "
                f"(retimes {e['retimes']})",
                file=sys.stderr,
            )

    # Full per-query detail always lands in bench_full.json next to this
    # script; the stdout JSON line must additionally fit the DRIVER'S
    # 2000-char stdout-tail window or the round records parsed=null (this
    # is exactly what silenced BENCH_r02/r03: the 143-query line is ~5 KB,
    # the driver keeps only the tail, and the truncated line no longer
    # parses). Strategy: emit all timings if the line fits, else the
    # slowest queries that do, with n_queries recording true coverage.
    record = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "window_verdict": window_verdict,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
        "compared_to": prior[0] if prior else None,
        "regressions_vs_prior": regressions,
        "noise_cleared": noise_cleared,
        "noise_probe": noise_probe,
    }
    Path(__file__).resolve().parent.joinpath("bench_full.json").write_text(
        json.dumps(record, indent=1)
    )
    line = json.dumps(record)
    budget = 1900
    if len(line) > budget:
        by_cost = sorted(timings, key=timings.get, reverse=True)
        kept: dict[str, float] = {}
        for name in by_cost:
            trial = dict(record, queries={**kept, name: timings[name]})
            if len(json.dumps(trial)) > budget:
                break
            kept[name] = timings[name]
        record["queries"] = kept
        line = json.dumps(record)
    print(line)


if __name__ == "__main__":
    main()
