"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The metric is total wall time of the headline set (warm session, median of
REPS per query). BASELINE.md records the history.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from projectdatalake_spark.session import get_spark  # noqa: E402

# Round-2 operators timed once each (reported separately — not part of the
# headline total, which stays comparable across rounds/BASELINE.md).
EXTENDED = [
    "asof_join_grouped",
    "tfidf_top_terms",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "split_assign_hash",
    "pack_token_budget",
    "mm_decode_real",
    "scd2_customer_history",
    "merge_partition_scoped",
    "sql_tpch_q3",
    "tpch_q5_local_volume",
    "tpch_q6_forecast",
    "tpch_q10_returned",
    "tpch_q14_promo",
    "range_join_bucketed",
    "stream_stream_join",
    "txlog_merge_upsert",
    "txlog_data_skipping",
    "txlog_delete_dv",
    "txlog_zorder_skipping",
    "tpch_q8_market_share",
    "tpch_q21_waiting_supplier",
    "txlog_update_dv",
    "paragraph_dedup",
    "text_unigram_logprob",
    "win_gapfill_locf",
    # round 3
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q20_part_promotion",
    "txlog_optimize_compact",
    "agg_regression_stats",
    "orc_roundtrip",
    "llm_corpus_pipeline",
    "txlog_bloom_skipping",
    "txlog_cdf_stream_source",
    "pyds_custom_source",
    "dedup_fuzzy_name_pairs",
    "resample_gapfill_hourly",
    "join_bucketed_colocated",
    "variant_semistructured",
    "interval_overlap_join",
    "text_sentences",
    "agg_bitwise",
    "safe_arithmetic",
    "scan_provenance",
    # round 4
    "txlog_clustered_write",
    "txlog_widen_schema",
    "retention_cohorts",
    "event_transitions",
    "pareto_frontier",
    "weighted_sample_priority",
    "mm_frame_sample",
    "graph_triangle_counts",
    "arrow_embed_features",
    "udtf_chunk_windows",
    "txlog_stream_upsert_sink",
    "txlog_apply_changes",
    "txlog_incremental_agg_cdc",
    "ann_mmr_rerank",
    "graph_triangle_estimate",
    # round-4 closing wave
    "anomaly_rolling_zscore",
    "anomaly_zscore_bucketed",
    "ewma_daily_smoothing",
    "sql_not_in_nulls",
    "source_reputation",
    "docs_reputable_sources",
    "dedup_simhash_pairs",
    # round-4 Delta/Iceberg interop
    "delta_roundtrip",
    "delta_convert_in_place",
    "delta_txlog_export",
    "delta_checkpoint_read",
    "iceberg_roundtrip",
    "iceberg_partition_pruning",
    "delta_delete_dv",
    "iceberg_position_delete",
    "delta_optimize_lifecycle",
    "iceberg_schema_evolution",
    "delta_cdf_changes",
    "delta_stream_cdf",
    "iceberg_stats_skipping",
    "format_convert_loop",
    "delta_vacuum_lifecycle",
    "iceberg_expire_lifecycle",
    "iceberg_stream_cdf",
    "delta_schema_merge",
    "iceberg_bucket_transform",
    "iceberg_month_transform",
    "iceberg_equality_delete",
    "iceberg_compaction",
    "semantic_dedup_survivors",
    "delta_rename_mapping",
    "iceberg_spec_evolution",
    "iceberg_dynamic_overwrite",
    "iceberg_wap_publish",
    "delta_check_constraint",
    "iceberg_stream_sink",
    "iceberg_rollback",
    # round 5
    "delta_merge_upsert",
    "iceberg_merge_upsert",
    "iceberg_stream_upsert_sink",
    "semantic_dedup_incremental",
    "delta_stream_sink",
    "delta_stream_upsert_sink",
    "delta_restore",
    "delta_shallow_clone",
    "format_convert_chain",
    "iceberg_sorted_compaction",
    "delta_optimize_zorder",
    "pca_embeddings",
    "stratified_split_exact",
    "iceberg_orphan_cleanup",
    # round-5 late wave
    "dedup_incremental_exact",
    "text_heavy_hitters",
    "agg_winsorized_stats",
    "text_kl_divergence",
    "sql_recursive_rollup",
    "agg_kmv_sketch",
    "txlog_hilbert_skipping",
    "scd2_point_in_time_join",
    "text_char_entropy",
    "iceberg_zorder_rewrite",
    "text_bm25_topk",
    "ts_holt_forecast",
    "aqp_sampled_aggregate",
    "txlog_incremental_join_cdc",
    # round 6
    "semantic_dedup_apply_only",
    "dedup_minhash_apply",
    "ann_topk_ivf_seeded",
    "corpus_dup_ngrams",
    "text_bigram_logprob",
    "mixture_temperature_sample",
    "curriculum_quality_phases",
    "win_cumulative_distinct",
    "streaks_gaps_islands",
    "attribution_last_touch",
    "agg_weighted_median",
    "rolling_corr_pairs",
    "txlog_check_constraint",
    "iceberg_branch_tag",
    "delta_generated_column",
    "iceberg_partitions_meta",
    "customer_rfm_segments",
    "intervals_merge_overlaps",
    "join_null_safe",
    "graph_degree_histogram",
    "basket_lift_pairs",
    "agg_mode_per_group",
    "anomaly_mad_robust",
    "orders_backlog_running",
    "stream_backfill_bounded_batches",
    "txlog_incremental_distinct_cdc",
    "txlog_incremental_topk_cdc",
    "sql_grouping_id",
    "ann_range_search_seeded",
    "embedding_label_centroids",
    "ts_seasonal_naive_mase",
    "agg_contribution_pareto",
    "path_trigram_top",
    "txlog_generated_column",
    # round 6 continuation
    "iceberg_rewrite_pos_deletes",
    "iceberg_rewrite_manifests",
    "delta_checkpoint_v2_sidecars",
    "txlog_recluster_incremental",
    "column_defaults_two_formats",
    "stream_fanout_two_sinks",
    "yoy_growth_monthly",
    "ohlc_monthly_orders",
    "chi_square_status_priority",
    "gini_customer_revenue",
    "benford_first_digit",
    "event_entropy_per_user",
    "embedding_outlier_centroid",
    "asof_join_nearest",
    "zipf_slope_tokens",
    "text_hapax_ratio",
    "tokenizer_fertility_by_lang",
    "ts_autocorr_daily",
    "ts_changepoint_meanshift",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "dup_invoice_pairs",
    "customer_ltv_cohort",
    "delta_recluster_incremental",
    "format_convert_full_circle",
    "dq_quarantine_split",
    "agg_hll_sketch",
    "graph_kcore",
    "scd2_incremental_apply",
    "mm_image_dhash_dedup",
    "mm_audio_fingerprint_dedup",
    "delta_cdf_to_txlog_replica",
    "dau_wau_stickiness",
    # round 7
    "ann_topk_pq_seeded",
    "mm_audio_constellation_dedup",
    "iceberg_puffin_ndv_stats",
    "iceberg_ndv_informed_join",
    "txlog_optimize_lease_split",
    "bloom_reduce_join",
    "ks_test_two_sample",
    "psi_price_drift",
    "ts_stl_weekly",
    "event_audience_overlap",
    "mm_video_framehash_dedup",
    "geo_radius_pairs",
    "geo_knn_join",
    "txlog_ndv_informed_join",
    "delta_ndv_informed_join",
    "stream_minhash_dedup_incremental",
    "survival_kaplan_meier",
    "star_ndv_join_ordering",
    "semantic_dedup_seeded",
    "graph_bfs_distances",
    "ts_theil_sen_trend",
    "sketch_intersection_ndv",
    "ts_cross_corr_leadlag",
    "stream_left_outer_join",
    "delta_row_tracking",
    "iceberg_row_lineage",
    "iceberg_row_lineage_rewrite",
    "sketch_kll_quantiles",
    "star_ndv_outer_join",
    "delta_uniform_export",
    "graph_pagerank",
    "sketch_difference_ndv",
    "sketch_kll_grouped",
    "stream_full_outer_join",
    "row_id_incremental_dedup",
    "bpe_encode_tokens",
    "iceberg_delete_vector",
    "txlog_row_tracking",
    "row_id_incremental_scan",
    "event_pattern_match",
    "iceberg_readable_metrics",
    "mm_image_phash_dedup",
    "win_rolling_median",
    "ann_topk_lsh_seeded",
    "bpe_train_merges",
    "txlog_row_tracking_optimize",
    "delta_row_tracking_optimize",
    # round-9 second-session additions
    "delta_type_widening",
    "delta_time_travel_ict",
    "delta_identity_column",
    "graph_connected_components",
    "kll_clustered_write",
    "pca_power_iteration",
    "bpe_encode_seeded",
    "iceberg_type_promotion",
    "ann_mmr_rerank_seeded",
    "stream_kll_quantiles",
    "iceberg_puffin_kll",
    "quantile_stats_three_formats",
    "iceberg_partition_stats",
    "delta_log_compaction",
    "delta_identity_merge",
    # round 10
    "iceberg_partition_stats_unified",
    "iceberg_partition_stats_deletes",
    "decimal_widening_three_formats",
    "sketch_hll_registers_seeded",
    "uniform_dv_roundtrip",
    "delta_identity_evolution",
    "text_simhash_seeded",
    # round 11
    "dedup_minhash_seeded",
    "iceberg_partition_stats_full",
    "iceberg_lineage_dynamic_overwrite",
    "delta_id_mode_writes",
    "delta_mapped_merge",
    "iceberg_lineage_merge",
    # round 12
    "ann_topk_ivfpq_seeded",
    "delta_mapped_schema_merge",
    "iceberg_lineage_identity_partitioned",
    "delta_foreign_partition_mapping",
]

# Apply-only rungs measure STEADY-STATE cost: their fit-once index builds
# (untimed) on a warm call first, so the timed number is the recurring
# per-batch cost the 100 TB amortization claim is about — not the fit.
WARM_FIRST = {"semantic_dedup_apply_only", "dedup_minhash_apply"}

# Plan-pinned, cache-light queries re-timed at the very END of the run:
# if the machine drifted mid-sweep (BASELINE.md's twice-documented
# environment contention — same tree measured 19.2→10.95 s with zero code
# change), the end-of-run canary reads >DRIFT_TAINT× its own start-of-run
# median and the emitted JSON carries env_factor + tainted=true, so an
# inflated extended table can never be committed unflagged again.
CANARIES = ["q1_pricing_summary", "multi_join_snowflake", "tpch_q3_shipping"]
DRIFT_TAINT = 1.2

# Absolute canary reference. The within-run drift canary above is blind
# to a run that is UNIFORMLY loaded from the start (round-10's 14.881 s
# driver run stamped env_factor 0.958/tainted:false because the
# contention drained by run end). abs_factor = median over canaries of
# (this run's start-of-run headline median ÷ this reference); >ABS_TAINT
# taints the run at launch.
#
# DERIVED, not hard-coded (ADVICE r12): the reference is the per-canary
# MEDIAN over the most recent ≤3 committed untainted idle records
# (BENCH_local_r*_idle.json) — so a new clean idle record rebaselines
# the yardstick in the same commit that records it (no manual sync to
# forget), and a persistent environment shift (the documented 1.1-1.3×
# oscillation, BASELINE.md rounds 2/6/10/11) converges into the
# reference over a few rounds instead of pushing honest idle runs over
# the taint line. A one-off loaded run still reads >ABS_TAINT× against
# the recent-median and taints. The hard floor (r10's fastest-known run)
# stays visible in the committed records and BASELINE.md — abs_factor
# measures "honest for THIS machine as it currently runs", not
# "all-time best". Off this machine the derived values still reflect
# the recording host; a much slower host self-taints at launch, which
# is the conservative failure (flagged, not silently trusted).
_ABS_SEED = {  # fallback when no committed idle record parses
    "q1_pricing_summary": 1.294,
    "multi_join_snowflake": 0.637,
    "tpch_q3_shipping": 0.778,
}


def _derive_abs_reference(here: str | None = None) -> dict[str, float]:
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    recs = []
    for fname in os.listdir(here):
        m = re.fullmatch(r"BENCH_local_r(\d+)[a-z]?_idle\.json", fname)
        if not m:
            continue
        try:
            with open(os.path.join(here, fname)) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        q = d.get("queries") or {}
        if (
            d.get("sf") == 0.1
            and d.get("tainted") is not True
            and all(n in q and q[n] > 0 for n in CANARIES)
        ):
            recs.append((int(m.group(1)), {n: float(q[n]) for n in CANARIES}))
    recs = [q for _r, q in sorted(recs, key=lambda t: t[0])[-3:]]
    if not recs:
        return dict(_ABS_SEED)
    return {
        n: round(statistics.median([q[n] for q in recs]), 3) for n in CANARIES
    }


ABS_REFERENCE = _derive_abs_reference()
ABS_TAINT = 1.2

HEADLINE = [
    # relational / analytic core
    "q1_pricing_summary",
    "multi_join_snowflake",
    "tpch_q3_shipping",
    "join_inner_orders_customer",
    "dedup_conditional_prefer",
    "time_parts",
    "derive_columns",
    "agg_cube",
    "win_topk_per_group",
    "win_running_sum",
    "asof_join_events_orders",
    "sessionize_events",
    # north-star document/vector operators
    "text_quality",
    "text_fingerprint",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "neardup_cosine_pairs",
    "ann_topk_bruteforce",
    # streaming
    "stream_tumbling_agg",
]
REPS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM + parquet footers once
    for n in names:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    for n in names:
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        per_query[n] = round(statistics.median(times), 3)

    total = round(sum(per_query.values()), 3)
    record = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }
    extended: dict[str, float] = {}
    for n in EXTENDED:
        if n not in qs:
            continue
        if n in WARM_FIRST:
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        extended[n] = _timed_once(qs[n], spark, sf_dir)
    probe = scale_probe(spark, sf_dir)
    # end-of-sweep drift canaries: median-of-REPS on the same plan-pinned
    # queries the headline already measured at the START of the run
    drift = 0.0
    for n in CANARIES:
        if n not in per_query or per_query[n] <= 0:
            continue
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        drift = max(drift, statistics.median(times) / per_query[n])
    env_factor = round(drift, 3)
    # absolute canary: the headline medians for the canary queries ARE the
    # start-of-run measurements — compare against the committed clean idle
    # reference so a uniformly loaded run self-taints even when the
    # within-run drift ratio looks flat
    abs_factor = compute_abs_factor(per_query, sf)
    tainted = env_factor > DRIFT_TAINT or abs_factor > ABS_TAINT
    record["env_factor"] = env_factor
    record["abs_factor"] = abs_factor
    record["tainted"] = tainted
    detail = {
        **record,
        "extended": extended,
        "scale_probe": probe,
    }
    # The driver keeps only a ~2000-char TAIL of stdout (r4/r5 verdicts:
    # `parsed: null` whenever the one line outgrew the capture). So stdout
    # carries ONLY the compact headline record (<2 KB — survives tail
    # capture verbatim), and the full extended/scale-probe detail goes to
    # sibling files the judge reads directly.
    here = os.path.dirname(os.path.abspath(__file__))
    for fname, payload in (
        ("BENCH_HEADLINE.json", {"headline": total, "unit": "sec", "sf": sf,
                                 "queries": per_query,
                                 "env_factor": env_factor,
                                 "abs_factor": abs_factor,
                                 "tainted": tainted}),
        ("BENCH_DETAIL.json", detail),
    ):
        try:
            with open(os.path.join(here, fname), "w") as f:
                json.dump(payload, f)
        except OSError:
            pass  # read-only checkout: stdout line is still the contract
    print(json.dumps(record))
    spark.stop()


def compute_abs_factor(per_query: dict[str, float], sf: float) -> float:
    """Median over canary queries of (this run's start-of-run headline
    median ÷ the committed clean idle reference). Pure so the
    self-tainting behavior is unit-testable without launching a bench;
    0.0 (never taints) off-sf0.1 since the reference medians are sf0.1."""
    ratios = [
        per_query[n] / ABS_REFERENCE[n]
        for n in CANARIES
        if sf == 0.1
        and n in per_query and n in ABS_REFERENCE and ABS_REFERENCE[n] > 0
    ]
    return round(statistics.median(ratios), 3) if ratios else 0.0


def _timed_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def scale_probe(spark, sf_dir: str) -> dict:
    """Near-linearity probe for the dedup ladder (the regression class
    BASELINE.md's history shows this code is prone to): run MinHash-LSH and
    SimHash over the sf documents table and over a salted 10× copy
    (sf1-equivalent doc count), and report the per-doc cost ratio — ~1.0
    means the candidate generation stayed linear; quadratic blowups or
    Catalyst expression re-inlining show up as ratios ≫ 1."""
    from pyspark.sql import functions as F

    from projectdatalake_spark.operators.dedup import minhash_lsh_pairs
    from projectdatalake_spark.operators.text import simhash_table
    from projectdatalake_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n1 = docs.count()
    # 10 salted copies: one leading token differs per copy, so clones stay
    # near-dups (exercising real verification work) without exact-dup
    # degeneracy
    big = (
        docs.crossJoin(spark.range(10).select(F.col("id").alias("k")))
        .select(
            (F.col("doc_id") * 10 + F.col("k")).alias("doc_id"),
            F.concat(F.lit("v"), F.col("k"), F.lit(" "), F.col("text")).alias("text"),
        )
    )

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out = {"docs_1x": n1, "docs_10x": n1 * 10}
    out["minhash_1x"] = round(timed(lambda: minhash_lsh_pairs(docs, threshold=0.5)), 3)
    out["minhash_10x"] = round(timed(lambda: minhash_lsh_pairs(big, threshold=0.5)), 3)
    out["simhash_1x"] = round(timed(lambda: simhash_table(docs)), 3)
    out["simhash_10x"] = round(timed(lambda: simhash_table(big)), 3)
    out["perdoc_ratio_minhash"] = round(out["minhash_10x"] / 10 / out["minhash_1x"], 3)
    out["perdoc_ratio_simhash"] = round(out["simhash_10x"] / 10 / out["simhash_1x"], 3)

    # composed curation pipeline (quality→dedup→decontam→split→pack):
    # near-linear per-doc cost means every stage stayed shuffle-bounded
    from projectdatalake_spark.pipelines.llm_corpus import curate

    docs_l = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    big_l = (
        docs_l.crossJoin(spark.range(10).select(F.col("id").alias("k")))
        .select(
            (F.col("doc_id") * 10 + F.col("k")).alias("doc_id"),
            F.concat(F.lit("v"), F.col("k"), F.lit(" "), F.col("text")).alias("text"),
            "lang",
        )
    )
    out["pipeline_1x"] = round(timed(lambda: curate(docs_l)), 3)
    spark.catalog.clearCache()
    out["pipeline_10x"] = round(timed(lambda: curate(big_l)), 3)
    spark.catalog.clearCache()
    out["perdoc_ratio_pipeline"] = round(
        out["pipeline_10x"] / 10 / out["pipeline_1x"], 3
    )
    return out


if __name__ == "__main__":
    main()
