"""Scale-headroom probe: replicate the sf0.1 fixtures N× (key-shifted
so uniqueness invariants hold) into a temp dir, then time the heavy
keys on the inflated data.

    python tools/stress_scale.py [N]      # default N=10 → 6M lineitem rows

Prints one line per key: inflated time, sf0.1 time, and the time
ratio vs the data ratio — near-linear (ratio ≈ N or below) means the
plan scales; superlinear growth flags a blowup the small-SF bench
can't see.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# key columns to shift per replica so PK-ish invariants survive
SHIFT_COLS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHIFT_STEP = 100_000_000

# replicated (fact) tables; dims stay 1× so joins keep their shape
REPLICATED = set(SHIFT_COLS)

KEYS = [
    "agg_groupby_hash",
    "join_multiway_star",
    "agg_cube",
    "win_row_number_topn",
    "stream_tumbling_agg",
    "text_tokenize_tf",
    "dedup_exact",
    "sim_knn_cosine",
    "dedup_minhash_lsh",
    "dedup_chunk",
    "contamination_ngram",
    "retention_cohort",
    "time_resample_ohlc",
    "tpch_q3",
    "tpch_q5",
    "tpch_q18",
    "tpch_q21",
    "event_transition_matrix",
    "win_count_distinct_sliding",
    "attribution_first_last",
    "text_unigram_logprob",
    "join_asof_tolerance",
    "agg_hll_partial_union",
    # round-4 additions
    "corpus_mix_report",
    "pack_sequences",
    "mix_weighted_sample",
    "embedding_quantize_int8",
    "select_token_budget",
    "event_pagerank",
    "text_heavy_hitters",
    "stream_hopping_topk",
    "agg_bitmap_distinct",
    "agg_weighted_percentile",
    "pipeline_training_mix",
    "event_session_stats",
    "mix_temperature_sampling",
    "alter_table_evolution",
    # round-5 additions
    "join_interval_bucketed",
    "join_asof_nearest",
    "text_bigram_logprob",
    "agg_corr_matrix",
    "sim_knn_pq",
    # round-5 mining batch
    "graph_triangle_count",
    "assoc_basket_lift",
    "agg_skew_kurtosis",
    "time_ewma",
    "event_anomaly_mad",
    "text_count_min",
    "sim_tfidf_cosine",
    "dedup_blocked_levenshtein",
    "feature_quantile_bins",
    "win_percent_cume",
    "win_nth_value",
    "udtf_apply_in_arrow",
    # round-5 second wave
    "join_null_safe",
    "agg_string_agg",
    "agg_conditional_family",
    "event_rfm_scores",
    "event_cooccurrence_pmi",
    "event_active_streaks",
    "text_keyword_topk",
    "time_lttb_downsample",
    "graph_jaccard_neighbors",
    "event_abtest_lift",
    "ml_eval_auc",
    "json_variant_extract",
    "corpus_zipf_fit",
    "event_window_funnel",
    "storage_rle_advisor",
    "agg_abc_classification",
    "ml_train_logreg",
    "time_series_decompose",
    "agg_hll_intersection",
    "join_lateral",
    # round-5 third wave (warehouse / survival / graph / layout)
    "scd2_history",
    "cdc_apply_log",
    "sample_reservoir",
    "ml_feature_hashing",
    "graph_degree_stats",
    "event_conversion_latency",
    "attribution_linear",
    "dedup_keep_best",
    "storage_zorder_advisor",
    "event_survival_km",
    "interval_max_concurrency",
    "graph_kcore",
    # round-5 fourth wave (novelty / PIT / mixing / MMR / LPA / M4)
    "text_ngram_novelty",
    "feature_pit_join",
    "mix_epoch_repeat",
    "sim_mmr_diversify",
    "graph_label_propagation",
    "source_txnlog_snapshot",
    "time_downsample_m4",
    "event_funnel_unordered",
    "win_time_range_frame",
    # round-5 fifth wave
    "time_changepoint_cusum",
    "event_cart_abandonment",
    "inventory_backlog_timeline",
    "ml_train_kmeans",
    "event_dwell_time",
    "mix_source_overlap_matrix",
    "stream_stream_left_join",
    "win_ignore_nulls",
    "win_exclude_current",
    "scan_table_checksum",
    "pipeline_incremental_dedup",
    "multimodal_chunk_overlap",
    "agg_trimmed_mean",
    "event_error_burn_rate",
    "corpus_heaps_law",
    "corpus_js_divergence",
    "event_segment_migration",
    "join_temporal_scd2",
    "event_ab_srm_check",
    "agg_gini_coefficient",
    "time_autocorrelation_acf",
    "graph_assortativity",
    "time_week_over_week",
    "dedup_containment",
    # round-6 wave
    "dialect_recursive_components",
    "dialect_iterate_kcore",
    "sink_txnlog_append",
    "source_txnlog_time_travel",
    "agg_herfindahl_index",
    "event_seq2_mining",
    "time_seasonal_naive_forecast",
    "event_bot_regularity",
    "graph_adamic_adar",
    "feature_target_encoding_loo",
    "ml_eval_confusion_prf",
    "orders_fulfillment_aging",
    "event_inter_arrival_fit",
    "corpus_loo_nll_by_source",
    "feature_woe_iv",
    "graph_local_clustering_topk",
    "stream_lateness_audit",
    "orders_duplicate_billing",
    "orders_cohort_ltv",
    "text_code_detect",
    "scan_minmax_file_skipping",
    "multimodal_pair_integrity",
    "pipeline_split_decontaminate",
    "win_groups_frame",
    "agg_theil_index",
    "event_new_vs_returning",
    "orders_sales_mix_shift",
    "text_frequency_filter",
    "sim_dedup_threshold_sweep",
    "dialect_iterate_components",
    "embedding_quality_audit",
    "inventory_abc_xyz",
    "time_peak_detection",
    "agg_benford_digits",
    "text_readability",
    "agg_winsorized_mean",
    "supply_single_source_risk",
    "pipeline_dedup_funnel",
    "mix_kl_to_target",
    "part_price_consistency",
    "event_audience_overlap",
    "event_retention_curve_fit",
    "text_nonascii_audit",
    "event_psi_value_drift",
    "orders_quarter_end_loading",
    "embedding_source_centroids",
    "data_contract_audit",
    "orders_top_customer_share",
    "event_hourly_heatmap",
]


def build(spark, n: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(tempfile.gettempdir(), f"adb_stress_{n}x")
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for t in TABLES:
        src = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        if t in REPLICATED:
            parts = []
            for i in range(n):
                p = src
                for c in SHIFT_COLS[t]:
                    p = p.withColumn(c, F.col(c) + F.lit(i * SHIFT_STEP))
                parts.append(p)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = src
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def main() -> int:
    # usage: stress_scale.py [N] [key ...]  (keys default to KEYS)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    keys = list(dict.fromkeys(sys.argv[2:] or KEYS))
    # 100x probes build broadcasts (saturated dictionaries, firsts
    # tables) that are tens-of-MB at 10x but hundreds at 100x — give
    # the single local JVM cluster-executor-sized heap room
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from algebraicdb_spark.plans import registry
    from algebraicdb_spark.session import get_spark
    from algebraicdb_spark.sources.catalog import load_tables

    spark = get_spark("stress", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"building {n}x fixtures …", flush=True)
    big = build(spark, n)

    qs = registry.queries()

    def run(sf_dir: str, key: str) -> float:
        load_tables(spark, sf_dir)
        t0 = time.time()
        qs[key](spark, sf_dir).collect()
        return time.time() - t0

    print(f"{'key':28s} {'1x':>7s} {'%dx' % n:>8s}  ratio (data={n}x)")
    for key in keys:
        base = min(run(BASE_SF, key) for _ in range(2))
        infl = min(run(big, key) for _ in range(2))
        flag = "" if infl / max(base, 1e-9) <= n * 1.5 else "  <-- SUPERLINEAR"
        print(f"{key:28s} {base:6.2f}s {infl:7.2f}s  {infl / max(base, 1e-9):5.1f}x{flag}",
              flush=True)
    shutil.rmtree(big, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
