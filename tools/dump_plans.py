"""Generate PLANS.md: the formatted physical plan of every headline query at
sf0.1, plus the plan-shape properties the tests pin (shuffle count, join
strategies, pushed filters, read schemas). Run after plan-affecting changes:

    python tools/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"

HEADLINE = [
    "pricing_summary",
    "daily_summary",
    "dedup_latest_events",
    "quality_report",
    "star_join_revenue",
    "topk_orders_per_priority",
    "anti_join_inactive_customers",
    "global_topk_orders",
    "rollup_revenue",
    "asof_click_attribution",
    "range_join_signup_windows",
    "dedup_exact_documents",
    "minhash_lsh_dedup",
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
    "token_stats",
    "doc_repetition_signals",
    "pii_redaction_scrub",
    "resample_locf_daily",
    "scd2_user_event_history",
    "cdc_snapshot_diff",
    "tfidf_keywords",
    "heavy_hitters_users",
    "histogram_order_prices",
    "chunk_documents_fixed",
    "remove_boilerplate",
    "funnel_view_click_purchase",
    "event_transition_matrix",
    "weighted_doc_sample",
    "corr_qty_price_by_flag",
    "mad_outlier_events",
    "zscore_events_by_type",
    "percent_rank_event_values",
    "vocab_top_tokens",
    "encode_documents_vocab",
    "token_bigram_lm",
    "scd2_point_in_time_purchases",
    "weekly_retention_cohorts",
    "top_session_paths",
    "rolling_anomaly_events",
    "funnel_step_latency",
    "session_cooccurrence_pairs",
    "correlated_subquery_q17",
    "rolling_active_users_7d",
    "session_association_rules",
    "heatmap_qty_price",
    "user_feature_matrix",
    "grouping_sets_revenue",
    "leakage_safe_split_docs",
    "incremental_summary_refresh",
    # r6 additions
    "ntile_customer_quartiles",
    "rank_orders_in_priority",
    "equi_depth_bands_events",
    "user_span_campaign_overlap",
    "ngram_jaccard_pairs_prefix",
    "profile_orders_columns",
    "fk_orphan_audit",
    "value_drift_by_type",
    "pca_embeddings_projection",
    "doc_perplexity_bigram",
    "knn_cosine_pca_prefilter",
    "medallion_two_batch_pipeline",
    "triangle_count_user_graph",
    "funnel_within_hour",
    "pareto_customer_revenue",
    "value_trend_by_type",
    "shipping_priority_q3",
    "local_supplier_volume_q5",
    "salted_star_revenue",
    # r7 additions
    "returned_item_customers_q10",
    "promo_revenue_q14",
    "benford_price_audit",
    "cume_dist_event_values",
    "cms_weekly_user_counts",
    "image_dhash_dedup_pairs",
    "knn_pq_adc",
    "weighted_exact_n_per_lang",
    "percent_rank_event_values",
    "volume_shipping_q7",
    "disjunctive_revenue_q19",
    "pareto_customer_revenue",
    "delta_interop_roundtrip",
    "waiting_suppliers_q21",
    "training_order_shuffle",
    "skyline_cheap_large_parts",
    "bm25_search_topk",
    "winnow_plagiarism_pairs",
    "quantile_sketch_weekly",
    "ohlc_daily_bars",
    "hybrid_search_rrf",
    "mmr_diverse_topk",
    # r9/r10 delta-surface additions
    "delta_colmap_bronze_silver",
    "minhash_lsh_verified_md5",
    "simhash_pairs_md5",
    "delta_optimize_skipping_scan",
    "delta_format_front_door",
    "delta_native_front_door",
    "delta_colmap_merge_roundtrip",
    "delta_deletion_vector_read",
    "delta_dv_delete_roundtrip",
    "delta_alter_columns_roundtrip",
    "delta_clone_divergence",
    # r11 additions
    "delta_restore_roundtrip",
    "delta_generated_columns",
    "delta_dv_purge_vacuum",
    "delta_colmap_id_read",
    "delta_v2_checkpoint_roundtrip",
    "delta_type_widening_read",
    "mixture_sample_by_lang",
    # late-r11 additions
    "delta_identity_append",
    "delta_row_tracking_ids",
    "delta_clustered_optimize_read",
    "delta_log_cleanup_roundtrip",
    "audio_features_wav",
    "audio_dedup_pairs",
    "delta_row_tracking_format_read",
    # r12 additions
    "delta_colmap_id_write",
    "ivf_cdc_sync_maintenance",
    "image_dhash_planted_pairs",
    "video_frame_dhash_sampled",
    "video_dedup_pairs_planted",
    "delta_type_widening_write",
    # r13 additions (rotation first-timer families + the re-fixed
    # clustered OPTIMIZE exercising the rank-encoded z-values)
    "hard_negative_mining",
    "label_centroids_embeddings",
    "funnel_within_hour",
    "top_session_paths",
    "stratified_sample_by_lang",
    "zscore_events_by_type",
    "rolling_hourly_user_value",
    "asof_nearest_click_anchor",
    "scd2_point_in_time_purchases",
    "dq_schema_tests_report",
    "profile_orders_columns",
    "fk_orphan_audit",
    "token_bigram_lm",
    # r13 metadata-scale profiles (footer-stats pushdown / log-stats fold)
    "footer_profile_lineitem",
    "delta_log_profile",
    "delta_incremental_liquid_optimize",
    # r14 additions: the SemDeDup flagship + the two rows-only→oracle
    # conversions
    "semantic_dedup_embeddings",
    "multimodal_features",
]


def main() -> None:
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import (
        count_shuffles,
        join_strategies,
        physical_plan,
        pushed_filters,
        read_schemas,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import registry
    from lakehouse_architecture_for_realestatedata_spark.session import get_spark

    spark = get_spark("plans")
    reg = registry()
    print("# PLANS — physical plans of the headline queries (sf0.1)")
    print()
    print(
        "Generated by `tools/dump_plans.py`. The properties below are the"
        " 100 TB contracts `tests/test_plans.py` pins: shuffle count, join"
        " strategy, filter pushdown, column pruning."
    )
    for name in HEADLINE:
        spec = reg.get(name)
        if spec is None:
            continue
        df = spec.spark_fn(spark, SF_DIR)
        print(f"\n## {name}\n")
        if spec.doc:
            print(f"{spec.doc}\n")
        print(f"- shuffles (static plan): {count_shuffles(df)}")
        js = join_strategies(df)
        print(f"- join strategies: {js if js else 'none (no join node)'}")
        pf = [f for f in pushed_filters(df) if f]
        if pf:
            print(f"- pushed filters: {pf}")
        rs = read_schemas(df)
        if rs:
            print(f"- read schemas (pruned): {[s[:120] for s in rs]}")
        print("\n```")
        print(physical_plan(df, mode="simple").strip())
        print("```")


if __name__ == "__main__":
    main()
