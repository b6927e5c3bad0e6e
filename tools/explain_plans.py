"""Dump formatted physical plans for headline queries into PLANS.md.

Run: python tools/explain_plans.py [sf_dir]

The point is auditability of the scale story: every plan should show
column-pruned scans (ReadSchema), pushed filters, broadcast joins for
dimension tables, partial aggregation, and wide WholeStageCodegen
spans.  Re-run after touching an operator and diff.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q_proj",
    "q_sort_limit",
    "q_agg_basic",
    "q_join_multi",
    "q_changelog_replay",
    "q_window_frame_range",
    "q_neardup_minhash",
    "q_neardup_jaccard",
    "q_simhash",
    "q_simsearch_ivf",
    "q_training_mix",
    "q_scd2",
    "q_pack_sequences",
    "q_chunk_docs",
    "q_vocab_oov",
    "q_quantize",
    "q_typemap_roundtrip",
    "q_embed_dedup",
    "q_tpch_q3",
    "q_kmeans",
    "q_pmi_bigrams",
    "q_dedup_keep_best",
    "q_fuzzy_dedup",
    "q_perplexity",
    "q_bm25",
    "q_pagerank",
    "q_tpch_q5",
    "q_tpch_q18",
    "q_winsorize",
    "q_tpch_q7",
    "q_tpch_q10",
    "q_map_ops",
    "q_boilerplate",
    "q_semantic_dedup",
    "q_tpch_q1",
    "q_tpch_q4",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_token_entropy",
    "q_zipf_slope",
    "q_span_dedup",
    "q_event_topk_hourly",
    "q_knn_classify",
    "q_media_decode_bmp",
    "q_media_decode_wav",
    "q_media_decode_png",
    "q_media_decode_gif",
    "q_media_frames_gif",
    "q_media_decode_jpeg",
    "q_media_decode_jpeg_color",
    "q_media_resize",
    "q_media_mp4_demux",
    "q_media_mp3_framing",
    "q_centroid_classify",
    "q_ngram_novelty",
    "q_session_stats",
    "q_cms_freq",
    "q_bloom_membership",
    "q_tpch_q8",
    "q_tpch_q17",
    "q_tpch_q21",
    "q_attribution",
    "q_event_paths",
    "q_copurchase",
    "q_text_embed_join",
    "q_incremental_rollup",
    "q_scd2_asof",
    "q_dlq_stats",
    "q_forget_keys",
    "q_clean_text",
    "q_skew_audit",
    "q_graph_triangles",
    "q_mutual_info",
    "q_truncate_middle",
    "q_dup_ranges",
    "q_lorenz_gini",
    "q_tokenizer_fertility",
    "q_lsh_calibration",
    "q_basket_lift",
    "q_ab_test",
    "q_event_transitions",
    "q_null_profile",
    "q_containment",
    "q_active_users_7d",
    "q_incremental_neardup",
    "q_ref_integrity",
    "q_wire_size_stats",
    "q_supplier_share",
    "q_mix_plan",
    # r3 waves
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_slot_lag",
    "q_offset_gaps",
    "q_props_schema_drift",
    "q_snapshot_handoff",
    "q_sink_commit_latency",
    "q_csv_wire",
    "q_topic_partition_assign",
    "q_dup_inflation",
    "q_doc_hapax",
    # r7 waves
    "q_media_video_mjpeg",
    "q_embed_cov",
    "q_power_iteration",
    "q_snapshot_chunks",
    "q_ewma_daily",
    "q_rolling_corr",
    "q_rolling_median",
    "q_seasonal_decompose",
    "q_autocorr",
    "q_cusum_changepoint",
    "q_chain_overlap",
    "q_class_balance_sample",
    "q_compaction_plan",
    "q_zorder_layout",
    "q_column_stats_skipping",
    "q_window_pmi_pairs",
    "q_rouge_overlap",
    "q_collapsing_merge",
    "q_queue_backlog",
    "q_wal_segment_budget",
    "q_runtime_filter_effect",
    "q_shuffle_plan_advisor",
    "q_broadcast_advisor",
    "q_mojibake_audit",
    "q_readability",
    "q_norm_text_dedup",
    "q_percent_change_wow",
    "q_partition_prune_stats",
    "q_benford_audit",
    "q_ols_regression",
    "q_cohort_matrix",
    "q_chi2_independence",
    "q_trigram_paths",
    "q_hazard_table",
    "q_temperature_mix",
    "q_interarrival_stats",
    "q_trend_forecast",
    "q_zscore_outliers",
    "q_backfill_plan",
    "q_grouped_agg_pandas",
    "q_ship_lag_sla",
    "q_cosine_calibration",
    "q_dp_geometric_counts",
    "q_kanonymity_audit",
    "q_topk_two_phase",
    "q_percentile_histogram",
    "q_encoding_advisor",
    "q_lateral_subquery",
    "q_data_contract",
    "q_time_travel",
    "q_topic_compaction",
    "q_trgm_search",
    "q_phrase_count_rank",
    "q_bitmap_index",
    "q_weighted_priority_sample",
    "q_mahalanobis_diag",
    "q_recursive_bfs",
    "q_variant_json",
    "q_pipe_syntax",
    "q_table_checksum",
    "q_calendar_dim",
    "q_base64_wire",
    "q_cascade_impact",
    "q_survivorship_merge",
    "q_feature_hashing",
    "q_target_encoding",
    "q_negative_sampling",
    "q_temporal_split_audit",
    "q_ks_two_sample",
    "q_self_similarity",
    "q_seq_patterns",
    "q_txn_boundaries",
    "q_partial_state_merge",
    "q_consistent_hash_moves",
    "q_skyline",
    "q_supply_allocation",
    "q_named_window",
    "q_group_by_all",
    "q_threshold_curve",
    "q_lexicon_spans",
    "q_robust_scaler",
    "q_learning_curve",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from kafka_connect_postgres_to_clickhouse_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark()
    qs = entry.queries()
    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        f"Generated by `python tools/explain_plans.py {sf_dir}`.",
        "Things to look for: `ReadSchema` (column pruning), `PushedFilters`,",
        "`BroadcastHashJoin` on dimension/centroid/profile sides, `partial_`",
        "aggregate modes, and `WholeStageCodegen` span ids.",
        "",
    ]
    for key in HEADLINE:
        df = qs[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {key}\n\n```\n{plan.strip()}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
