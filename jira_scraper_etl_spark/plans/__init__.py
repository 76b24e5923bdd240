"""Driver-facing query plans. Importing this package populates the registry."""

from .registry import QUERIES, Query, queries, oracle_sql  # noqa: F401

# Importing the plan modules populates the registry.
from . import analysis_ops  # noqa: F401,E402
from . import warehouse_ops  # noqa: F401,E402
from . import setsim_ops  # noqa: F401,E402
from . import vector_ops  # noqa: F401,E402
from . import skew_ops  # noqa: F401,E402
from . import llm_ops  # noqa: F401,E402
from . import corpus_ops  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import jira_parity  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import tpch_more  # noqa: F401,E402
from . import scalar_funcs  # noqa: F401,E402
from . import event_time  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Registry order = external-visibility order. Correctness harnesses may
# sample only a PREFIX of the registry (the round-2 driver file covered
# the first 50 entries), so the front of the dict is a deliberate choice,
# not an artifact of import order: new or recently-changed oracle-backed
# queries first (they need fresh external signal most), then the rest of
# the oracle-backed surface, rows-only entries last (their prefix slot
# carries the weakest signal). Rotate _PRIORITY each round as entries
# age: a query that has been externally green twice can yield its slot.
# ---------------------------------------------------------------------------

_PRIORITY = [
    # -- Round-14 rotation (round-13 verdict #2): entries whose plans
    # CHANGED in the r13 optimization round but whose driver window had
    # already rotated away — they were last externally green in r12,
    # PRE-change, so they need post-change driver verification most.
    "dedup_minhash_lsh", "dedup_minhash_verdict", "dq_profile_orders",
    "embedding_pca_power",
    # -- r13-new entries (r13-green once; keep near the front for a
    # second green before yielding their slots) --
    "mm_jpeg_pixel_stats", "curate_dsir_weights",
    "dedup_substring_exact", "text_gopher_quality",
    "text_repetition_coverage", "text_c4_filters", "curate_source_rollup",
    "curate_fineweb_keep",
    # -- Round-13 rotation (verdict #5): strict staleness order --
    # entries sorted by last driver-green round (CORRECTNESS_r*),
    # ties broken by the previous registry order. The 50-entry
    # driver window = the whole 42-entry r8-stale cohort plus the
    # 8 stalest r9 entries; later cohorts follow so the registry
    # order IS the staleness ladder for future rotations.
    # last externally green: round 8 (42 entries)
    "window_ntile_distribution", "text_winnow_fingerprints",
    "q5_local_supplier_volume", "q18_large_volume_customers",
    "customer_rfm_segments", "similarity_ann_signlsh",
    "events_rolling_distinct_hll", "events_anomaly_mad_approx",
    "embedding_pca_project", "snapshot_diff_customers", "dedup_span_exact",
    "dedup_cluster_canonical", "dedup_incremental_novel", "text_vocab_topk",
    "text_char_diversity", "text_repetition_stats", "decontaminate_ngram",
    "decontaminate_hashed", "curate_pretrain_corpus", "curate_corpus_v2",
    "curate_corpus_v3", "text_char_pair_stats", "events_session_concurrency",
    "events_cohort_retention", "window_first_last_orders",
    "events_hourly_gapfill", "events_pivot_type_counts",
    "events_transition_matrix", "similarity_topk_sq8", "curate_dataset_card",
    "dedup_containment", "curate_multimodal_corpus", "decontaminate_embedding",
    "mm_decode_meta", "mm_byte_stats", "mm_resize_plan", "mm_frame_sample",
    "events_attribution_1h", "dedup_pairs_edit_distance", "text_fingerprint",
    "text_pii_redact", "text_length_percentiles",
    # last externally green: round 9 (26 entries)
    "agg_distinct_segments", "agg_exact_count_distinct", "agg_grouping_sets",
    "agg_orders_by_priority", "agg_rollup_year_status",
    "agg_running_max_per_group", "setop_except_never_priority",
    "setop_intersect_buyers", "setop_union_segments", "window_rank_lag_orders",
    "window_running_revenue", "window_top3_orders_per_customer",
    "topk_expensive_orders", "join_anti_customers_without_orders",
    "join_left_outer_order_counts", "join_range_price_bands",
    "join_semi_customers_with_big_orders", "join_asof_last_event_before_order",
    "join_revenue_by_nation", "join_skewed_events_by_type",
    "filter_project_shipped_window", "dedup_exact", "events_funnel_1h",
    "events_latest_state_per_user", "events_session_30m",
    "events_sliding_1h_30m",
    # last externally green: round 10 (26 entries)
    "text_winnow_overlap", "text_bigram_novelty", "text_heavy_hitters_mg",
    "text_bigram_assoc", "dedup_embedding_cosine_exact",
    "similarity_ann_mllsh", "text_corpus_freq_score", "q17_small_qty_revenue",
    "q2_min_cost_supplier", "lateral_topk_customers_per_nation",
    "events_reachability_hops", "events_unpivot_type_counts",
    "events_enriched_segment_hourly", "func_array_ops",
    "func_classification_rules", "func_date_arithmetic",
    "func_date_validation", "func_hashing", "func_json_extract",
    "func_null_handling", "func_question_extraction",
    "func_summary_composition", "func_text_cleanup", "q1_pricing_summary",
    "agg_approx_count_distinct", "agg_cube_flag_status",
    # last externally green: round 11 (49 entries)
    "dedup_semantic_semdedup", "text_bpe_encode_stats",
    "events_pagerank_types", "agg_regression_price_qty", "events_ewma_value",
    "similarity_ann_ivfpq", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_national_market_share", "q9_product_type_profit", "q10_returned_items",
    "q11_important_parts", "q12_shipping_delay_buckets",
    "q14_promotion_effect", "q16_part_supplier_relation",
    "q21_suppliers_kept_waiting", "q20_potential_part_promotion",
    "q13_customer_order_distribution", "q15_top_supplier",
    "mm_png_pixel_stats", "similarity_topk_bruteforce", "split_train_test",
    "sample_stratified", "pack_sequences", "sample_mixture_weights",
    "embedding_label_centroids", "agg_listagg_rich_customers",
    "agg_mode_priority_by_status", "agg_percentile_disc_price",
    "mm_pixel_stats", "mm_wav_sample_stats", "text_winnow_fingerprints_fast",
    "q4_order_priority_checking", "q19_disjunctive_revenue",
    "q22_global_sales_opportunity", "window_relative_rank_stats",
    "agg_boolean_aggregates", "func_regex_extract", "events_tumbling_1h",
    "text_language_id", "text_quality_score", "text_token_stats",
    "events_trailing_1h_sum", "dedup_embedding_cosine", "similarity_ann_ivf",
    "dedup_jaccard_prefix", "text_tfidf_topk", "dedup_embedding_cosine_rp",
    "embedding_kmeans_exact",
    # last externally green: round 12 (the four r13-CHANGED members of
    # this cohort moved to the front of the list, above)
    "dedup_embedding_rp_verdict", "layout_compaction_bins",
    "dq_histogram_totalprice", "events_user_journey", "events_anomaly_mad",
    "window_rolling_median", "stats_corr_matrix", "ngram_count_of_counts",
    "bpe_learn_merges", "events_trailing_distinct_types",
    "dq_referential_integrity", "q3_shipping_priority", "events_volume_cusum",
    "events_path_mining", "events_markov_eval", "orders_basket_affinity",
    "events_watermark_audit", "merge_upsert_customer_balance",
    "events_merge_intervals", "events_scd2_history",
    "events_winsorize_p1_p99", "events_winsorize_approx",
    "sample_weighted_hash", "agg_incremental_merge", "agg_hll_mergeable",
    "events_type_cooccurrence", "events_zorder_code", "mm_dedup_phash",
    "events_debounce_5m", "orders_yoy_growth", "pareto_revenue_by_brand",
    "chunk_documents_overlap", "text_dedup_lines", "corpus_shard_shuffle",
    "join_hotkey_isolated_lang", "dedup_simhash_pairs", "join_skewed_peers_1h",
    "text_length_percentiles_approx", "jira_qa_pairs_udtf",
    "jira_transform_silver", "jira_corpus_stats", "jira_source_scan",
    "embedding_quantize_int8", "dedup_simhash", "dedup_ngram_jaccard",
    "join_full_outer_entity_activity",
]
_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"_PRIORITY names not in registry: {_missing}"
_dupes = len(_PRIORITY) - len(set(_PRIORITY))
assert not _dupes, f"_PRIORITY contains {_dupes} duplicate names"
_ordered = {n: QUERIES[n] for n in _PRIORITY}
_ordered.update((n, q) for n, q in QUERIES.items() if n not in _ordered)
QUERIES.clear()
QUERIES.update(_ordered)
