"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-schema query on sf0.001; ``queries`` /
``oracle_sql`` expose the engine's operator inventory (SURVEY.md §2 +
training-data-pipeline extensions) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udacitycapstonedataengineer_spark.plans.queries import ORACLE, QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["star_revenue_by_region_year"](spark, SF_SMOKE)


# The correctness driver checks a fixed-size 50-row prefix of this
# dict, so ordering is part of the contract. ADVICE r5 found the
# round-5 boundary comment had drifted to slot 51 (dropping
# docs_char_class_profile), so the window is now an explicit
# constant: _DRIVER_WINDOW = the first 50 of the pool below, and
# tests/test_entry_contract.py asserts (a) the window is exactly 50,
# (b) every query in the must-check tiers lands inside it, and
# (c) every registered query is either driver-green in a committed
# CORRECTNESS_r*.json or inside the window — rotations can't silently
# starve a query again.
#
# Round-8 tiers, in order (VERDICT r7 #1: ALL 16 r02-stale queries
# rotate this round — the count is now derived from the raw
# CORRECTNESS_r*.json files by tests/test_entry_contract.py, not a
# hand-maintained comment — plus the full 30-query r03 cohort, which
# fills the window: 1 flagship + 1 re-earn + 9 new + 39 rotation
# = 50. After this round no registered query's latest driver green
# is older than r03, and only seven r03 queries (deferred to r9 —
# see _DEFERRED_R03) remain below r04.):
#   1. flagship
#   2. changed this round — must re-earn their rows
#   3. new round-8 queries — earn rows immediately
#   4. staleness rotation: every query whose LAST driver-green round
#      is r02 (16 queries: the near-dup dedup family, projection
#      basics, TPC-H q19-q22) then the whole r03 cohort (30).
_REEARN_R8 = [
    # png_decode gained the whole-image filter-0/2 fast path — the
    # registered roundtrip query must re-earn its row on the new code
    "multimodal_png_roundtrip",
]
_NEW_R8: list[str] = [
    # composed IVF-PQ index, full-pipeline DuckDB replay + recall contract
    "ann_topk_ivfpq",
    # BM25 served from the standing postings index (scan twin's oracle)
    "text_bm25_indexed_topk",
    # SemDeDup: k-means cells + within-cell cosine, full oracle replay
    "semdedup_pairs",
    # incremental SemDeDup: batch vs corpus-fitted standing cells
    "semdedup_incremental_pairs",
    # IVF-PQ + exact re-rank refinement (FAISS refine stage)
    "ann_topk_ivfpq_refined",
    # Kneser-Ney continuation counts (n-gram LM training statistic)
    "text_kn_continuation_counts",
    # rare-bigram (OOV) rate — corpus-statistics quality screen
    "docs_oov_bigram_rate",
    # int8-code cosine serving path (exact integer dot products)
    "ann_topk_int8",
    # SemDeDup keep policy: closure over semantic pairs
    "semdedup_clusters",
]
_ROTATION_R8 = [
    # last green r02
    "dedup_exact_groups", "dedup_exact_keep_canonical",
    "dedup_incremental_anti", "dedup_minhash_lsh", "dedup_simhash",
    "ngram_jaccard_pairs", "derive_column", "drop_columns",
    "project_select", "rename_columns", "filter_predicate", "fact_orders",
    "tpch_q19_disjunctive", "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers", "tpch_q22_dormant_customers",
    # last green r03
    "docs_contamination_check", "docs_global_dup_spans",
    "docs_repetition_stats", "embedding_neardup_pairs",
    "embedding_quantize_int8", "events_forward_fill",
    "events_spend_rank_stats", "events_transition_bigrams",
    "json_extract_props", "kmeans_clusters", "olap_grouping_sets",
    "pii_redact_contacts", "pivot_native_counts",
    "quality_expectation_report", "rollup_incremental_merge",
    "sql_exists_semijoin",
    "sql_lateral_topn_per_customer", "sql_not_exists_antijoin",
    "sql_recursive_date_spine", "sql_scalar_subquery", "stats_corr_exact",
    "text_lang_id", "text_token_stats",
    # (four r03 queries defer to r9; their slots went to the round-8
    # new-query tier. test_stalest_cohort_rotates keeps them from
    # starving: r03 becomes the stalest cohort after this round and
    # must rotate next.)
]
_DEFERRED_R03 = [
    "sample_hash_orders", "scd2_nation_update", "text_fingerprint",
    "text_top_terms", "unpivot_part_metrics", "variant_extract_props",
    "window_running_sum",
]
# prior-round tier lists (green in CORRECTNESS_r07; kept for registry
# ordering beyond the checked prefix)
_GREEN_R7 = [
    "dedup_clusters", "text_bpe_pair_stats",
    "docs_ngram_repetition", "orders_benford_screen",
    "events_markov_transition", "embeddings_gram_matrix",
    "orders_zorder_key", "text_bm25_linear_topk",
    "parts_copurchase_triangles", "events_asof_last_purchase",
    "events_cohort_retention", "events_funnel_conversion",
    "events_lag_lead_ntile", "events_pivot_by_type",
    "events_range_join_click_error", "events_session_window_native",
    "events_sessionize", "events_topk_per_group",
    "events_trailing_hour_sum", "events_window_agg",
    "multimodal_audio_windows", "multimodal_features",
    "multimodal_frame_sample", "multimodal_meta_stats", "olap_cube_counts",
    "olap_rollup_counts", "percentile_by_status", "set_except",
    "set_intersect", "set_union_distinct", "topk_orders_global",
    "tpch_q1_pricing_summary", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_priority_check",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_priority_classes",
    "tpch_q13_customer_distribution", "tpch_q14_promo_effect",
    "tpch_q16_supplier_relation", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
]
_GREEN_R6 = [
    "docs_char_class_profile",
    "supplier_nation_trade_matrix",
    "docs_source_lang_mix",
    "nation_revenue_share",
    "events_type_weekday_chisq",
    "orders_cohort_ltv",
    "orders_daily_autocorr",
    "orders_monthly_price_bands",
    "text_bigram_pmi",
    "events_linear_attribution",
    "events_heavy_hitters",
    "events_linear_attribution_daygrain",
    "orders_cohort_ltv_incremental",
    "corpus_sample_exact_counts",
    "lineitem_selfjoin_fanout_profile",
    "events_bot_regularity_audit",
    "embeddings_norm_outliers",
    "events_daily_anomaly_seasonal",
    "orders_duplicate_invoice_pairs",
    "docs_crosslingual_template_leakage",
    "orders_scd2_asof_revenue",
    "orders_monthly_forecast_eval",
    "orders_daily_drawdown",
    "orders_cohort_survival",
    "part_sourcing_risk_grid",
    "events_error_burst_windows",
    "priority_dim",
    "join_left_broadcast", "groupby_avg", "calendar_dim",
    "null_profile", "dedup_by_key", "sas_labels_decode",
    "dropna_rows", "sas_date_decode",
    "cast_types", "country_dim", "global_counts", "initcap_labels",
    "join_string_keys", "join_dedup", "distinct_rows",
    "tpch_q15_top_supplier",
    "ann_topk_bruteforce", "text_tfidf_top_terms",
    "docs_pack_sequences", "corpus_mixture_sample",
    "orders_snapshot_diff", "orders_equidepth_deciles",
]
# driver-green in earlier rounds, kept registered after the window
_GREEN_BACKLOG = [
    "docs_novelty_hapax", "text_keyword_search_topk",
    "corpus_source_overlap", "cms_point_counts",
    "dedup_minhash_incremental", "ann_topk_filtered",
    "events_mad_outliers", "events_user_streaks",
    "bloom_membership_orders", "orders_profile_drift",
    "scd2_point_in_time_read", "basket_part_pairs",
    "events_conversion_latency_stats", "lineitem_shipping_lag_stats",
    "docs_length_percentiles_by_source", "events_power_users_pareto",
    "orders_monthly_seasonality",
    "customer_rfm_segments", "docs_quality_gate_funnel",
    "supplier_lead_time_trend", "events_first_touch_attribution",
    "referential_integrity_audit", "events_hourly_heatmap",
    "orders_open_backlog_daily", "docs_shingle_containment",
    "orders_hot_keys_skew", "orders_interorder_gap_stats",
    "events_dau_mau_stickiness",
    "events_churn_buckets",
    "docs_token_rarity",
    "text_vocab_coverage", "events_session_duration_stats",
    "docs_dedup_savings_by_source", "graph_pagerank_eventtypes",
    "nation_top_customers_concat", "orders_daily_status_spine",
    "events_activity_bitmap", "embeddings_label_centroid",
    "dedup_threshold_sweep", "docs_pack_budget_sweep",
    "orders_first_vs_repeat_revenue", "events_new_vs_returning_daily",
    "part_brand_supplier_hhi",
    "docs_langid_agreement", "lineitem_discount_band_revenue",
    "customer_segment_value_profile",
    "orders_value_gini",
    "ann_topk_lsh", "ann_topk_ivf",
    "text_quality_score", "docs_chunk_windows",
    "sql_fact_dim_join",
    "orders_outlier_iqr", "events_debounce",
    "sketch_distinct_users_daily",
    "grouped_median_dev", "grouped_median_dev_native",
    "sql_qualified_star",
    "text_fuzzy_pairs_levenshtein",
    "text_pseudonymize_sha2",
    "ml_split_assignment",
    "orders_price_histogram",
    "orders_winsorized_sum",
    "events_zscore_outliers",
    "orders_column_profile", "events_mode_value_per_type",
    "text_inverted_index",
    "approx_percentile_price", "approx_distinct_users",
    "sample_stratified_by_status",
    "sketch_value_quantiles",
    "events_rolling_7d_active_users",
]

_PRIORITY = (
    ["star_revenue_by_region_year"]
    + _REEARN_R8
    + _NEW_R8
    + _ROTATION_R8
    + _GREEN_R7
    + _GREEN_R6
    + _GREEN_BACKLOG
)
# the driver's correctness gate reads exactly this prefix
_DRIVER_WINDOW = _PRIORITY[:50]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    oracled-first (see _PRIORITY note)."""
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in ordered and n in ORACLE]
    ordered += [n for n in QUERIES if n not in ordered]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return dict(ORACLE)
