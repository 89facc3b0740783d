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


# The correctness driver checks a fixed-size (~50) prefix of this
# dict, so ordering is part of the contract. Round-3 rotation
# (VERDICT r2 #3): the flagship plus one representative per §2 family
# keeps the reference surface continuously driver-verified, and the
# rest of the window goes to oracled queries that r01/r02 never
# checked — round-3-changed queries first, then the heaviest new
# shuffle shapes. Queries already driver-green in r01/r02 (TPC-H
# suite, dedup/ANN leads) follow after the window; rows-only
# approximate/seeded queries (pinned by error-bound tests) come last.
_PRIORITY = [
    "star_revenue_by_region_year",
    # one driver-green representative per §2 family, every round
    "priority_dim", "cast_types", "dropna_rows", "null_profile",
    "distinct_rows", "dedup_by_key", "join_left_broadcast",
    "country_dim", "join_string_keys", "join_dedup", "groupby_avg",
    "global_counts", "calendar_dim", "sas_date_decode",
    "initcap_labels", "sas_labels_decode",
    # changed this round — must re-earn a driver-green row
    "events_rolling_7d_active_users", "events_spend_rank_stats",
    "kmeans_clusters",
    # never checked in r01/r02: heavy new shuffle shapes first
    "dedup_clusters", "orders_equidepth_deciles",
    "docs_global_dup_spans", "docs_contamination_check",
    "docs_repetition_stats", "variant_extract_props",
    "events_transition_bigrams", "events_forward_fill",
    "unpivot_part_metrics", "olap_grouping_sets",
    "pivot_native_counts", "stats_corr_exact", "sample_hash_orders",
    "window_running_sum", "scd2_nation_update",
    "rollup_incremental_merge", "quality_expectation_report",
    "embedding_neardup_pairs", "embedding_quantize_int8",
    "sql_exists_semijoin", "sql_not_exists_antijoin",
    "sql_scalar_subquery", "sql_recursive_date_spine",
    "sql_lateral_topn_per_customer", "text_token_stats",
    "text_lang_id", "text_fingerprint", "text_top_terms",
    "json_extract_props", "pii_redact_contacts",
    # ---- ~50-row driver window boundary ----
    # still-unchecked tail: rotate into the window in round 4
    "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf",
    "text_quality_score", "docs_chunk_windows",
    "grouped_median_dev", "grouped_median_dev_native",
    "sql_fact_dim_join", "sql_qualified_star",
    "text_tfidf_top_terms", "text_fuzzy_pairs_levenshtein",
    "text_pseudonymize_sha2", "docs_pack_sequences",
    "corpus_mixture_sample", "ml_split_assignment",
    "orders_price_histogram", "orders_outlier_iqr",
    "events_debounce", "orders_winsorized_sum",
    "events_zscore_outliers", "orders_snapshot_diff",
    "orders_column_profile", "events_mode_value_per_type",
    "text_inverted_index",
]


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
