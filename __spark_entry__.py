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


# The correctness driver checks a fixed-size prefix of this dict, so
# ordering is part of the contract: the core §2 reference surface and
# TPC-H suite lead, then every remaining ORACLED query (registration
# order), and the handful of rows-only queries (approximate/seeded —
# each pinned by an error-bound test instead) come last.
_PRIORITY = [
    "star_revenue_by_region_year",
    "priority_dim", "calendar_dim", "country_dim", "fact_orders",
    "project_select", "drop_columns", "rename_columns", "derive_column",
    "cast_types", "dropna_rows", "filter_predicate", "null_profile",
    "distinct_rows", "dedup_by_key",
    "join_left_broadcast", "join_string_keys", "join_dedup",
    "groupby_avg", "global_counts", "sas_date_decode", "initcap_labels",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q4_priority_check", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q10_returned_items",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q18_large_volume", "tpch_q19_disjunctive",
    "tpch_q22_dormant_customers",
    "tpch_q2_min_cost_supplier", "tpch_q9_product_profit",
    "tpch_q11_important_stock", "tpch_q12_priority_classes",
    "tpch_q13_customer_distribution", "tpch_q16_supplier_relation",
    "tpch_q17_small_qty_revenue", "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers",
    "dedup_exact_groups", "dedup_exact_keep_canonical",
    "dedup_minhash_lsh", "dedup_simhash", "ngram_jaccard_pairs",
    "dedup_incremental_anti",
    "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf",
    "text_quality_score", "docs_chunk_windows",
    "grouped_median_dev", "grouped_median_dev_native",
    "sas_labels_decode",
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
