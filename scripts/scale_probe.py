"""One-off ~sf1 scale probe (VERDICT r1 #8).

The driver ships sf{0.001,0.01,0.1}; to validate the AQE/shuffle
settings beyond sf0.1 this synthesizes a ×N replica of sf0.1 (fact
tables replicated with shifted keys so join integrity and key
cardinality growth are preserved; dims kept as-is, mirroring TPC-H's
sublinear dim scaling) and times the most expensive headline queries.

Usage:  python scripts/scale_probe.py [factor] [out_dir]
Prints one JSON line with per-query seconds at the scaled SF.

This is a PERF probe only — correctness stays pinned to the driver's
own testdata at sf0.01/sf0.001.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from udacitycapstonedataengineer_spark.session import get_spark  # noqa: E402
from udacitycapstonedataengineer_spark.sources.readers import (  # noqa: E402
    TABLES,
    load_table,
)

PROBE_QUERIES = [
    "star_revenue_by_region_year",
    "tpch_q5_local_supplier_volume",
    "tpch_q3_shipping_priority",
    "tpch_q1_pricing_summary",
    "tpch_q10_returned_items",
    "dedup_minhash_lsh",
    "dedup_by_key",
    "events_sessionize",
    # round-2b additions: heaviest of the new suite
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "text_tfidf_top_terms",
    "docs_contamination_check",
    "docs_pack_sequences",
    # round-3 additions: remaining heavy round-2b shuffle shapes
    # (VERDICT r2 #4/#5)
    "orders_equidepth_deciles",
    "docs_global_dup_spans",
    "events_rolling_7d_active_users",
    "dedup_clusters",
    # round-4 additions: bigram/shingle-grain and incremental shapes
    "docs_novelty_hapax",
    "corpus_source_overlap",
    "dedup_minhash_incremental",
    "text_keyword_search_topk",
    # round-4b: order-grain self-join and bounded range-join shapes
    "basket_part_pairs",
    "events_conversion_latency_stats",
    # round-5: remaining round-4 shapes with no sf1-eq datapoint
    # (VERDICT r4 #5)
    "bloom_membership_orders",
    "cms_point_counts",
    "events_power_users_pareto",
    "events_user_streaks",
    "orders_profile_drift",
    # round-5/5b: new heavy shapes — shingle self-join, ±1-delta
    # backlog, 30-anchor engagement fan-out, term-grain rarity
    "docs_shingle_containment",
    "orders_open_backlog_daily",
    "events_dau_mau_stickiness",
    "docs_token_rarity",
    "customer_rfm_segments",
    "supplier_lead_time_trend",
    # round-5c/5d: term ranking, sessionization rollup, iterative
    # PageRank, fingerprint savings, bitmap aggregate, centroids
    "text_vocab_coverage",
    "events_session_duration_stats",
    "graph_pagerank_eventtypes",
    "docs_dedup_savings_by_source",
    "events_activity_bitmap",
    "embeddings_label_centroid",
    # round-5e sweeps
    "dedup_threshold_sweep",
    "docs_pack_budget_sweep",
    # round-5f growth/concentration
    "orders_first_vs_repeat_revenue",
    "events_new_vs_returning_daily",
    "part_brand_supplier_hhi",
    # round-5g/5h: per-row model exprs + ranking-path Gini
    "docs_langid_agreement",
    "orders_value_gini",
    # round-5i re-probe: de-broadcast customer (ADVICE r5)
    "supplier_nation_trade_matrix",
    # round-6: bigram-grain shuffle, trailing-window fan-out,
    # MG candidates + exact verify, custkey cohort join
    "text_bigram_pmi",
    "events_linear_attribution",
    "events_linear_attribution_daygrain",
    "events_heavy_hitters",
    "orders_cohort_ltv",
    "orders_monthly_price_bands",
    "orders_cohort_ltv_incremental",
    "corpus_sample_exact_counts",
    "lineitem_selfjoin_fanout_profile",
    "events_bot_regularity_audit",
    "embeddings_norm_outliers",
    "events_daily_anomaly_seasonal",
    "text_bpe_pair_stats",
    "orders_duplicate_invoice_pairs",
    "docs_crosslingual_template_leakage",
    "orders_scd2_asof_revenue",
    "orders_monthly_forecast_eval",
    "orders_daily_drawdown",
    "orders_cohort_survival",
    # round-7: PNG codec pipeline, 5-gram repetition screen,
    # transition matrix, integer Gram matrix
    "multimodal_png_roundtrip",
    "docs_ngram_repetition",
    "events_markov_transition",
    "embeddings_gram_matrix",
    "orders_zorder_key",
    "text_bm25_linear_topk",
    "parts_copurchase_triangles",
    # round-9: bigram-grain KN smoothing; SemDeDup keep policy
    # (k-means + within-cell pairs + CC closure + anti-join)
    "text_kn_bigram_prob",
    "semdedup_survivors",
    # round-10 (VERDICT r9 #4): the IVF-PQ serving/maintenance pair,
    # plus the new trigram KN, drift-governance, and incremental
    # SemDeDup shapes
    "ann_topk_ivfpq_served",
    "ann_topk_ivfpq_incremental",
    "text_kn_trigram_prob",
    "ivfpq_index_drift",
    "semdedup_survivors_incremental",
    # round-11: served recall curve (build+write+4 pruned probes);
    # KN standing-table merge (O(batch grams) given the standing side)
    "ann_ivfpq_recall_curve_served",
    "text_kn_bigram_incremental",
    # round-13: sampled recall@k (multi-query ground truth + per-query
    # pruned probes), two-grain trigram merge, LM-scored quality filter
    "ann_ivfpq_recall_at_k",
    "text_kn_trigram_incremental",
    "docs_lm_quality_score",
]

# SF-PROPORTIONAL replication (VERDICT r7 #6). The old ×N clone kept
# dims (part/customer/supplier) unshifted and repeated identical
# documents/baskets, so shingle and co-purchase graphs densified
# super-linearly (~30× edges at ×10) and the top probe numbers
# measured CLONE DENSITY, not the algorithm. Real SF growth scales
# the part catalog, customer base, supplier pool, and document corpus
# WITH the facts. So: every key domain that grows with SF in TPC-H
# (partkey, suppkey, custkey, orderkey, and the extension tables'
# ids) is shifted per replica — replica i's lineitems reference
# replica i's parts/suppliers, its orders reference its customers —
# and content is decorrelated: each document replica's tokens are
# salted per replica (real growth adds NOVEL documents, not byte
# clones — unsalted clones give every doc 9 exact twins and a
# quadratic-in-N near-dup pair count), and each embedding replica is
# circularly component-shifted (norms and per-component distribution
# preserved, direction decorrelated). region/nation stay fixed
# (TPC-H's constant dims).
_KEY_DOMAINS = {  # domain -> (owning table, pk column)
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
_SHIFTS = {  # table -> {column: key domain}; FK spans come from the
    # domain's OWNING table so referential integrity survives the shift
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def build_scaled(spark, src_dir: str, out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spans = {
        dom: load_table(spark, src_dir, tbl).agg(F.max(pk)).collect()[0][0]
        + 1
        for dom, (tbl, pk) in _KEY_DOMAINS.items()
    }
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        df = load_table(spark, src_dir, name)
        shift_cols = _SHIFTS.get(name)
        if not shift_cols:
            df.write.mode("overwrite").parquet(dst)  # region/nation
            continue
        parts = []
        for i in range(factor):
            part = df
            for c, dom in shift_cols.items():
                part = part.withColumn(c, F.col(c) + F.lit(i * spans[dom]))
            if name == "documents" and i > 0:
                # per-token salt: replica docs are NOVEL in shingle
                # space (prefixing every token rewrites every n-gram)
                part = part.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", f"r{i}x$1"),
                ).withColumn("n_chars", F.length("text"))
            if name == "embeddings" and i > 0:
                k = (i * 7) % 64 or 1
                # circular shift: same norm, decorrelated direction
                part = part.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {k + 1}, {64 - k}),"
                        f" slice(embedding, 1, {k}))"
                    ),
                )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # v2 dir: the v1 clone replica is a DIFFERENT dataset shape — never
    # mix cached v1 files into an SF-proportional probe
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale_probe_v2_x{factor}"
    )
    src = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="scale-probe", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      # 10× data in ONE local JVM (driver = all executors):
                      # the default 1g heap is no model of a real cluster's
                      # per-executor memory — size it like one executor
                      # would be.
                      extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, src, out_dir, factor)

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    # warmup
    QUERIES[PROBE_QUERIES[0]](spark, out_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # optional subset for round-incremental probing:
    #   SPARK_GRAFT_PROBE_ONLY="q1,q2" python scripts/scale_probe.py
    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    names = (
        [n for n in only.split(",") if n] if only else PROBE_QUERIES
    )
    timings = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # queries persist() intermediates sized to THEIR run; at ×10
        # those caches are big enough to evict/spill the next query's
        # working set, which showed up as 3-7× run-order-dependent
        # swings — isolate each datapoint
        spark.catalog.clearCache()
    print(json.dumps({
        "metric": "scale_probe_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf_equivalent": 0.1 * factor,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
