"""Round-5g query group: metadata-vs-model agreement, pricing-band
reporting, and segment value profiles.

Same conventions as every group (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import lang_id, lang_id_sql
from .registry import query


@query(
    "docs_langid_agreement",
    f"""
    WITH pred AS (
        SELECT lang AS declared, {lang_id_sql("text")} AS predicted
        FROM documents
    )
    SELECT declared, predicted,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN declared = predicted
                         THEN count(*) ELSE 0 END)
                    OVER (PARTITION BY declared) * 10000
                // sum(count(*)) OVER (PARTITION BY declared)
                AS BIGINT) AS declared_agreement_bp
    FROM pred
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def _docs_langid_agreement(spark, t):
    # metadata-vs-model confusion table: declared `lang` column versus
    # the engine's n-gram lang_id prediction — the audit you run
    # before trusting EITHER signal to filter a 100-TB corpus. Output
    # at (declared, predicted) grain with each declared language's
    # agreement rate in basis points. One fact pass (lang_id is a
    # per-row native expression, zero shuffle) into a cell-grain
    # aggregate; the agreement window runs over the ≤|langs|² cell
    # table. The window's SUM over grouped counts mirrors the oracle
    # exactly (sum of CASE over the declared partition).
    pred = t["documents"].select(
        F.col("lang").alias("declared"), lang_id("text").alias("predicted")
    )
    cells = pred.groupBy("declared", "predicted").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return cells.select(
        "declared",
        "predicted",
        "n_docs",
        F.expr(
            "CAST(sum(CASE WHEN declared = predicted THEN n_docs ELSE 0 END)"
            " OVER (PARTITION BY declared) * 10000 AS BIGINT)"
            " DIV sum(n_docs) OVER (PARTITION BY declared)"
        ).alias("declared_agreement_bp"),
    ).orderBy("declared", "predicted")


@query(
    "lineitem_discount_band_revenue",
    """
    SELECT CAST(ROUND(l_discount * 100) AS INT) AS discount_pct,
           count(*) AS n_items,
           CAST(sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS gross_cents,
           CAST(sum(CAST(ROUND(l_extendedprice * l_discount * 100)
                         AS BIGINT)) AS BIGINT) AS discount_cents
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def _lineitem_discount_band_revenue(spark, t):
    # pricing-band report: revenue given away per discount level — the
    # q6/q19 money math as a reporting grid instead of a filter. One
    # map-side-combinable aggregate at ≤11 output rows; all money in
    # integer cents (the per-row ROUND happens before aggregation, so
    # both engines round the same scalar, never a compared float).
    return (
        t["lineitem"]
        .groupBy(
            F.round(F.col("l_discount") * 100)
            .cast("int")
            .alias("discount_pct")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("gross_cents"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * F.col("l_discount") * 100
                ).cast("long")
            ).alias("discount_cents"),
        )
        .orderBy("discount_pct")
    )


@query(
    "customer_segment_value_profile",
    """
    WITH o AS (
        SELECT o_custkey, count(*) AS n_orders,
               sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1
    )
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_customers,
           CAST(sum(COALESCE(o.n_orders, 0)) AS BIGINT) AS n_orders,
           CAST(sum(COALESCE(o.cents, 0)) AS BIGINT) AS revenue_cents,
           CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inactive,
           CAST(sum(COALESCE(o.cents, 0))
                // greatest(sum(COALESCE(o.n_orders, 0)), 1) AS BIGINT)
               AS avg_order_cents
    FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def _customer_segment_value_profile(spark, t):
    # market-segment value profile: customers, orders, revenue,
    # inactive count, and average order value per segment — the BI
    # rollup behind q3's segment filter. The fact aggregates to
    # customer grain FIRST (one shuffle with map-side combine), then
    # left-joins the customer dim so never-ordered customers are
    # counted, then a 5-row segment aggregate. Average crosses as
    # integer cents with a greatest(,1) guard both engines share.
    o = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
    )
    return (
        t["customer"]
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.coalesce("n_orders", F.lit(0))).alias("n_orders"),
            F.sum(F.coalesce("cents", F.lit(0))).alias("revenue_cents"),
            F.sum(
                F.col("o_custkey").isNull().cast("int")
            ).alias("n_inactive"),
            F.expr(
                "sum(COALESCE(cents, 0))"
                " DIV greatest(sum(COALESCE(n_orders, 0)), 1)"
            ).alias("avg_order_cents"),
        )
        .orderBy("segment")
    )
