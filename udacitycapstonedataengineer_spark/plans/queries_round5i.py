"""Round-5i query group: cross-dimension grids — the nation×nation
trade matrix (the reporting generalization of TPC-H Q7's two-nation
volume query) and the corpus source×language mix.

Same conventions as every group (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query


@query(
    "supplier_nation_trade_matrix",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_items,
           CAST(sum(CAST(ROUND(l.l_extendedprice
                               * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def _supplier_nation_trade_matrix(spark, t):
    # full nation×nation trade matrix — Q7 without its two-nation
    # filter, as the ≤625-row reporting grid. customer is
    # SF-proportional (~150k rows/SF — billions at 100 TB), so it
    # arrives via a pinned SHUFFLE_HASH join on o_custkey, never a
    # broadcast (ADVICE r5; same rule as q8/q21). The orders side is
    # first reduced to (orderkey, cust_nation) so the big
    # lineitem⋈orders orderkey shuffle carries one string, not the
    # customer row; supplier-scale and nation dims broadcast; revenue
    # in per-row integer cents rounded before aggregation.
    n = t["nation"].select("n_nationkey", "n_name")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cust = (
        t["customer"]
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                n.select(
                    F.col("n_nationkey").alias("ck"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("ck"),
        )
        .select("c_custkey", "cust_nation")
    )
    orders_nat = (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .join(
            cust.hint("shuffle_hash"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "cust_nation")
    )
    return (
        t["lineitem"]
        .join(
            orders_nat.hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                n.select(
                    F.col("n_nationkey").alias("sk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sk"),
        )
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).alias("revenue_cents"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


@query(
    "docs_source_lang_mix",
    """
    WITH cells AS (
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM documents GROUP BY 1, 2
    )
    SELECT source, lang, n_docs, chars_total,
           CAST((n_docs * 10000)
                // sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
               AS source_share_bp
    FROM cells
    ORDER BY 1, 2
    """,
)
def _docs_source_lang_mix(spark, t):
    # corpus composition grid: documents and bytes per source×language
    # with each language's share of its source — the mixture report
    # that feeds sampling weights (corpus_mixture_sample). One
    # cell-grain aggregate; the share window runs over the ≤|sources|
    # ×|langs| cell table, never the fact.
    cells = (
        t["documents"]
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
        )
    )
    return cells.select(
        "source",
        "lang",
        "n_docs",
        "chars_total",
        F.expr(
            "(n_docs * 10000) DIV (sum(n_docs) OVER (PARTITION BY source))"
        ).alias("source_share_bp"),
    ).orderBy("source", "lang")
