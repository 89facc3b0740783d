"""Round-5f query group: growth and concentration analytics —
first-vs-repeat revenue split, daily new-vs-returning users, and
supplier-concentration HHI (Herfindahl) per part brand.

Same conventions as every group (plans/registry.py). HHI is fully
integer here: shares in basis points (truncating division), HHI =
Σ share_bp² ≤ 10⁸ — exact BIGINTs end to end, no float summation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query


@query(
    "orders_first_vs_repeat_revenue",
    """
    WITH flagged AS (
        SELECT year(o_orderdate) AS yr,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN row_number() OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate,
                                                     o_orderkey) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM orders
    )
    SELECT yr,
           CAST(sum(CASE WHEN is_first = 1 THEN cents ELSE 0 END)
                AS BIGINT) AS first_cents,
           CAST(sum(CASE WHEN is_first = 0 THEN cents ELSE 0 END)
                AS BIGINT) AS repeat_cents,
           CAST(sum(is_first) AS BIGINT) AS n_first_orders,
           CAST(sum(1 - is_first) AS BIGINT) AS n_repeat_orders,
           CAST((sum(CASE WHEN is_first = 1 THEN cents ELSE 0 END) * 10000)
                // sum(cents) AS BIGINT) AS first_share_bp
    FROM flagged
    GROUP BY 1
    ORDER BY 1
    """,
)
def _orders_first_vs_repeat_revenue(spark, t):
    # acquisition-vs-retention revenue split: each order is flagged as
    # the customer's FIRST (deterministic tie-break on orderkey) via a
    # customer-partitioned window — bounded frames, one user-keyed
    # shuffle — then revenue splits by year. Integer cents; share as
    # basis points.
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = t["orders"].select(
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.row_number().over(w) == 1).cast("int").alias("is_first"),
    )
    first_cents = F.sum(
        F.when(F.col("is_first") == 1, F.col("cents")).otherwise(0)
    )
    return (
        flagged.groupBy("yr")
        .agg(
            first_cents.alias("first_cents"),
            F.sum(
                F.when(F.col("is_first") == 0, F.col("cents")).otherwise(0)
            ).alias("repeat_cents"),
            F.sum("is_first").alias("n_first_orders"),
            F.sum(1 - F.col("is_first")).alias("n_repeat_orders"),
            F.expr(
                "(sum(CASE WHEN is_first = 1 THEN cents ELSE 0 END)"
                " * 10000) DIV sum(cents)"
            ).alias("first_share_bp"),
        )
        .orderBy("yr")
    )


@query(
    "events_new_vs_returning_daily",
    """
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY 1
    ),
    du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    )
    SELECT CAST(du.day AS VARCHAR) AS day,
           CAST(sum(CASE WHEN f.first_day = du.day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN f.first_day <> du.day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning
    FROM du JOIN firsts f USING (user_id)
    GROUP BY 1
    ORDER BY 1
    """,
)
def _events_new_vs_returning_daily(spark, t):
    # daily growth accounting: users active each day split into
    # first-ever-seen vs returning. Two user-keyed aggregates off one
    # persisted day×user table (the DAU/MAU grain — ~10⁻⁴ of the fact
    # at 100 TB), joined at user grain; day output as ISO strings per
    # the repo's date discipline.
    du = (
        t["events"]
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .persist()
    )
    firsts = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                (F.col("first_day") == F.col("day")).cast("int")
            ).alias("n_new"),
            F.sum(
                (F.col("first_day") != F.col("day")).cast("int")
            ).alias("n_returning"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_new",
            "n_returning",
        )
        .orderBy("day")
    )


@query(
    "part_brand_supplier_hhi",
    """
    WITH sq AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(l_quantity) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
        SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS tot_qty
        FROM sq GROUP BY 1
    ),
    hhi AS (
        SELECT sq.l_partkey,
               CAST(sum(((sq.qty * 10000) // t.tot_qty)
                        * ((sq.qty * 10000) // t.tot_qty)) AS BIGINT)
                   AS hhi
        FROM sq JOIN tot t USING (l_partkey)
        GROUP BY 1
    )
    SELECT p.p_brand AS brand,
           count(*) AS n_parts,
           CAST(sum(h.hhi) // count(*) AS BIGINT) AS avg_hhi,
           CAST(max(h.hhi) AS BIGINT) AS max_hhi,
           CAST(sum(CASE WHEN h.hhi >= 50000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_concentrated
    FROM hhi h JOIN part p ON p.p_partkey = h.l_partkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def _part_brand_supplier_hhi(spark, t):
    # supply-chain concentration: Herfindahl index of each part's
    # supplier quantity shares, rolled up per brand (avg/max HHI and
    # the count of parts above the 0.5 concentration line). Fully
    # integer: shares in basis points via truncating division, HHI =
    # Σ share_bp² ≤ 10⁸ — exact BIGINTs, no float accumulation
    # anywhere, so it hash-matches any engine. Plan: one
    # (part,supplier)-grain aggregate off the fact, part-grain
    # marginal reusing that table (persisted — two consumers), the
    # HHI aggregate rides the same part partitioning, brand dim
    # broadcasts.
    sq = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
        .persist()
    )
    tot = sq.groupBy("l_partkey").agg(F.sum("qty").alias("tot_qty"))
    share = F.expr("(qty * 10000) DIV tot_qty")
    hhi = (
        sq.join(tot, "l_partkey")
        .select("l_partkey", (share * share).alias("sh2"))
        .groupBy("l_partkey")
        .agg(F.sum("sh2").alias("hhi"))
    )
    return (
        hhi.join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr("sum(hhi) DIV count(1)").alias("avg_hhi"),
            F.max("hhi").alias("max_hhi"),
            F.sum(
                (F.col("hhi") >= 50_000_000).cast("int")
            ).alias("n_concentrated"),
        )
        .orderBy("brand")
    )
