"""TPC-H expansion suite (Q4/Q7/Q8/Q14/Q15/Q18/Q19/Q22 shapes).

The testdata schema is reduced TPC-H (no partsupp; lineitem lacks
commitdate/receiptdate/shipmode; part lacks container/mfgr), so
queries whose classic predicates need missing columns are adapted to
equivalent PLAN SHAPES on the available columns — the point of each
query (semi-join, cross-nation join graph, conditional-aggregate
share, window-max, HAVING + semi-join, disjunctive pushdown,
anti-join + exact scalar threshold) is preserved, and every one is
DuckDB-oracled.

Money math follows functions/exact.py: integer minor units inside the
aggregate (order-independent, bit-stable on any partitioning), one
float division at the end — identical IEEE ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query

# revenue in "price-cents × discount-complement-points" units;
# /10000.0 at the end yields dollars (see tpch_q10). A function, not a
# module constant: Column construction needs an active SparkContext.
def _rev_units():
    return F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )


_REV_SQL = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)::HUGEINT * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"


@query(
    "tpch_q4_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-07-01'
      AND o.o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def _tpch_q4_priority_check(spark, t):
    # Q4 shape: quarter of orders, EXISTS-semi-join against lineitem
    # (classic late-delivery predicate adapted to returned-line — the
    # commit/receipt dates aren't in the reduced schema), priority
    # histogram. left_semi keeps orders-grain rows without duplication
    # — no DISTINCT, no row explosion, one shuffle on orderkey.
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(units) AS DOUBLE) / 10000.0 AS revenue
    FROM (SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                 year(l.l_shipdate) AS l_year,
                 {_REV_SQL} AS units
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
          WHERE ((ns.n_name IN ('NATION_1','NATION_2','NATION_3')
                   AND nc.n_name IN ('NATION_4','NATION_5','NATION_6'))
              OR (ns.n_name IN ('NATION_4','NATION_5','NATION_6')
                   AND nc.n_name IN ('NATION_1','NATION_2','NATION_3')))
            AND l.l_shipdate >= DATE '1996-01-01'
            AND l.l_shipdate < DATE '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def _tpch_q7_volume_shipping(spark, t):
    # Q7: bilateral trade volume between two nation blocs by ship year.
    # Both nation dims broadcast; the disjunctive nation-pair predicate
    # sits ABOVE the joins (it spans both sides) but each join input is
    # pre-pruned to the two nations — the cross-filter that keeps the
    # big fact⋈fact join small at scale.
    bloc_a = ("NATION_1", "NATION_2", "NATION_3")
    bloc_b = ("NATION_4", "NATION_5", "NATION_6")
    both = bloc_a + bloc_b
    ns = F.broadcast(
        t["nation"].filter(F.col("n_name").isin(*both)).select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    nc = F.broadcast(
        t["nation"].filter(F.col("n_name").isin(*both)).select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    sup = t["supplier"].join(ns, F.col("s_nationkey") == F.col("s_nkey"))
    cust = t["customer"].join(nc, F.col("c_nationkey") == F.col("c_nkey"))
    oc = t["orders"].join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    joined = (
        li.join(sup.select("s_suppkey", "supp_nation"),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("supp_nation").isin(*bloc_a) & F.col("cust_nation").isin(*bloc_b))
            | (F.col("supp_nation").isin(*bloc_b) & F.col("cust_nation").isin(*bloc_a))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev_units().alias("units"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("units").cast("double") / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN units ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(units) AS DOUBLE) AS mkt_share
    FROM (SELECT year(o.o_orderdate) AS o_year, ns.n_name AS supp_nation,
                 {_REV_SQL} AS units
          FROM lineitem l
          JOIN part p     ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
          JOIN region r   ON nc.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA'
            AND p.p_type = 'STANDARD'
            AND o.o_orderdate >= DATE '1996-01-01'
            AND o.o_orderdate < DATE '1998-01-01')
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def _tpch_q8_market_share(spark, t):
    # Q8: one nation's share of STANDARD-part revenue sold into ASIA,
    # by order year. The share is a ratio of two exact integer sums —
    # one conditional — so the single double division is bit-stable.
    # part/supplier/nation/region all broadcast; lineitem⋈orders is
    # the only big shuffle.
    asia_cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    o = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    std_parts = F.broadcast(
        t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey")
    )
    supp_nation = F.broadcast(
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        t["lineitem"]
        .join(std_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_year", "supp_nation", _rev_units().alias("units"))
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("units")).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(nat).cast("double") / F.sum("units").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q14_promo_effect",
    f"""
    SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO' THEN units ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(units) AS DOUBLE) AS promo_revenue_pct
    FROM (SELECT p.p_type, {_REV_SQL} AS units
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l.l_shipdate >= DATE '1996-09-01'
            AND l.l_shipdate < DATE '1996-10-01')
    """,
)
def _tpch_q14_promo_effect(spark, t):
    # Q14: promo parts' share of one month's revenue. Date filter at
    # the lineitem scan, part broadcast, one global agg of two exact
    # sums — the conditional-aggregate share pattern.
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    joined = li.join(
        F.broadcast(t["part"].select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("p_type", _rev_units().alias("units"))
    promo = F.when(F.col("p_type") == "PROMO", F.col("units")).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    return joined.agg(
        (
            (F.lit(100).cast("double") * F.sum(promo).cast("double"))
            / F.sum("units").cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no, SUM(units) AS units
        FROM (SELECT l_suppkey, {_REV_SQL} AS units
              FROM lineitem
              WHERE l_shipdate >= DATE '1996-01-01'
                AND l_shipdate < DATE '1996-04-01')
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.units AS DOUBLE) / 10000.0 AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.units = (SELECT max(units) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def _tpch_q15_top_supplier(spark, t):
    # Q15: supplier(s) with the quarter's max revenue. The max-equality
    # comparison runs on the EXACT integer units (double sums would
    # make "equals max" partitioning-dependent). The global max comes
    # from a broadcast 1-row aggregate crossJoined back onto rev — a
    # global window would funnel the per-supplier aggregate through one
    # task; this shape stays fully parallel at any supplier count.
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = (
        li.select("l_suppkey", _rev_units().alias("units"))
        .groupBy("l_suppkey")
        .agg(F.sum("units").alias("units"))
    ).persist()
    max_units = rev.agg(F.max("units").alias("__max"))
    top = rev.crossJoin(F.broadcast(max_units)).filter(
        F.col("units") == F.col("__max")
    )
    return (
        top.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("units").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q18_large_volume",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate_iso, o_totalprice, sum_qty
    FROM (
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_iso,
               o.o_totalprice,
               CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2, 3, 4, 5
        HAVING SUM(l.l_quantity) > 250
    )
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def _tpch_q18_large_volume(spark, t):
    # Q18: orders whose total quantity exceeds a threshold, with the
    # buyer. The aggregate runs at lineitem-grain FIRST (orderkey only
    # — narrow shuffle), the >250 filter prunes before the customer
    # join, and only surviving orderkeys join to orders/customer.
    # quantity sums are exact (whole-valued doubles cast to long).
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_iso"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive",
    f"""
    SELECT CAST(SUM(units) AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM (SELECT {_REV_SQL} AS units
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 25
                 AND l.l_quantity >= 1 AND l.l_quantity <= 30)
             OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
                 AND l.l_quantity >= 10 AND l.l_quantity <= 40)
             OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
                 AND l.l_quantity >= 20 AND l.l_quantity <= 50))
    """,
)
def _tpch_q19_disjunctive(spark, t):
    # Q19: OR-of-ANDs spanning both join sides. Catalyst pushes the
    # derivable disjunctions to each scan (brand/size union to part,
    # quantity union to lineitem) and keeps the cross-side residual on
    # the join — the disjunctive-pushdown stress test.
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 50)
        )
    )
    joined = t["lineitem"].join(
        F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return joined.filter(cond).agg(
        (F.sum(_rev_units()).cast("double") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "tpch_q22_dormant_customers",
    """
    WITH pos AS (
        SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer WHERE c_acctbal > 0
    ),
    thresh AS (SELECT count(*) AS n, SUM(bal_cents) AS s FROM pos)
    SELECT c_mktsegment,
           count(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS totacctbal
    FROM customer c, thresh
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * thresh.n > thresh.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def _tpch_q22_dormant_customers(spark, t):
    # Q22 shape: above-average-balance customers with no RECENT orders
    # (anti-join), rolled up by segment. The "above average" threshold
    # compares in EXACT integer cents cross-multiplied against the
    # (count, sum) pair — bal*n > s avoids a float average whose last
    # ulp would make boundary membership partitioning-dependent.
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    thresh = F.broadcast(
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(bal_cents).alias("s"),
        )
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        t["customer"]
        .crossJoin(thresh)
        .filter(bal_cents * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal_cents).cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "lineitem_shipping_lag_stats",
    """
    WITH lag AS (
        SELECT o.o_orderpriority,
               datediff('day', o.o_orderdate, l.l_shipdate) AS lag_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(SUM(lag_days) AS BIGINT) AS lag_days_total,
           CAST(MAX(lag_days) AS BIGINT) AS lag_days_max,
           CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_slow,
           quantile_cont(lag_days, 0.5) AS lag_days_median
    FROM lag
    GROUP BY 1
    ORDER BY 1
    """,
)
def _lineitem_shipping_lag_stats(spark, t):
    # order-to-ship latency profile per order priority (the reduced
    # schema has no commit/receipt dates — order date -> ship date is
    # the available operational lag): totals/max/median and slow-item
    # (>90 day) counts. Lags are exact integer day differences; the
    # median interpolates on integers (quantile_cont ≡ percentile
    # precedent). One orderkey-grain join (the priority column rides
    # the join), one map-side-combined aggregate at priority grain.
    lag = F.datediff("l_shipdate", "o_orderdate")
    joined = t["lineitem"].select("l_orderkey", "l_shipdate").join(
        t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("lag_days").cast("long").alias("lag_days_total"),
            F.max("lag_days").cast("long").alias("lag_days_max"),
            F.sum((F.col("lag_days") > 90).cast("long")).alias("n_slow"),
            F.expr("percentile(lag_days, 0.5)").alias("lag_days_median"),
        )
        .orderBy("o_orderpriority")
    )
