"""TPC-H completion suite (Q2/Q9/Q11/Q12/Q13/Q16/Q17/Q20/Q21 shapes).

With this module every one of the 22 TPC-H query SHAPES is covered
(Q1/3/4/5/6/7/8/10/14/15/18/19/22 live in queries_olap.py /
queries_tpch2.py). The testdata schema is reduced TPC-H — no partsupp,
no commitdate/receiptdate/shipmode, no availqty/supplycost — so:

- the part-supplier relation (Q2/Q11/Q16/Q20) is DERIVED from lineitem:
  distinct (l_partkey, l_suppkey) pairs, with "supply cost" = the
  minimum observed unit price and "supplied volume" = shipped quantity.
  Same join topology and subquery shapes as the classics, on data that
  exists.
- Q21's "kept waiting" predicate becomes l_shipdate > o_orderdate + 90
  days (the two dates we have), and Q12's ship-mode classes become
  return-flag classes; the plan shapes (multi-EXISTS self-correlation,
  conditional two-class counting) are untouched.

Every threshold that decides ROW MEMBERSHIP is computed in exact
cross-multiplied integers (``5*qty*cnt < sum`` instead of
``qty < 0.2*avg``) so membership can never flip with partitioning or
engine; see functions/exact.py. Floats appear only in final projected
values, as single IEEE expressions identical in both engines
(``floor()`` where a stable integerization is needed — Spark and DuckDB
agree on floor; they do NOT agree on round's half-boundary).

Reference: the reference repo has no TPC-H (it is a star-schema ETL,
etl.py:1-120); this suite is the engine-extension surface promised in
SURVEY.md §2.7 "beyond the reference".
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query
from .queries_tpch2 import _REV_SQL, _rev_units


def _qty_int():
    # l_quantity is a whole-valued double (1..50); exact as bigint.
    return F.round(F.col("l_quantity")).cast("long")


_QTY_SQL = "CAST(ROUND(l_quantity) AS BIGINT)"

# Unit price in whole cents via floor((100*ext)/qty): one shared IEEE
# division then floor — bit-identical across engines (round is not).
_UNIT_COST_SQL = "CAST(FLOOR((100.0 * l_extendedprice) / l_quantity) AS BIGINT)"


def _unit_cost():
    return F.floor((F.lit(100.0) * F.col("l_extendedprice")) / F.col("l_quantity"))


@query(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, MIN({_UNIT_COST_SQL}) AS cost_cents
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name,
               p.p_partkey, p.p_brand, ps.cost_cents,
               MIN(ps.cost_cents) OVER (PARTITION BY p.p_partkey) AS min_cost
        FROM ps
        JOIN eu ON ps.l_suppkey = eu.s_suppkey
        JOIN part p ON ps.l_partkey = p.p_partkey
        WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 15
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey,
           CAST(cost_cents AS DOUBLE) / 100.0 AS supply_cost
    FROM ranked WHERE cost_cents = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def _tpch_q2_min_cost_supplier(spark, t):
    # Q2 shape: cheapest EUROPE supplier per selected part. The classic
    # correlated MIN subquery is expressed as a window min over the
    # derived part-supplier relation — ONE pass, no re-join of the
    # aggregated subquery (what Catalyst's decorrelation would build
    # anyway, minus the duplicate scan). Supplier⋈nation⋈region and the
    # filtered part list broadcast; the only shuffle is the (partkey,
    # suppkey) groupBy that builds `ps`. Min-cost equality runs on
    # exact integer cents; (p_partkey, s_suppkey) in the sort makes the
    # LIMIT deterministic under ties.
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_unit_cost()).alias("cost_cents"))
    )
    eu = F.broadcast(
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = F.broadcast(
        t["part"]
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 15))
        .select("p_partkey", "p_brand")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "s_suppkey",
            (F.col("cost_cents").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    f"""
    SELECT n_name AS nation, o_year,
           CAST(SUM(amount_units) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (SELECT n.n_name, year(o.o_orderdate) AS o_year,
                 {_REV_SQL}
                 - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)::HUGEINT
                   * {_QTY_SQL} * 100 AS amount_units
          FROM lineitem l
          JOIN part p     ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n   ON s.s_nationkey = n.n_nationkey
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          WHERE p.p_name LIKE '%widget%')
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def _tpch_q9_product_profit(spark, t):
    # Q9 shape: profit on a product line by supplier nation and order
    # year. partsupp's supplycost is proxied by p_retailprice (per
    # unit), so amount = revenue-units − retail-cents·qty·100, all in
    # the same exact 10^-4-dollar units — the sum is order-independent
    # and the single final division is bit-stable. part (name-filtered)
    # and supplier⋈nation broadcast; lineitem⋈orders is the one big
    # shuffle, on the natural orderkey.
    parts = F.broadcast(
        t["part"]
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = F.broadcast(
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    amount = _rev_units() - (
        F.round(F.col("p_retailprice") * 100).cast("decimal(38,0)")
        * _qty_int()
        * 100
    )
    return (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["orders"].select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("n_name").alias("nation"), "o_year", amount.alias("amount_units"))
        .groupBy("nation", "o_year")
        .agg((F.sum("amount_units").cast("double") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    """
    WITH grouped AS (
        SELECT l.l_partkey AS p_partkey,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)::HUGEINT)
                   AS val_cents
        FROM lineitem l
        WHERE l.l_suppkey IN (
            SELECT s_suppkey FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA')
        GROUP BY 1
    ),
    totals AS (SELECT SUM(val_cents) AS tot FROM grouped)
    SELECT p_partkey, CAST(val_cents AS DOUBLE) / 100.0 AS part_value
    FROM grouped, totals
    WHERE val_cents * 2000 > tot
    ORDER BY part_value DESC, p_partkey
    """,
)
def _tpch_q11_important_stock(spark, t):
    # Q11 shape: parts whose ASIA-supplied value exceeds a fraction of
    # the global total — group-by HAVING against a scalar subquery over
    # the SAME aggregate. The scalar total re-aggregates the grouped
    # result (tiny, part-grain) instead of rescanning lineitem, and the
    # fraction test cross-multiplies exact integers (val*2000 > tot ⟺
    # val > 0.0005·tot) so membership can't flip with float error.
    asia_supp = F.broadcast(
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    grouped = (
        t["lineitem"]
        .join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(cents).alias("val_cents"))
    )
    total = F.broadcast(grouped.agg(F.sum("val_cents").alias("tot")))
    return (
        grouped.crossJoin(total)
        .filter(F.col("val_cents") * 2000 > F.col("tot"))
        .select(
            "p_partkey",
            (F.col("val_cents").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "tpch_q12_priority_classes",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def _tpch_q12_priority_classes(spark, t):
    # Q12 shape: two-class conditional counting of order priorities per
    # line class (ship modes in the classic; return flags here — the
    # column the reduced schema has). Both lineitem filters sit at the
    # scan; the orderkey join carries only (orderkey, priority); the
    # CASE sums fold in one partial-aggregated shuffle.
    li = t["lineitem"].filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .select("o_orderkey", "o_orderpriority")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def _tpch_q13_customer_distribution(spark, t):
    # Q13 shape: distribution of per-customer order counts, KEEPING
    # zero-order customers — the filtered LEFT OUTER join (the filter
    # lives in the join condition, so non-matching customers survive
    # with count 0; a WHERE would delete them). The classic's
    # o_comment NOT LIKE filter becomes a priority exclusion.
    # Pre-filtering the right side before a left join is semantically
    # identical to the ON-clause residual and lets the filter reach the
    # orders scan. count(o_orderkey) counts non-null only — exactly the
    # matched rows. Two aggregations, each one narrow shuffle
    # (custkey, then the tiny count-grain).
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q16_supplier_relation",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def _tpch_q16_supplier_relation(spark, t):
    # Q16 shape: how many qualifying suppliers can supply each
    # (brand, type, size) bucket — distinct-count over the derived
    # part-supplier relation, minus an excluded-supplier NOT IN
    # subquery. s_suppkey is non-null so NOT IN ≡ anti-join (the
    # null-aware trap documented in queries_sql.py does not bite);
    # the exclusion list is ~suppliers-sized → broadcast anti-join.
    # The (partkey, suppkey) DISTINCT and the countDistinct reuse the
    # same hash partitioning; part is broadcast.
    bad = F.broadcast(
        t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    ps = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    parts = F.broadcast(
        t["part"]
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 7, 14, 21, 28, 35, 42, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_qty_revenue",
    f"""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(SUM({_QTY_SQL}) AS BIGINT) AS sum_qty,
               count(*) AS cnt
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)), 0)
                AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE 5 * {_QTY_SQL} * a.cnt < a.sum_qty
    """,
)
def _tpch_q17_small_qty_revenue(spark, t):
    # Q17 shape: revenue lost to small-quantity orders — each line
    # compares against 20% of ITS PART's average quantity (the classic
    # correlated scalar-aggregate subquery). Decorrelated by hand to
    # the plan Catalyst would build: per-part (sum, count) computed
    # once via a window over the brand-filtered lines (identical
    # per-part values — the filter is on part attributes only), and the
    # membership test cross-multiplied to exact integers:
    # 5·qty·cnt < sum ⟺ qty < 0.2·avg, no float boundary. One shuffle
    # (partkey), brand parts broadcast, COALESCE keeps the empty case
    # engine-identical.
    li = t["lineitem"].join(
        F.broadcast(
            t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    w = Window.partitionBy("l_partkey")
    qualified = (
        li.withColumn("sum_qty", F.sum(_qty_int()).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.lit(5) * _qty_int() * F.col("cnt") < F.col("sum_qty"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return qualified.agg(
        (
            F.coalesce(F.sum(cents), F.lit(0)).cast("double") / 100.0 / 7.0
        ).alias("avg_yearly")
    )


@query(
    "tpch_q20_part_promotion",
    f"""
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
        SELECT l_suppkey,
               CAST(SUM({_QTY_SQL}) AS BIGINT) AS total_qty,
               CAST(SUM(CASE WHEN l_shipdate >= DATE '1997-01-01'
                              AND l_shipdate < DATE '1998-01-01'
                             THEN {_QTY_SQL} ELSE 0 END) AS BIGINT) AS y97_qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM red)
        GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (SELECT l_suppkey FROM shipped
                          WHERE 2 * y97_qty > total_qty AND y97_qty > 0)
    ORDER BY s_name
    """,
)
def _tpch_q20_part_promotion(spark, t):
    # Q20 shape: nested semi-joins with an aggregated HAVING — which
    # EUROPE suppliers concentrated their shipments of red parts in
    # 1997 (availqty doesn't exist, so "more than half of their
    # all-time volume shipped that year" replaces "stock exceeds half
    # of shipped"). Inner subquery: parts IN name-filtered set (semi);
    # middle: per (supplier, part) exact quantity sums with the
    # 2·y97 > total cross-multiplied test; outer: supplier IN (semi),
    # nation/region broadcast. No join produces duplicate supplier
    # rows — semis all the way down.
    red = F.broadcast(
        t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    y97 = (F.col("l_shipdate") >= F.lit("1997-01-01")) & (
        F.col("l_shipdate") < F.lit("1998-01-01")
    )
    promoted = (
        t["lineitem"]
        .join(red, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(_qty_int()).alias("total_qty"),
            F.sum(F.when(y97, _qty_int()).otherwise(0)).alias("y97_qty"),
        )
        .filter((F.lit(2) * F.col("y97_qty") > F.col("total_qty")) & (F.col("y97_qty") > 0))
        .select("l_suppkey")
    )
    eu_nation = F.broadcast(
        t["nation"].join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t["supplier"]
        .join(eu_nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(promoted, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def _tpch_q21_waiting_suppliers(spark, t):
    # Q21 shape: the supplier who ALONE shipped late on a multi-supplier
    # finished order ("kept the order waiting"). The classic plan is a
    # triple self-join of lineitem (EXISTS + NOT EXISTS) — three scans
    # and two correlated joins of the biggest table. Here it collapses
    # into ONE aggregation per order:
    #   n_supp      = countDistinct(supplier)            > 1  ⟺ EXISTS
    #   n_late_supp = countDistinct(supplier | late)     = 1  ⟺ NOT EXISTS
    #   late_supp   = max(supplier | late)   — the unique culprit
    # then late lines attribute back to (orderkey, late_supp). Same
    # result, one lineitem shuffle on orderkey instead of three — the
    # 100-TB rewrite. The DuckDB oracle runs the CLASSIC double-EXISTS
    # formulation, so parity is a cross-formulation equivalence proof.
    # "Late" = shipped >90 days after order date (the dates that exist
    # in the reduced schema). Counting matches the classic: one row per
    # LATE LINE of the culprit supplier.
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    # The orders side is FACT-proportional — never broadcast it (the
    # sf1-equivalent probe caught Spark size-misestimating it under the
    # broadcast threshold and OOMing the build). SHUFFLE_HASH pins a
    # shuffle join on l_orderkey, which the per-order aggregation then
    # reuses — same exchange count as the broadcast plan, but bounded
    # memory at any scale.
    li = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late", F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
        )
    )
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).alias("n_late_supp"),
            F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
            F.sum(
                F.when(F.col("late"), 1).otherwise(0)
            ).alias("n_late_lines"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select("late_supp", "n_late_lines")
    )
    asia_supp = F.broadcast(
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        per_order.join(asia_supp, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
