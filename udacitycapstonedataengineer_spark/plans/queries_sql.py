"""Pure-SQL-surface queries (SURVEY.md §2.9 / §3.3).

The reference mixes ``createOrReplaceTempView`` + ``spark.sql`` with
DataFrame ops on the same tables (etl_functions.py:23-34, 89-109);
these queries exercise that surface end-to-end: every catalog table is
registered as a temp view by ``load_tables``, and the plan is authored
entirely in SQL — same Catalyst pipeline, same physical plans as the
DataFrame twins.
"""

from __future__ import annotations

from .registry import query

# etl_functions.py:29-34 shape: fact LEFT JOIN dim ON natural key,
# SELECT fact.* plus the surrogate — with the reference's
# monotonically_increasing_id swapped for a deterministic rank.
_FACT_DIM_SQL = """
    WITH dim AS (
        SELECT o_orderpriority,
               row_number() OVER (ORDER BY o_orderpriority) AS priority_key
        FROM (SELECT DISTINCT o_orderpriority FROM orders)
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
           dim.priority_key
    FROM orders o
    LEFT JOIN dim ON dim.o_orderpriority = o.o_orderpriority
"""

_QUALIFIED_STAR_SQL = """
    SELECT n.*, r.r_name AS region_name
    FROM nation n
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@query("sql_fact_dim_join", _FACT_DIM_SQL)
def _sql_fact_dim_join(spark, t):
    # authored as SQL against the temp-view catalog (§3.3 lifecycle:
    # parser → analyzer resolves views → same Catalyst pipeline)
    return spark.sql(_FACT_DIM_SQL)


@query("sql_qualified_star", _QUALIFIED_STAR_SQL)
def _sql_qualified_star(spark, t):
    # qualified refs + * expansion — the reference's SQL grammar surface
    return spark.sql(_QUALIFIED_STAR_SQL)


# TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates it into a
# left-semi join on l_orderkey (no per-row subquery execution), so the
# fact scans once and the semi side carries only the join key.
_EXISTS_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
"""

# NOT IN with a non-nullable subquery column → left-anti join.
_NOT_EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
"""

# scalar subquery: compare each order against the global average (the
# subquery evaluates ONCE and broadcasts — not per row).
_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / (100.0 * count(*))
        FROM orders
    )
"""


@query("sql_exists_semijoin", _EXISTS_SQL)
def _sql_exists_semijoin(spark, t):
    return spark.sql(_EXISTS_SQL)


@query("sql_not_exists_antijoin", _NOT_EXISTS_SQL)
def _sql_not_exists_antijoin(spark, t):
    return spark.sql(_NOT_EXISTS_SQL)


@query("sql_scalar_subquery", _SCALAR_SUBQ_SQL)
def _sql_scalar_subquery(spark, t):
    return spark.sql(_SCALAR_SUBQ_SQL)


# Spark 4 recursive CTE (WITH RECURSIVE, SPARK-24497): the classic
# warehouse densification — generate a contiguous date spine and
# left-join sparse daily aggregates onto it so missing days surface as
# explicit zeros (gap-filled time series feed downstream models without
# NULL-day bugs). The recursion is driver-bounded (one literal quarter,
# 90 levels — under Spark's recursion guard) and the spine is tiny, so
# the only real work is the one orders aggregation; the spine side of
# the join broadcasts. DuckDB runs the same WITH RECURSIVE shape —
# engine-dialect differences (INTERVAL literal, strftime) only.
_RECURSIVE_SPINE_SPARK = """
    WITH RECURSIVE spine(d) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT d + INTERVAL '1' DAY FROM spine WHERE d < DATE '1995-03-31'
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               count(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-04-01'
        GROUP BY 1
    )
    SELECT date_format(spine.d, 'yyyy-MM-dd') AS day_iso,
           COALESCE(daily.n_orders, 0) AS n_orders,
           CAST(COALESCE(daily.cents, 0) AS DOUBLE) / 100.0 AS revenue
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    ORDER BY day_iso
"""

_RECURSIVE_SPINE_DUCK = """
    WITH RECURSIVE spine(d) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT d + INTERVAL 1 DAY FROM spine WHERE d < DATE '1995-03-31'
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               count(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-04-01'
        GROUP BY 1
    )
    SELECT strftime(spine.d, '%Y-%m-%d') AS day_iso,
           COALESCE(daily.n_orders, 0) AS n_orders,
           CAST(COALESCE(daily.cents, 0) AS DOUBLE) / 100.0 AS revenue
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    ORDER BY day_iso
"""


@query("sql_recursive_date_spine", _RECURSIVE_SPINE_DUCK)
def _sql_recursive_date_spine(spark, t):
    return spark.sql(_RECURSIVE_SPINE_SPARK)


# Correlated LATERAL subquery with per-key ORDER BY + LIMIT — "top-2
# orders for every high-balance customer". Catalyst decorrelates the
# lateral into a window/rank rewrite (no per-row re-execution); the
# same query in DuckDB uses its native LATERAL join. Deterministic:
# the inner ordering (o_totalprice DESC, o_orderkey) is total.
_LATERAL_TOPN_SPARK = """
    SELECT c.c_custkey, top.o_orderkey, top.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) AS top
    WHERE c.c_acctbal > 9000
"""


@query("sql_lateral_topn_per_customer", _LATERAL_TOPN_SPARK)
def _sql_lateral_topn_per_customer(spark, t):
    return spark.sql(_LATERAL_TOPN_SPARK)
