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
