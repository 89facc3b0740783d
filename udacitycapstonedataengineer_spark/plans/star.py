"""Star-schema pipeline over the driver's TPC-H-ish catalog.

This is the reference's etl.py:82-94 lifecycle re-expressed on the
testdata mapping from FIXTURES.md: ``orders`` plays the immigration
fact, ``o_orderpriority`` plays visatype, ``o_orderdate`` plays arrdate,
``nation``+``region`` play the country lookup, and avg customer account
balance per nation plays the country average temperature
(etl_functions.py:80-111 semantics).

Scale notes (the part the reference got wrong):
- dims join back to the fact via broadcast — no fact shuffle;
- the fact is never collected or re-read from disk mid-pipeline
  (reference re-reads the visa dim parquet at etl_functions.py:22);
- surrogate keys are deterministic (dims.py), so re-runs and the
  DuckDB oracle agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import money_avg, money_sum
from ..operators.dims import build_calendar_dim, build_dimension


def build_priority_dim(orders: DataFrame) -> DataFrame:
    """visa_type_dim analog (etl_functions.py:62-71)."""
    return build_dimension(orders, ["o_orderpriority"], "priority_key")


def build_country_dim(
    nation: DataFrame, region: DataFrame, customer: DataFrame
) -> DataFrame:
    """country_dim analog (etl_functions.py:80-111): lookup join for the
    label (J2), second left join for an aggregate attribute (J3+A1).
    Both sides of every join here are dimension-sized → broadcast."""
    avg_bal = customer.groupBy("c_nationkey").agg(
        money_avg("c_acctbal").alias("avg_acctbal")
    )
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .join(F.broadcast(avg_bal), nation.n_nationkey == avg_bal.c_nationkey, "left")
        .select(
            F.col("n_nationkey").alias("country_code"),
            F.col("n_name").alias("country_name"),
            F.col("r_name").alias("region_name"),
            F.col("avg_acctbal"),
        )
    )


def build_fact(orders: DataFrame, priority_dim: DataFrame) -> DataFrame:
    """immigration_fact analog (etl_functions.py:13-38): renames, a
    broadcast left join to resolve the surrogate FK, and the date
    rendered as ISO string exactly as the reference's fact does."""
    return (
        orders.join(F.broadcast(priority_dim), "o_orderpriority", "left")
        .select(
            F.col("o_orderkey").alias("record_id"),
            F.col("o_custkey").alias("customer_key"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total_price"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("arrival_date"),
            F.col("priority_key"),
        )
    )


def build_star(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Full pipeline: every output table of the reference star schema."""
    priority_dim = build_priority_dim(tables["orders"])
    return {
        "priority_dim": priority_dim,
        "calendar_dim": build_calendar_dim(tables["orders"], "o_orderdate"),
        "country_dim": build_country_dim(
            tables["nation"], tables["region"], tables["customer"]
        ),
        "fact": build_fact(tables["orders"], priority_dim),
    }


def flagship_revenue_by_region_year(tables: dict[str, DataFrame]) -> DataFrame:
    """Flagship query (SURVEY.md §7.1): the operator spine in one plan —
    scans, broadcast dim joins, calendar derivation, exact group-by
    aggregation, ordered output.

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, revenue by
    region × order-year. nation/region broadcast; lineitem⋈orders and
    ⋈customer are the real shuffles and AQE handles their sizing.
    """
    li, o, c = tables["lineitem"], tables["orders"], tables["customer"]
    n, r = tables["nation"], tables["region"]
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    # join order matters without CBO stats: orders⋈customer first keeps
    # the re-shuffled intermediate at orders-cardinality; joining
    # lineitem first would shuffle the 4×-wider li⋈o result a second
    # time for the customer key. lineitem itself shuffles once either way.
    enriched_orders = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "c_nationkey"
    )
    return (
        li.join(enriched_orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.year("o_orderdate").alias("order_year"),
            revenue,
        )
        .groupBy("region_name", "order_year")
        .agg(
            money_sum(F.col("rev"), scale=4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("region_name", "order_year")
    )
