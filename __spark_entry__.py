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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return dict(ORACLE)
