"""Query registry plumbing shared by all query-group modules.

Conventions every registered query follows (driver hash-compare):
- alias computed columns identically in Spark and oracle SQL;
- no ROUND on compared doubles (half-boundary semantics differ);
  raw IEEE expressions are bit-identical, aggregates go through
  functions.exact;
- dates cross as ISO strings, timestamps as epoch micros;
- surrogate keys are rank-based on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import pin_oracle_semantics
from ..sources.readers import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn(spark, tables) -> DataFrame`` under ``name``,
    optionally with its DuckDB oracle SQL."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_oracle_semantics(spark)
            return fn(spark, load_tables(spark, sf_dir))

        wrapped.__name__ = f"query_{name}"
        wrapped.__wrapped__ = fn  # raw (spark, tables) fn for tests
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return wrapped

    return deco
