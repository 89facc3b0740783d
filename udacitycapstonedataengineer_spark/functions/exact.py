"""Order-independent ("exact") floating aggregation.

Summing doubles is order-dependent: a Spark partial-agg tree and a
DuckDB sequential sum can disagree in the last ulps, and at 1000
executors the Spark result isn't even stable run to run. For money-like
columns with fixed decimal scale we instead sum exact integer
minor-units (long), which is associative and overflow-safe to ~9e18 —
deterministic on any cluster layout, and bit-identical to the oracle.

This is also the fast path: the per-row round+cast stays inside
whole-stage codegen and the shuffle carries 8-byte longs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _units(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale)).cast("long")


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """SUM(col) where col has at most ``scale`` fractional digits.
    Oracle SQL equivalent: SUM(CAST(ROUND(col * 10^s) AS BIGINT)) / 10^s.
    """
    return F.sum(_units(col, scale)) / float(10**scale)


def money_avg(col: Column | str, scale: int = 2) -> Column:
    """AVG(col), exact-sum based: one long division at the end.
    Oracle SQL: SUM(CAST(ROUND(col*10^s) AS BIGINT)) / (10^s * COUNT(col)).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_units(c, scale)) / ((10**scale) * F.count(c))
