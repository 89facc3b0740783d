"""Data-quality gates (SURVEY.md §2.10 Q1-Q3).

The reference's quality_checks (etl_functions.py:136-147) prints
"NOK" per empty table and always returns 0 — nothing fails. Here the
gates RAISE, return their evidence as data, and run as few Spark jobs
as possible: FK coverage is one broadcast anti-join count, not a
per-key loop; all-table row counts come from one action per table on
the already-cached pipeline outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityError(AssertionError):
    """A quality gate failed; message carries the metric evidence."""


def assert_nonempty(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Q1: every output table must have rows. Returns the counts."""
    counts = {name: df.count() for name, df in tables.items()}
    empty = [name for name, n in counts.items() if n == 0]
    if empty:
        raise QualityError(f"empty output tables: {empty} (counts={counts})")
    return counts


def fk_coverage(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> dict[str, int]:
    """Every non-null fact FK must resolve in the dim (the check the
    reference never made — its left joins silently null the key).
    One broadcast LEFT ANTI join; no fact shuffle."""
    unresolved = (
        fact.filter(F.col(fact_key).isNotNull())
        .join(
            F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()),
            fact_key,
            "left_anti",
        )
        .count()
    )
    if unresolved:
        raise QualityError(
            f"{unresolved} fact rows have {fact_key} not present in dim.{dim_key}"
        )
    return {"unresolved_fks": unresolved}


def check_star(star: dict[str, DataFrame]) -> dict[str, int]:
    """Full gate for the star pipeline (plans/star.py outputs):
    non-empty tables + fact→priority_dim FK coverage."""
    metrics = assert_nonempty(star)
    metrics.update(fk_coverage(star["fact"], star["priority_dim"], "priority_key", "priority_key"))
    return metrics
