"""Dimension builders (SURVEY.md §1.2, §2.2 P6, §2.6).

The reference builds each dim as distinct + ``monotonically_increasing_id``
(etl_functions.py:56,69,128) — keys that depend on partition layout, so
two runs of the same pipeline disagree. Surrogate keys here are
deterministic: dense row_number over the natural key. The global-order
window is safe because it runs AFTER the distinct, on dimension-sized
data (17 visa types, 289 countries, ~2500 dates) — never on the fact.
For fact-grain keys use ``xxhash64`` of the natural key instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dates import calendar_columns


def build_dimension(
    df: DataFrame,
    natural_key: list[str],
    surrogate_name: str,
) -> DataFrame:
    """visa_type_dim semantics (etl_functions.py:62-71): distinct natural
    key + surrogate. Deterministic: key i = rank of the natural key."""
    w = Window.orderBy(*natural_key)
    return (
        df.select(*natural_key)
        .distinct()
        .withColumn(surrogate_name, F.row_number().over(w))
    )


def build_calendar_dim(
    df: DataFrame, date_col: Column | str, out_name: str = "arrdate"
) -> DataFrame:
    """Calendar dim (etl_functions.py:115-131): distinct date + the five
    calendar attributes + deterministic id. Sink should partition by
    (arrival_year, arrival_month, arrival_week) per the reference."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    dates = df.select(c.alias(out_name)).distinct()
    for name, expr in calendar_columns(out_name).items():
        dates = dates.withColumn(name, expr)
    return dates.withColumn("id", F.row_number().over(Window.orderBy(out_name)))


def fact_surrogate(natural_key: list[str]) -> Column:
    """Fact-grain surrogate: xxhash64 of the natural key — no shuffle,
    no window, stable at any scale (collision-checked in tests)."""
    return F.xxhash64(*[F.col(c) for c in natural_key])
