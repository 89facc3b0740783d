"""Date/calendar functions (SURVEY.md §2.6 C1-C6).

The reference decodes SAS epoch dates (days since 1960-01-01, stored as
double) with a row-at-a-time Python UDF (etl_functions.py:24,121;
utility.py:68) — a JVM→Python round trip per batch that breaks
whole-stage codegen. The native expression below is semantically
identical (including the reference's ``if x`` quirk that maps BOTH null
and 0 to null) and stays entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SAS_EPOCH = "1960-01-01"


def sas_date_decode(col: Column | str) -> Column:
    """days-since-1960 double → DateType, with the reference's 0→null
    quirk (etl_functions.py:24: ``if x`` is falsy for 0.0).

    Oracle SQL: CASE WHEN x IS NULL OR x = 0 THEN NULL
                     ELSE DATE '1960-01-01' + CAST(x AS INT) END
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (c == 0), F.lit(None).cast("date")
    ).otherwise(F.date_add(F.to_date(F.lit(SAS_EPOCH)), c.cast("int")))


def calendar_columns(date_col: Column | str) -> dict[str, Column]:
    """The five calendar attributes of the reference's calendar dim
    (etl_functions.py:123-127). Spark ``dayofweek`` is 1=Sunday; the
    DuckDB oracle compensates with ``dayofweek(d) + 1`` (0=Sunday there).
    ``weekofyear`` is ISO week in both engines."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "arrival_day": F.dayofmonth(c),
        "arrival_week": F.weekofyear(c),
        "arrival_month": F.month(c),
        "arrival_year": F.year(c),
        "arrival_weekday": F.dayofweek(c),
    }
