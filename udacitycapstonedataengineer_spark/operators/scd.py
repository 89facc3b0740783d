"""Slowly-changing-dimension maintenance (SCD type 2).

The reference rebuilds every dimension from scratch each run
(etl_functions.py:62-71 distinct + overwrite). Real warehouses keep
dimension HISTORY: when an attribute changes, the current row is
closed (valid_to = change date) and a new current row opens. This
operator applies one batch of updates to a versioned dimension.

Scale: one shuffle of the CURRENT slice on the natural key (history
rows pass through untouched); the update batch is usually tiny
relative to the dimension → Catalyst broadcasts it. Change detection
is null-safe column equality, all JVM-side. Output row count =
history + current + changed + brand-new, so the operator is
append-shaped — on a lake this becomes MERGE INTO; the detection
logic is identical.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERSION_COLS = ("valid_from", "valid_to", "is_current")


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    change_col: str = "change_date",
) -> DataFrame:
    """Apply ``updates`` (key + attrs + change date) to a versioned
    ``dim`` (key + attrs + valid_from/valid_to/is_current).

    - changed attrs → current row closes at the change date, a new
      current row opens;
    - identical attrs / keys without an update → untouched;
    - brand-new keys → inserted as current;
    - history rows always pass through.
    """
    out_cols = [*key_cols, *attr_cols, *VERSION_COLS]
    cur = dim.filter(F.col("is_current")).select(*out_cols)
    hist = dim.filter(~F.col("is_current")).select(*out_cols)
    u = updates.select(
        *key_cols,
        *[F.col(a).alias(f"__u_{a}") for a in attr_cols],
        F.col(change_col).alias("__chg"),
    )

    j = cur.join(u, key_cols, "left")
    differs = reduce(
        or_,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attr_cols],
    )
    change = F.col("__chg").isNotNull() & differs

    kept = j.filter(~change).select(*out_cols)
    closed = j.filter(change).select(
        *key_cols,
        *attr_cols,
        F.col("valid_from"),
        F.col("__chg").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    reopened = j.filter(change).select(
        *key_cols,
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.col("__chg").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    brand_new = u.join(cur.select(*key_cols), key_cols, "left_anti").select(
        *key_cols,
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.col("__chg").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(
        reopened
    ).unionByName(brand_new)


def scd2_as_of(dim: DataFrame, as_of) -> DataFrame:
    """Point-in-time read of an SCD2 dimension: the row version valid
    AT ``as_of`` (valid_from <= as_of < valid_to, open-ended current
    rows included). The temporal read-side of scd2_apply — joins and
    reports "as of" any past date reconstruct exactly, which is the
    reason to carry SCD2 versions at all. Pure filter: predicate
    pushes to the scan, no shuffle."""
    d = F.lit(as_of).cast("date")
    return dim.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )
