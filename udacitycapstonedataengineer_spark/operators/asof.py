"""As-of (point-in-time) join — an operator Spark lacks natively.

Composition strategy (a): union-and-carry. Tag both sides, union them,
and per key carry the right side's payload forward in time order with
``last(ignorenulls)`` over a running window; rows tagged "left" then
hold the latest right payload with ``right.ts <= left.ts``. This is
EXACT and fully distributed: one shuffle on the key, no per-group
pandas (`pd.merge_asof` via applyInPandas is strategy (b), only needed
when the window trick can't express the semantics, e.g. nearest-in-
either-direction with tolerance).

At 100 TB: cost is a single hash partition on the key + an in-partition
sort — the same as any windowed operator, and strictly cheaper than a
range join (no interval explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """For every left row, attach the payload of the LATEST right row
    with ``right.ts <= left.ts`` for the same key (NULLs where no such
    row exists). ``right`` must be unique per (key, ts) — pre-aggregate
    if it is not, or the carried payload is ambiguous.

    Returns all left columns plus ``payload_cols`` (right side).
    """
    left_cols = left.columns
    tagged_r = right.select(
        key, ts, *payload_cols, F.lit(0).alias("__side")
    )
    tagged_l = left.withColumn("__side", F.lit(1))
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows (__side=0) sort before left rows at equal ts, so an
    # exactly-coincident right payload is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(*left_cols, *payload_cols)
