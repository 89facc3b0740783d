"""Distributed EXACT global ranking — no single-partition windows.

Spark's classic scale trap: ``Window.orderBy(...)`` with no
``partitionBy`` funnels every row through ONE task. The reference has
no ranking operator (its 374-line ETL never sorts globally), but the
engine's analytics extensions (percent_rank/cume_dist, equi-depth
histograms, exact medians) all need a total-order rank — so this
module provides the scale-safe building block once:

1. ``repartitionByRange`` on the order columns → contiguous,
   balanced value ranges, one per shuffle partition (boundary
   sampling is seeded deterministically in Spark's RangePartitioner).
2. ``row_number`` WITHIN each range partition (distributed; bounded
   by partition size, never the full table).
3. Per-partition row counts (one tiny row per partition) are
   cumulative-summed with a window over ≤ num_buckets rows — the only
   "global" window in the plan runs over the partition-count table,
   not the data.
4. rank = partition offset + within-partition row_number.

Memory per task is bounded by the range-partition size at ANY data
scale; doubling executors halves it. Total cost: two full-data
shuffles (range + the window's hash on partition id) — the price of
exactness without a serial stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rnk",
    num_buckets: int | None = None,
) -> DataFrame:
    """Append 1-based ``rank_col`` = row rank under the total order
    ``order_cols`` (caller must make the tuple unique — add a
    tie-break key — for a deterministic result)."""
    nb = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    p = df.repartitionByRange(nb, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("__pid").orderBy(*cols)
    ranked = p.withColumn("__rn", F.row_number().over(w_in))
    # one row per partition: the only unpartitioned window runs here
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        p.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        )
        .select("__pid", "__off")
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )
