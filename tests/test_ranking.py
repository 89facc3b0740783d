"""Distributed exact global ranking (operators/ranking.py).

The building block behind every total-order statistic in the engine
(percent_rank/cume_dist, equi-depth histograms): ranks must equal the
single-window reference on any input, while the plan keeps per-task
memory bounded by the range-partition size."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.operators.ranking import with_global_rank


def _ref_ranks(df, order_cols):
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("ref", F.row_number().over(w).cast("long"))


def test_matches_single_window_reference(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 2654435761 % 1000).alias("v"),
        F.col("id").alias("k"),
    )
    got = with_global_rank(df, ["v", "k"], "rnk", num_buckets=7)
    ref = _ref_ranks(df, ["v", "k"])
    mismatches = (
        got.join(ref, ["v", "k"]).filter(F.col("rnk") != F.col("ref")).count()
    )
    assert mismatches == 0
    # rank is a permutation of 1..n
    n = df.count()
    assert got.agg(F.min("rnk"), F.max("rnk"), F.countDistinct("rnk")).first() == (
        1,
        n,
        n,
    )


def test_skewed_and_tiny_inputs(spark):
    # all-equal order values: tie-break key must still yield 1..n
    df = spark.range(0, 50).select(F.lit(1).alias("v"), F.col("id").alias("k"))
    got = with_global_rank(df, ["v", "k"], "rnk", num_buckets=8)
    assert [r.rnk for r in got.orderBy("k").collect()] == list(range(1, 51))
    # single row
    one = spark.range(1).select(F.lit(9).alias("v"), F.col("id").alias("k"))
    assert with_global_rank(one, ["v", "k"]).first().rnk == 1


def test_plan_has_no_global_data_window(spark):
    """The only no-partitionBy window must run over the per-partition
    count table (≤ num_buckets rows), never the data itself: the data
    window is partitioned by SPARK_PARTITION_ID."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 13).alias("v"), F.col("id").alias("k")
    )
    plan = (
        with_global_rank(df, ["v", "k"], "rnk", num_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SPARK_PARTITION_ID" in plan
    assert "rangepartitioning" in plan.lower()
