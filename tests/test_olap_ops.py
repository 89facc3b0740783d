"""Operator-level checks for the approximate and as-of paths that the
hash oracle can't cover."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.operators.asof import asof_join_backward
from udacitycapstonedataengineer_spark.plans.queries import QUERIES
from udacitycapstonedataengineer_spark.sources.readers import load_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["approx_distinct_users"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.05 * n), (et, approx[et], n)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    approx = {
        r.o_orderstatus: r.median_price
        for r in QUERIES["approx_percentile_price"](spark, sf_dir).collect()
    }
    exact = {
        r.o_orderstatus: r.m
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, m in exact.items():
        assert abs(approx[k] - m) <= 0.02 * abs(m), (k, approx[k], m)


def test_range_join_matches_naive_and_avoids_nested_loop(spark, sf_dir):
    from udacitycapstonedataengineer_spark.operators.rangejoin import (
        range_join_bucketed,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us").alias("c_start"),
        (F.col("ts_us") + 600_000_000).alias("c_end"),
    )
    bucketed = range_join_bucketed(
        errors, clicks, "user_id", "ts_us", "c_start", "c_end",
        bucket_width=600_000_000,
    )
    naive = errors.join(
        clicks,
        (errors.user_id == clicks.user_id)
        & (clicks.c_start <= errors.ts_us)
        & (errors.ts_us < clicks.c_end),
    ).select(errors.user_id, "event_id", "ts_us", "c_start", "c_end")
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, naive.collect())
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)],
        ["k", "ts", "val"],
    )
    got = {
        r.tag: r.val
        for r in asof_join_backward(
            left, right, key="k", ts="ts", payload_cols=["val"]
        ).collect()
    }
    # ts=10 sees the coincident right row; ts=20 the latest earlier one;
    # ts=5 predates all; key 2's only right row is in the future
    assert got == {"a": 100.0, "b": 150.0, "c": None, "d": None}
