"""Misra-Gries two-pass heavy hitters (operators/heavyhitters.py):
exactness of the final output and the candidate-superset guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.operators.heavyhitters import (
    heavy_hitters_exact,
    mg_partition_candidates,
)


def _skewed_df(spark):
    # 1 item at ~33%, one at ~17%, long tail of singletons
    rows = (
        [("hot",)] * 400
        + [("warm",)] * 200
        + [(f"tail_{i}",) for i in range(600)]
    )
    return spark.createDataFrame(rows, "item string").repartition(7)


def test_heavy_hitters_exact_matches_bruteforce(spark):
    df = _skewed_df(spark)
    got = {
        (r["item"], r["n"], r["n_total"])
        for r in heavy_hitters_exact(
            df, F.col("item"), share_bp=1000
        ).collect()
    }
    n_total = df.count()
    brute = {
        (r["item"], r["n"], n_total)
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 10000 >= 1000 * n_total)
        .collect()
    }
    assert got == brute
    assert {i for i, _, _ in got} == {"hot", "warm"}


def test_mg_candidates_superset_guarantee(spark):
    # capacity+1 > 1/θ with θ=10% ⇒ every ≥10% item must survive,
    # even at a capacity far below the distinct-item count
    df = _skewed_df(spark)
    cands = {
        r["item"]
        for r in mg_partition_candidates(df, "item", capacity=11).collect()
    }
    assert {"hot", "warm"} <= cands
    # and the summary stayed bounded: ≤ capacity rows per partition
    assert len(cands) <= 11 * df.rdd.getNumPartitions()


def test_mg_bounded_output_on_uniform_tail(spark):
    # all-singleton input: summaries must not blow past capacity
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(5000)], "item string"
    ).repartition(4)
    cands = mg_partition_candidates(df, "item", capacity=8)
    assert cands.count() <= 8 * 4
