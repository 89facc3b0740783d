"""Misra-Gries heavy hitters — bounded-memory candidates + exact verify.

The 100-TB frequent-items pattern: a full ``groupBy(item).count()``
shuffles the item grain (fine for bounded vocabularies, ruinous for
open-ended ones — URLs, user agents, n-grams). Misra-Gries keeps a
``capacity``-sized summary per partition in one pass with NO shuffle,
and the mergeable-summaries guarantee (Agarwal et al., PODS'12) bounds
the undercount by N/(capacity+1) under arbitrary merging.

Used as a TWO-PASS exact operator (the classic heavy-hitters recipe):

1. per-partition MG summaries → union of surviving items. By the
   averaging argument, any item with global share ≥ θ has local share
   ≥ θ in at least one partition, so with capacity+1 > 1/θ the union
   is a guaranteed SUPERSET of the θ-heavy items.
2. exact counts of ONLY the candidate items (broadcast semi-join onto
   the fact — the item-grain shuffle now touches candidates only),
   then the exact θN threshold.

Output is therefore EXACT and engine-independent — the sketch decides
only how much work pass 2 does — so the oracle is plain
``GROUP BY ... HAVING`` SQL, hash-compared.

Reference parity: the reference has no frequent-items surface
(utility.py stops at null-profiles); this is a training-data-pipeline
extension (stopword/boilerplate discovery, hot-key detection).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_partition_candidates(
    df: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Distinct items surviving a per-partition Misra-Gries summary.

    One pass, no shuffle; ≤ ``capacity`` rows emitted per partition.
    Guarantee: every item with within-partition relative frequency
    > 1/(capacity+1) survives that partition's summary.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            # batch-exact counts merged into the running summary, then
            # one MG reduction — mergeable-summaries semantics keep
            # the total undercount ≤ N_partition/(capacity+1)
            for item, cnt in pdf[item_col].value_counts().items():
                summary[item] = summary.get(item, 0) + int(cnt)
            if len(summary) > capacity:
                dec = sorted(summary.values(), reverse=True)[capacity]
                summary = {
                    i: c - dec for i, c in summary.items() if c > dec
                }
        yield pd.DataFrame({item_col: list(summary.keys())})

    return (
        df.select(F.col(item_col).cast("string").alias(item_col))
        .mapInPandas(summarize, f"{item_col} string")
        .distinct()
    )


def heavy_hitters_exact(
    df: DataFrame,
    item_expr: Column,
    *,
    share_bp: int,
    capacity: int | None = None,
) -> DataFrame:
    """Items whose exact count satisfies ``10000·n ≥ share_bp·N``.

    ``capacity`` defaults to the smallest value honoring the superset
    guarantee for the requested threshold (capacity+1 > 10000/share_bp).
    Returns (item, n, n_total) with exact BIGINTs.
    """
    if capacity is None:
        capacity = 10_000 // share_bp + 1
    # null items are excluded on BOTH passes (pandas value_counts
    # drops NaN, so a null could never become a candidate anyway —
    # making the exclusion explicit keeps the SQL-oracle twin exact)
    items = df.select(item_expr.cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    candidates = mg_partition_candidates(items, "item", capacity)
    total = items.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * 10_000 >= F.lit(share_bp) * F.col("n_total"))
        .select("item", "n", "n_total")
    )
