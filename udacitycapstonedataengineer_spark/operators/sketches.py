"""Mergeable sketches (Apache DataSketches via Spark SQL built-ins).

The scale story: exact distinct counts and quantiles need a shuffle of
every value; sketches are small, MERGEABLE summaries — build one per
partition/day/source, union them later, never rescan. That algebra
(estimate(union(parts)) == estimate(whole)) is what makes incremental
pipelines cheap at 100 TB: each new day contributes one sketch, and
any rollup (week, month, all-time) is a union of sketches.

No DuckDB twin exists for DataSketches, so these register rows-only;
the merge-equality and error-bound contracts are pinned by
tests/test_sketches.py instead (the same pattern as
approx_distinct_users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_daily_distinct(
    events: DataFrame, key: str = "user_id", lg_k: int = 12
) -> DataFrame:
    """Per-day HLL sketches of distinct ``key``, plus the estimate —
    the daily building block of an incremental distinct-users rollup."""
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"))
        .select(
            "day",
            F.hll_sketch_estimate("sketch").alias("est_distinct"),
            "sketch",
        )
    )


def hll_merge_estimate(daily: DataFrame) -> DataFrame:
    """Union the daily sketches → one all-time estimate. O(#days)
    driver-free merge, never touching the raw events again."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct")
    )


def kll_value_quantiles(
    events: DataFrame,
    value_col: str = "value",
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable quantile sketch (KLL) over a double column: per-type
    sketches, merged to a global sketch, then quantiles — the
    distributed-percentile path that doesn't materialize groups."""
    per_type = events.groupBy("event_type").agg(
        F.kll_sketch_agg_double(value_col).alias("sk")
    )
    # kll_sketch_merge_double is a binary scalar: fold the per-group
    # sketches in a DETERMINISTIC order (sorted by group key) so the
    # merged sketch — and its quantiles — are layout-independent
    merged = per_type.agg(
        F.expr(
            "aggregate("
            " slice(transform(array_sort(collect_list(struct(event_type, sk))),"
            "       x -> x.sk), 2, 2147483647),"
            " transform(array_sort(collect_list(struct(event_type, sk))),"
            "       x -> x.sk)[0],"
            " (acc, s) -> kll_sketch_merge_double(acc, s))"
        ).alias("sk")
    )
    return merged.select(
        *[
            F.kll_sketch_get_quantile_double("sk", F.lit(p)).alias(
                f"q{int(p * 100)}"
            )
            for p in probs
        ]
    )


def theta_distinct_by_source(
    docs: DataFrame, key: str = "fingerprint"
) -> DataFrame:
    """Theta sketches per source + the cross-source union estimate —
    distinct-content accounting across corpus sources (how much does a
    new crawl REALLY add?)."""
    per_source = docs.groupBy("source").agg(
        F.theta_sketch_agg(key).alias("sk"),
    )
    return per_source.select(
        "source",
        F.theta_sketch_estimate("sk").alias("est_distinct"),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch as a DataFrame: ``depth``×``width`` counters,
    one row per (i, bucket). Unlike the DataSketches wrappers above,
    this is PURE native SQL over the engine-portable H60 hash — so the
    whole sketch (and its estimates) is deterministic, integer-exact,
    and DuckDB-oracle-checkable bit for bit.

    Mergeable by construction: union partial sketches and
    ``groupBy(i, bucket).sum(cnt)`` — each day/source/partition
    contributes one d×w table, rollups never rescan the data. Point
    estimates via cms_estimate are min over d counters: always an
    OVERESTIMATE (est >= true count), within eps·N with the usual
    (d, w) probability bounds."""
    from .dedup import H60

    salted = f"concat('cms|', i, '|', CAST({key_col} AS STRING))"
    return (
        df.select(
            F.col(key_col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
        )
        .select(
            "i",
            F.expr(f"{H60.format(x=salted)} % {width}").alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probe: DataFrame, key_col: str, depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-count estimates for ``probe`` keys against a cms_build
    sketch: min over the d counters each key hashes to. The probe side
    explodes to (key, i, bucket) and equi-joins the (tiny, d×w-row)
    sketch — broadcast, no shuffle of the probe grain."""
    from .dedup import H60

    salted = f"concat('cms|', i, '|', CAST({key_col} AS STRING))"
    keyed = probe.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
    ).select(
        key_col,
        "i",
        F.expr(f"{H60.format(x=salted)} % {width}").alias("bucket"),
    )
    return (
        keyed.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    depth: int = 3,
) -> DataFrame:
    """Bloom filter as a DataFrame: the distinct set-bit POSITIONS of
    ``df``'s keys under ``depth`` salted H60 hashes mod ``m_bits``.
    Like cms_build, pure portable integer arithmetic — buildable,
    mergeable (union + distinct), and oracle-checkable in any engine.
    At most ``m_bits`` rows regardless of key cardinality; the
    membership contract is one-sided (false positives possible at the
    standard (m, d, n) rate, false negatives never)."""
    from .dedup import H60

    salted = f"concat('bloom|', i, '|', CAST({key_col} AS STRING))"
    return (
        df.select(
            F.col(key_col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
        )
        .select(F.expr(f"{H60.format(x=salted)} % {m_bits}").alias("position"))
        .distinct()
    )


def bloom_contains(
    bits: DataFrame,
    probe: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    depth: int = 3,
) -> DataFrame:
    """(key, claimed_present) per distinct probe key: present iff ALL
    ``depth`` bit positions are set. The bits side is at most m_bits
    rows → broadcast; the probe side never shuffles.

    The probe is deduplicated and presence is aggregated as a
    universal check (``min(__set) == 1``), not a count: a counted
    ``sum == depth`` breaks the one-sided no-false-negative contract
    as soon as a key appears twice in the probe (each duplicate row
    explodes to ``depth`` more position rows)."""
    from .dedup import H60

    salted = f"concat('bloom|', i, '|', CAST({key_col} AS STRING))"
    keyed = (
        probe.select(key_col)
        .distinct()
        .select(
            F.col(key_col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
        )
        .select(
            key_col,
            F.expr(f"{H60.format(x=salted)} % {m_bits}").alias("position"),
        )
    )
    hit = F.broadcast(bits.withColumn("__set", F.lit(1)))
    return (
        keyed.join(hit, "position", "left")
        .groupBy(key_col)
        .agg(
            (F.min(F.coalesce(F.col("__set"), F.lit(0))) == 1).alias(
                "claimed_present"
            )
        )
    )
