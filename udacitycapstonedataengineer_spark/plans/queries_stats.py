"""Statistical / ML-housekeeping queries: deterministic dataset
splits, histograms, and robust outlier detection — all exact-math,
all DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import H60, H60_SQL
from .registry import query


@query(
    "ml_split_assignment",
    f"""
    WITH tagged AS (
        SELECT doc_id,
               {H60_SQL.format(x="'split|' || CAST(doc_id AS VARCHAR)")} % 100
                   AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
)
def _ml_split_assignment(spark, t):
    # train/val/test assignment that is a PURE FUNCTION of the row key:
    # the portable H60 hash mod 100 against 80/10/10 thresholds. No
    # RNG, no state — any engine, any run, any subset of the data
    # assigns each doc identically (the property that keeps eval sets
    # stable as the corpus grows; random splits resample on every
    # ingest). The decision is a per-row expression at the scan; the
    # per-split audit counts are one tiny aggregate.
    bucket = (
        F.expr(H60.format(x="concat('split|', CAST(doc_id AS STRING))")) % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        t["documents"]
        .select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


@query(
    "orders_price_histogram",
    """
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 50000 AS bin,
           count(*) AS n_orders,
           CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS min_cents,
           CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM orders
    GROUP BY bin
    ORDER BY bin
    """,
)
def _orders_price_histogram(spark, t):
    # equi-width histogram in $500 bins — binning by integer division
    # of exact cents (floor ≡ truncation on non-negatives, identical in
    # both engines; float width_bucket would put boundary values in
    # engine-dependent bins). One aggregate at bin grain; the per-bin
    # min/max make the bins self-describing for plotting.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        t["orders"]
        .select(cents.alias("cents"))
        .groupBy(F.expr("cents DIV 50000").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("bin")
    )


@query(
    "orders_outlier_iqr",
    """
    WITH cents AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    bounds AS (
        SELECT o_orderstatus,
               quantile_cont(c, 0.25) AS q1,
               quantile_cont(c, 0.75) AS q3
        FROM cents GROUP BY o_orderstatus
    )
    SELECT c.o_orderstatus,
           count(*) AS n_orders,
           CAST(SUM(CASE WHEN c.c * 2 > 2 * b.q3 + 3 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
           CAST(SUM(CASE WHEN c.c * 2 < 2 * b.q1 - 3 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers
    FROM cents c JOIN bounds b ON c.o_orderstatus = b.o_orderstatus
    GROUP BY c.o_orderstatus
    ORDER BY c.o_orderstatus
    """,
)
def _orders_outlier_iqr(spark, t):
    # Tukey-fence outliers per status: price outside
    # [q1 − 1.5·IQR, q3 + 1.5·IQR]. The quartiles interpolate on exact
    # integer cents (percentile ≡ quantile_cont bitwise on integers —
    # same discipline as percentile_by_status), and the fence test is
    # DOUBLED on both sides (2c > 2q3 + 3(q3−q1)) so the 1.5 factor
    # becomes integer-valued float math with one representable form —
    # no engine-dependent rounding at the membership boundary. The
    # bounds table is status-grain (tiny) → broadcast back onto
    # orders; two total shuffles.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    c = t["orders"].select(
        "o_orderstatus", cents.alias("c")
    )
    bounds = F.broadcast(
        c.groupBy("o_orderstatus").agg(
            F.expr("percentile(c, 0.25)").alias("q1"),
            F.expr("percentile(c, 0.75)").alias("q3"),
        )
        .withColumnRenamed("o_orderstatus", "b_status")
    )
    iqr3 = 3 * (F.col("q3") - F.col("q1"))
    return (
        c.join(bounds, F.col("o_orderstatus") == F.col("b_status"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("c") * 2 > 2 * F.col("q3") + iqr3, 1).otherwise(0)
            ).alias("n_high_outliers"),
            F.sum(
                F.when(F.col("c") * 2 < 2 * F.col("q1") - iqr3, 1).otherwise(0)
            ).alias("n_low_outliers"),
        )
        .orderBy("o_orderstatus")
    )
