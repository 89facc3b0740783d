"""Round-5h query group: inequality and content-shape profiling —
exact Gini coefficient over order values (the scalar complement to
events_power_users_pareto's concentration curve) and per-source
character-class fingerprints.

Same conventions as every group (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ranking import with_global_rank
from .registry import query


@query(
    "orders_value_gini",
    """
    WITH cents AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c, o_orderkey) AS rnk
        FROM cents
    )
    SELECT count(*) AS n_orders,
           CAST(sum(c) AS BIGINT) AS total_cents,
           CAST(sum(rnk * c) AS DOUBLE) AS rank_weighted_cents,
           CAST(2 * sum(rnk * c) - (count(*) + 1) * sum(c) AS DOUBLE)
               / CAST(count(*) * sum(c) AS DOUBLE) AS gini
    FROM ranked
    """,
)
def _orders_value_gini(spark, t):
    # exact Gini coefficient of order-value inequality — the scalar
    # the Pareto top-share curve summarizes. Needs a total-order rank
    # over the fact, which is exactly what the DISTRIBUTED exact
    # ranking provides (range partition + per-partition row_number +
    # broadcast offsets; the oracle's global row_number is the
    # single-task shape the operator exists to avoid). The closed
    # form G = (2·Σrank·x − (n+1)·Σx) / (n·Σx) aggregates the
    # rank-weighted sum in a DECIMAL(38,0) accumulator (Σrank·cents
    # is ~n²·c̄/2 — already past int64 at the ×10 probe; DuckDB's sum
    # widens to HUGEINT on its own), then the ratio is ONE
    # deterministic conversion+division: the exact decimal/int128
    # values round to the same nearest double in both engines.
    # Deterministic tie-break on (cents, orderkey).
    cents = t["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    ranked = with_global_rank(cents, ["c", "o_orderkey"], "rnk")
    src = "sum(cast(rnk * c as decimal(38,0)))"
    sc = "cast(sum(c) as decimal(38,0))"
    return ranked.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("c").alias("total_cents"),
        F.expr(f"CAST({src} AS DOUBLE)").alias("rank_weighted_cents"),
        F.expr(
            f"CAST(2 * {src} - (count(1) + 1) * {sc} AS DOUBLE)"
            f" / CAST(count(1) * {sc} AS DOUBLE)"
        ).alias("gini"),
    )


@query(
    "docs_char_class_profile",
    r"""
    WITH d AS (
        SELECT source, n_chars,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   AS n_alpha,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               length(regexp_replace(text, '[^ \t\n]', '', 'g'))
                   AS n_space
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST((sum(n_alpha) * 10000) // sum(n_chars) AS BIGINT)
               AS alpha_bp,
           CAST((sum(n_digit) * 10000) // sum(n_chars) AS BIGINT)
               AS digit_bp,
           CAST((sum(n_space) * 10000) // sum(n_chars) AS BIGINT)
               AS space_bp
    FROM d
    GROUP BY 1
    ORDER BY 1
    """,
)
def _docs_char_class_profile(spark, t):
    # per-source character-class fingerprint: alphabetic / digit /
    # whitespace shares — the cheap content-type signal that separates
    # prose from tables, logs, and code before any model runs. Counts
    # via regexp_replace-and-measure (a character class with IDENTICAL
    # semantics in Java regex and RE2), per-row native exprs, one
    # source-grain aggregate; shares as basis points over exact sums.
    d = t["documents"].select(
        "source",
        "n_chars",
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace("text", "[^ \t\n]", "")).alias("n_space"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.expr(
                "(sum(n_alpha) * 10000) DIV sum(n_chars)"
            ).alias("alpha_bp"),
            F.expr(
                "(sum(n_digit) * 10000) DIV sum(n_chars)"
            ).alias("digit_bp"),
            F.expr(
                "(sum(n_space) * 10000) DIV sum(n_chars)"
            ).alias("space_bp"),
        )
        .orderBy("source")
    )
