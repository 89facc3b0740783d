"""Round-5d query group: ordered string aggregation, dense-spine
gap filling, bitmap activity aggregates, and per-label centroids over
quantized embeddings.

Same conventions as every group (plans/registry.py). The bitmap query
is the scale story of the batch: a 31-bit month-activity bitmap
replaces count-distinct-days with an O(1)-state, fully map-side-
combinable integer OR — the roaring-bitmap technique at its smallest.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.similarity import _MAXABS_EXPR, _MAXABS_SQL
from .registry import query


@query(
    "nation_top_customers_concat",
    """
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           array_to_string(list_sort(list(c.c_name))[1:5], ',')
               AS top5_names
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def _nation_top_customers_concat(spark, t):
    # ordered string aggregation (SQL string_agg / listagg surface):
    # per nation, the 5 alphabetically-first customer names, comma-
    # joined. The count aggregates over ALL customers, but the list is
    # rank-FILTERED to ≤5 per group BEFORE collect_list — per-group
    # window state and collected-array memory stay bounded at any
    # scale, unlike a collect-then-slice which materializes the whole
    # group. array_sort after collect makes the (unordered) list
    # deterministic.
    c = t["customer"].join(
        F.broadcast(t["nation"]),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = Window.partitionBy("n_name").orderBy("c_name", "c_custkey")
    counts = c.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    top5 = (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("c_name")), ","
            ).alias("top5_names")
        )
    )
    return (
        counts.join(top5, "nation")
        .select("nation", "n_customers", "top5_names")
        .orderBy("nation")
    )


@query(
    "orders_daily_status_spine",
    """
    WITH days AS (SELECT DISTINCT o_orderdate AS day FROM orders),
    statuses AS (SELECT DISTINCT o_orderstatus AS status FROM orders),
    counts AS (
        SELECT o_orderdate AS day, o_orderstatus AS status,
               count(*) AS n
        FROM orders GROUP BY 1, 2
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, s.status AS status,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
    FROM days d
    CROSS JOIN statuses s
    LEFT JOIN counts c ON c.day = d.day AND c.status = s.status
    ORDER BY 1, 2
    """,
)
def _orders_daily_status_spine(spark, t):
    # dense-spine gap filling: every (day, status) combination with
    # explicit zeros — the reporting shape downstream charting and
    # window functions need (a missing row silently breaks lag/moving
    # averages). The spine is the cross join of two SMALL distinct
    # sets (calendar days × 3 statuses), never a fact-grain product;
    # the fact contributes one (day,status)-grain aggregate that
    # left-joins onto the spine via broadcast.
    o = t["orders"]
    days = o.select(F.col("o_orderdate").alias("day")).distinct()
    statuses = o.select(F.col("o_orderstatus").alias("status")).distinct()
    counts = o.groupBy(
        F.col("o_orderdate").alias("day"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        days.crossJoin(F.broadcast(statuses))
        .join(counts, ["day", "status"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "status",
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
        .orderBy("day", "status")
    )


@query(
    "events_activity_bitmap",
    """
    SELECT user_id,
           CAST(bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)) AS BIGINT)
               AS activity_bitmap,
           CAST(bit_count(bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)))
                AS INT) AS active_days,
           CAST(min(day(ts)) AS INT) AS first_day,
           CAST(max(day(ts)) AS INT) AS last_day
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def _events_activity_bitmap(spark, t):
    # per-user month-activity BITMAP: day-of-month n sets bit n−1, so
    # one BIGINT carries the whole activity calendar and
    # active_days = popcount(bitmap). This is the scale replacement
    # for count(DISTINCT day): O(1) state per user instead of a
    # distinct set, fully map-side combinable (OR is associative/
    # commutative), and downstream set algebra (retention = popcount
    # of bitmap_a AND bitmap_b) becomes integer ops — the roaring-
    # bitmap technique, single-word edition. Testdata events all fall
    # in one month; a multi-month corpus keys the groupBy by (user,
    # month) with the same per-group word.
    # shiftleft's Python wrapper takes a literal shift count only —
    # the column-valued shift has to go through the SQL expression
    bit = F.expr("shiftleft(cast(1 as bigint), dayofmonth(ts) - 1)")
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.bit_or(bit).alias("activity_bitmap"),
            F.bit_count(F.bit_or(bit)).cast("int").alias("active_days"),
            F.min(F.dayofmonth("ts")).alias("first_day"),
            F.max(F.dayofmonth("ts")).alias("last_day"),
        )
        .orderBy("user_id")
    )


@query(
    "embeddings_label_centroid",
    f"""
    WITH q AS (
        SELECT label,
               CASE WHEN max_abs = 0
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                         x -> CAST(round(x::DOUBLE * (127.0 / max_abs))
                                   AS INTEGER))
               END AS codes
        FROM (SELECT label, embedding,
                     {_MAXABS_SQL.format(e="embedding")} AS max_abs
              FROM embeddings)
    )
    SELECT label, CAST(s.i AS INT) AS dim,
           count(*) AS n_vecs,
           CAST(sum(codes[s.i]) AS BIGINT) AS sum_q,
           CAST((sum(codes[s.i]) * 10000) // count(*) AS BIGINT)
               AS mean_q_e4
    FROM q, generate_series(1, 64) AS s(i)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def _embeddings_label_centroid(spark, t):
    # per-label centroid over int8-QUANTIZED codes (the shared
    # symmetric quantizer from operators/similarity.py): exact BIGINT
    # component sums, mean as a ×10⁴ rational — so the centroid is
    # bit-identical across engines, unlike a float mean whose
    # summation order differs. Plan: narrow per-row quantize (no
    # shuffle), posexplode to (label, dim) grain, one
    # map-side-combinable aggregate at labels×64 output rows. The
    # integer-centroid trick is the same fixed-point discipline as
    # the k-means operator (operators/clustering.py).
    maxabs = F.expr(_MAXABS_EXPR.format(e="embedding"))
    step1 = t["embeddings"].withColumn("max_abs", maxabs)
    codes = F.expr(
        "CASE WHEN max_abs = 0D THEN transform(embedding, x -> 0)"
        " ELSE transform(embedding,"
        "  x -> cast(round(cast(x as double) * (127.0D / max_abs)) as int))"
        " END"
    )
    return (
        step1.withColumn("codes", codes)
        .select("label", F.posexplode("codes").alias("pos", "qv"))
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("qv").alias("sum_q"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            "sum_q",
            F.expr("(sum_q * 10000) DIV n_vecs").alias("mean_q_e4"),
        )
        .orderBy("label", "dim")
    )
