"""Round-5b query group: engagement / diagnostics shapes — hot-key
skew profiling, purchase-cadence stats, DAU/MAU stickiness,
ratio-to-report revenue shares, churn bucketing, a chi-square
association table, and unigram-rarity document scoring.

Same conventions as every group (plans/registry.py): identical
aliases both engines, integer/rational arithmetic wherever a float
comparison could flip (basis points via truncating integer division,
which Spark ``DIV`` and DuckDB ``//`` both implement), percentiles
only at dyadic quantiles over integers (exact in binary), doubles
only as single deterministic expressions over exact integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query

# whitespace tokenizer twin of queries_dedup._TOKS_SQL
_TOKS_SPARK = "filter(split(lower(trim(text)), '\\\\s+'), s -> s != '')"


@query(
    "orders_hot_keys_skew",
    """
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(count(*) * 10000 // (SELECT count(*) FROM orders)
                AS BIGINT) AS share_bp
    FROM orders
    GROUP BY 1
    ORDER BY n_orders DESC, o_custkey
    LIMIT 10
    """,
)
def _orders_hot_keys_skew(spark, t):
    # hot-key diagnostics: the 10 heaviest join/agg keys and their
    # share of the fact table — the profile you run BEFORE choosing a
    # salting or skew-join strategy (the engine's own AQE skew
    # threshold is keyed off exactly this distribution). Plan: one
    # map-side-combinable count per key, broadcast 1-row total,
    # TakeOrdered for the top-10 (never a global sort shuffle).
    # Deterministic tie-break on the key itself.
    o = t["orders"]
    total = o.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            "n_orders",
            F.expr("n_orders * 10000 DIV n_total").alias("share_bp"),
        )
        .orderBy(F.desc("n_orders"), "o_custkey")
        .limit(10)
    )


@query(
    "orders_interorder_gap_stats",
    """
    WITH g AS (
        SELECT date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate,
                                                         o_orderkey),
                         o_orderdate) AS gap
        FROM orders
    )
    SELECT count(*) AS n_gaps,
           CAST(sum(gap) AS BIGINT) AS sum_gap_days,
           CAST(sum(gap) * 100 // count(*) AS BIGINT) AS avg_gap_e2,
           quantile_cont(gap, 0.25) AS p25_gap,
           quantile_cont(gap, 0.5) AS p50_gap,
           quantile_cont(gap, 0.75) AS p75_gap,
           CAST(max(gap) AS INT) AS max_gap
    FROM g WHERE gap IS NOT NULL
    """,
)
def _orders_interorder_gap_stats(spark, t):
    # purchase-cadence profile: days between consecutive orders of the
    # same customer, summarized globally. The lag window is PARTITIONED
    # by customer (bounded frames, no single-task trap); the final
    # 1-row aggregate is map-side combinable. Quantiles sit on integer
    # day counts at dyadic p, so the interpolated values are exact
    # halves/quarters in double — no cross-engine ulp drift. The mean
    # crosses as a rational (×100, truncating integer division).
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        t["orders"]
        .select(
            F.datediff(
                "o_orderdate", F.lag("o_orderdate").over(w)
            ).alias("gap")
        )
        .filter(F.col("gap").isNotNull())
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").alias("sum_gap_days"),
        F.expr("sum(gap) * 100 DIV count(1)").alias("avg_gap_e2"),
        F.expr("percentile(gap, 0.25)").alias("p25_gap"),
        F.expr("percentile(gap, 0.5)").alias("p50_gap"),
        F.expr("percentile(gap, 0.75)").alias("p75_gap"),
        F.max("gap").alias("max_gap"),
    )


@query(
    "events_dau_mau_stickiness",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(count(DISTINCT CASE WHEN du.day = d.day
                                    THEN du.user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS mau_30d,
           CAST(count(DISTINCT CASE WHEN du.day = d.day
                                    THEN du.user_id END) * 10000
                // count(DISTINCT du.user_id) AS BIGINT) AS stickiness_bp
    FROM days d
    JOIN du ON du.day BETWEEN d.day - 29 AND d.day
    GROUP BY d.day
    ORDER BY day
    """,
)
def _events_dau_mau_stickiness(spark, t):
    # DAU/MAU stickiness — the engagement ratio product teams track.
    # Same scale shape as events_rolling_7d_active_users: collapse to
    # distinct (day, user) FIRST (one shuffle; ~10⁻⁴ of event count at
    # 100 TB), then EXPLODE each pair to its ≤30 trailing anchors and
    # equi-join the anchor dimension — never a range predicate Spark
    # would nested-loop. Fan-out is 30× of the day×user grain, not of
    # the fact table. Stickiness crosses as basis points (truncating
    # integer division over two exact distinct-counts).
    # the day×user table feeds the anchor dimension AND the fan-out —
    # persisted so the fact scan + distinct shuffle run once
    du = (
        t["events"]
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .persist()
    )
    days = du.select(F.col("day").alias("anchor")).distinct()
    fanout = du.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 29))
        ).alias("anchor"),
    )
    return (
        fanout.join(F.broadcast(days), "anchor", "left_semi")
        .groupBy("anchor")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("anchor"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("mau_30d"),
        )
        .select(
            F.date_format("anchor", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau_30d",
            F.expr("dau * 10000 DIV mau_30d").alias("stickiness_bp"),
        )
        .orderBy("day")
    )


@query(
    "nation_revenue_share",
    """
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(cents AS BIGINT) AS nation_cents,
           CAST(sum(cents) OVER (PARTITION BY region) AS BIGINT)
               AS region_cents,
           CAST(cents * 10000 // sum(cents) OVER (PARTITION BY region)
                AS BIGINT) AS share_bp
    FROM rev
    ORDER BY region, nation
    """,
)
def _nation_revenue_share(spark, t):
    # ratio-to-report: each nation's share of its region's revenue.
    # The fact scan aggregates to nation grain FIRST (25 rows), so the
    # share window runs partitioned over a dim-sized table — the
    # window is an output-grain formality, not a data-movement step.
    # customer is SF-proportional, so it joins via a pinned
    # SHUFFLE_HASH on o_custkey (ADVICE r5; q8/q21 precedent) — only
    # the fixed-size nation/region dims broadcast; the other real
    # shuffle is the nation-grain aggregate with map-side combine.
    rev = (
        t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_nationkey").hint(
                "shuffle_hash"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.col("cents").alias("nation_cents"),
        F.sum("cents").over(w).alias("region_cents"),
        F.expr(
            "cents * 10000 DIV (sum(cents) OVER (PARTITION BY region))"
        ).alias("share_bp"),
    ).orderBy("region", "nation")


@query(
    "events_churn_buckets",
    """
    WITH last AS (
        SELECT user_id, max(CAST(ts AS DATE)) AS last_day
        FROM events GROUP BY 1
    ),
    mx AS (SELECT max(last_day) AS mxd FROM last)
    SELECT CASE
             WHEN date_diff('day', last_day, mxd) <= 7 THEN 'active_7d'
             WHEN date_diff('day', last_day, mxd) <= 30 THEN 'recent_30d'
             WHEN date_diff('day', last_day, mxd) <= 90 THEN 'lapsed_90d'
             ELSE 'churned'
           END AS bucket,
           count(*) AS n_users
    FROM last, mx
    GROUP BY 1
    ORDER BY 1
    """,
)
def _events_churn_buckets(spark, t):
    # recency-bucketed churn accounting: users binned by days since
    # their last event, relative to the corpus high-water mark. One
    # user-grain aggregate (map-side combinable max), a broadcast
    # 1-row corpus max, then a 4-bucket count. Integer day arithmetic
    # only — bucket edges cannot ulp-flip.
    # user-grain recency table feeds the corpus max AND the bucketing
    # — persisted so the fact scan+agg runs once
    last = (
        t["events"]
        .groupBy("user_id")
        .agg(F.max(F.to_date("ts")).alias("last_day"))
        .persist()
    )
    mx = last.agg(F.max("last_day").alias("mxd"))
    idle = F.datediff("mxd", "last_day")
    bucket = (
        F.when(idle <= 7, "active_7d")
        .when(idle <= 30, "recent_30d")
        .when(idle <= 90, "lapsed_90d")
        .otherwise("churned")
    )
    return (
        last.crossJoin(F.broadcast(mx))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("bucket")
    )


@query(
    "events_type_weekday_chisq",
    """
    WITH c AS (
        SELECT event_type, CAST(isodow(ts) AS INT) AS dow,
               count(*) AS obs
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_tot
           FROM c GROUP BY 1),
    ct AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS col_tot
           FROM c GROUP BY 1),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM c)
    SELECT c.event_type, c.dow, CAST(c.obs AS BIGINT) AS obs,
           rt.row_tot, ct.col_tot, n.n_total,
           (CAST(n.n_total AS DOUBLE) * CAST(c.obs AS DOUBLE)
              - CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE))
             * (CAST(n.n_total AS DOUBLE) * CAST(c.obs AS DOUBLE)
                  - CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE))
             / (CAST(n.n_total AS DOUBLE) * CAST(rt.row_tot AS DOUBLE)
                  * CAST(ct.col_tot AS DOUBLE))
               AS chisq_contrib
    FROM c
    JOIN rt USING (event_type)
    JOIN ct USING (dow)
    CROSS JOIN n
    ORDER BY event_type, dow
    """,
)
def _events_type_weekday_chisq(spark, t):
    # chi-square association table for event_type × ISO weekday — the
    # independence screen behind "does behavior vary by day?". Output
    # is the CELL grain (|types|×7 rows): observed count, marginals,
    # and the per-cell chi² contribution. The contribution is the one
    # double in the group: each BIGINT factor is cast to double BEFORE
    # any multiply (ADVICE r5 — n_total·row_tot·col_tot grows ~n³ in
    # event count, so an int64 product would silently wrap in Spark
    # with ANSI off while DuckDB raises; IEEE products/differences in
    # the same association order are still bit-identical across
    # engines). The total, which WOULD depend on summation order, is
    # deliberately left to the consumer. Marginals are dim-sized
    # broadcasts; the one shuffle is the cell-grain count. The cell
    # table feeds FOUR consumers
    # (marginals, total, output) — persisted, since caching 35 rows to
    # avoid three extra fact scans is the trade that always wins.
    c = (
        t["events"]
        .select(
            "event_type",
            (F.weekday("ts") + F.lit(1)).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("obs"))
        .persist()
    )
    rt = c.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    ct = c.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    n = c.agg(F.sum("obs").alias("n_total"))
    nt_d = F.col("n_total").cast("double")
    num = nt_d * F.col("obs").cast("double") - F.col("row_tot").cast(
        "double"
    ) * F.col("col_tot").cast("double")
    den = nt_d * F.col("row_tot").cast("double") * F.col("col_tot").cast(
        "double"
    )
    return (
        c.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "obs",
            "row_tot",
            "col_tot",
            "n_total",
            (num * num / den).alias("chisq_contrib"),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "docs_token_rarity",
    r"""
    WITH dt AS (
        SELECT DISTINCT doc_id, tok
        FROM documents,
             unnest(list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 s -> s <> '')) AS u(tok)
    ),
    df AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1)
    SELECT doc_id,
           count(*) AS n_terms,
           CAST(sum(df) AS BIGINT) AS sum_df,
           CAST(sum(df) * 10000 // count(*) AS BIGINT) AS mean_df_e4
    FROM dt JOIN df USING (tok)
    GROUP BY 1
    ORDER BY 1
    """,
)
def _docs_token_rarity(spark, t):
    # unigram-rarity scoring: a document's mean corpus document-
    # frequency over its DISTINCT terms — the LM-free cousin of
    # docs_novelty_hapax at unigram grain (low mean-df = rare
    # vocabulary; high = stock phrasing). Integer-exact end to end:
    # sum-of-df and term counts are BIGINTs, the mean crosses as a
    # ×10⁴ rational. Plan: narrow explode to distinct (doc, term);
    # ONE term-grain shuffle for df; the join back reuses the term
    # partitioning; final doc-grain agg. Never doc×doc. The (doc,
    # term) set feeds both sides, so it is persisted once.
    dt = (
        t["documents"]
        .select("doc_id", F.explode(F.expr(_TOKS_SPARK)).alias("tok"))
        .distinct()
        .persist()
    )
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        dt.join(df, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_terms",
            "sum_df",
            F.expr("sum_df * 10000 DIV n_terms").alias("mean_df_e4"),
        )
        .orderBy("doc_id")
    )
