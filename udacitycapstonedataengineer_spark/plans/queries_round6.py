"""Round-6 query group: cohort economics, time-series diagnostics,
exact grouped quantile bands, collocation mining, and multi-touch
attribution.

Reference provenance: the reference pipeline (etl.py:47-96) stops at
star-schema loads; these are the reporting/analysis layers a consumer
of those tables runs next, built to the same conventions as every
group (plans/registry.py): exact integer accumulation, single shared
IEEE expressions for any compared double, dim broadcasts only for
fixed-size dims, fact-side shuffles on explicit keys.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import ORACLE, query

# whitespace tokenizer — twin of the DuckDB expression used in every
# text oracle (queries_dedup._TOKS_SQL)
_TOKS_SPARK = "filter(split(lower(trim(text)), '\\\\s+'), s -> s != '')"


@query(
    "orders_cohort_ltv",
    """
    WITH first AS (
        SELECT o_custkey, CAST(min(year(o_orderdate)) AS INT) AS cohort_year
        FROM orders GROUP BY 1
    )
    SELECT f.cohort_year,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           count(DISTINCT o.o_custkey) AS n_active,
           count(*) AS n_orders,
           CAST(sum(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def _orders_cohort_ltv(spark, t):
    # customer-lifetime-value triangle: customers cohorted by first-
    # order year, revenue and active-customer counts per (cohort,
    # order year). The retention/LTV report every subscription and
    # marketplace team reads. Plan: one custkey-grain aggregate for
    # the cohort stamp, then a custkey shuffle join back onto orders
    # (both sides SF-proportional — pinned SHUFFLE_HASH, never a
    # broadcast), then the ≤|years|² cell aggregate; count(DISTINCT
    # custkey) partial-aggregates on the custkey partitioning it
    # already rides. Exact integer cents.
    first = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.min(F.year("o_orderdate")).alias("cohort_year"))
        .withColumnRenamed("o_custkey", "f_custkey")
    )
    return (
        t["orders"]
        .join(
            first.hint("shuffle_hash"),
            F.col("o_custkey") == F.col("f_custkey"),
        )
        .groupBy(
            "cohort_year", F.year("o_orderdate").alias("order_year")
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("revenue_cents"),
        )
        .orderBy("cohort_year", "order_year")
    )


@query(
    "orders_daily_autocorr",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        FROM orders GROUP BY 1
    ),
    lags AS (SELECT * FROM (VALUES (1), (7), (28)) AS t(lag_days)),
    pairs AS (
        SELECT l.lag_days, a.n AS x, b.n AS y
        FROM daily a
        JOIN lags l ON TRUE
        JOIN daily b ON b.d = a.d + l.lag_days
    ),
    m AS (
        SELECT lag_days, count(*) AS n_pairs,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               sum(x::HUGEINT * y) AS sxy,
               sum(x::HUGEINT * x) AS sxx,
               sum(y::HUGEINT * y) AS syy
        FROM pairs GROUP BY 1
    )
    SELECT lag_days, n_pairs,
           (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS autocorr
    FROM m
    ORDER BY lag_days
    """,
)
def _orders_daily_autocorr(spark, t):
    # lag-{1,7,28} autocorrelation of the daily order-count series —
    # the seasonality detector behind orders_monthly_seasonality
    # (weekly/monthly rhythm shows up as high lag-7/lag-28 r). The
    # fact collapses to a date-grain series FIRST (≤ a few thousand
    # rows at any SF), so the lag self-join and the five exact moments
    # run on a dim-sized table; moments accumulate as exact integers
    # (decimal cross-products — the stats_corr_exact pattern) and ONE
    # shared IEEE formula produces the double on both engines.
    daily = (
        t["orders"]
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    lags = spark.range(0).sparkSession.createDataFrame(
        [(1,), (7,), (28,)], "lag_days int"
    )
    b = daily.select(F.col("d").alias("bd"), F.col("n").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("bd") == F.expr("date_add(d, lag_days)"),
        )
        .select("lag_days", F.col("n").alias("x"), "y")
    )
    m = pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    nd = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    # zero variance on either side → autocorr undefined → NULL. DuckDB
    # division by zero already yields NULL, so the oracle agrees; an
    # unguarded divide errors under Spark's ANSI mode (hypothesis
    # found the constant-series case in round 8).
    denom = F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    corr = F.when(denom != 0, (nd * sxy - sx * sy) / denom)
    return m.select("lag_days", "n_pairs", corr.alias("autocorr")).orderBy(
        "lag_days"
    )


@query(
    "orders_monthly_price_bands",
    """
    WITH o AS (
        SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT)
                   AS ym,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT ym, cents,
               row_number() OVER (PARTITION BY ym
                                  ORDER BY cents, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY ym) AS n
        FROM o
    )
    SELECT ym, CAST(max(n) AS BIGINT) AS n_orders,
           max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS p50_cents,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS p90_cents,
           max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)
               AS p99_cents
    FROM r GROUP BY ym ORDER BY ym
    """,
)
def _orders_monthly_price_bands(spark, t):
    # exact P50/P90/P99 order-value bands per month — the SLO-style
    # percentile report, discrete (type-1) quantiles so every value is
    # an actual order amount and every band is an exact BIGINT (no
    # interpolation, no float drift). Rank extraction: row_number
    # within each month (a value-partitioned window — per-month sort
    # is spill-backed at scale) + the partition count, then one cell
    # aggregate picks the ceil(p·n) ranks via integer arithmetic.
    # Month count is bounded (~84 here), so the output is dim-sized.
    o = t["orders"].select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("ym").orderBy("cents", "o_orderkey")
    r = o.select(
        "ym",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("ym")).alias("n"),
    )
    pick = lambda expr: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(expr), F.col("cents"))
    )
    return (
        r.groupBy("ym")
        .agg(
            F.max("n").alias("n_orders"),
            pick("(n + 1) DIV 2").alias("p50_cents"),
            pick("(9 * n + 9) DIV 10").alias("p90_cents"),
            pick("(99 * n + 99) DIV 100").alias("p99_cents"),
        )
        .orderBy("ym")
    )


@query(
    "text_bigram_pmi",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           s -> s <> '') AS tk
        FROM documents
    ),
    big AS (
        SELECT tk[u.i] AS t1, tk[u.i + 1] AS t2
        FROM toks, unnest(range(1, len(tk))) AS u(i)
    ),
    p AS (SELECT t1, t2, count(*) AS n_xy FROM big GROUP BY 1, 2),
    s AS (SELECT t1, CAST(sum(n_xy) AS BIGINT) AS n_x FROM p GROUP BY 1),
    e AS (SELECT t2, CAST(sum(n_xy) AS BIGINT) AS n_y FROM p GROUP BY 1),
    tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_total FROM p)
    SELECT p.t1, p.t2, p.n_xy, s.n_x, e.n_y, tot.n_total,
           (CAST(p.n_xy AS DOUBLE) * CAST(tot.n_total AS DOUBLE))
           / (CAST(s.n_x AS DOUBLE) * CAST(e.n_y AS DOUBLE)) AS lift
    FROM p JOIN s USING (t1) JOIN e USING (t2) CROSS JOIN tot
    WHERE p.n_xy >= 5
    ORDER BY t1, t2
    """,
)
def _text_bigram_pmi(spark, t):
    # collocation mining: corpus bigram counts with marginals and the
    # PMI-monotone lift n₍xy₎·N / (n₍x·₎·n₍·y₎) — the screen for
    # multi-word expressions ("new york") before tokenizer training.
    # Lift rather than log-PMI keeps the compared double ONE shared
    # IEEE expression (ranking is identical; consumers can log it).
    # Plan: narrow per-doc bigram explode, ONE bigram-grain shuffle to
    # pair counts (persisted — three consumers), marginals and the
    # total derived from the pair table (never re-tokenizing), min-
    # count 5 keeps output at the collocation grain. Marginal tables
    # are vocabulary-sized: they join back via bigram-side shuffles at
    # scale (AQE broadcasts them when small).
    big = (
        t["documents"]
        .select(F.expr(_TOKS_SPARK).alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> struct(element_at(tk, i) AS t1, "
                    "element_at(tk, i + 1) AS t2))"
                )
            ).alias("b")
        )
        .select("b.t1", "b.t2")
    )
    p = big.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_xy")).persist()
    s = p.groupBy("t1").agg(F.sum("n_xy").alias("n_x"))
    e = p.groupBy("t2").agg(F.sum("n_xy").alias("n_y"))
    tot = p.agg(F.sum("n_xy").alias("n_total"))
    lift = (
        F.col("n_xy").cast("double") * F.col("n_total").cast("double")
    ) / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
    return (
        p.filter(F.col("n_xy") >= 5)
        .join(s, "t1")
        .join(e, "t2")
        .crossJoin(F.broadcast(tot))
        .select("t1", "t2", "n_xy", "n_x", "n_y", "n_total",
                lift.alias("lift"))
        .orderBy("t1", "t2")
    )


@query(
    "events_linear_attribution",
    """
    WITH ev AS (
        SELECT event_id, user_id, ts, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    purch AS (
        SELECT event_id AS pid, user_id, ts AS pts, vc
        FROM ev WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT p.pid, p.vc, e.event_type
        FROM purch p
        JOIN ev e ON e.user_id = p.user_id
                 AND e.ts < p.pts
                 AND e.ts >= p.pts - INTERVAL 7 DAY
    ),
    cnt AS (SELECT pid, count(*) AS n_t FROM touch GROUP BY 1),
    split AS (
        SELECT t.event_type, t.vc // c.n_t AS share
        FROM touch t JOIN cnt c USING (pid)
    ),
    direct AS (
        SELECT 'direct' AS event_type, p.vc AS share
        FROM purch p LEFT JOIN cnt c ON c.pid = p.pid
        WHERE c.pid IS NULL
    ),
    unioned AS (
        SELECT * FROM split UNION ALL SELECT * FROM direct
    )
    SELECT event_type, count(*) AS n_attributions,
           CAST(sum(share) AS BIGINT) AS attributed_cents
    FROM unioned
    GROUP BY 1
    ORDER BY 1
    """,
)
def _events_linear_attribution(spark, t):
    # linear multi-touch attribution: each purchase's value is split
    # equally (integer floor division — remainders documented as
    # dropped, identically in both engines) across the user's touches
    # in the trailing 7 days; purchases with no prior touch attribute
    # whole to 'direct'. Plan: the touch fan-out is a USER-equi-join
    # with a time-range filter — per-user weekly event counts are
    # bounded, so fan-out is O(purchases · touches/week), never
    # user×user; the per-purchase touch table persists (it feeds the
    # count AND the split); everything else is exact-integer
    # aggregation at the event_type grain.
    ev = t["events"].select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("pts"),
            "vc",
        )
    )
    touch = (
        purch.join(
            ev.select("user_id", "ts", F.col("event_type").alias("t_type")),
            (F.col("user_id") == F.col("p_user"))
            & (F.col("ts") < F.col("pts"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
        )
        .select("pid", "vc", F.col("t_type").alias("event_type"))
        .persist()
    )
    cnt = touch.groupBy("pid").agg(F.count(F.lit(1)).alias("n_t"))
    split = touch.join(cnt, "pid").select(
        "event_type", F.expr("vc DIV n_t").alias("share")
    )
    direct = (
        purch.join(cnt, purch.pid == cnt.pid, "left_anti")
        .select(F.lit("direct").alias("event_type"), F.col("vc").alias("share"))
    )
    return (
        split.unionByName(direct)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_attributions"),
            F.sum("share").alias("attributed_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "events_heavy_hitters",
    """
    WITH ev AS (
        SELECT CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
                   AS item
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
    ),
    tot AS (SELECT count(*) AS n_total FROM ev),
    c AS (SELECT item, count(*) AS n FROM ev GROUP BY 1)
    SELECT c.item, c.n, t.n_total
    FROM c CROSS JOIN tot t
    WHERE c.n * 10000 >= 105 * t.n_total
    ORDER BY item
    """,
)
def _events_heavy_hitters(spark, t):
    # frequent-items over an open-ended key (the JSON prop value):
    # two-pass Misra-Gries — per-partition bounded summaries (no
    # shuffle, ≤capacity rows each) give a guaranteed candidate
    # superset of every item at ≥1.05% share; pass 2 exact-counts the
    # candidates only, so the item-grain shuffle never materializes
    # the full key space. Output is EXACT (the sketch only prunes
    # work), hence the plain HAVING-style oracle. At 100 TB this is
    # the shape for URL/user-agent/n-gram hot-key discovery where
    # groupBy-the-world is the bottleneck.
    from ..operators.heavyhitters import heavy_hitters_exact

    return heavy_hitters_exact(
        t["events"],
        F.get_json_object("props", "$.k").cast("long").cast("string"),
        share_bp=105,
    ).orderBy("item")


# the day-grain rewrite shares events_linear_attribution's oracle —
# two formulations, one truth
_ATTRIBUTION_ORACLE = ORACLE["events_linear_attribution"]


@query("events_linear_attribution_daygrain", _ATTRIBUTION_ORACLE)
def _events_linear_attribution_daygrain(spark, t):
    # the BOUNDED-fan-out rewrite of events_linear_attribution (same
    # oracle — results are identical by construction). The naive shape
    # joins every purchase to every touch event in its trailing 7
    # days: fan-out O(purchases · per-user weekly density), quadratic
    # in density (the ×10 probe artifact). This rewrite splits the
    # window per the rolling-7d trick:
    #   interior days (fully inside the window) come from a DAY-GRAIN
    #   (user, day, type) count table — ≤6 anchor rows per purchase
    #   regardless of density;
    #   the two BOUNDARY days (window start, purchase day) join at
    #   event grain with the exact ts predicates.
    # Per-purchase math then runs at (purchase, type) grain: every
    # touch of a purchase gets the same floor share, so
    # cnt_type·(vc DIV n_t) is exactly the row-grain sum.
    ev = t["events"].select(
        "event_id",
        "user_id",
        "ts",
        F.to_date("ts").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("pts"),
            (F.col("ts") - F.expr("INTERVAL 7 DAY")).alias("wstart"),
            F.col("day").alias("p_day"),
            F.to_date(F.col("ts") - F.expr("INTERVAL 7 DAY")).alias("w_day"),
            "vc",
        )
        .persist()
    )
    # day-grain type counts — the table a real deployment maintains
    # incrementally
    du = (
        ev.groupBy("user_id", "day", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    # interior anchors: days strictly between w_day and p_day
    # (≤6 rows/purchase, independent of event density)
    interior = (
        purch.filter(F.expr("datediff(p_day, w_day) >= 2"))
        .select(
            "pid",
            "p_user",
            # sequence() reverses when stop < start, hence the ≥2
            # guard above
            F.explode(
                F.expr(
                    "transform(sequence(1, datediff(p_day, w_day) - 1), "
                    "i -> date_add(w_day, i))"
                )
            ).alias("a_day"),
        )
        .join(
            du,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("day") == F.col("a_day")),
        )
        .select("pid", "event_type", "cnt")
    )
    # boundary days at event grain: window-start day (ts >= wstart)
    # and purchase day (ts < pts) — for SUB-7-day spans where
    # w_day == p_day, only the double-bounded purchase-day branch may
    # apply, and the start-day branch must not double-count
    bnd_start = (
        purch.filter(F.col("w_day") != F.col("p_day"))
        .join(
            ev.select("user_id", "ts", "day", "event_type"),
            (F.col("user_id") == F.col("p_user"))
            & (F.col("day") == F.col("w_day"))
            & (F.col("ts") >= F.col("wstart"))
            & (F.col("ts") < F.col("pts")),
        )
        .select("pid", "event_type", F.lit(1).alias("cnt"))
    )
    bnd_end = purch.join(
        ev.select("user_id", "ts", "day", "event_type"),
        (F.col("user_id") == F.col("p_user"))
        & (F.col("day") == F.col("p_day"))
        & (F.col("ts") >= F.col("wstart"))
        & (F.col("ts") < F.col("pts")),
    ).select("pid", "event_type", F.lit(1).alias("cnt"))
    touch_t = (
        interior.unionByName(bnd_start)
        .unionByName(bnd_end)
        .groupBy("pid", "event_type")
        .agg(F.sum("cnt").alias("cnt_type"))
        .persist()
    )
    n_t = touch_t.groupBy("pid").agg(F.sum("cnt_type").alias("n_t"))
    split = (
        touch_t.join(n_t, "pid")
        .join(purch.select("pid", "vc"), "pid")
        .select(
            "event_type",
            "cnt_type",
            (F.col("cnt_type") * F.expr("vc DIV n_t")).alias("cents"),
        )
    )
    direct = (
        purch.join(n_t, purch.pid == n_t.pid, "left_anti")
        .select(
            F.lit("direct").alias("event_type"),
            F.lit(1).alias("cnt_type"),
            F.col("vc").alias("cents"),
        )
    )
    return (
        split.unionByName(direct)
        .groupBy("event_type")
        .agg(
            F.sum("cnt_type").alias("n_attributions"),
            F.sum("cents").alias("attributed_cents"),
        )
        .orderBy("event_type")
    )


_LTV_ORACLE = ORACLE["orders_cohort_ltv"]


@query("orders_cohort_ltv_incremental", _LTV_ORACLE)
def _orders_cohort_ltv_incremental(spark, t):
    # incremental maintenance of the LTV triangle — same oracle as
    # orders_cohort_ltv, so the driver proves delta-merge ≡ full
    # recompute. The hard part of incrementalizing this report is
    # n_active: count(DISTINCT custkey) per cell is NOT mergeable from
    # cell aggregates, so the maintained state is
    #   - cust_first: custkey → cohort_year   (customer-grain)
    #   - presence:   distinct (cohort, year, custkey)  (the exact-
    #     distinct state a production pipeline keeps as a bucketed
    #     table; HLL is the approximate alternative)
    #   - cells:      additive n_orders / revenue per (cohort, year)
    # A date-split delta (here: orders from 1999-01-01) can only ADD
    # orders after the base window, so an existing customer's cohort
    # never changes — new customers cohort at their first delta year.
    # Every merge is a custkey- or cell-grain shuffle; the fact is
    # scanned once per side.
    split = "1999-01-01"
    o = t["orders"].select(
        "o_custkey",
        "o_orderdate",
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = o.filter(F.col("o_orderdate") < F.lit(split))
    delta = o.filter(F.col("o_orderdate") >= F.lit(split))

    cust_first_base = base.groupBy("o_custkey").agg(
        F.min("yr").alias("cohort_year")
    )
    # new-in-delta customers cohort at their first delta year
    delta_first = delta.groupBy("o_custkey").agg(
        F.min("yr").alias("delta_first")
    )
    cust_first = (
        cust_first_base.join(
            delta_first.withColumnRenamed("o_custkey", "d_custkey"),
            F.col("o_custkey") == F.col("d_custkey"),
            "full_outer",
        )
        .select(
            F.coalesce("o_custkey", "d_custkey").alias("o_custkey"),
            F.coalesce("cohort_year", "delta_first").alias("cohort_year"),
        )
        .persist()
    )

    def presence(side):
        return (
            side.select("o_custkey", "yr")
            .distinct()
            .join(cust_first.hint("shuffle_hash"), "o_custkey")
            .select("cohort_year", "yr", "o_custkey")
        )

    presence_all = presence(base).unionByName(presence(delta)).distinct()
    n_active = presence_all.groupBy("cohort_year", "yr").agg(
        F.count(F.lit(1)).alias("n_active")
    )

    def cells(side):
        return (
            side.join(cust_first.hint("shuffle_hash"), "o_custkey")
            .groupBy("cohort_year", "yr")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("revenue_cents"),
            )
        )

    merged = (
        cells(base)
        .unionByName(cells(delta))
        .groupBy("cohort_year", "yr")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
    )
    return (
        merged.join(n_active, ["cohort_year", "yr"])
        .select(
            "cohort_year",
            F.col("yr").alias("order_year"),
            "n_active",
            "n_orders",
            "revenue_cents",
        )
        .orderBy("cohort_year", "order_year")
    )


@query(
    "corpus_sample_exact_counts",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('smp|' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT source, count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM ranked
    WHERE rn <= 40
    GROUP BY source
    ORDER BY source
    """,
)
def _corpus_sample_exact_counts(spark, t):
    # exact-count reproducible sampling: take EXACTLY k docs per
    # source (not a rate — a count), chosen by ranking on a keyed md5
    # so the selected set is a pure function of doc ids: stable across
    # runs, engines, partitionings, and appends of UNSELECTED docs.
    # This is the quota-sampling counterpart of corpus_mixture_sample
    # (rate-based): mixture hits a ratio in expectation, this hits a
    # budget exactly — the "give me 1M docs per source for the
    # ablation" op. Plan: one per-source window over the md5 rank
    # (source-partitioned — spill-backed per group at scale; for very
    # few giant sources route through operators/ranking.py instead).
    # Output summarizes the selected set (count + id aggregates) so
    # the oracle proves the SAME docs were chosen, not just as many.
    k = 40
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        t["documents"]
        .select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("source")
    )


@query(
    "lineitem_selfjoin_fanout_profile",
    """
    WITH c AS (
        SELECT l_partkey, count(*) AS cnt
        FROM lineitem GROUP BY 1
    ),
    b AS (
        -- length(bin(x))-1 == floor(log2(x)) in EXACT integer terms
        -- (libm log2 can ulp-flip at powers of two across engines)
        SELECT CAST(length(bin(cnt)) - 1 AS INT) AS bucket,
               cnt
        FROM c
    )
    SELECT bucket,
           count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS n_selfjoin_pairs
    FROM b
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def _lineitem_selfjoin_fanout_profile(spark, t):
    # join fan-out profiler — the skew-planning diagnostic run BEFORE
    # a self-equi-join: per log2 key-frequency bucket, how many keys,
    # rows, and C(cnt,2) pair comparisons a self-join on l_partkey
    # would generate. Σ pairs is the exact cost of the naive join; the
    # bucket tail shows whether a skew cap / salting is needed (the
    # number the LSH max_bucket cap and operators/skew.py act on).
    # One key-grain count with map-side combine, then a ≤64-row bucket
    # rollup. All integer: the log2 bucket comes from length(bin(cnt))
    # (libm log2 can ulp-flip at exact powers of two across engines)
    # and the pair count uses integer division; per-key pairs stay in
    # BIGINT for any cnt ≤ ~4.3B — past that the profile's answer is
    # "don't run this join".
    c = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.select(
            F.expr("CAST(length(bin(cnt)) - 1 AS INT)").alias("bucket"),
            "cnt",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.sum(
                F.expr("cnt * (cnt - 1) DIV 2")
            ).alias("n_selfjoin_pairs"),
        )
        .orderBy("bucket")
    )


@query(
    "events_bot_regularity_audit",
    """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_us
        FROM events
    ),
    m AS (
        SELECT user_id, count(*) AS n_gaps,
               CAST(sum(gap_us) AS BIGINT) AS span_us,
               CAST(min(gap_us) AS BIGINT) AS min_gap_us,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY 1
    )
    SELECT user_id, n_gaps, span_us, min_gap_us, max_gap_us,
           span_us // n_gaps AS mean_gap_us,
           ((max_gap_us - min_gap_us) * 10 * n_gaps <= span_us)
               AS metronome_flag,
           (n_gaps * 3600000000 >= span_us * 100) AS high_rate_flag
    FROM m
    ORDER BY user_id
    """,
)
def _events_bot_regularity_audit(spark, t):
    # bot/abuse screen — the traffic-hygiene pass a training-data
    # pipeline runs before events feed anything downstream. Per user:
    # inter-event gap moments in exact integer micros plus two flags,
    # both as pure integer comparisons (no float thresholds to drift):
    #   metronome_flag — gap range ≤ 10% of the mean gap
    #     ((max−min)·10·n ≤ Σgap): inhuman regularity;
    #   high_rate_flag — ≥100 events/hour sustained over the span
    #     (n·3600e6 ≥ span·100).
    # Plan: one user-partitioned lag window (value-partitioned,
    # spill-backed), one user-grain aggregate with map-side combine.
    g = (
        t["events"]
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
        )
        .withColumn(
            "gap_us",
            F.col("us")
            - F.lag("us").over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    m = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("span_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )
    return m.select(
        "user_id",
        "n_gaps",
        "span_us",
        "min_gap_us",
        "max_gap_us",
        F.expr("span_us DIV n_gaps").alias("mean_gap_us"),
        (
            (F.col("max_gap_us") - F.col("min_gap_us"))
            * 10
            * F.col("n_gaps")
            <= F.col("span_us")
        ).alias("metronome_flag"),
        (
            F.col("n_gaps") * F.lit(3_600_000_000)
            >= F.col("span_us") * 100
        ).alias("high_rate_flag"),
    ).orderBy("user_id")


@query(
    "embeddings_norm_outliers",
    """
    WITH n2 AS (
        SELECT vec_id, label,
               list_aggregate(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   'sum') AS norm2
        FROM embeddings
    ),
    r AS (
        SELECT vec_id, label, norm2,
               row_number() OVER (PARTITION BY label
                                  ORDER BY norm2, vec_id) AS rn,
               count(*) OVER (PARTITION BY label) AS n
        FROM n2
    ),
    med AS (
        SELECT label, max(CASE WHEN rn = (n + 1) // 2 THEN norm2 END)
                   AS med_norm2
        FROM r GROUP BY label
    )
    SELECT n2.label,
           count(*) AS n_vecs,
           med.med_norm2,
           CAST(sum(CASE WHEN n2.norm2 * 4 < med.med_norm2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN n2.norm2 > med.med_norm2 * 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM n2 JOIN med USING (label)
    GROUP BY n2.label, med.med_norm2
    ORDER BY n2.label
    """,
)
def _embeddings_norm_outliers(spark, t):
    # embedding hygiene — corrupt/degenerate vector detection before
    # vectors feed ANN or training: per label, count vectors whose
    # ‖v‖² sits 4× above or below the label's (lower-)median ‖v‖².
    # norm² is the per-row left-fold aggregate(transform(...)) proven
    # bit-identical to DuckDB's list_aggregate in the ANN oracles; the
    # median is a rank-extracted ACTUAL element (no interpolation), so
    # flags are exact double comparisons with integer factors — no
    # threshold drift. Plan: per-row narrow math, one label-
    # partitioned rank window, one label-grain rollup.
    n2 = t["embeddings"].select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(transform(embedding, "
            "x -> cast(x as double) * cast(x as double)), "
            "0.0D, (acc, x) -> acc + x)"
        ).alias("norm2"),
    )
    w = Window.partitionBy("label").orderBy("norm2", "vec_id")
    r = n2.select(
        "label",
        "norm2",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias("n"),
    )
    med = r.groupBy("label").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("norm2"))
        ).alias("med_norm2")
    )
    return (
        n2.join(med, "label")
        .groupBy("label", "med_norm2")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                (F.col("norm2") * 4 < F.col("med_norm2")).cast("int")
            ).alias("n_low"),
            F.sum(
                (F.col("norm2") > F.col("med_norm2") * 4).cast("int")
            ).alias("n_high"),
        )
        .select("label", "n_vecs", "med_norm2", "n_low", "n_high")
        .orderBy("label")
    )


@query(
    "events_daily_anomaly_seasonal",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(isodow(ts) AS INT) AS dow,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    prof AS (
        SELECT dow, CAST(sum(n) AS BIGINT) AS sum_n,
               count(*) AS n_days
        FROM daily GROUP BY 1
    ),
    res AS (
        SELECT d.d, d.n,
               (p.sum_n * 100) // p.n_days AS expected_e2,
               d.n * 100 - (p.sum_n * 100) // p.n_days AS residual_e2
        FROM daily d JOIN prof p USING (dow)
    ),
    r2 AS (
        SELECT d, n, expected_e2, residual_e2,
               row_number() OVER (ORDER BY abs(residual_e2), d) AS rn,
               count(*) OVER () AS n_total
        FROM res
    ),
    mad AS (
        SELECT max(CASE WHEN rn = (n_total + 1) // 2
                        THEN abs(residual_e2) END) AS mad_e2
        FROM r2
    )
    SELECT CAST(r.d AS VARCHAR) AS d, r.n, r.expected_e2,
           r.residual_e2, m.mad_e2,
           (abs(r.residual_e2) > 5 * m.mad_e2) AS is_anomaly
    FROM res r CROSS JOIN mad m
    ORDER BY 1
    """,
)
def _events_daily_anomaly_seasonal(spark, t):
    # seasonality-adjusted anomaly screen: each day's event count vs
    # its WEEKDAY's mean (the dow profile removes the weekly rhythm
    # that fools a flat z-score), residuals scored against their MAD
    # (median absolute residual — robust, so one outage day doesn't
    # inflate the yardstick that should flag it). Exact integers
    # end-to-end: expectations in centi-events via truncating
    # division, the MAD rank-extracted as an actual |residual|, the
    # flag a pure integer comparison. Plan: fact → day grain (tiny),
    # 7-row dow profile, one bounded rank window over days, 1-row MAD
    # broadcast. The global window rides the DAY-grain table —
    # calendar-bounded by construction.
    daily = (
        t["events"]
        .groupBy(
            F.to_date("ts").alias("d"),
            (F.weekday("ts") + F.lit(1)).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    prof = daily.groupBy("dow").agg(
        F.sum("n").alias("sum_n"), F.count(F.lit(1)).alias("n_days")
    )
    res = (
        daily.join(F.broadcast(prof), "dow")
        .select(
            "d",
            "n",
            F.expr("(sum_n * 100) DIV n_days").alias("expected_e2"),
            F.expr("n * 100 - (sum_n * 100) DIV n_days").alias(
                "residual_e2"
            ),
        )
        .persist()
    )
    w = Window.orderBy(F.abs(F.col("residual_e2")), "d")
    r2 = res.select(
        F.abs(F.col("residual_e2")).alias("abs_r"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_total"),
    )
    mad = r2.agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n_total + 1) DIV 2"),
                   F.col("abs_r"))
        ).alias("mad_e2")
    )
    return (
        res.crossJoin(F.broadcast(mad))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "n",
            "expected_e2",
            "residual_e2",
            "mad_e2",
            (F.abs(F.col("residual_e2")) > 5 * F.col("mad_e2")).alias(
                "is_anomaly"
            ),
        )
        .orderBy("d")
    )


@query(
    "text_bpe_pair_stats",
    r"""
    WITH words AS (
        SELECT tok AS w, count(*) AS f
        FROM documents,
             unnest(list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 s -> s <> '')) AS u(tok)
        GROUP BY 1
    ),
    p1 AS (
        SELECT w[u.i] AS a, w[u.i + 1] AS b, CAST(sum(f) AS BIGINT) AS n
        FROM (SELECT string_split_regex(w, '') AS w, f
              FROM words WHERE length(w) >= 2) t,
             unnest(range(1, len(w))) AS u(i)
        GROUP BY 1, 2
    ),
    top1 AS (SELECT a, b FROM p1 ORDER BY n DESC, a, b LIMIT 1),
    merged AS (
        SELECT replace(words.w, top1.a || top1.b, chr(164)) AS w, f
        FROM words CROSS JOIN top1
    ),
    p2 AS (
        SELECT w[u.i] AS a, w[u.i + 1] AS b, CAST(sum(f) AS BIGINT) AS n
        FROM (SELECT string_split_regex(w, '') AS w, f
              FROM merged WHERE length(w) >= 2) t,
             unnest(range(1, len(w))) AS u(i)
        GROUP BY 1, 2
    )
    SELECT * FROM (
        SELECT 1 AS iteration, a, b, n FROM p1
        ORDER BY n DESC, a, b LIMIT 5
    )
    UNION ALL
    SELECT * FROM (
        SELECT 2 AS iteration, a, b, n FROM p2
        ORDER BY n DESC, a, b LIMIT 5
    )
    ORDER BY iteration, n DESC, a, b
    """,
)
def _text_bpe_pair_stats(spark, t):
    # tokenizer-training prep: the pair statistics behind BPE. Word
    # frequencies once (classic BPE trains on the word-frequency
    # table, not the raw stream), adjacent char-pair counts weighted
    # by word frequency (every adjacent position counts, the
    # get_stats convention), the argmax pair under a TOTAL order
    # (count desc, then pair — deterministic at ties), the merge
    # applied corpus-wide as a left-to-right string replace (exactly
    # BPE's non-overlapping merge for single-char symbols; '¤' is the
    # merged-symbol marker, absent from the ascii corpus), and the
    # next iteration's top pairs. Output: top-5 pairs of iterations 1
    # and 2. Plan: the fact collapses to the word-frequency table
    # immediately (vocabulary-sized); everything after runs at word
    # or pair grain. The driver-looped full BPE training would repeat
    # the merge step against this same table.
    words = (
        t["documents"]
        .select(F.explode(F.expr(_TOKS_SPARK)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .persist()
    )

    def pair_counts(wdf):
        return (
            wdf.filter(F.length("w") >= 2)
            .select(
                "f",
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(w) - 1), "
                        "i -> struct(substr(w, i, 1) AS a, "
                        "substr(w, i + 1, 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("n"))
        )

    c1 = pair_counts(words).persist()
    top1 = c1.orderBy(F.desc("n"), "a", "b").limit(1).select("a", "b")
    merged = words.crossJoin(F.broadcast(top1)).select(
        F.expr("replace(w, a || b, chr(164))").alias("w"), "f"
    )
    c2 = pair_counts(merged)
    out1 = (
        c1.orderBy(F.desc("n"), "a", "b")
        .limit(5)
        .select(F.lit(1).alias("iteration"), "a", "b", "n")
    )
    out2 = (
        c2.orderBy(F.desc("n"), "a", "b")
        .limit(5)
        .select(F.lit(2).alias("iteration"), "a", "b", "n")
    )
    return out1.unionByName(out2).orderBy(
        "iteration", F.desc("n"), "a", "b"
    )


@query(
    "orders_duplicate_invoice_pairs",
    """
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
    )
    SELECT a.o_custkey,
           a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           a.cents AS cents_a, b.cents AS cents_b,
           CAST(date_diff('day', a.d, b.d) AS INT) AS day_gap
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(a.cents - b.cents) * 50 <= a.cents
     AND abs(date_diff('day', a.d, b.d)) <= 30
    ORDER BY a.o_custkey, orderkey_a, orderkey_b
    """,
)
def _orders_duplicate_invoice_pairs(spark, t):
    # double-billing screen — fuzzy ROW dedup on a fact table (the
    # dedup family's corpus operators work on documents; this is the
    # transactional sibling): two orders by the same customer with
    # amounts within 2% of each other inside a 30-day window are
    # duplicate-invoice suspects. Scale shape: a ≤30-day pair spans
    # at most TWO month boundaries (Jan 31 + 30 days lands Mar 2
    # across a 28-day February — month ±1 alone would MISS that
    # pair), so the left side explodes to month ±2 and the join is
    # EQUI on (custkey, month) — the classic banded time join
    # (operators/rangejoin.py pattern) — with the %-band and
    # day-window as residual filters. Fan-out is
    # per-customer-per-~5-months, never the full customer history;
    # the oracle states the same semantics as a plain non-equi
    # self-join (the oracle needn't be scale-shaped, the plan must).
    o = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    month = F.year("d") * 12 + F.month("d")
    a = (
        o.select(
            F.col("o_custkey").alias("ck"),
            F.col("cents").alias("cents_a"),
            F.col("o_orderkey").alias("orderkey_a"),
            F.col("d").alias("da"),
            month.alias("ma"),
        )
        .select(
            "*",
            F.explode(
                F.expr("array(ma - 2, ma - 1, ma, ma + 1, ma + 2)")
            ).alias("mb"),
        )
    )
    b = o.select(
        F.col("o_custkey").alias("ck2"),
        F.col("cents").alias("cents_b"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("d").alias("db"),
        month.alias("m2"),
    )
    return (
        a.join(
            b,
            (F.col("ck") == F.col("ck2"))
            & (F.col("mb") == F.col("m2"))
            & (F.col("orderkey_a") < F.col("orderkey_b"))
            & (
                F.abs(F.col("cents_a") - F.col("cents_b")) * 50
                <= F.col("cents_a")
            )
            & (F.abs(F.datediff("db", "da")) <= 30),
        )
        .select(
            F.col("ck").alias("o_custkey"),
            "orderkey_a",
            "orderkey_b",
            "cents_a",
            "cents_b",
            F.datediff("db", "da").cast("int").alias("day_gap"),
        )
        .orderBy("o_custkey", "orderkey_a", "orderkey_b")
    )


@query(
    "docs_crosslingual_template_leakage",
    r"""
    WITH f AS (
        SELECT doc_id, lang,
               md5(substr(regexp_replace(lower(trim(text)),
                                         '\s+', ' ', 'g'), 1, 60)) AS fp
        FROM documents
    ),
    leaked AS (
        SELECT fp, count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               CAST(min(doc_id) AS BIGINT) AS example_doc_id
        FROM f GROUP BY fp
        HAVING count(DISTINCT lang) > 1
    )
    SELECT fp, n_docs, n_langs, example_doc_id
    FROM leaked
    ORDER BY n_docs DESC, fp
    """,
)
def _docs_crosslingual_template_leakage(spark, t):
    # cross-lingual template leakage: normalized 60-char PREFIX
    # fingerprints shared across multiple declared languages — the
    # boilerplate/header-template signal per-language exact dedup
    # misses entirely (a shared English banner pasted atop every
    # translation dedups within each language and survives across
    # them). Prefix grain rather than whole-doc because translations
    # share templates, not bodies. One fingerprint-grain shuffle with
    # map-side combine; distinct-lang counting rides the same
    # partitioning. Exact md5 fingerprints — hash-identical across
    # engines (the functions/text.py normalize convention, truncated
    # before hashing).
    fp = F.md5(
        F.expr(
            r"substr(regexp_replace(lower(trim(text)), '\\s+', ' '), 1, 60)"
        )
    )
    return (
        t["documents"]
        .select("doc_id", "lang", fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_langs") > 1)
        .orderBy(F.desc("n_docs"), "fp")
    )


@query(
    "orders_scd2_asof_revenue",
    """
    WITH scd AS (
        SELECT c.n_nationkey AS k,
               CASE WHEN c.n_nationkey % 3 = 0 THEN (c.n_regionkey + 1) % 5
                    ELSE c.n_regionkey END AS region_new,
               c.n_regionkey AS region_old,
               c.n_nationkey % 3 = 0 AS changed
        FROM nation c
    ),
    versions AS (
        SELECT k, region_old AS region, DATE '1990-01-01' AS valid_from,
               CASE WHEN changed THEN DATE '2000-01-01' END AS valid_to
        FROM scd
        UNION ALL
        SELECT k, region_new, DATE '2000-01-01', CAST(NULL AS DATE)
        FROM scd WHERE changed
    )
    SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
           v.region,
           count(*) AS n_orders,
           CAST(sum(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN versions v
      ON v.k = c.c_nationkey
     AND o.o_orderdate >= v.valid_from
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def _orders_scd2_asof_revenue(spark, t):
    # the report SCD2 exists FOR: each fact row joined to the dim
    # version valid AT ITS OWN date (orders before the 2000-01-01
    # region change report under the old region, after under the new
    # — a current-version join would silently rewrite history).
    # Built on operators/scd.scd2_apply (same scenario as
    # scd2_nation_update); the versioned dim is dim-sized so the
    # as-of lookup is an EQUI broadcast join on nationkey with the
    # validity window as a residual — per-row as-of at zero extra
    # shuffles. customer joins via pinned SHUFFLE_HASH
    # (SF-proportional); the one real aggregate is (year, region).
    from ..operators.scd import scd2_apply

    nation = t["nation"]
    dim = nation.select(
        F.col("n_nationkey").alias("k"),
        F.col("n_regionkey").alias("region"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = nation.filter(F.col("n_nationkey") % 3 == 0).select(
        F.col("n_nationkey").alias("k"),
        ((F.col("n_regionkey") + 1) % 5).alias("region"),
        F.lit("2000-01-01").cast("date").alias("change_date"),
    )
    versions = scd2_apply(dim, updates, ["k"], ["region"]).select(
        "k", "region", "valid_from", "valid_to"
    )
    return (
        t["orders"]
        .join(
            t["customer"]
            .select("c_custkey", "c_nationkey")
            .hint("shuffle_hash"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(versions),
            (F.col("k") == F.col("c_nationkey"))
            & (F.col("o_orderdate") >= F.col("valid_from"))
            & (
                F.col("valid_to").isNull()
                | (F.col("o_orderdate") < F.col("valid_to"))
            ),
        )
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            "region",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("revenue_cents"),
        )
        .orderBy("yr", "region")
    )


@query(
    "orders_monthly_forecast_eval",
    """
    WITH m AS (
        SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT)
                   AS ym,
               CAST(sum(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT a.ym, a.cents AS actual_cents, f.cents AS forecast_cents,
           abs(a.cents - f.cents) AS abs_err_cents,
           abs(a.cents - f.cents) * 10000 // f.cents AS err_bp
    FROM m a JOIN m f ON f.ym = a.ym - 100
    ORDER BY a.ym
    """,
)
def _orders_monthly_forecast_eval(spark, t):
    # forecast-evaluation harness with the naive seasonal baseline:
    # forecast(month) = same month last year, scored per month in
    # exact integer cents and basis-point error — the baseline every
    # real forecasting model must beat, and the exact-arithmetic
    # error-accounting pattern its evaluation reuses (a float MAPE
    # would drift across engines; |a−f|·10⁴ DIV f cannot). Plan: one
    # month-grain aggregate off the fact, then a self-equi-join on
    # the ≤84-row month table (broadcast by size).
    m = (
        t["orders"]
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
                "ym"
            )
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
        .persist()
    )
    f = m.select(
        (F.col("ym") + 100).alias("fym"), F.col("cents").alias("fc")
    )
    return (
        m.join(F.broadcast(f), F.col("ym") == F.col("fym"))
        .select(
            "ym",
            F.col("cents").alias("actual_cents"),
            F.col("fc").alias("forecast_cents"),
            F.abs(F.col("cents") - F.col("fc")).alias("abs_err_cents"),
            F.expr(
                "abs(cents - fc) * 10000 DIV fc"
            ).alias("err_bp"),
        )
        .orderBy("ym")
    )


@query(
    "orders_daily_drawdown",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT d, n,
               max(n) OVER (ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS peak
        FROM daily
    )
    SELECT CAST(d AS VARCHAR) AS d, n, peak,
           (peak - n) * 10000 // peak AS drawdown_bp
    FROM r
    ORDER BY 1
    """,
)
def _orders_daily_drawdown(spark, t):
    # running-peak drawdown of the daily order series — the
    # demand-collapse detector (how far below the best day so far is
    # today, in basis points). Finance's max-drawdown machinery
    # applied to volume. The fact collapses to the day grain first;
    # the running max is an unpartitioned window ONLY over that
    # calendar-bounded table (window-sweep allowlisted), and the
    # drawdown is integer basis points — no float path.
    daily = (
        t["orders"]
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.select(
            "d",
            "n",
            F.max("n").over(w).alias("peak"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "n",
            "peak",
            F.expr("(peak - n) * 10000 DIV peak").alias("drawdown_bp"),
        )
        .orderBy("d")
    )


@query(
    "orders_cohort_survival",
    """
    WITH first AS (
        SELECT o_custkey, CAST(min(year(o_orderdate)) AS INT) AS cohort_year
        FROM orders GROUP BY 1
    ),
    cohort AS (
        SELECT cohort_year, count(*) AS n_cohort FROM first GROUP BY 1
    ),
    active AS (
        SELECT DISTINCT f.cohort_year,
               CAST(year(o.o_orderdate) AS INT) - f.cohort_year AS k,
               o.o_custkey
        FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
    ),
    alive AS (
        SELECT cohort_year, k, count(*) AS n_alive
        FROM active GROUP BY 1, 2
    )
    SELECT a.cohort_year, a.k, a.n_alive, c.n_cohort,
           a.n_alive * 10000 // c.n_cohort AS survival_bp
    FROM alive a JOIN cohort c USING (cohort_year)
    ORDER BY 1, 2
    """,
)
def _orders_cohort_survival(spark, t):
    # cohort survival curves — the Kaplan-Meier-flavored cut of the
    # LTV triangle: for each acquisition cohort, the share of
    # customers still ordering k years later, in exact basis points.
    # ("Still ordering at k" = placed an order in year cohort+k — the
    # discrete-activity definition matching the triangle's n_active.)
    # Plan: the custkey cohort stamp (one custkey-grain aggregate), a
    # pinned SHUFFLE_HASH join back onto orders, distinct at
    # (cohort, k, custkey) riding the same custkey partitioning, then
    # two dim-sized rollups. Integer-exact throughout.
    first = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.min(F.year("o_orderdate")).alias("cohort_year"))
        .withColumnRenamed("o_custkey", "f_custkey")
        .persist()
    )
    cohort = first.groupBy("cohort_year").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    active = (
        t["orders"]
        .join(
            first.hint("shuffle_hash"),
            F.col("o_custkey") == F.col("f_custkey"),
        )
        .select(
            "cohort_year",
            (F.year("o_orderdate") - F.col("cohort_year")).alias("k"),
            "o_custkey",
        )
        .distinct()
    )
    alive = active.groupBy("cohort_year", "k").agg(
        F.count(F.lit(1)).alias("n_alive")
    )
    return (
        alive.join(F.broadcast(cohort), "cohort_year")
        .select(
            "cohort_year",
            "k",
            "n_alive",
            "n_cohort",
            F.expr("n_alive * 10000 DIV n_cohort").alias("survival_bp"),
        )
        .orderBy("cohort_year", "k")
    )


@query(
    "part_sourcing_risk_grid",
    """
    WITH ps AS (
        SELECT l_partkey,
               count(DISTINCT l_suppkey) AS n_suppliers,
               CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM ps)
    SELECT CAST(ps.n_suppliers AS INT) AS n_suppliers,
           count(*) AS n_parts,
           CAST(sum(ps.cents) AS BIGINT) AS revenue_cents,
           CAST(sum(ps.cents) * 10000 // t.total_cents AS BIGINT)
               AS revenue_share_bp
    FROM ps CROSS JOIN tot t
    GROUP BY 1, t.total_cents
    ORDER BY 1
    """,
)
def _part_sourcing_risk_grid(spark, t):
    # supply-chain resilience grid: revenue concentration by how many
    # distinct suppliers actually ship each part (the low end is the
    # at-risk single/dual-sourced revenue procurement teams track).
    # Complements part_brand_supplier_hhi: HHI measures WITHIN-part
    # share concentration, this measures sourcing REDUNDANCY. Grain =
    # observed supplier-count values, bounded by suppliers-per-part
    # (a catalog property, not data volume). Plan: one (part)-grain
    # aggregate with the distinct-supplier count riding it, a 1-row
    # total broadcast, a bounded rollup. Exact cents and basis
    # points.
    ps = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_suppliers"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents"),
        )
        .persist()
    )
    tot = ps.agg(F.sum("cents").alias("total_cents"))
    return (
        ps.crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("n_suppliers").cast("int").alias("n_suppliers"),
            "total_cents",
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            "n_suppliers",
            "n_parts",
            "revenue_cents",
            F.expr(
                "revenue_cents * 10000 DIV total_cents"
            ).alias("revenue_share_bp"),
        )
        .orderBy("n_suppliers")
    )


@query(
    "events_error_burst_windows",
    """
    WITH w AS (
        SELECT epoch_us(ts) // 600000000 AS win, count(*) AS n_err
        FROM events WHERE event_type = 'error'
        GROUP BY 1
    ),
    r AS (
        SELECT win, n_err,
               row_number() OVER (ORDER BY n_err, win) AS rn,
               count(*) OVER () AS nt
        FROM w
    ),
    med AS (
        SELECT max(CASE WHEN rn = (nt + 1) // 2 THEN n_err END)
                   AS median_err
        FROM r
    )
    SELECT w.win, w.n_err, m.median_err,
           (w.n_err >= 3 * m.median_err) AS is_burst
    FROM w CROSS JOIN med m
    ORDER BY w.win
    """,
)
def _events_error_burst_windows(spark, t):
    # incident detection: error counts per 10-minute window flagged
    # when ≥3× the median window ("is this error rate an incident or
    # baseline noise?"). Median rather than mean so sustained outages
    # don't drag the yardstick up after the fact; rank-extracted as
    # an actual count, threshold a pure integer comparison. Plan: the
    # pushed error filter reaches the scan, one window-grain
    # aggregate; the global rank rides only the calendar-bounded
    # window table (allowlisted); 1-row median broadcast.
    w = (
        t["events"]
        .filter(F.col("event_type") == "error")
        .groupBy(
            F.expr("unix_micros(ts) DIV 600000000").alias("win")
        )
        .agg(F.count(F.lit(1)).alias("n_err"))
        .persist()
    )
    rank_w = Window.orderBy("n_err", "win")
    r = w.select(
        "n_err",
        F.row_number().over(rank_w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nt"),
    )
    med = r.agg(
        F.max(
            F.when(F.col("rn") == F.expr("(nt + 1) DIV 2"), F.col("n_err"))
        ).alias("median_err")
    )
    return (
        w.crossJoin(F.broadcast(med))
        .select(
            "win",
            "n_err",
            "median_err",
            (F.col("n_err") >= 3 * F.col("median_err")).alias("is_burst"),
        )
        .orderBy("win")
    )
