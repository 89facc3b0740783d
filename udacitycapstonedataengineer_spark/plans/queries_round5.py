"""Round-5 query group: analytics / governance shapes the registry
did not cover yet — customer value segmentation, corpus quality
funnel, grouped trend regression, attribution, referential-integrity
audit, activity heatmap, interval-stabbing backlog, and asymmetric
(containment) near-dup.

Same conventions as every group (plans/registry.py): identical
aliases both engines, integer/rational arithmetic wherever a float
comparison could flip a bucket, no unpartitioned fact-grain windows
(tests/test_window_sweep.py is the gate).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries_dedup import _SHINGLES_SQL, _TOKS_SQL
from .registry import query

_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


@query(
    "customer_rfm_segments",
    """
    WITH m AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate),
                         (SELECT max(o_orderdate) FROM orders)) AS r_days,
               count(*) AS f_orders,
               sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS m_cents
        FROM orders GROUP BY 1
    ),
    q AS (
        SELECT quantile_cont(r_days, 0.25) AS r1, quantile_cont(r_days, 0.5) AS r2,
               quantile_cont(r_days, 0.75) AS r3,
               quantile_cont(f_orders, 0.25) AS f1, quantile_cont(f_orders, 0.5) AS f2,
               quantile_cont(f_orders, 0.75) AS f3,
               quantile_cont(m_cents, 0.25) AS m1, quantile_cont(m_cents, 0.5) AS m2,
               quantile_cont(m_cents, 0.75) AS m3
        FROM m
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           CAST(sum(m_cents) AS BIGINT) AS segment_cents
    FROM (
        SELECT
            -- recency: LOWER days-since-last-order is better → invert
            4 - ((r_days > r1)::INT + (r_days > r2)::INT + (r_days > r3)::INT)
                AS r_score,
            1 + (f_orders > f1)::INT + (f_orders > f2)::INT + (f_orders > f3)::INT
                AS f_score,
            1 + (m_cents > m1)::INT + (m_cents > m2)::INT + (m_cents > m3)::INT
                AS m_score,
            m_cents
        FROM m, q
    )
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def _customer_rfm_segments(spark, t):
    # RFM segmentation with BROADCAST quartile thresholds — never an
    # ntile() global window (the single-task trap the ranking family
    # avoids). Metrics are integers (days, counts, cents), so the
    # interpolated quartiles are exact halves in double and the
    # bucket comparisons cannot ulp-flip between engines. The exact
    # percentile over the customer-grain metric table is the one
    # driver-sized step (|customers| longs); at extreme cardinality
    # swap it for the KLL sketch (operators/sketches.py) — the
    # downstream bucketing is unchanged.
    o = t["orders"]
    max_od = o.agg(F.max("o_orderdate").alias("mx"))
    # customer-grain metric table feeds the quartile agg AND the
    # scoring join — persisted so the fact scan+agg runs once
    m = (
        o.crossJoin(F.broadcast(max_od))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("mx"), F.max("o_orderdate")).alias("r_days"),
            F.count(F.lit(1)).alias("f_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "m_cents"
            ),
        )
        .persist()
    )
    q = m.agg(
        *[
            F.expr(f"percentile({c}, {p})").alias(f"{c[0]}{i}")
            for c in ("r_days", "f_orders", "m_cents")
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )
    scored = m.crossJoin(F.broadcast(q)).select(
        (
            4
            - (
                (F.col("r_days") > F.col("r1")).cast("int")
                + (F.col("r_days") > F.col("r2")).cast("int")
                + (F.col("r_days") > F.col("r3")).cast("int")
            )
        ).alias("r_score"),
        (
            1
            + (F.col("f_orders") > F.col("f1")).cast("int")
            + (F.col("f_orders") > F.col("f2")).cast("int")
            + (F.col("f_orders") > F.col("f3")).cast("int")
        ).alias("f_score"),
        (
            1
            + (F.col("m_cents") > F.col("m1")).cast("int")
            + (F.col("m_cents") > F.col("m2")).cast("int")
            + (F.col("m_cents") > F.col("m3")).cast("int")
        ).alias("m_score"),
        "m_cents",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("m_cents").alias("segment_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "docs_quality_gate_funnel",
    r"""
    WITH d AS (
        SELECT n_chars,
               len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                               s -> s <> '')) AS n_toks,
               length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct
        FROM documents
    )
    SELECT count(*) AS n_total,
           CAST(sum((n_chars >= 200)::INT) AS BIGINT) AS n_len_ok,
           CAST(sum((n_chars >= 200 AND n_toks >= 30)::INT) AS BIGINT)
               AS n_tok_ok,
           CAST(sum((n_chars >= 200 AND n_toks >= 30
                     AND n_punct * 100 <= n_chars * 20)::INT) AS BIGINT)
               AS n_punct_ok
    FROM d
    """,
)
def _docs_quality_gate_funnel(spark, t):
    # quality-gate FUNNEL: cumulative survivor counts through the
    # length → token-count → punctuation gates, one corpus pass, no
    # shuffle beyond the final 1-row aggregate. The ratio gate is the
    # integer cross-multiply (n_punct*100 <= n_chars*20), never a
    # float division. This is the governance twin of
    # text_quality_score: the same gates, reported as pipeline yield
    # instead of per-doc flags.
    d = t["documents"].select(
        "n_chars",
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda s: s != "")
        ).alias("n_toks"),
        F.length(
            F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")
        ).alias("n_punct"),
    )
    len_ok = F.col("n_chars") >= 200
    tok_ok = len_ok & (F.col("n_toks") >= 30)
    punct_ok = tok_ok & (F.col("n_punct") * 100 <= F.col("n_chars") * 20)
    return d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(len_ok.cast("int")).alias("n_len_ok"),
        F.sum(tok_ok.cast("int")).alias("n_tok_ok"),
        F.sum(punct_ok.cast("int")).alias("n_punct_ok"),
    )


@query(
    "supplier_lead_time_trend",
    """
    WITH xy AS (
        SELECT l.l_suppkey,
               year(o.o_orderdate) * 12 + month(o.o_orderdate) AS x,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS y
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT l_suppkey,
           count(*) AS n_items,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS den,
           CAST((count(*) * sum(x * y) - sum(x) * sum(y)) * 10000
                // (count(*) * sum(x * x) - sum(x) * sum(x)) AS BIGINT)
               AS slope_bp
    FROM xy
    GROUP BY 1
    HAVING count(*) * sum(x * x) - sum(x) * sum(x) <> 0
    ORDER BY 1
    """,
)
def _supplier_lead_time_trend(spark, t):
    # per-supplier TREND of order→ship lag: grouped least-squares
    # slope in pure int64 (x = month index, y = lag days; slope as
    # basis points via integer floor-div) — the closed-form
    # n·Σxy − Σx·Σy over n·Σx² − (Σx)², so the whole regression is
    # one map-side-combinable aggregate over the lineitem⋈orders
    # join: no per-group iteration, no floats until never. The join
    # shuffles on orderkey (bucketing co-locates it at scale); the
    # supplier-grain agg is a second, far smaller shuffle.
    xy = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_suppkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("x"),
            F.datediff("l_shipdate", "o_orderdate").alias("y"),
        )
    )
    g = xy.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_items") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_items") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        g.select(
            "l_suppkey",
            "n_items",
            num.alias("num"),
            den.alias("den"),
            F.expr(
                "(n_items * sxy - sx * sy) * 10000"
                " DIV (n_items * sxx - sx * sx)"
            ).alias("slope_bp"),
        )
        .filter(F.col("den") != 0)
        .orderBy("l_suppkey")
    )


@query(
    "events_first_touch_attribution",
    f"""
    WITH first_touch AS (
        SELECT user_id, event_type AS first_type
        FROM (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
    ),
    conv AS (
        SELECT user_id, count(*) AS n_purchases,
               sum({_CENTS}) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT f.first_type,
           count(*) AS n_users,
           CAST(sum(c.n_purchases) AS BIGINT) AS n_purchases,
           CAST(sum(c.cents) AS BIGINT) AS attributed_cents
    FROM conv c JOIN first_touch f USING (user_id)
    GROUP BY 1
    ORDER BY 1
    """,
)
def _events_first_touch_attribution(spark, t):
    # first-touch attribution: every converting user's purchases are
    # credited to their FIRST-ever event type. The first touch is a
    # user-PARTITIONED row_number (bounded per key — not a global
    # window); both sides aggregate to user grain before the join, so
    # the join input is |users|, not |events|; revenue stays in exact
    # cents.
    ev = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_touch = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_type"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.expr(_CENTS)).alias("cents"),
        )
    )
    return (
        conv.join(first_touch, "user_id")
        .groupBy("first_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_purchases").alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
        .orderBy("first_type")
    )


@query(
    "referential_integrity_audit",
    """
    SELECT 'orders->customer' AS fk, count(*) AS n_rows,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem->orders', count(*),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem->part', count(*),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem->supplier', count(*),
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ORDER BY 1
    """,
)
def _referential_integrity_audit(spark, t):
    # referential-integrity audit: orphan counts for every fact→dim
    # FK, the pre-flight check a warehouse load runs before
    # publishing. Each check is a LEFT join counting null dim keys —
    # expressed as one aggregate per FK so map-side combine collapses
    # each to (total, orphans) long before the union. Dim sides
    # (customer/part/supplier keysets) broadcast at these
    # cardinalities; lineitem→orders is the one genuine shuffle and
    # rides the orderkey bucketing at scale. A healthy load reports 0
    # orphans — the row (with its non-zero n_rows) is the evidence,
    # not an empty result.
    def audit(fact, fact_key, dim, dim_key, label):
        return (
            fact.select(F.col(fact_key))
            .join(
                dim.select(F.col(dim_key)),
                F.col(fact_key) == F.col(dim_key),
                "left",
            )
            .agg(
                F.lit(label).alias("fk"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.when(F.col(dim_key).isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
        )

    checks = [
        audit(t["orders"], "o_custkey", t["customer"], "c_custkey",
              "orders->customer"),
        audit(t["lineitem"], "l_orderkey", t["orders"], "o_orderkey",
              "lineitem->orders"),
        audit(t["lineitem"], "l_partkey", t["part"], "p_partkey",
              "lineitem->part"),
        audit(t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey",
              "lineitem->supplier"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "fk", "n_rows", "n_orphans"
    ).orderBy("fk")


@query(
    "events_hourly_heatmap",
    f"""
    SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN {_CENTS} ELSE 0 END) AS BIGINT)
               AS purchase_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def _events_hourly_heatmap(spark, t):
    # day-of-week × hour activity matrix (traffic heatmap): one
    # aggregate at (dow, hr) grain — 168 output rows regardless of
    # input size, fully map-side combinable except the exact distinct
    # users (which shuffles (dow,hr,user); swap for HLL via
    # operators/sketches.py when exactness isn't required). Spark
    # dayofweek is 1=Sunday; DuckDB's 0=Sunday (+1 in the oracle).
    return (
        t["events"]
        .groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hr")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.expr(_CENTS)
                ).otherwise(0)
            ).alias("purchase_cents"),
        )
        .orderBy("dow", "hr")
    )


@query(
    "orders_open_backlog_daily",
    """
    WITH bounds AS (
        SELECT o.o_orderkey, o.o_orderdate AS start_day,
               max(l.l_shipdate) AS end_day
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    deltas AS (
        SELECT start_day AS day, 1 AS delta FROM bounds
        UNION ALL
        SELECT end_day + INTERVAL 1 DAY, -1 FROM bounds
    ),
    daily AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS d
        FROM deltas GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(sum(d) OVER (ORDER BY day) AS BIGINT) AS n_open
    FROM daily
    ORDER BY day
    """,
)
def _orders_open_backlog_daily(spark, t):
    # interval-stabbing backlog: how many orders were OPEN (placed but
    # not fully shipped) on each day. The scale-safe shape is the
    # ±1-delta trick: each order contributes exactly two rows (+1 at
    # placement, −1 after its last shipment), the deltas aggregate at
    # DAY grain, and the running sum is a window over the day-grain
    # table — calendar-bounded rows (~2.4k days), allowlisted in
    # tests/test_window_sweep.py, never an interval×day fan-out or a
    # fact-grain window.
    # order-grain interval table feeds both delta branches —
    # persisted so the orders⋈lineitem join runs once
    bounds = (
        t["orders"]
        .select("o_orderkey", "o_orderdate")
        .join(
            t["lineitem"].select("l_orderkey", "l_shipdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("end_day"))
        .persist()
    )
    deltas = bounds.select(
        F.col("o_orderdate").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        bounds.select(
            F.date_add(F.col("end_day"), 1).cast("timestamp").alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("n_open", F.sum("d").over(w))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_open",
        )
        .orderBy("day")
    )


@query(
    "docs_shingle_containment",
    f"""
    WITH sh AS (
        SELECT doc_id, unnest(shingles) AS shingle
        FROM (SELECT doc_id, {_SHINGLES_SQL} AS shingles
              FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents))
    ),
    rare AS (
        SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 64
    ),
    shf AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM shf a JOIN shf b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           CAST(n_inter * 10000 // least(sa.n_sh, sb.n_sh) AS BIGINT)
               AS containment_bp
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter * 10 >= least(sa.n_sh, sb.n_sh) * 8
    ORDER BY doc_a, doc_b
    """,
)
def _docs_shingle_containment(spark, t):
    # asymmetric near-dup: CONTAINMENT |A∩B| / min(|A|,|B|) catches a
    # document embedded inside a larger one — the quote/boilerplate
    # case symmetric Jaccard under-scores (union grows with the big
    # doc). Shingle-grain equi-join (never doc×doc) with the measured
    # df≤64 skew cap, via the shared shingle_pair_counts operator.
    # Threshold and score in integer cross-multiply / basis points.
    from ..operators.dedup import shingle_pair_counts

    inter, sizes = shingle_pair_counts(t["documents"], max_df=64)
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("n_inter") * 10 >= F.least("na", "nb") * 8
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.expr("n_inter * 10000 DIV least(na, nb)").alias(
                "containment_bp"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )
