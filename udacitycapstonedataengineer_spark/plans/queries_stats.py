"""Statistical / ML-housekeeping queries: deterministic dataset
splits, histograms, and robust outlier detection — all exact-math,
all DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import H60, H60_SQL
from ..operators.ranking import with_global_rank
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


@query(
    "docs_repetition_stats",
    """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    wrd AS (SELECT doc_id, unnest(ws) AS word FROM w),
    wa AS (
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_words,
               count(*) AS n_distinct_words,
               CAST(MAX(cnt) AS BIGINT) AS top_word_n
        FROM (SELECT doc_id, word, count(*) AS cnt
              FROM wrd GROUP BY doc_id, word)
        GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        FROM w WHERE len(ws) >= 2
    ),
    ba AS (
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                   AS n_dup_bigrams
        FROM (SELECT doc_id, bigram, count(*) AS cnt
              FROM bg GROUP BY doc_id, bigram)
        GROUP BY doc_id
    )
    SELECT wa.doc_id, n_words, n_distinct_words, top_word_n,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           COALESCE(n_dup_bigrams, 0) AS n_dup_bigrams
    FROM wa LEFT JOIN ba USING (doc_id)
    ORDER BY wa.doc_id
    """,
)
def _docs_repetition_stats(spark, t):
    # Gopher/C4-style within-document repetition profile: the counts
    # behind the classic quality filters (most-frequent-word fraction,
    # duplicate-bigram fraction). Emitted as exact integers — the
    # consumer picks thresholds; no float ratios cross the engine
    # boundary. Two explode→two-level aggregates (map-side partial agg
    # absorbs the per-doc fan-out), joined back at doc grain. The
    # (doc_id, word) shuffle key is high-cardinality and unskewed, so
    # the plan holds at corpus scale.
    docs = t["documents"].select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    )
    wa = (
        docs.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.max("cnt").alias("top_word_n"),
        )
    )
    # sequence(1, size-1) is guarded by size>=2: Spark's sequence(1, 0)
    # is DESCENDING [1, 0], not empty (see queries_text chunking note).
    bigrams = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
    )
    ba = (
        docs.filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)
            ).alias("n_dup_bigrams"),
        )
    )
    # LEFT join + 0-fill: a 1-word doc has no bigrams but must still
    # appear in the profile (inner join would silently drop it)
    return (
        wa.join(ba, "doc_id", "left")
        .select(
            "doc_id", "n_words", "n_distinct_words", "top_word_n",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_dup_bigrams", F.lit(0)).alias("n_dup_bigrams"),
        )
        .orderBy("doc_id")
    )


@query(
    "docs_global_dup_spans",
    """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, len(ws) - 4),
                   i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2],
                                  ws[i+3], ws[i+4]))) AS shingle
        FROM w WHERE len(ws) >= 5
    ),
    df AS (
        SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY shingle) AS n_docs
        FROM sh
    )
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_shingles
    FROM df GROUP BY doc_id ORDER BY doc_id
    """,
)
def _docs_global_dup_spans(spark, t):
    # cross-document duplicate-span profile (the C4 "repeated span"
    # signal): for each doc, how many of its distinct word-5-gram
    # spans also occur in at least one OTHER document. Distinct
    # (doc, shingle) pairs → window count at shingle grain → doc-grain
    # rollup: the corpus-wide span frequency is ONE shuffle on the
    # shingle key (uniform, high-cardinality), never an all-pairs doc
    # comparison. Complements docs_contamination_check (which compares
    # against a broadcast eval set, not the corpus itself).
    shingles = F.expr(
        "transform(sequence(1, size(ws) - 4),"
        " i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1),"
        " element_at(ws, i+2), element_at(ws, i+3), element_at(ws, i+4)))"
    )
    sh = (
        t["documents"]
        .select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .filter(F.size("ws") >= 5)
        .select("doc_id", F.explode(shingles).alias("shingle"))
        .distinct()
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    return (
        sh.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias(
                "n_shared_shingles"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "events_debounce",
    """
    WITH ordered AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS prev_us
        FROM events
    )
    SELECT event_id, user_id, event_type
    FROM ordered
    WHERE prev_us IS NULL OR us - prev_us >= 60000000
    ORDER BY event_id
    """,
)
def _events_debounce(spark, t):
    # debounce: suppress repeat (user, type) events arriving within
    # 60 s of the previous KEPT-or-not event — the standard guard
    # against double-clicks / retry storms before sessionization or
    # billing. lag over the total (ts, event_id) order makes the
    # decision deterministic under timestamp ties; integer
    # epoch-micros arithmetic keeps the threshold test exact. One
    # (user, type) shuffle, no join.
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    return (
        t["events"]
        .select("event_id", "user_id", "event_type", us.alias("us"),
                prev.alias("prev_us"))
        .filter(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") >= 60_000_000)
        )
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "events_rolling_7d_active_users",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(count(DISTINCT CASE WHEN du.day = d.day
                                    THEN du.user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau_7d
    FROM days d
    JOIN du ON du.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    ORDER BY day
    """,
)
def _events_rolling_7d_active_users(spark, t):
    # DAU + trailing-7-day active users per day — the sliding-window
    # COUNT DISTINCT that plain windows can't express (distinct does
    # not decompose over frames). Strategy: collapse events to
    # distinct (day, user) FIRST (one shuffle, day×user grain — at
    # 100 TB this is users×days rows, ~10⁻⁴ of the event count), then
    # fan each pair out to its ≤7 trailing window anchors with an
    # EXPLODED sequence + equi-join — never a range predicate, which
    # Spark would plan as a nested-loop compare of every pair against
    # every day (ADVICE r2). The broadcast semi-join keeps only
    # anchors that exist in the data (matching the oracle's `days`
    # dimension). `day` is emitted as an ISO string so both engines
    # agree on the output type (the repo's date-output discipline).
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
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("anchor"),
    )
    return (
        fanout.join(F.broadcast(days), "anchor", "left_semi")
        .groupBy("anchor")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("anchor"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau_7d"),
        )
        .select(
            F.date_format("anchor", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau_7d",
        )
        .orderBy("day")
    )


@query(
    "orders_winsorized_sum",
    """
    WITH cents AS (
        SELECT o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    b AS (
        SELECT o_orderstatus,
               quantile_cont(c, 0.05) AS q05,
               quantile_cont(c, 0.95) AS q95
        FROM cents GROUP BY o_orderstatus
    ),
    agg AS (
        SELECT c.o_orderstatus,
               count(*) AS n_orders,
               CAST(SUM(CASE WHEN c.c < b.q05 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_below,
               CAST(SUM(CASE WHEN c.c > b.q95 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above,
               CAST(SUM(CASE WHEN c.c >= b.q05 AND c.c <= b.q95
                             THEN c.c ELSE 0 END) AS BIGINT) AS mid_sum_cents,
               MIN(b.q05) AS q05, MIN(b.q95) AS q95
        FROM cents c JOIN b USING (o_orderstatus)
        GROUP BY c.o_orderstatus
    )
    SELECT o_orderstatus, n_orders, n_below, n_above, mid_sum_cents,
           CAST(mid_sum_cents AS DOUBLE) + n_below * q05 + n_above * q95
               AS winsorized_sum_cents
    FROM agg ORDER BY o_orderstatus
    """,
)
def _orders_winsorized_sum(spark, t):
    # winsorized total per status: clip at the 5th/95th percentile
    # before summing — the robust aggregate that keeps a few fat-
    # finger orders from owning the metric. The interior sum stays an
    # exact BIGINT of cents; the clipped tails contribute as
    # count × quantile in ONE shared float expression evaluated after
    # aggregation (never a float sum over rows, which would be
    # accumulation-order-dependent on a cluster). Quantiles
    # interpolate on integer cents — bitwise-identical across engines
    # (percentile ≡ quantile_cont, same discipline as
    # percentile_by_status). Tiny status-grain bounds broadcast back.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    c = t["orders"].select("o_orderstatus", cents.alias("c"))
    b = F.broadcast(
        c.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(c, 0.05)").alias("q05"),
            F.expr("percentile(c, 0.95)").alias("q95"),
        )
        .withColumnRenamed("o_orderstatus", "b_status")
    )
    agg = (
        c.join(b, F.col("o_orderstatus") == F.col("b_status"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("c") < F.col("q05"), 1).otherwise(0)).alias(
                "n_below"
            ),
            F.sum(F.when(F.col("c") > F.col("q95"), 1).otherwise(0)).alias(
                "n_above"
            ),
            F.sum(
                F.when(
                    (F.col("c") >= F.col("q05"))
                    & (F.col("c") <= F.col("q95")),
                    F.col("c"),
                ).otherwise(0)
            ).alias("mid_sum_cents"),
            F.min("q05").alias("q05"),
            F.min("q95").alias("q95"),
        )
    )
    winsorized = (
        F.col("mid_sum_cents").cast("double")
        + F.col("n_below") * F.col("q05")
        + F.col("n_above") * F.col("q95")
    )
    return agg.select(
        "o_orderstatus", "n_orders", "n_below", "n_above",
        "mid_sum_cents", winsorized.alias("winsorized_sum_cents"),
    ).orderBy("o_orderstatus")


@query(
    "events_zscore_outliers",
    """
    WITH c AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               SUM(v) AS s1, SUM(v::HUGEINT * v) AS s2
        FROM c GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(MIN(m.n) AS BIGINT) AS n_values,
           CAST(SUM(CASE WHEN 4 * (m.n::HUGEINT * c.v - m.s1)
                             * (m.n::HUGEINT * c.v - m.s1)
                          > 9 * (m.n::HUGEINT * m.s2 - m.s1 * m.s1)
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers_1p5sigma
    FROM c JOIN m USING (event_type)
    GROUP BY c.event_type
    ORDER BY c.event_type
    """,
)
def _events_zscore_outliers(spark, t):
    # robust outlier count per type with ZERO float ops: |x − μ| > kσ
    # cross-multiplied into pure integer arithmetic —
    # 4·(n·x − Σx)² > 9·(n·Σx² − (Σx)²) is exactly |z| > 1.5 (k²=9/4).
    # The moments accumulate as exact integers (decimal for the
    # squares — Σx² passes int64 around sf10); the membership test is
    # then layout- and engine-independent, unlike any float-σ
    # comparison at the boundary. Tiny type-grain moments broadcast
    # back onto the stream; one shuffle total.
    v = F.round(F.col("value") * 100).cast("long")
    c = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .select("event_type", v.alias("v"))
    )
    m = F.broadcast(
        c.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("s2"),
        )
        .withColumnRenamed("event_type", "m_type")
    )
    dec = lambda name: F.col(name).cast("decimal(38,0)")  # noqa: E731
    diff = dec("n") * dec("v") - dec("s1")
    cond = 4 * diff * diff > 9 * (dec("n") * F.col("s2") - dec("s1") * dec("s1"))
    return (
        c.join(m, F.col("event_type") == F.col("m_type"))
        .groupBy("event_type")
        .agg(
            F.min("n").cast("long").alias("n_values"),
            F.sum(F.when(cond, 1).otherwise(0)).alias("n_outliers_1p5sigma"),
        )
        .orderBy("event_type")
    )


@query(
    "orders_snapshot_diff",
    """
    WITH old AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderstatus
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   + CASE WHEN o_orderkey % 5 = 0 THEN 100 ELSE 0 END AS cents,
               o_orderstatus
        FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.cents IS DISTINCT FROM n.cents
                     OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                     THEN 'changed' END AS change_type,
           o.cents AS old_cents, n.cents AS new_cents,
           o.o_orderstatus AS old_status, n.o_orderstatus AS new_status
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
               WHEN n.o_orderkey IS NULL THEN 'removed'
               WHEN o.cents IS DISTINCT FROM n.cents
                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN 'changed' END IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def _orders_snapshot_diff(spark, t):
    # CDC snapshot diff demoed on two derived versions of orders
    # (simulated deletes via %7, inserts via %11, price updates via
    # %5): one full-outer join on the key, null-safe comparison,
    # emit only differing rows. The operator (operators/diff.py)
    # projects compared columns before the join so the shuffle carries
    # key + values only; bucketed snapshots make it shuffle-free.
    from ..operators.diff import snapshot_diff

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = t["orders"].select(
        "o_orderkey", cents.alias("cents"), "o_orderstatus"
    )
    old = base.filter(F.col("o_orderkey") % 7 != 0)
    new = base.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 5 == 0, 100).otherwise(0),
    )
    return (
        snapshot_diff(old, new, ["o_orderkey"], ["cents", "o_orderstatus"])
        .select(
            "o_orderkey", "change_type",
            "old_cents", "new_cents",
            F.col("old_o_orderstatus").alias("old_status"),
            F.col("new_o_orderstatus").alias("new_status"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "orders_column_profile",
    """
    WITH a AS (
        SELECT count(*) AS n_rows,
               count(o_orderstatus) AS nn_status,
               count(DISTINCT o_orderstatus) AS nd_status,
               CAST(min(o_orderstatus) AS VARCHAR) AS mn_status,
               CAST(max(o_orderstatus) AS VARCHAR) AS mx_status,
               count(o_custkey) AS nn_cust,
               count(DISTINCT o_custkey) AS nd_cust,
               CAST(min(o_custkey) AS VARCHAR) AS mn_cust,
               CAST(max(o_custkey) AS VARCHAR) AS mx_cust,
               count(o_orderpriority) AS nn_prio,
               count(DISTINCT o_orderpriority) AS nd_prio,
               CAST(min(o_orderpriority) AS VARCHAR) AS mn_prio,
               CAST(max(o_orderpriority) AS VARCHAR) AS mx_prio
        FROM orders
    )
    SELECT col_name, n_rows, n_non_null, n_distinct, min_value, max_value
    FROM (
        SELECT 'o_orderstatus' AS col_name, n_rows, nn_status AS n_non_null,
               nd_status AS n_distinct, mn_status AS min_value,
               mx_status AS max_value FROM a
        UNION ALL
        SELECT 'o_custkey', n_rows, nn_cust, nd_cust, mn_cust, mx_cust FROM a
        UNION ALL
        SELECT 'o_orderpriority', n_rows, nn_prio, nd_prio, mn_prio, mx_prio
        FROM a
    )
    ORDER BY col_name
    """,
)
def _orders_column_profile(spark, t):
    # one-pass wide-table profile (the df.describe() a data engineer
    # actually wants): per column — non-null count, exact distinct
    # count, min, max — in a SINGLE scan + aggregate. Spark plans the
    # 3 exact DISTINCTs as one Expand (3× row multiply before partial
    # agg) — one shuffle, no per-column jobs; at extreme widths swap
    # exact distincts for approx_count_distinct (sketch suite covers
    # that trade). Values stringified so the long-format output has a
    # uniform schema.
    o = t["orders"]
    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").cast("string").alias("mn_status"),
        F.max("o_orderstatus").cast("string").alias("mx_status"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").cast("string").alias("mn_prio"),
        F.max("o_orderpriority").cast("string").alias("mx_prio"),
    )
    long = a.selectExpr(
        """stack(3,
            'o_orderstatus', nn_status, nd_status, mn_status, mx_status,
            'o_custkey', nn_cust, nd_cust, mn_cust, mx_cust,
            'o_orderpriority', nn_prio, nd_prio, mn_prio, mx_prio
        ) AS (col_name, n_non_null, n_distinct, min_value, max_value)""",
        "n_rows",
    )
    return long.select(
        "col_name", "n_rows", "n_non_null", "n_distinct",
        "min_value", "max_value",
    ).orderBy("col_name")


@query(
    "orders_equidepth_deciles",
    """
    WITH c AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    vg AS (SELECT c, count(*) AS cnt FROM c GROUP BY c),
    v2 AS (
        SELECT c, cnt,
               COALESCE(SUM(cnt) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS start
        FROM vg
    ),
    tot AS (SELECT count(*) AS n FROM c),
    r AS (
        SELECT cc.c,
               v2.start + ROW_NUMBER() OVER (PARTITION BY cc.c
                                             ORDER BY cc.o_orderkey) AS rnk
        FROM c cc JOIN v2 ON cc.c = v2.c
    )
    SELECT CAST((rnk - 1) * 10 // n AS BIGINT) AS decile,
           count(*) AS n_orders,
           CAST(MIN(c) AS BIGINT) AS min_cents,
           CAST(MAX(c) AS BIGINT) AS max_cents
    FROM r, tot
    GROUP BY decile
    ORDER BY decile
    """,
)
def _orders_equidepth_deciles(spark, t):
    # equi-depth (quantile) histogram via EXACT distributed ranking.
    # The oracle's rank (value-group start + row_number within the
    # value ordered by o_orderkey) is exactly the global rank under
    # (c, o_orderkey), so we compute it with with_global_rank's
    # range-partition + offset scheme: per-task memory is bounded by
    # the range-partition size even when every price is DISTINCT
    # (near-unique continuous values were the residual hazard of the
    # earlier value-grain cumsum window — its "distinct values"
    # table degenerated to row grain). decile = (rank−1)·10 div n,
    # pure integer math identical in both engines.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    c = t["orders"].select("o_orderkey", cents.alias("c"))
    tot = F.broadcast(c.groupBy().agg(F.count(F.lit(1)).alias("n")))
    r = (
        with_global_rank(c, ["c", "o_orderkey"], "rnk")
        .crossJoin(tot)
        .select(
            "c",
            F.expr("(rnk - 1) * 10 DIV n").alias("decile"),
        )
    )
    return (
        r.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
        .orderBy("decile")
    )


@query(
    "events_mode_value_per_type",
    """
    SELECT event_type, mode_cents, n_occurrences
    FROM (
        SELECT event_type, c AS mode_cents, count(*) AS n_occurrences,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY count(*) DESC, c) AS rn
        FROM (SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS c
              FROM events WHERE value IS NOT NULL)
        GROUP BY event_type, c
    ) WHERE rn = 1
    ORDER BY event_type
    """,
)
def _events_mode_value_per_type(spark, t):
    # exact mode per group with a DETERMINISTIC tie-break (highest
    # count, then smallest value): (type, value)-grain aggregate, then
    # a top-1 window at value grain — never a per-group collect. The
    # two-level shape means the heavy shuffle key is (type, value),
    # which stays unskewed even when one type dominates the stream.
    v = F.round(F.col("value") * 100).cast("long")
    counts = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .select("event_type", v.alias("c"))
        .groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.desc("n_occurrences"), "c"
        )
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("c").alias("mode_cents"),
            "n_occurrences",
        )
        .orderBy("event_type")
    )


@query(
    "text_inverted_index",
    """
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    SELECT term, count(*) AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM tok
    GROUP BY term
    HAVING count(*) >= 10
    ORDER BY term
    """,
)
def _text_inverted_index(spark, t):
    # inverted index (term → sorted posting list) — the retrieval
    # building block under keyword search / BM25 / RAG hybrid search.
    # Distinct (doc, term) pairs → one shuffle on the term key; the
    # posting list is sorted INSIDE the aggregate (sort_array over
    # collect_list), so no per-term window, and emitted as a joined
    # string for a stable cross-engine representation. At 100 TB
    # stop-word-grade terms make postings huge — the df floor here
    # stands in for the tiered posting/stop-listing a real index does;
    # collect_list is bounded by that same cap.
    tok = (
        t["documents"]
        .select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .distinct()
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("postings"),
        )
        .filter(F.col("df") >= 10)
        .orderBy("term")
    )


@query(
    "events_mad_outliers",
    """
    WITH c AS (SELECT event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events WHERE value IS NOT NULL),
    med AS (SELECT event_type,
                   quantile_cont(cents, 0.5) AS m
            FROM c GROUP BY 1),
    dev AS (SELECT c.event_type, c.cents, med.m,
                   abs(c.cents - med.m) AS adev
            FROM c JOIN med USING (event_type)),
    mad AS (SELECT event_type,
                   quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY 1)
    SELECT dev.event_type,
           count(*) AS n_values,
           CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY 1
    ORDER BY 1
    """,
)
def _events_mad_outliers(spark, t):
    # robust outlier counts via Median Absolute Deviation — the
    # heavy-tail-safe twin of events_zscore_outliers (one extreme
    # value shifts a mean/stddev fence, but not median±3·MAD). Values
    # go through integer cents, so the only floats are the two
    # medians — Spark `percentile` and DuckDB quantile_cont share the
    # linear-interpolation definition bit for bit (the
    # percentile_by_status precedent), and the 3·MAD comparison uses
    # those bit-identical doubles on both engines. Two grouped
    # medians = two shuffles on event_type (5 groups); the join back
    # is a broadcast of a 5-row table each time.
    cents = F.round(F.col("value") * 100).cast("long")
    c = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .select("event_type", cents.alias("cents"))
        .persist()
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("m")
    )
    dev = (
        c.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "cents",
            F.abs(F.col("cents") - F.col("m")).alias("adev"),
        )
        .persist()
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(
                (F.col("adev") > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "events_user_streaks",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(ts AS DATE) AS day
        FROM events
    ),
    grp AS (
        SELECT user_id, day,
               CAST(day AS DATE) - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM days
    ),
    streaks AS (
        SELECT user_id, count(*) AS streak_len, min(day) AS streak_start
        FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id, streak_len,
           strftime(streak_start, '%Y-%m-%d') AS streak_start
    FROM (
        SELECT user_id, streak_len, streak_start,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY streak_len DESC, streak_start)
                   AS rn
        FROM streaks
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def _events_user_streaks(spark, t):
    # gaps-and-islands: each user's LONGEST run of consecutive active
    # days (engagement-streak analytics). The classic rewrite — day
    # minus per-user row_number is constant within a consecutive run —
    # turns streak detection into a groupBy, all integer date math.
    # One shuffle on user_id for the window, the rest stays at
    # (user, anchor) grain. Ties broken by earliest streak.
    days = (
        t["events"]
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    best = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "streak_len",
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
        )
        .orderBy("user_id")
    )


@query(
    "orders_profile_drift",
    """
    WITH tagged AS (
        SELECT o_orderkey % 2 AS snap,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderstatus, o_custkey
        FROM orders
    ),
    prof AS (
        SELECT snap,
               count(*) AS n_rows,
               count(DISTINCT o_custkey) AS n_cust,
               count(DISTINCT o_orderstatus) AS n_status,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents,
               CAST(SUM(cents) // count(*) AS BIGINT) AS mean_cents_floor
        FROM tagged GROUP BY snap
    )
    SELECT a.n_rows AS rows_a, b.n_rows AS rows_b,
           a.n_cust AS cust_a, b.n_cust AS cust_b,
           a.n_status AS status_a, b.n_status AS status_b,
           a.min_cents AS min_a, b.min_cents AS min_b,
           a.max_cents AS max_a, b.max_cents AS max_b,
           a.mean_cents_floor AS mean_a, b.mean_cents_floor AS mean_b,
           (abs(a.n_rows - b.n_rows) * 10 > b.n_rows)
               OR (abs(a.mean_cents_floor - b.mean_cents_floor) * 10
                   > b.mean_cents_floor)
               OR (a.n_status <> b.n_status) AS drifted
    FROM (SELECT * FROM prof WHERE snap = 0) a
    CROSS JOIN (SELECT * FROM prof WHERE snap = 1) b
    """,
)
def _orders_profile_drift(spark, t):
    # snapshot drift check — the "did today's load change shape?" gate
    # a pipeline runs before publishing: row counts, key cardinality,
    # domain size, and value range/center compared between two
    # snapshots (stand-ins: even/odd orderkeys), with a drift verdict
    # at >10% movement on rows or mean, or any domain-size change.
    # All integer math (floor-mean in cents, basis-point-free 10x
    # cross-multiplication) so the verdict is engine-exact. One scan:
    # both snapshot profiles come from a single groupBy(snap) pass;
    # the final compare is a 1x1-row broadcast crossJoin.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    prof = (
        t["orders"]
        .select(
            (F.col("o_orderkey") % 2).alias("snap"),
            cents.alias("cents"),
            "o_orderstatus",
            "o_custkey",
        )
        .groupBy("snap")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.countDistinct("o_orderstatus").alias("n_status"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.expr("SUM(cents) DIV count(*)").alias("mean_cents_floor"),
        )
        .persist()
    )
    a = prof.filter(F.col("snap") == 0).drop("snap")
    b = prof.filter(F.col("snap") == 1).drop("snap")
    a = a.select(*[F.col(c).alias(f"{c}__a") for c in a.columns])
    b = b.select(*[F.col(c).alias(f"{c}__b") for c in b.columns])
    joined = a.crossJoin(F.broadcast(b))
    drifted = (
        (F.abs(F.col("n_rows__a") - F.col("n_rows__b")) * 10
         > F.col("n_rows__b"))
        | (
            F.abs(
                F.col("mean_cents_floor__a") - F.col("mean_cents_floor__b")
            ) * 10
            > F.col("mean_cents_floor__b")
        )
        | (F.col("n_status__a") != F.col("n_status__b"))
    )
    return joined.select(
        F.col("n_rows__a").alias("rows_a"),
        F.col("n_rows__b").alias("rows_b"),
        F.col("n_cust__a").alias("cust_a"),
        F.col("n_cust__b").alias("cust_b"),
        F.col("n_status__a").alias("status_a"),
        F.col("n_status__b").alias("status_b"),
        F.col("min_cents__a").alias("min_a"),
        F.col("min_cents__b").alias("min_b"),
        F.col("max_cents__a").alias("max_a"),
        F.col("max_cents__b").alias("max_b"),
        F.col("mean_cents_floor__a").alias("mean_a"),
        F.col("mean_cents_floor__b").alias("mean_b"),
        drifted.alias("drifted"),
    )
