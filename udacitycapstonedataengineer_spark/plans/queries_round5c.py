"""Round-5c query group: vocabulary/OOV planning, session-duration
profiling, dedup savings accounting, and an iterative PageRank on the
event-type transition graph — the second iterative graph algorithm
after the connected-components closure (operators/graph.py).

Same conventions as every group (plans/registry.py). The PageRank is
bit-exact across engines by construction: every per-edge and per-node
update is integer fixed-point (rank ×10¹², edge probabilities ×10⁶,
truncating integer division, order-free BIGINT sums), so a fixed
iteration count yields the same BIGINTs in Spark and DuckDB — no
float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, fingerprint_sql
from ..operators.ranking import with_global_rank
from ..streaming.events import sessionize
from .registry import query

_TOKS_SQL = r"string_split_regex(lower(trim(text)), '\s+')"
_VOCAB_SIZES = [100, 1000, 10000]


@query(
    "text_vocab_coverage",
    rf"""
    WITH toks AS (
        SELECT tok
        FROM documents,
             unnest(list_filter({_TOKS_SQL}, s -> s <> '')) AS u(tok)
    ),
    tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
    ranked AS (
        SELECT tok, tf, row_number() OVER (ORDER BY tf DESC, tok) AS rnk
        FROM tf
    ),
    total AS (
        SELECT CAST(sum(tf) AS BIGINT) AS total_tokens,
               count(*) AS n_terms_total
        FROM tf
    ),
    sizes AS (SELECT unnest([{", ".join(map(str, _VOCAB_SIZES))}])
              AS vocab_size)
    SELECT vocab_size, n_terms_total, total_tokens, covered_tokens,
           CAST(((total_tokens - covered_tokens) * 10000)
                // total_tokens AS BIGINT) AS oov_bp
    FROM (
        SELECT s.vocab_size, t.n_terms_total, t.total_tokens,
               CAST(sum(CASE WHEN r.rnk <= s.vocab_size
                             THEN r.tf ELSE 0 END) AS BIGINT)
                   AS covered_tokens
        FROM ranked r CROSS JOIN sizes s CROSS JOIN total t
        GROUP BY 1, 2, 3
    )
    ORDER BY vocab_size
    """,
)
def _text_vocab_coverage(spark, t):
    # tokenizer-vocabulary planning: what OOV rate does a top-V
    # frequency vocabulary buy? — the sweep you run before fixing a
    # BPE/vocab budget. The term table (already aggregated, orders of
    # magnitude below token grain) is ranked with the DISTRIBUTED
    # exact ranking (range partition + per-partition row_number +
    # broadcast offsets, operators/ranking.py) — never a global-order
    # window over terms, whose cardinality at 100 TB is itself
    # hundreds of millions. The 3-row size dimension and the 1-row
    # total broadcast onto the ranked terms; OOV crosses as basis
    # points.
    toks = t["documents"].select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"),
                lambda s: s != "",
            )
        ).alias("tok")
    )
    # the term table feeds the ranking (twice — ranked rows + offsets)
    # AND the total; unpersisted, the corpus tokenize+explode runs
    # three times. Terms are the right grain to cache: orders of
    # magnitude below token grain.
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf")).persist()
    ranked = with_global_rank(
        tf.withColumn("neg_tf", -F.col("tf")), ["neg_tf", "tok"], "rnk"
    )
    total = tf.agg(
        F.sum("tf").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_terms_total"),
    )
    sizes = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v) for v in _VOCAB_SIZES])
        ).alias("vocab_size")
    )
    return (
        ranked.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(total))
        .groupBy("vocab_size", "n_terms_total", "total_tokens")
        .agg(
            F.sum(
                F.when(F.col("rnk") <= F.col("vocab_size"), F.col("tf"))
                .otherwise(0)
            ).alias("covered_tokens")
        )
        .select(
            "vocab_size",
            "n_terms_total",
            "total_tokens",
            "covered_tokens",
            F.expr(
                "((total_tokens - covered_tokens) * 10000)"
                " DIV total_tokens"
            ).alias("oov_bp"),
        )
        .orderBy("vocab_size")
    )


@query(
    "events_session_duration_stats",
    """
    WITH marked AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    numbered AS (
        SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                                              ORDER BY ts_us, event_id
                                              ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS session_seq
        FROM marked
    ),
    sess AS (
        SELECT user_id, session_seq, count(*) AS n_events,
               max(ts_us) - min(ts_us) AS duration_us
        FROM numbered GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           CAST(sum((n_events = 1)::INT) AS BIGINT) AS n_bounce_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events_total,
           CAST((sum(n_events) * 100) // count(*) AS BIGINT)
               AS avg_events_e2,
           quantile_cont(duration_us, 0.25) AS p25_duration_us,
           quantile_cont(duration_us, 0.5) AS p50_duration_us,
           quantile_cont(duration_us, 0.75) AS p75_duration_us,
           CAST(max(duration_us) AS BIGINT) AS max_duration_us
    FROM sess
    """,
)
def _events_session_duration_stats(spark, t):
    # session-length distribution — the analytic the sessionizer
    # exists FOR: bounce share, events per session, and duration
    # percentiles. Rides the sessionize operator (streaming/events.py,
    # shared with the streaming twin): one user-keyed shuffle to
    # session grain, then a 1-row map-side-combinable aggregate.
    # Durations are integer micros; percentiles at dyadic p over
    # integers are exact halves in double (no cross-engine drift);
    # the mean crosses as a ×100 rational.
    sess = sessionize(t["events"], gap_minutes=30)
    return sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int")).alias(
            "n_bounce_sessions"
        ),
        F.sum("n_events").alias("n_events_total"),
        F.expr("(sum(n_events) * 100) DIV count(1)").alias("avg_events_e2"),
        F.expr("percentile(duration_us, 0.25)").alias("p25_duration_us"),
        F.expr("percentile(duration_us, 0.5)").alias("p50_duration_us"),
        F.expr("percentile(duration_us, 0.75)").alias("p75_duration_us"),
        F.max("duration_us").alias("max_duration_us"),
    )


@query(
    "docs_dedup_savings_by_source",
    f"""
    WITH fp AS (
        SELECT doc_id, source, n_chars,
               {fingerprint_sql()} AS fingerprint
        FROM documents
    ),
    keep AS (
        SELECT source, n_chars, doc_id,
               min(doc_id) OVER (PARTITION BY source, fingerprint)
                   AS keeper
        FROM fp
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum((doc_id = keeper)::INT) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(sum(CASE WHEN doc_id = keeper THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_kept,
           CAST(((sum(n_chars)
                  - sum(CASE WHEN doc_id = keeper THEN n_chars
                             ELSE 0 END)) * 10000)
                // sum(n_chars) AS BIGINT) AS savings_bp
    FROM keep
    GROUP BY 1
    ORDER BY 1
    """,
)
def _docs_dedup_savings_by_source(spark, t):
    # dedup ROI accounting: per source, how many rows and bytes would
    # WITHIN-SOURCE exact dedup remove — the governance report that
    # justifies (or kills) a dedup stage before it runs on 100 TB.
    # One shuffle on (source, fingerprint) for the keeper window
    # (16-byte md5 keys, the exact-dedup partitioning), then a
    # source-grain aggregate. Savings cross as basis points.
    w = Window.partitionBy("source", "fingerprint")
    keep = (
        t["documents"]
        .withColumn("fingerprint", fingerprint())
        .withColumn("keeper", F.min("doc_id").over(w))
    )
    kept_chars = F.when(
        F.col("doc_id") == F.col("keeper"), F.col("n_chars")
    ).otherwise(0)
    return (
        keep.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("doc_id") == F.col("keeper")).cast("int")
            ).alias("n_kept"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(kept_chars).alias("chars_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "chars_total",
            "chars_kept",
            F.expr(
                "((chars_total - chars_kept) * 10000) DIV chars_total"
            ).alias("savings_bp"),
        )
        .orderBy("source")
    )


_PR_SCALE = 1_000_000_000_000  # rank fixed-point: ×10¹²
_PR_ITERS = 3


def _pagerank_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE body."""
    return f"""
    {out} AS (
        SELECT n.node,
               CAST(((15 * {_PR_SCALE}) // (100 * nn.n_nodes))
                    + ((85 * COALESCE(c.contrib, 0)) // 100)
                    AS BIGINT) AS r
        FROM nodes n CROSS JOIN nn
        LEFT JOIN (
            SELECT p.dst AS node,
                   sum(({prev}.r * p.p_e6) // 1000000) AS contrib
            FROM pedges p JOIN {prev} ON {prev}.node = p.src
            GROUP BY 1
        ) c USING (node)
    )"""


@query(
    "graph_pagerank_eventtypes",
    f"""
    WITH seq AS (
        SELECT event_type AS dst,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS src
        FROM events
    ),
    edges AS (
        SELECT src, dst, count(*) AS w
        FROM seq WHERE src IS NOT NULL GROUP BY 1, 2
    ),
    outs AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY 1),
    pedges AS (
        SELECT e.src, e.dst,
               CAST((e.w * 1000000) // o.out_w AS BIGINT) AS p_e6
        FROM edges e JOIN outs o USING (src)
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT count(*) AS n_nodes FROM nodes),
    r0 AS (
        SELECT node, CAST({_PR_SCALE} // n_nodes AS BIGINT) AS r
        FROM nodes, nn
    ),{_pagerank_iter_sql("r0", "r1")},{_pagerank_iter_sql("r1", "r2")},{
        _pagerank_iter_sql("r2", "r3")}
    SELECT node, r AS rank_e12 FROM r3 ORDER BY node
    """,
)
def _graph_pagerank_eventtypes(spark, t):
    # PageRank over the event-type transition graph (which states
    # dominate user flows) — the iterative-graph-algorithm shape
    # beyond the connected-components closure. Bit-exact across
    # engines with a FIXED iteration count because every update is
    # integer fixed-point: ranks ×10¹², edge probabilities ×10⁶
    # (precomputed once, so the per-edge term is rank·p DIV 10⁶ —
    # bounded by 10¹⁸ regardless of edge weight, i.e. scale-
    # independent of the fact table), truncating division, and
    # order-free BIGINT sums. Dangling mass is not redistributed
    # (documented contract both sides). Plan: edge extraction is one
    # user-partitioned lag window over the fact; everything iterative
    # runs at EDGE/NODE grain — the fact is scanned once, and each
    # iteration is a node-grain broadcast join onto the (tiny
    # relative to facts) edge table. The edge/node tables feed every
    # iteration, so they are persisted.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    )
    edges = (
        seq.filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outs = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    pedges = (
        edges.join(outs, "src")
        .select(
            "src", "dst", F.expr("(w * 1000000) DIV out_w").alias("p_e6")
        )
        .persist()
    )
    nodes = (
        t["events"].select(F.col("event_type").alias("node")).distinct()
        .persist()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{_PR_SCALE} DIV n_nodes").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            pedges.join(
                F.broadcast(r.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("(r * p_e6) DIV 1000000")).alias("contrib"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(F.broadcast(contrib), "node", "left")
            .select(
                "node",
                F.expr(
                    f"((15 * {_PR_SCALE}) DIV (100 * n_nodes))"
                    " + ((85 * COALESCE(contrib, 0)) DIV 100)"
                ).alias("r"),
            )
        )
    return r.select("node", F.col("r").alias("rank_e12")).orderBy("node")
