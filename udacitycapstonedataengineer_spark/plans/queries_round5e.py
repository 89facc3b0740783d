"""Round-5e query group: parameter-sweep reports — the "what should I
set the knob to" queries a pipeline owner runs before committing a
dedup threshold or a packing budget to a 100-TB job.

Both sweeps broadcast a tiny parameter dimension over an
already-aggregated table, so the sweep costs one extra small fan-out,
never an extra pass over the corpus. All arithmetic integer/rational
(plans/registry.py conventions).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import shingle_pair_counts
from .queries_dedup import _SHINGLES_SQL, _TOKS_SQL
from .registry import query

_JACCARD_THRESHOLDS_BP = [5000, 7000, 9000]
_PACK_BUDGETS = [128, 512, 2048]


@query(
    "dedup_threshold_sweep",
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
    ),
    pairs AS (
        SELECT doc_a, doc_b,
               (n_inter * 10000)
                   // (sa.n_sh + sb.n_sh - n_inter) AS jaccard_bp
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    ),
    th AS (SELECT unnest([{", ".join(map(str, _JACCARD_THRESHOLDS_BP))}])
           AS threshold_bp)
    SELECT t.threshold_bp,
           CAST(sum(CASE WHEN p.jaccard_bp >= t.threshold_bp
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT CASE WHEN p.jaccard_bp >= t.threshold_bp
                                    THEN p.doc_b END) AS BIGINT)
               AS n_docs_removed
    FROM pairs p CROSS JOIN th t
    GROUP BY 1
    ORDER BY 1
    """,
)
def _dedup_threshold_sweep(spark, t):
    # dedup threshold sensitivity: how many near-dup pairs — and how
    # many docs a keep-lowest-id policy would remove — at Jaccard
    # ≥ 0.5 / 0.7 / 0.9. The decision report you run BEFORE burning a
    # threshold into the 100-TB dedup job. Candidate pairs come from
    # the shingle-grain equi-join with the measured df≤64 skew cap
    # (the docs_shingle_containment shape — never doc×doc); the
    # 3-row threshold dimension broadcasts over the pair table, so
    # the sweep costs one pair-grain fan-out ×3, not three passes.
    # Jaccard crosses as basis points (|A∩B| / |A∪B| by
    # inclusion-exclusion on exact counts).
    inter, sizes = shingle_pair_counts(t["documents"], max_df=64)
    pairs = (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("(n_inter * 10000) DIV (na + nb - n_inter)").alias(
                "jaccard_bp"
            ),
        )
    )
    th = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v) for v in _JACCARD_THRESHOLDS_BP])
        ).alias("threshold_bp")
    )
    hit = F.col("jaccard_bp") >= F.col("threshold_bp")
    return (
        pairs.crossJoin(F.broadcast(th))
        .groupBy("threshold_bp")
        .agg(
            F.sum(hit.cast("int")).alias("n_pairs"),
            F.countDistinct(F.when(hit, F.col("doc_b"))).alias(
                "n_docs_removed"
            ),
        )
        .orderBy("threshold_bp")
    )


@query(
    "docs_pack_budget_sweep",
    f"""
    WITH counted AS (
        SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens
        FROM documents
    ),
    offs AS (
        SELECT source, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - n_tokens AS start_offset
        FROM counted
    ),
    b AS (SELECT unnest([{", ".join(map(str, _PACK_BUDGETS))}]) AS budget)
    SELECT b.budget,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN (start_offset // b.budget)
                              <> ((start_offset + n_tokens - 1) // b.budget)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
           CAST((sum(CASE WHEN (start_offset // b.budget)
                               <> ((start_offset + n_tokens - 1) // b.budget)
                          THEN 1 ELSE 0 END) * 10000)
                // count(*) AS BIGINT) AS crossing_bp
    FROM offs CROSS JOIN b
    GROUP BY 1
    ORDER BY 1
    """,
)
def _docs_pack_budget_sweep(spark, t):
    # packing-budget fragmentation sweep: at sequence budgets
    # 128/512/2048, how many documents straddle a pack boundary (and
    # so lose attention locality) under the concat-and-chunk layout
    # of docs_pack_sequences. Same integer offset math as the packer
    # — cumulative per-source token offsets, truncating division —
    # with the 3-row budget dimension broadcast over the doc-grain
    # offset table. One corpus tokenize-count, one per-source window,
    # ×3 fan-out at doc grain.
    n_tokens = F.size(
        F.split(F.lower(F.trim("text")), r"\s+")
    ).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = (
        t["documents"]
        .select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn(
            "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
    )
    b = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v) for v in _PACK_BUDGETS])
        ).alias("budget")
    )
    crossing = F.expr(
        "(start_offset DIV budget)"
        " <> ((start_offset + n_tokens - 1) DIV budget)"
    )
    return (
        offs.crossJoin(F.broadcast(b))
        .groupBy("budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(crossing.cast("int")).alias("n_crossing"),
        )
        .select(
            "budget",
            "n_docs",
            "total_tokens",
            "n_crossing",
            F.expr("(n_crossing * 10000) DIV n_docs").alias("crossing_bp"),
        )
        .orderBy("budget")
    )
