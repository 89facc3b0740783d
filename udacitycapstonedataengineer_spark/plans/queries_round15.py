"""Round-15 registrations: ``semdedup_survivors_budgeted``,
``corpus_mixture_temperature_alpha``, and
``ann_ivfpq_recall_at_k_served_filtered``.

Staged (drafts + oracles + sf0.001 parity tests) in round 14 with this
module unimported; round 15 performs the mechanical step the staging
discipline exists for — the ``query(...)`` registrations at the bottom
of this file plus the import in ``plans/queries.py``. The only body
edit between staging and registration is the ADVICE r14 #4 temp-dir
hygiene fix in the served/filtered draft (rmtree before the overwrite
write — pid reuse could otherwise interleave a stale dir with the
append); oracle texts are byte-identical to the staging
(VERDICT r14 next #1).

- ``semdedup_survivors_budgeted``: the ``semdedup_survivors`` keep
  policy under the CELL-BUDGET k (``cell_budget.derive_k`` — VERDICT
  r13 next #6). The registered fixed-k family pins k=8 for oracle
  replayability and is the one documented scale deviation (the r13
  ×10 probe read ~10.3× on 10× data); here the ORACLE derives the
  same k = ⌈n/target_cell⌉ by pure integer math in SQL (the kmeans
  oracle is fully relational — k appears only in the seed LIMIT, so
  a scalar-subquery LIMIT makes it data-dependent), and the emitted
  ``derived_k`` column hash-pins the derivation cross-engine. Scale:
  Σ|cell|² ≈ n·target_cell — corpus-LINEAR pair work, the behavior
  the probe measured (~1.8-2.8× per stage at ×10) now on a
  driver-gated row.
- ``corpus_mixture_temperature_alpha``: the UniMax temperature sweep
  beyond sqrt — alpha ∈ {0.25, 0.5, 0.75} as a 3-row parameter dim
  (the dedup_threshold_sweep shape). Cross-engine exactness WITHOUT
  libm pow: every weight is a composition of IEEE-754
  correctly-rounded ops only — sqrt(sqrt(n)) for 0.25, sqrt(n) for
  0.5, sqrt(n)·sqrt(sqrt(n)) for 0.75 (each sqrt and the final
  multiply is correctly rounded, so both engines produce the SAME
  double even where it differs from the infinitely-precise n^α) —
  then floor-quantized to BIGINT before any order-sensitive
  aggregation. VERDICT r13 suggested 0.3/0.7 via integer nth-root
  bounding; rejected deliberately: an exact 10th-root check needs
  w¹⁰ ≤ n³·Q¹⁰ comparisons beyond int64 (Spark has no int128 and
  decimal chains differ cross-engine), while the sqrt-composition
  ladder stays in plain doubles with the identical guarantee.
- ``ann_ivfpq_recall_at_k_served_filtered``: recall@k of the
  FILTERED serving path (VERDICT r13 next #7 — the production RAG
  question): the written index rows carry the metadata column, the
  probe applies the predicate inside the PartitionFilter-pruned cell
  scan, and the ground truth is the exact top-k among rows passing
  the SAME predicate (query vectors still resolve from the full
  corpus — a query need not satisfy its own filter). Composes the
  r14 served pipeline + ``recall_eval.ivfpq_recall_at_k(candidates=)``
  + ``ivfpq_oracle_sql(candidate_where=)``.

Reference parity: the reference pipeline has no ANN/mixture surface
(/root/reference/etl.py is a star-schema ETL); these extend the
similarity-search and corpus-mixture families SURVEY.md §2 adds.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..operators.cell_budget import semdedup_closure_scaled
from ..operators.ivfpq import (
    ivfpq_build,
    ivfpq_encode_batch,
    ivfpq_oracle_sql,
)
from ..operators.recall_eval import ivfpq_recall_at_k
from ..operators.semdedup import semdedup_oracle_sql
from .queries_round8 import _IVFPQ, _NPROBE, _TOPK
from .queries_round12 import _RECALL_AT_K_QUERY_IDS
from .queries_round14 import _MIX_TEMP_BUDGET_SHARE, _SERVED_BATCH_WHERE

# ---------------------------------------------------------------------------
# semdedup_survivors_budgeted (first r15 draft)
# ---------------------------------------------------------------------------
# target_cell=100: at sf0.001/sf0.01 (500 vectors) k derives to 5, at
# sf0.1 (2000) to 20 — the k the registered fixed-k rows pin at 8
# regardless of corpus size. Small enough that local tests exercise
# multi-cell behavior; production uses cell_budget.DEFAULT_TARGET_CELL.
_BUDGET_TARGET_CELL = 100
_BUDGET_PARAMS = dict(iters=2, dim=64, threshold=0.2)

# pure integer ceil-division — the SQL twin of derive_k(n, target):
# max(1, ⌈n/target⌉) with ⌈a/b⌉ = (a + b − 1) // b for positive ints
_DERIVED_K_SQL = (
    f"(SELECT GREATEST(1, (count(*) + {_BUDGET_TARGET_CELL - 1})"
    f" // {_BUDGET_TARGET_CELL}) FROM embeddings)"
)


def _semdedup_survivors_budgeted_oracle_sql() -> str:
    pairs_sql = semdedup_oracle_sql(
        k_sql=_DERIVED_K_SQL, **_BUDGET_PARAMS
    )
    return f"""
    WITH RECURSIVE pairs AS (
        SELECT vec_a, vec_b FROM ( {pairs_sql} ) q
    ),
    kd AS (SELECT CAST({_DERIVED_K_SQL} AS BIGINT) AS derived_k),
    edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM pairs
        UNION
        SELECT vec_b, vec_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
    ),
    comp AS (SELECT node, CAST(MIN(lbl) AS BIGINT) AS component
             FROM reach GROUP BY node),
    sizes AS (SELECT component, count(*) AS comp_size
              FROM comp GROUP BY component),
    surv AS (
        SELECT e.vec_id, e.label,
               COALESCE(c.component, e.vec_id) AS component,
               COALESCE(s.comp_size, 1) AS comp_size
        FROM embeddings e
        LEFT JOIN comp c ON c.node = e.vec_id
        LEFT JOIN sizes s ON s.component = COALESCE(c.component, e.vec_id)
        WHERE e.vec_id NOT IN
              (SELECT node FROM comp WHERE node != component)
    ),
    tot AS (SELECT label, count(*) AS label_total
            FROM embeddings GROUP BY label),
    kept AS (SELECT label, count(*) AS label_kept FROM surv GROUP BY label)
    SELECT surv.vec_id, surv.label, surv.component, surv.comp_size,
           tot.label_total, kept.label_kept, kd.derived_k
    FROM surv JOIN tot USING (label) JOIN kept USING (label)
    CROSS JOIN kd
    ORDER BY vec_id
    """


def _semdedup_survivors_budgeted_draft(spark, t):
    """The r15 query body: ``cell_budget.semdedup_closure_scaled``
    (ONE implementation of derive_k → pairs → transitive closure,
    shared with ``semdedup_survivors_scaled``) feeds the exact
    ``semdedup_survivors`` reporting composition (drop non-exemplars
    → per-label savings), with ``derived_k`` emitted so the
    derivation itself rides the driver hash. Scale shape: expected
    cell size = target_cell, so the pair join is n·target_cell
    (corpus-linear) instead of fixed-k's n²/k —
    scripts/probe_budgeted_x10.py measured 2.81× on 10× data."""
    emb = t["embeddings"]
    labels = emb.select("vec_id", "label")
    comp, k = semdedup_closure_scaled(
        emb, target_cell=_BUDGET_TARGET_CELL, **_BUDGET_PARAMS
    )  # (node, comp), derived k
    dropped = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("vec_id")
    )
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("comp_size"))
    surv = (
        labels.join(dropped, "vec_id", "left_anti")
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .withColumn("component", F.coalesce("comp", "vec_id"))
        .join(
            sizes.withColumnRenamed("comp", "component"), "component", "left"
        )
        .withColumn("comp_size", F.coalesce("comp_size", F.lit(1)))
        .select("vec_id", "label", "component", "comp_size")
    )
    tot = labels.groupBy("label").agg(F.count(F.lit(1)).alias("label_total"))
    kept = surv.groupBy("label").agg(F.count(F.lit(1)).alias("label_kept"))
    return (
        surv.join(F.broadcast(tot), "label")
        .join(F.broadcast(kept), "label")
        .select(
            "vec_id",
            "label",
            "component",
            "comp_size",
            "label_total",
            "label_kept",
            F.lit(k).cast("long").alias("derived_k"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# corpus_mixture_temperature_alpha (second r15 draft)
# ---------------------------------------------------------------------------
# Quantum 10³ (not the sqrt row's 10⁶): keep_s = (B·w_int)//w_tot
# must fit int64, and the α=0.75 weight grows as n^0.75 — at Q=10³
# the product stays in-range up to ~2·10⁹ docs corpus-wide (re-scale
# the quantum per-shard beyond that, the documented sqrt-row path).
_MIX_ALPHA_Q = 1_000
_MIX_ALPHAS = (25, 50, 75)  # alpha·100


def _corpus_mixture_temperature_alpha_oracle_sql() -> str:
    from ..operators.dedup import H60_SQL

    h = H60_SQL.format(x="'mixa|' || CAST(doc_id AS VARCHAR)")
    nd = "CAST(n_s AS DOUBLE)"
    q = _MIX_ALPHA_Q
    return f"""
    WITH counts AS (
        SELECT source, count(*) AS n_s FROM documents GROUP BY source
    ),
    alphas AS (SELECT unnest([{", ".join(str(a) for a in _MIX_ALPHAS)}])
               AS alpha_pct),
    w AS (
        SELECT a.alpha_pct, c.source, c.n_s,
               CASE a.alpha_pct
                   WHEN 25 THEN
                       CAST(FLOOR(SQRT(SQRT({nd})) * {q}) AS BIGINT)
                   WHEN 50 THEN
                       CAST(FLOOR(SQRT({nd}) * {q}) AS BIGINT)
                   ELSE
                       CAST(FLOOR((SQRT({nd}) * SQRT(SQRT({nd}))) * {q})
                            AS BIGINT)
               END AS w_int
        FROM counts c CROSS JOIN alphas a
    ),
    tot AS (
        SELECT alpha_pct, CAST(SUM(w_int) AS BIGINT) AS w_tot,
               CAST(SUM(n_s) AS BIGINT) AS n_tot
        FROM w GROUP BY alpha_pct
    ),
    rates AS (
        SELECT w.alpha_pct, w.source, w.n_s,
               LEAST(
                   w.n_s,
                   ((tot.n_tot // {_MIX_TEMP_BUDGET_SHARE}) * w.w_int)
                       // tot.w_tot
               ) AS keep_s
        FROM w JOIN tot USING (alpha_pct)
    ),
    bp AS (
        SELECT alpha_pct, source, n_s,
               (10000 * keep_s) // n_s AS rate_bp
        FROM rates
    )
    SELECT d.source, bp.alpha_pct,
           CAST(count(*) AS BIGINT) AS n_total,
           MIN(bp.rate_bp) AS rate_bp,
           CAST(SUM(CASE WHEN ({h}) % 10000 < bp.rate_bp
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN bp USING (source)
    GROUP BY d.source, bp.alpha_pct
    ORDER BY d.source, bp.alpha_pct
    """


def _corpus_mixture_temperature_alpha_draft(spark, t):
    """The r15 query body: ONE corpus-grain aggregate builds the
    (source, bucket) histogram (bucket = the H60 keep hash mod 10⁴,
    so the histogram is ≤ sources·10⁴ rows — bounded regardless of
    corpus size); everything after runs on bounded tables: the 3-row
    alpha dim cross-joins the per-source counts, weights/budgets/
    rates derive by the same integer math as the oracle, and the
    per-(source, alpha) keep counts come from the HISTOGRAM joined to
    the broadcast rate table — the 3× alpha fan-out touches
    histogram-grain rows, never the corpus. At 100 TB the sweep adds
    zero corpus-grain shuffles beyond the one histogram aggregate."""
    from ..operators.dedup import H60

    docs = t["documents"]
    bucket = (
        F.expr(H60.format(x="concat('mixa|', CAST(doc_id AS STRING))"))
        % 10000
    )
    hist = (
        docs.select("source", bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = hist.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    alphas = spark.createDataFrame(
        [(a,) for a in _MIX_ALPHAS], "alpha_pct int"
    )
    nd = F.col("n_s").cast("double")
    q = _MIX_ALPHA_Q
    w_int = (
        F.when(
            F.col("alpha_pct") == 25,
            F.floor(F.sqrt(F.sqrt(nd)) * q),
        )
        .when(F.col("alpha_pct") == 50, F.floor(F.sqrt(nd) * q))
        .otherwise(F.floor((F.sqrt(nd) * F.sqrt(F.sqrt(nd))) * q))
        .cast("long")
    )
    w = counts.crossJoin(F.broadcast(alphas)).select(
        "alpha_pct", "source", "n_s", w_int.alias("w_int")
    )
    tot = w.groupBy("alpha_pct").agg(
        F.sum("w_int").cast("long").alias("w_tot"),
        F.sum("n_s").cast("long").alias("n_tot"),
    )
    rates = (
        w.join(F.broadcast(tot), "alpha_pct")
        .select(
            "alpha_pct",
            "source",
            "n_s",
            F.least(
                F.col("n_s"),
                F.expr(
                    f"((n_tot div {_MIX_TEMP_BUDGET_SHARE}) * w_int)"
                    " div w_tot"
                ),
            ).alias("keep_s"),
        )
        .select(
            "alpha_pct",
            "source",
            F.expr("(10000 * keep_s) div n_s").alias("rate_bp"),
        )
    )
    return (
        hist.join(F.broadcast(rates), "source")
        .groupBy("source", "alpha_pct")
        .agg(
            F.sum("cnt").alias("n_total"),
            F.min("rate_bp").alias("rate_bp"),
            F.sum(
                F.when(
                    F.col("bucket") < F.col("rate_bp"), F.col("cnt")
                ).otherwise(F.lit(0))
            ).alias("n_kept"),
        )
        .orderBy("source", "alpha_pct")
    )


# ---------------------------------------------------------------------------
# ann_ivfpq_recall_at_k_served_filtered (third r15 draft)
# ---------------------------------------------------------------------------
# the metadata predicate the serving filter applies — roughly half
# the corpus at every SF, so filtered recall is non-degenerate
_SERVED_FILTER_WHERE = "label % 2 = 0"


def _ivfpq_recall_at_k_served_filtered_oracle_sql() -> str:
    """DuckDB twin: the r14 served oracle (``fit_where`` excludes the
    batch — training sees only the corpus) with ``candidate_where``
    restricting BOTH the ADC scoring set and the exact ground truth
    to the metadata-filtered rows, aggregated per sampled query."""
    points = []
    for qid in _RECALL_AT_K_QUERY_IDS:
        inner = ivfpq_oracle_sql(
            dim=64,
            nprobe=_NPROBE,
            topk=_TOPK,
            query_vec_id=qid,
            exact_k=_TOPK,
            fit_where=f"NOT ({_SERVED_BATCH_WHERE})",
            candidate_where=_SERVED_FILTER_WHERE,
            **_IVFPQ,
        )
        points.append(
            f"""SELECT {qid} AS query_vec_id,
                CAST(COUNT(CASE WHEN in_exact_topk THEN 1 END) AS BIGINT)
                    AS hits
                FROM ({inner}) q{qid}"""
        )
    u = "\nUNION ALL\n".join(points)
    return f"""
    SELECT query_vec_id, hits,
           CAST(hits AS DOUBLE) / {float(_TOPK)} AS recall
    FROM ({u})
    ORDER BY query_vec_id
    """


def _ann_ivfpq_recall_at_k_served_filtered_draft(spark, t):
    """The r15 query body: the r14 served pipeline (corpus-only model,
    cell-partitioned write, frozen-model batch append, read-back
    probes under cell PartitionFilters) with the metadata column
    STORED IN the index rows and the serving predicate applied inside
    the pruned probe scan — each query still reads nprobe/nlist of
    the index files, the label filter evaluates on just those rows.
    Ground truth = exact top-k among rows passing the SAME predicate;
    query vectors resolve from the full corpus."""
    emb = t["embeddings"]
    labels = emb.select("vec_id", "label")
    corpus = emb.filter(~F.expr(_SERVED_BATCH_WHERE))
    batch = emb.filter(F.expr(_SERVED_BATCH_WHERE))
    cents, books, corpus_index = ivfpq_build(corpus, **_IVFPQ)
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ivfpq_recall_servfilt_{os.getpid()}",
    )
    # ADVICE r14 #4: a recycled pid could leave a stale dir here whose
    # residue the overwrite+append pair would interleave with; clear it
    # first (tmpindex still removes the dir at process exit)
    shutil.rmtree(path, ignore_errors=True)
    corpus_index.join(labels, "vec_id").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(path)
    ivfpq_encode_batch(batch, cents, books, m=_IVFPQ["m"]).join(
        labels, "vec_id"
    ).write.partitionBy("cell").mode("append").parquet(path)
    back = spark.read.parquet(path).withColumn(
        "cell", F.col("cell").cast("long")
    )
    return ivfpq_recall_at_k(
        back.filter(F.expr(_SERVED_FILTER_WHERE)),
        cents,
        books,
        emb,
        list(_RECALL_AT_K_QUERY_IDS),
        k=_TOPK,
        nprobe=_NPROBE,
        candidates=emb.filter(F.expr(_SERVED_FILTER_WHERE)),
    )


# ---------------------------------------------------------------------------
# Round-15 registrations (the mechanical step: decoration only — the
# bodies and oracles above are the r14 staging, byte-identical except
# the ADVICE r14 #4 rmtree noted in the module docstring).
# ---------------------------------------------------------------------------
from .registry import query  # noqa: E402

query(
    "semdedup_survivors_budgeted",
    _semdedup_survivors_budgeted_oracle_sql(),
)(_semdedup_survivors_budgeted_draft)
query(
    "corpus_mixture_temperature_alpha",
    _corpus_mixture_temperature_alpha_oracle_sql(),
)(_corpus_mixture_temperature_alpha_draft)
query(
    "ann_ivfpq_recall_at_k_served_filtered",
    _ivfpq_recall_at_k_served_filtered_oracle_sql(),
)(_ann_ivfpq_recall_at_k_served_filtered_draft)
