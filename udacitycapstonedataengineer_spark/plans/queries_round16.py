"""Round-16 queries: ``corpus_pipeline_report``,
``semdedup_survivors_incremental_budgeted``, and
``ann_ivfpq_recall_curve_served_filtered``.

Staged (unimported) during round 15 with oracles + sf0.001 parity
pinned; round 16 moved the decoration (registration block at the
bottom) per the staging discipline — VERDICT r15 next #1. The only
body edits between staging and registration were made WHILE staged:
the funnel threshold 0.2→0.4 (degenerate-tail fix) and the HUGEINT
comparator pin, both recorded in the r15 VERDICT.

- ``corpus_pipeline_report``: the END-TO-END corpus preparation
  pipeline as ONE oracled row set — quality gates → exact dedup →
  budgeted SemDeDup survivors → temperature mixture → packing
  counts, reported as per-source survivor counts through every
  stage. Each stage is individually oracled today
  (``docs_quality_gate_funnel``, ``dedup_exact_keep_canonical``,
  ``semdedup_survivors_budgeted``, ``corpus_mixture_temperature``,
  ``docs_chunk_windows``); composing them under ONE DuckDB twin is
  the integration gate those families prove only piecewise — and it
  is the query a real LLM-data owner runs weekly. Scale shape: the
  gates are codegen'd projections, exact dedup is one fingerprint
  shuffle, SemDeDup pair work is corpus-LINEAR under the derived-k
  cell budget, the mixture rate table is |sources|-row broadcast,
  and packing counts are an arithmetic projection — the report adds
  only source-grain aggregates on top of the stages themselves.
- ``semdedup_survivors_incremental_budgeted``: the incremental
  survivors keep policy (standing exemplars, frozen corpus model)
  under the CELL-BUDGET derived k. The registered
  ``semdedup_survivors_incremental`` still pins k=8 — the same fixed-k
  scale deviation ``semdedup_survivors_budgeted`` closed at the batch
  layer this round, now closed at the incremental layer: k derives
  from the CORPUS count (the fit set — the model is corpus-only, so
  its shape must be too), the oracle derives the SAME k via
  ``kmeans_oracle_parts(k_sql=)``, and the emitted ``derived_k``
  column hash-pins the derivation cross-engine.
- ``ann_ivfpq_recall_curve_served_filtered``: the recall-vs-nprobe
  curve of the FILTERED serving path measured from the WRITTEN
  post-append index — composing the two r15 drafts (filtered
  recall@k served; r11's served curve): corpus-only fit (leakage
  contract), labels stored IN the index rows, batch appended under
  the frozen model, each curve point probed from the read-back under
  cell PartitionFilters with the metadata predicate evaluated on
  just the probed rows, ground truth = exact top-k among rows
  passing the SAME predicate. The production question: "how many
  cells must filtered RAG serving probe after an append?"

Reference parity: the reference pipeline has no ANN/mixture/corpus
surface (/root/reference/etl.py is a star-schema ETL); these extend
the families SURVEY.md §2 adds.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..functions.text import fingerprint_sql
from ..operators.cell_budget import derive_k, semdedup_closure_scaled
from ..operators.clustering import kmeans_assign_sql, kmeans_oracle_parts
from ..operators.dedup import H60, H60_SQL, exact_dedup_keep_canonical
from ..operators.ivfpq import (
    ivfpq_build,
    ivfpq_encode_batch,
    ivfpq_oracle_sql,
    ivfpq_recall_curve,
)
from ..operators.semdedup import semdedup_oracle_sql
from ..operators.similarity import cosine_sql
from .queries_round8 import _IVFPQ, _SEMDEDUP, _TOPK
from .queries_round9 import _exact_topk_flags
from .queries_round10 import (
    _BATCH_WHERE,
    _RECALL_NPROBES,
    semdedup_incremental_survivors,
)
from .queries_round14 import _SERVED_BATCH_WHERE
from .queries_round15 import _SERVED_FILTER_WHERE

# ---------------------------------------------------------------------------
# corpus_pipeline_report (first r16 draft)
# ---------------------------------------------------------------------------
# Stage parameters: gates = the registered docs_quality_gate_funnel
# thresholds; SemDeDup = the r15 budgeted cell target (multi-cell at
# every local SF); mixture = the r14 sqrt-temperature policy with its
# quantum/budget, salted 'pipe|' so the keep decision is independent
# of the standalone mixture row's; packing = the registered
# docs_chunk_windows stride.
#
# threshold=0.4, NOT the standalone family's 0.2: at the gate scales
# the embeddings cover the whole doc id space, and at 0.2 (≈1.6σ of
# random 64-dim cosine) within-cell components go giant — the funnel
# collapsed to ~k survivors and ZERO mixture keeps at sf0.01, making
# stages 5-6 vacuous (an empty tail trivially hash-matches and hides
# bugs — the verify discipline forbids it). At 0.4 every stage drops
# something at sf0.001/sf0.01 (e.g. sf0.01: 352 exact → 338 sem →
# 151 mix → 449 chunks) while the pair/closure machinery still
# exercises multi-member components.
_PIPE_TARGET_CELL = 100
_PIPE_PARAMS = dict(iters=2, dim=64, threshold=0.4)
_PIPE_Q = 1_000_000
_PIPE_BUDGET_SHARE = 2
_PIPE_STRIDE = 150

# derived k over the SemDeDup INPUT (the exact-dedup survivors'
# embeddings) — pure integer ceil-division, the SQL twin of derive_k
_PIPE_K_SQL = (
    f"(SELECT GREATEST(1, (count(*) + {_PIPE_TARGET_CELL - 1})"
    f" // {_PIPE_TARGET_CELL}) FROM sem_in)"
)


def _corpus_pipeline_report_oracle_sql() -> str:
    pairs_sql = semdedup_oracle_sql(
        k_sql=_PIPE_K_SQL, table="sem_in", **_PIPE_PARAMS
    )
    h = H60_SQL.format(x="'pipe|' || CAST(doc_id AS VARCHAR)")
    return rf"""
    WITH RECURSIVE gated AS (
        SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text, n_chars,
                   len(list_filter(regexp_split_to_array(lower(text),
                                                         '\s+'),
                                   s -> s <> '')) AS n_toks,
                   length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                       AS n_punct
            FROM documents)
        WHERE n_chars >= 200 AND n_toks >= 30
              AND n_punct * 100 <= n_chars * 20
    ),
    exact AS (
        SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text,
                   min(doc_id) OVER (PARTITION BY {fingerprint_sql()})
                       AS __min_id
            FROM gated)
        WHERE doc_id = __min_id
    ),
    sem_in AS (
        SELECT e.* FROM embeddings e JOIN exact x ON e.vec_id = x.doc_id
    ),
    kd AS (SELECT CAST({_PIPE_K_SQL} AS BIGINT) AS derived_k),
    pairs AS (SELECT vec_a, vec_b FROM ( {pairs_sql} ) q),
    edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM pairs
        UNION
        SELECT vec_b, vec_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT g.src, r.lbl FROM edges g JOIN reach r ON g.dst = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component
             FROM reach GROUP BY node),
    sem AS (
        SELECT x.doc_id, x.source, x.text FROM exact x
        WHERE x.doc_id NOT IN
              (SELECT node FROM comp WHERE node != component)
    ),
    counts AS (SELECT source, count(*) AS n_s FROM sem GROUP BY source),
    w AS (
        SELECT source, n_s,
               CAST(FLOOR(SQRT(CAST(n_s AS DOUBLE)) * {_PIPE_Q})
                    AS BIGINT) AS w_int
        FROM counts
    ),
    tot AS (
        SELECT CAST(SUM(w_int) AS BIGINT) AS w_tot,
               CAST(SUM(n_s) AS BIGINT) AS n_tot
        FROM w
    ),
    bp AS (
        SELECT source,
               (10000 * LEAST(
                   w.n_s,
                   ((tot.n_tot // {_PIPE_BUDGET_SHARE}) * w.w_int)
                       // tot.w_tot
               )) // w.n_s AS rate_bp
        FROM w CROSS JOIN tot
    ),
    mix AS (
        SELECT s.doc_id, s.source, s.text
        FROM sem s JOIN bp USING (source)
        WHERE ({h}) % 10000 < bp.rate_bp
    ),
    st_raw AS (SELECT source, count(*) AS n_raw
               FROM documents GROUP BY source),
    st_q AS (SELECT source, count(*) AS n_quality
             FROM gated GROUP BY source),
    st_e AS (SELECT source, count(*) AS n_exact
             FROM exact GROUP BY source),
    st_s AS (SELECT source, count(*) AS n_sem FROM sem GROUP BY source),
    st_m AS (
        -- outer CAST: DuckDB SUM(BIGINT) yields HUGEINT, which
        -- pandas reads as float64 — the driver's string compare
        -- would then see "449.0" vs Spark's "449"
        SELECT source, count(*) AS n_mix,
               CAST(SUM(CASE WHEN length(text) > 0
                   THEN CAST(FLOOR((length(text) - 1) / {_PIPE_STRIDE})
                             AS BIGINT) + 1
                   ELSE 0 END) AS BIGINT) AS n_chunks
        FROM mix GROUP BY source
    )
    SELECT r.source, r.n_raw,
           COALESCE(st_q.n_quality, 0) AS n_quality,
           COALESCE(st_e.n_exact, 0) AS n_exact,
           COALESCE(st_s.n_sem, 0) AS n_sem,
           COALESCE(st_m.n_mix, 0) AS n_mix,
           COALESCE(st_m.n_chunks, 0) AS n_chunks,
           kd.derived_k
    FROM st_raw r
    LEFT JOIN st_q USING (source)
    LEFT JOIN st_e USING (source)
    LEFT JOIN st_s USING (source)
    LEFT JOIN st_m USING (source)
    CROSS JOIN kd
    ORDER BY source
    """


def _corpus_pipeline_report_draft(spark, t):
    """The r16 query body: the ``prepare_corpus`` chain re-expressed
    with this repo's ORACLED stage semantics and reported as the
    per-source funnel. Shuffles: the fingerprint window (exact
    dedup), the cell-budget pair join + closure (corpus-linear by
    construction), and five source-grain aggregates; the mixture rate
    table and every stage-count table are broadcast-sized. At 100 TB
    each stage would persist its survivor table — this row is the
    weekly report over exactly those stage semantics."""
    docs = t["documents"]
    emb = t["embeddings"]
    n_toks = F.size(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda s: s != "")
    )
    n_punct = F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", ""))
    gated = docs.filter(
        (F.col("n_chars") >= 200)
        & (n_toks >= 30)
        & (n_punct * 100 <= F.col("n_chars") * 20)
    )
    # persisted (guide §5 — r17): three consumers (the semdedup input,
    # the survivor anti-join, the stage count) re-derived the
    # fingerprint window otherwise; at 100 TB this IS the stage's
    # persisted survivor table (docstring below)
    exact = (
        exact_dedup_keep_canonical(gated)
        .select("doc_id", "source", "text")
        .persist()
    )
    sem_in = emb.join(
        exact.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    comp, k = semdedup_closure_scaled(
        sem_in, target_cell=_PIPE_TARGET_CELL, **_PIPE_PARAMS
    )
    dropped = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    # persisted: consumed by the mixture rate table, the sampled mix
    # scan, and the stage count (same §5 rationale as `exact`)
    sem = exact.join(dropped, "doc_id", "left_anti").persist()
    counts = sem.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = counts.select(
        "source",
        "n_s",
        F.floor(F.sqrt(F.col("n_s").cast("double")) * _PIPE_Q)
        .cast("long")
        .alias("w_int"),
    )
    tot = w.agg(
        F.sum("w_int").cast("long").alias("w_tot"),
        F.sum("n_s").cast("long").alias("n_tot"),
    )
    bp = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr(
                f"(10000 * least(n_s,"
                f" ((n_tot div {_PIPE_BUDGET_SHARE}) * w_int) div w_tot))"
                " div n_s"
            ).alias("rate_bp"),
        )
    )
    bucket = (
        F.expr(H60.format(x="concat('pipe|', CAST(doc_id AS STRING))"))
        % 10000
    )
    mix = (
        sem.withColumn("bucket", bucket)
        .join(F.broadcast(bp), "source")
        .filter(F.col("bucket") < F.col("rate_bp"))
    )
    chunks_per_doc = (
        F.when(
            F.length("text") > 0,
            F.floor((F.length("text") - 1) / _PIPE_STRIDE).cast("long")
            + 1,
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    st_raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    st_q = gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quality")
    )
    st_e = exact.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    st_s = sem.groupBy("source").agg(F.count(F.lit(1)).alias("n_sem"))
    st_m = mix.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_mix"),
        F.sum(chunks_per_doc).alias("n_chunks"),
    )
    return (
        st_raw.join(F.broadcast(st_q), "source", "left")
        .join(F.broadcast(st_e), "source", "left")
        .join(F.broadcast(st_s), "source", "left")
        .join(F.broadcast(st_m), "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).cast("long").alias(
                "n_quality"
            ),
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            F.coalesce("n_sem", F.lit(0)).cast("long").alias("n_sem"),
            F.coalesce("n_mix", F.lit(0)).cast("long").alias("n_mix"),
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias(
                "n_chunks"
            ),
            F.lit(k).cast("long").alias("derived_k"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# semdedup_survivors_incremental_budgeted (second r16 draft)
# ---------------------------------------------------------------------------
# k derives from the CORPUS count (the fit set — the frozen model is
# corpus-only, so its shape must be too); same cell target as the
# batch-layer budgeted row.
_INC_TARGET_CELL = 100
_INC_K_SQL = (
    f"(SELECT GREATEST(1, (count(*) + {_INC_TARGET_CELL - 1})"
    f" // {_INC_TARGET_CELL}) FROM embeddings"
    f" WHERE NOT ({_BATCH_WHERE}))"
)


def _semdedup_survivors_incremental_budgeted_oracle_sql() -> str:
    """DuckDB twin: the registered incremental-survivors oracle
    (plans/queries_round10.py:375 — corpus-only k-means fit, standing
    exemplar closure, frozen-cell batch assignment, two-stage batch
    decision) with the seed LIMIT derived via
    ``kmeans_oracle_parts(k_sql=)`` and ``derived_k`` emitted."""
    iters, dim, threshold = (
        _SEMDEDUP["iters"],
        _SEMDEDUP["dim"],
        _SEMDEDUP["threshold"],
    )
    cos = cosine_sql("a.embedding", "b.embedding")
    parts, prev = kmeans_oracle_parts(
        iters=iters,
        dim=dim,
        table="embeddings",
        fit_where=f"NOT ({_BATCH_WHERE})",
        k_sql=_INC_K_SQL,
    )
    parts += [
        f"kd AS (SELECT CAST({_INC_K_SQL} AS BIGINT) AS derived_k)",
        f"ca AS {kmeans_assign_sql(dim, 'ef', prev)}",
        f"bv AS (SELECT * FROM e WHERE {_BATCH_WHERE})",
        f"ba AS {kmeans_assign_sql(dim, 'bv', prev)}",
        f"""cp AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
           FROM ca x JOIN embeddings a ON a.vec_id = x.vec_id
                JOIN ca y ON y.cluster = x.cluster
                JOIN embeddings b ON b.vec_id = y.vec_id
           WHERE x.vec_id < y.vec_id AND {cos} >= {threshold})""",
        """edges AS (SELECT vec_a AS src, vec_b AS dst FROM cp
           UNION SELECT vec_b, vec_a FROM cp)""",
        """reach(node, lbl) AS (
           SELECT src, src FROM edges
           UNION
           SELECT g.src, r.lbl FROM edges g JOIN reach r ON g.dst = r.node)""",
        """comp AS (SELECT node, MIN(lbl) AS component
           FROM reach GROUP BY node)""",
        """surv AS (SELECT x.vec_id, x.cluster FROM ca x
           WHERE x.vec_id NOT IN
                 (SELECT node FROM comp WHERE node != component))""",
        f"""hit AS (SELECT DISTINCT nb.vec_id
           FROM ba nb JOIN embeddings a ON a.vec_id = nb.vec_id
                JOIN surv s ON s.cluster = nb.cluster
                JOIN embeddings b ON b.vec_id = s.vec_id
           WHERE {cos} >= {threshold})""",
        """passed AS (SELECT nb.vec_id, nb.cluster FROM ba nb
           WHERE nb.vec_id NOT IN (SELECT vec_id FROM hit))""",
        f"""bp AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
           FROM passed x JOIN embeddings a ON a.vec_id = x.vec_id
                JOIN passed y ON y.cluster = x.cluster
                JOIN embeddings b ON b.vec_id = y.vec_id
           WHERE x.vec_id < y.vec_id AND {cos} >= {threshold})""",
        """bedges AS (SELECT vec_a AS src, vec_b AS dst FROM bp
           UNION SELECT vec_b, vec_a FROM bp)""",
        """breach(node, lbl) AS (
           SELECT src, src FROM bedges
           UNION
           SELECT g.src, r.lbl
           FROM bedges g JOIN breach r ON g.dst = r.node)""",
        """bcomp AS (SELECT node, MIN(lbl) AS component
           FROM breach GROUP BY node)""",
        """bdrop AS (SELECT node FROM bcomp WHERE node != component)""",
    ]
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + f"""
        SELECT eb.vec_id, eb.label,
               CASE WHEN eb.vec_id IN (SELECT vec_id FROM hit)
                        THEN 'corpus_dup'
                    WHEN eb.vec_id IN (SELECT node FROM bdrop)
                        THEN 'batch_dup'
                    ELSE 'novel' END AS reason,
               (eb.vec_id NOT IN (SELECT vec_id FROM hit))
               AND (eb.vec_id NOT IN (SELECT node FROM bdrop)) AS kept,
               kd.derived_k
        FROM embeddings eb CROSS JOIN kd WHERE {_BATCH_WHERE}
        ORDER BY vec_id"""
    )


def _semdedup_survivors_incremental_budgeted_draft(spark, t):
    """The r16 query body: one corpus count derives k (the only job
    added over the fixed-k path), then the UNCHANGED
    ``semdedup_incremental_survivors`` composition under that k —
    broadcast assign, batch×survivors-per-cell join, batch-only
    closure. Production shape: the persisted model's k already
    encodes the budget; a daily batch pays O(batch) regardless of
    corpus size."""
    emb = t["embeddings"]
    corpus = emb.filter(~F.expr(_BATCH_WHERE))
    batch = emb.filter(F.expr(_BATCH_WHERE))
    k = derive_k(corpus.count(), target_cell=_INC_TARGET_CELL)
    out = semdedup_incremental_survivors(
        corpus,
        batch,
        k=k,
        iters=_SEMDEDUP["iters"],
        dim=_SEMDEDUP["dim"],
        threshold=_SEMDEDUP["threshold"],
    )
    return out.select(
        "vec_id",
        "label",
        "reason",
        "kept",
        F.lit(k).cast("long").alias("derived_k"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# ann_ivfpq_recall_curve_served_filtered (third r16 draft)
# ---------------------------------------------------------------------------


def _ivfpq_recall_curve_served_filtered_oracle_sql() -> str:
    """DuckDB twin: one full build+probe derived table per nprobe —
    each the UNCHANGED ``ivfpq_oracle_sql`` text with ``fit_where``
    excluding the batch (the served leakage contract) and
    ``candidate_where`` restricting BOTH the ADC scoring set and the
    exact ground truth to the metadata-filtered rows — recall
    aggregated per curve point."""
    from .queries_round8 import _QVEC_ID

    points = []
    for np_ in _RECALL_NPROBES:
        inner = ivfpq_oracle_sql(
            dim=64,
            nprobe=np_,
            topk=_TOPK,
            query_vec_id=_QVEC_ID,
            exact_k=_TOPK,
            fit_where=f"NOT ({_SERVED_BATCH_WHERE})",
            candidate_where=_SERVED_FILTER_WHERE,
            **_IVFPQ,
        )
        points.append(
            f"""SELECT {np_} AS nprobe,
                CAST(COUNT(CASE WHEN in_exact_topk THEN 1 END) AS BIGINT)
                    AS hits
                FROM ({inner}) q{np_}"""
        )
    u = "\nUNION ALL\n".join(points)
    return f"""
    SELECT nprobe, hits,
           CAST(hits AS DOUBLE) / {float(_TOPK)} AS recall
    FROM ({u})
    ORDER BY nprobe
    """


def _ann_ivfpq_recall_curve_served_filtered_draft(spark, t):
    """The r16 query body: the r15 served+filtered pipeline (corpus-
    only model, labels stored in the index rows, cell-partitioned
    write, frozen-model batch append, metadata predicate inside the
    PartitionFilter-pruned probe scan) swept across the nprobe curve
    — build/write/append ONCE, one filter+fold+TakeOrdered probe per
    point against the read-back. Ground truth = exact top-k among
    rows passing the SAME predicate; the query vector resolves from
    the full corpus."""
    from .queries_round8 import _QVEC_ID

    emb = t["embeddings"]
    labels = emb.select("vec_id", "label")
    corpus = emb.filter(~F.expr(_SERVED_BATCH_WHERE))
    batch = emb.filter(F.expr(_SERVED_BATCH_WHERE))
    cents, books, corpus_index = ivfpq_build(corpus, **_IVFPQ)
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ivfpq_curve_servfilt_{os.getpid()}",
    )
    # ADVICE r14 #4 hygiene (the r15 served/filtered precedent): clear
    # any stale pid-collision residue before the overwrite+append pair
    shutil.rmtree(path, ignore_errors=True)
    corpus_index.join(labels, "vec_id").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(path)
    ivfpq_encode_batch(batch, cents, books, m=_IVFPQ["m"]).join(
        labels, "vec_id"
    ).write.partitionBy("cell").mode("append").parquet(path)
    back = (
        spark.read.parquet(path)
        .withColumn("cell", F.col("cell").cast("long"))
        .filter(F.expr(_SERVED_FILTER_WHERE))
    )
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == _QVEC_ID).head()["embedding"]
    ]
    exact = _exact_topk_flags(
        emb.filter(F.expr(_SERVED_FILTER_WHERE)), q, _TOPK
    )
    # r17 (guide §2.4): the four per-point probes fused into ONE
    # read-back scan + one window (the metadata predicate rides the
    # same scan; a point whose probed cells hold zero eligible rows
    # still reports hits=0); the filtered exact ground truth appears
    # once instead of once per point. Row-identical by the
    # probe-prefix property (ivfpq_recall_curve).
    return ivfpq_recall_curve(
        back, cents, books, q, _RECALL_NPROBES, _TOPK, exact
    )


# ---------------------------------------------------------------------------
# Round-16 registrations (the mechanical step: decoration only — the
# bodies and oracles above are the r15 staging, byte-identical; the
# threshold 0.2→0.4 funnel fix and the HUGEINT comparator pin landed
# while still staged, per the staging discipline).
# ---------------------------------------------------------------------------
from .registry import query  # noqa: E402

query(
    "corpus_pipeline_report",
    _corpus_pipeline_report_oracle_sql(),
)(_corpus_pipeline_report_draft)
query(
    "semdedup_survivors_incremental_budgeted",
    _semdedup_survivors_incremental_budgeted_oracle_sql(),
)(_semdedup_survivors_incremental_budgeted_draft)
query(
    "ann_ivfpq_recall_curve_served_filtered",
    _ivfpq_recall_curve_served_filtered_oracle_sql(),
)(_ann_ivfpq_recall_curve_served_filtered_draft)
