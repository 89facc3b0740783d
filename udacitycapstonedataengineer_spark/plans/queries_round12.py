"""Round-12 staging area: the r13 ``ann_ivfpq_recall_at_k``,
``text_kn_trigram_incremental``, and ``docs_lm_quality_score``
drafts.

NOT imported by ``plans.queries`` — nothing here registers. The r12
driver window is exactly full (flagship + 2 governance re-earns + the
47-query r07 cohort, VERDICT r11 #2), so no new query CAN take a slot
this round; capabilities land test-pinned with their oracles drafted
so the r13 registrations are mechanical:

- ``ann_ivfpq_recall_at_k`` (VERDICT r11 #5 pre-work): Spark side
  test-pinned since r11 (``operators/recall_eval.py``);
  ``test_recall_at_k_draft_oracle_parity`` validates the draft
  end-to-end against DuckDB at sf0.001.
- ``text_kn_trigram_incremental``: the r11 bigram merge discipline
  (queries_round11.kn_bigram_merge) extended one level down KN's
  recursion. The trigram statistics need TWO anti-join grains — new
  trigram TYPES move N1+(w1w2·)/N1+(·w2w3), and new (w2,w3) PAIRS
  (a strict subset) move N1+(w2·)/N1+(·w3)/N1+(··) — so the merge is
  the real proof that incremental maintenance survives the recursive
  continuation distributions. Oracle = the UNCHANGED full-corpus
  ``text_kn_trigram_prob`` SQL (hash equality IS the
  append-equals-rebuild proof, exactly as the bigram row did it).
- ``docs_lm_quality_score``: perplexity-shaped quality filtering
  over the driver-gated KN bigram LM, hash-safe via fixed-point
  per-document aggregation (see the section comment below).

Reference parity: the reference pipeline has no ANN/LM surface
(/root/reference/etl.py is a star-schema ETL); these extend the
similarity-search and text-analysis families SURVEY.md §2 adds
beyond it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ivfpq import ivfpq_build, ivfpq_oracle_sql
from ..operators.recall_eval import ivfpq_recall_at_k
from .queries_round8 import _IVFPQ, _NPROBE, _TOPK

# The pinned query sample: deterministic ids so the DuckDB twin can
# replay the exact ground truth per query. Includes the established
# _QVEC_ID (7) so one row cross-checks the registered recall curve's
# nprobe=2 point, plus three spread ids.
_RECALL_AT_K_QUERY_IDS = (3, 7, 11, 19)


def _ivfpq_recall_at_k_oracle_sql() -> str:
    """DuckDB twin of the sampled recall@k evaluation: one full
    build+probe derived table per sampled query id — each is the
    UNCHANGED ``ivfpq_oracle_sql`` text (the driver-gated
    ann_topk_ivfpq semantics) — aggregated to (query_vec_id, hits,
    recall). The per-query union is the recall-curve oracle shape
    with the loop over query ids instead of nprobe points."""
    points = []
    for qid in _RECALL_AT_K_QUERY_IDS:
        inner = ivfpq_oracle_sql(
            dim=64,
            nprobe=_NPROBE,
            topk=_TOPK,
            query_vec_id=qid,
            exact_k=_TOPK,
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


def _ann_ivfpq_recall_at_k_draft(spark, t):
    """The r13 query body: build once, evaluate the pinned sample via
    the one-pass multi-query ground truth + per-query ADC probes
    (operators/recall_eval.py — pinned bit-stable since r11)."""
    emb = t["embeddings"]
    cents, books, index = ivfpq_build(emb, **_IVFPQ)
    return ivfpq_recall_at_k(
        index,
        cents,
        books,
        emb,
        list(_RECALL_AT_K_QUERY_IDS),
        k=_TOPK,
        nprobe=_NPROBE,
    )


# ---------------------------------------------------------------------------
# text_kn_trigram_incremental (r13 draft)
# ---------------------------------------------------------------------------

# the same standing/batch split text_kn_bigram_incremental uses —
# n-grams never cross documents, so corpus + batch gram multisets
# partition the full corpus's exactly
_KN_TRI_BATCH_WHERE = "doc_id % 10 = 7"


def _doc_trigrams(docs):
    """(w1, w2, w3) per trigram occurrence — byte-identical semantics
    to the extraction inside the registered ``text_kn_trigram_prob``
    (queries_round10.py:124-148; that query's text is committed, so
    the staging copy lives here). The draft's end-to-end oracle
    parity test pins the two tokenizations together: any drift turns
    the sf0.001 hash red."""
    return (
        docs.select(
            F.expr(r"split(lower(trim(text)), '\\s+')").alias("toks")
        )
        .filter(F.expr("size(toks) >= 3"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2), i -> "
                    "struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2, "
                    "element_at(toks, i + 2) AS w3))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2", "g.w3")
        .filter(
            (F.col("w1") != "") & (F.col("w2") != "") & (F.col("w3") != "")
        )
    )


def kn_trigram_merge(s123, b123):
    """Merge a batch's trigram counts onto the standing KN trigram
    tables and return (m123, c12m, nc23m, nc2m, cont3m, typesm) — the
    post-merge statistics, exactly equal to a full rebuild's (pinned
    by ``test_kn_trigram_merge_equals_rebuild`` and the draft's
    oracle-hash parity).

    ``s123`` (w1, w2, w3, c_s) is the standing trigram-count table;
    ``b123`` (w1, w2, w3, c_b) the batch's. Occurrence counts merge
    additively; the TYPE-grain statistics live at TWO grains, each
    needing its own absent-from-standing set:

    - trigram grain (``newp`` = batch types absent from standing):
      moves n3p = N1+(w1w2·), nc23 = N1+(·w2w3), and nc2 = N1+(·w2·)
      (nc2 sums nc23 over w3, so every new trigram type adds 1);
    - (w2,w3) grain (``new23`` = the distinct middle-suffix pairs of
      ``newp`` absent from standing's pair set — a strict subset):
      moves n2p = N1+(w2·), cont3 = N1+(·w3), and n_types = N1+(··),
      which count distinct PAIRS, so a new trigram whose (w2,w3)
      already exists must not bump them.

    Cost is O(|batch types|) given the standing table: one
    trigram-grain anti-join, one pair-grain anti-join over the
    batch's pairs, then tiny per-w1w2/w2w3/w2/w3 aggregates — the
    100 TB corpus contributes only its persisted count table, never
    a rescan."""
    m123 = s123.join(b123, ["w1", "w2", "w3"], "full_outer").select(
        "w1",
        "w2",
        "w3",
        (
            F.coalesce("c_s", F.lit(0)) + F.coalesce("c_b", F.lit(0))
        ).alias("c123"),
    )
    # batch trigram types absent from standing. Persisted (guide §5 —
    # r17, VERDICT r16 next #5): the merge's two-grain statistics
    # consume this and the (w2,w3)-grain tables below from several
    # branches each; without the persist every branch re-derives its
    # subtree from the base count tables (snc23 alone was re-derived
    # 5× — a full standing-table pass + shuffle per branch).
    newp = b123.join(s123, ["w1", "w2", "w3"], "left_anti").persist()

    # (w1,w2) grain: occurrence total is additive, type count moves
    # only on new trigram types
    s12 = s123.groupBy("w1", "w2").agg(
        F.sum("c_s").alias("c12_s"), F.count(F.lit(1)).alias("n3p_s")
    )
    b12 = b123.groupBy("w1", "w2").agg(F.sum("c_b").alias("c12_b"))
    n12 = newp.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n3p_new"))
    c12m = (
        s12.join(b12, ["w1", "w2"], "full_outer")
        .join(n12, ["w1", "w2"], "full_outer")
        .select(
            "w1",
            "w2",
            (
                F.coalesce("c12_s", F.lit(0))
                + F.coalesce("c12_b", F.lit(0))
            ).alias("c12"),
            (
                F.coalesce("n3p_s", F.lit(0))
                + F.coalesce("n3p_new", F.lit(0))
            ).alias("n3p"),
        )
    )

    # (w2,w3) grain: nc23 counts distinct w1 contexts, so every new
    # trigram type adds 1 (both persisted — see the newp note)
    snc23 = (
        s123.groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).alias("nc23_s"))
        .persist()
    )
    nnc23 = (
        newp.groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).alias("nc23_new"))
        .persist()
    )
    nc23m = snc23.join(nnc23, ["w2", "w3"], "full_outer").select(
        "w2",
        "w3",
        (
            F.coalesce("nc23_s", F.lit(0)) + F.coalesce("nc23_new", F.lit(0))
        ).alias("nc23"),
    )
    # batch (w2,w3) pairs with NO standing trigram — the only rows
    # that move the pair-grain statistics (persisted: 3 consumers)
    new23 = nnc23.join(snc23, ["w2", "w3"], "left_anti").persist()

    # w2 grain: nc2 sums nc23 (additive in new trigram types), n2p
    # counts distinct (w2,w3) pairs (additive in new pairs only)
    snc2 = snc23.groupBy("w2").agg(
        F.sum("nc23_s").alias("nc2_s"), F.count(F.lit(1)).alias("n2p_s")
    )
    nnc2 = nnc23.groupBy("w2").agg(F.sum("nc23_new").alias("nc2_new"))
    n2 = new23.groupBy("w2").agg(F.count(F.lit(1)).alias("n2p_new"))
    nc2m = (
        snc2.join(nnc2, "w2", "full_outer")
        .join(n2, "w2", "full_outer")
        .select(
            "w2",
            (
                F.coalesce("nc2_s", F.lit(0)) + F.coalesce("nc2_new", F.lit(0))
            ).alias("nc2"),
            (
                F.coalesce("n2p_s", F.lit(0)) + F.coalesce("n2p_new", F.lit(0))
            ).alias("n2p"),
        )
    )

    # w3 grain + global: both count distinct (w2,w3) pairs
    scont3 = snc23.groupBy("w3").agg(F.count(F.lit(1)).alias("cont3_s"))
    ncont3 = new23.groupBy("w3").agg(F.count(F.lit(1)).alias("cont3_new"))
    cont3m = scont3.join(ncont3, "w3", "full_outer").select(
        "w3",
        (
            F.coalesce("cont3_s", F.lit(0))
            + F.coalesce("cont3_new", F.lit(0))
        ).alias("cont3"),
    )
    typesm = (
        snc23.select(F.count(F.lit(1)).alias("types_s"))
        .crossJoin(new23.select(F.count(F.lit(1)).alias("types_new")))
        .select((F.col("types_s") + F.col("types_new")).alias("n_types"))
    )
    return m123, c12m, nc23m, nc2m, cont3m, typesm


def _text_kn_trigram_incremental_draft(spark, t):
    """The r13 query body: standing corpus contributes only its
    persisted trigram-count table; the batch merges on
    (kn_trigram_merge) and the final smoothing is the UNCHANGED
    ``text_kn_trigram_prob`` shared float expression over the merged
    exact-integer counts. Oracle: the UNCHANGED full-corpus trigram
    SQL — hash equality proves append ≡ rebuild through BOTH
    recursion levels. Shuffles: trigram-grain counts + the two
    anti-joins, then the usual tiny join-backs — per-ingest cost is
    O(batch grams + batch types), never a corpus rescan."""
    docs = t["documents"]
    corpus = docs.filter(~F.expr(_KN_TRI_BATCH_WHERE))
    batch = docs.filter(F.expr(_KN_TRI_BATCH_WHERE))
    # persisted: in production s123 IS a standing parquet table and
    # b123 a materialized batch aggregate; here each feeds several
    # downstream branches that would otherwise replay explode+count
    s123 = (
        _doc_trigrams(corpus)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c_s"))
        .persist()
    )
    b123 = (
        _doc_trigrams(batch)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c_b"))
        .persist()
    )
    m123, c12m, nc23m, nc2m, cont3m, typesm = kn_trigram_merge(s123, b123)
    d = F.lit(0.75)
    p_bi = (
        (F.col("nc23").cast("double") - d) / F.col("nc2").cast("double")
    ) + (
        ((d * F.col("n2p").cast("double")) / F.col("nc2").cast("double"))
        * (F.col("cont3").cast("double") / F.col("n_types").cast("double"))
    )
    p_tri = (
        (F.col("c123").cast("double") - d) / F.col("c12").cast("double")
    ) + (
        ((d * F.col("n3p").cast("double")) / F.col("c12").cast("double"))
        * p_bi
    )
    return (
        m123.join(c12m, ["w1", "w2"])
        .join(nc23m, ["w2", "w3"])
        .join(nc2m, "w2")
        .join(cont3m, "w3")
        .crossJoin(F.broadcast(typesm))
        .select(
            "w1",
            "w2",
            "w3",
            F.col("c123").alias("c_trigram"),
            F.col("c12").alias("c_context"),
            p_tri.alias("kn_prob"),
        )
        .orderBy(F.desc("kn_prob"), "w1", "w2", "w3")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# docs_lm_quality_score (r13 draft)
# ---------------------------------------------------------------------------
# LM-scored quality filtering — the CCNet/perplexity-filter shape
# (Wenzek et al. 2020): score each document by how well the corpus
# language model predicts it, then the LOWEST-scoring documents are
# the filter candidates. Here the model is the driver-gated
# interpolated KN bigram LM (text_kn_bigram_prob's exact statistics),
# and the per-document aggregate is hash-safe by construction: each
# bigram OCCURRENCE contributes floor(kn_prob · 10⁹) — a BIGINT
# quantization of a double both engines compute bit-identically — so
# the per-doc sum is an exact integer under any shuffle order (the
# functions/exact.py discipline; a float sum would be
# partition-order-dependent, a log-based perplexity would hinge on
# libm ulp parity). Documents with no bigram (< 2 tokens) are not
# scoreable and are excluded by the inner join.

_LM_SCORE_SCALE = 1_000_000_000
_LM_SCORE_BOTTOM = 40


def _docs_lm_quality_score_oracle_sql() -> str:
    return rf"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    bgd AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
        WHERE toks[i] != '' AND toks[i + 1] != ''
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bgd GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                  count(*) AS n1p FROM c12 GROUP BY w1),
    cont AS (SELECT w2, count(*) AS cont FROM c12 GROUP BY w2),
    ty AS (SELECT count(*) AS n_types FROM c12),
    knp AS (
        SELECT w1, w2,
               ((CAST(c12.c12 AS DOUBLE) - 0.75) / CAST(c1.c1 AS DOUBLE))
               + (((0.75 * CAST(c1.n1p AS DOUBLE)) / CAST(c1.c1 AS DOUBLE))
                  * (CAST(cont.cont AS DOUBLE)
                     / CAST(ty.n_types AS DOUBLE))) AS kn_prob
        FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN ty
    ),
    perdoc AS (
        SELECT bgd.doc_id,
               count(*) AS n_bigrams,
               CAST(SUM(CAST(FLOOR(knp.kn_prob * {_LM_SCORE_SCALE})
                             AS BIGINT)) AS BIGINT) AS q_sum
        FROM bgd JOIN knp USING (w1, w2)
        GROUP BY bgd.doc_id
    )
    SELECT doc_id, n_bigrams,
           CAST(q_sum AS DOUBLE)
               / ({_LM_SCORE_SCALE}.0 * CAST(n_bigrams AS DOUBLE))
               AS lm_score
    FROM perdoc
    ORDER BY lm_score ASC, doc_id
    LIMIT {_LM_SCORE_BOTTOM}
    """


def _docs_lm_quality_score_draft(spark, t):
    """The r13 query body: corpus KN bigram stats (the registered
    text_kn_bigram_prob expression, bit-identical on both engines),
    quantized per occurrence and summed per document as exact
    BIGINTs; bottom-N lowest-scoring documents are the quality-filter
    candidates. Shuffles: bigram-grain count + the two tiny stat
    join-backs (the LM itself), one bigram-grain join of occurrences
    to kn_prob, one doc-grain aggregate, then TakeOrdered(N) — in
    production the LM table is the standing artifact the KN ingest
    already maintains, so scoring a new batch is O(batch bigrams)."""
    from .queries_round8 import _doc_bigrams

    bgd = _doc_bigrams(t["documents"])
    c12 = bgd.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("cont"))
    types = c12.select(F.count(F.lit(1)).alias("n_types"))
    kn = (
        (F.col("c12").cast("double") - F.lit(0.75))
        / F.col("c1").cast("double")
    ) + (
        (
            (F.lit(0.75) * F.col("n1p").cast("double"))
            / F.col("c1").cast("double")
        )
        * (F.col("cont").cast("double") / F.col("n_types").cast("double"))
    )
    knp = (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select("w1", "w2", kn.alias("kn_prob"))
    )
    perdoc = (
        bgd.join(knp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.floor(F.col("kn_prob") * F.lit(_LM_SCORE_SCALE)).cast(
                    "long"
                )
            ).alias("q_sum"),
        )
    )
    return (
        perdoc.select(
            "doc_id",
            "n_bigrams",
            (
                F.col("q_sum").cast("double")
                / (
                    F.lit(float(_LM_SCORE_SCALE))
                    * F.col("n_bigrams").cast("double")
                )
            ).alias("lm_score"),
        )
        .orderBy("lm_score", "doc_id")
        .limit(_LM_SCORE_BOTTOM)
    )
