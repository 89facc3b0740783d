"""Round-11 query group.

- ann_ivfpq_recall_curve_served — the recall-vs-nprobe curve probed
  from the WRITTEN cell-partitioned index (VERDICT r10 #5): the
  production loop re-measures recall after appends against the
  parquet index ``ann_topk_ivfpq_served`` writes, not an in-memory
  build. Same oracle as ``ann_ivfpq_recall_curve`` — the driver gate
  proves written ≡ in-memory ≡ DuckDB for the whole curve, and
  ``test_ivfpq_recall_curve_served_partition_pruned`` asserts every
  probe point's scan carries a PartitionFilter on ``cell`` (each
  point reads nprobe/nlist of the index files).
- text_kn_bigram_incremental — append ≡ rebuild for the Kneser-Ney
  LM statistics (VERDICT r10 #6): the standing bigram-count table
  absorbs a new batch's counts ADDITIVELY, while the derived
  statistics merge with distinct-left-context care — continuation
  counts N1+(·w2), left-type counts N1+(w1·), and the global type
  count are NOT additive (a batch bigram already present in the
  standing table adds occurrences but no new type), so each merges
  as standing + |batch types absent from standing| via one
  bigram-grain anti-join. The oracle is the UNCHANGED full-corpus
  ``text_kn_bigram_prob`` SQL — hash equality IS the
  append-equals-rebuild proof (the BM25/IVF-PQ maintenance
  discipline applied to the LM family).

Reference parity: the reference pipeline has no ANN/LM surface
(/root/reference/etl.py is a star-schema ETL); these extend the
LLM-training-data families SURVEY.md §2 adds beyond it.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..operators.ivfpq import ivfpq_build, ivfpq_recall_curve
from .queries_round8 import _IVFPQ, _QVEC_ID, _TOPK, _doc_bigrams
from .queries_round9 import _exact_topk_flags
from .queries_round10 import _RECALL_NPROBES, _ivfpq_recall_curve_oracle_sql
from .registry import query


@query("ann_ivfpq_recall_curve_served", _ivfpq_recall_curve_oracle_sql())
def _ann_ivfpq_recall_curve_served(spark, t):
    # The recall-decay check as production runs it: after every append
    # the curve is re-measured against the WRITTEN index, because the
    # in-memory build no longer exists — the index is a parquet table
    # partitioned by cell (ann_topk_ivfpq_served's layout). Build once,
    # write once, read back, then one filter+fold+TakeOrdered probe per
    # nprobe point against the read-back; each point's `cell isin`
    # filter lands as a PartitionFilter so a point reads nprobe/nlist
    # of the files (plan-asserted in test_ivfpq.py). Same oracle as
    # ann_ivfpq_recall_curve: the driver gate proves the served curve
    # ≡ the in-memory curve ≡ DuckDB each round. pid-scoped path:
    # bench/driver re-runs overwrite in place, concurrent processes
    # never collide.
    emb = t["embeddings"]
    cents, books, index = ivfpq_build(emb, **_IVFPQ)
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ivfpq_curve_served_{os.getpid()}",
    )
    index.write.partitionBy("cell").mode("overwrite").parquet(path)
    back = spark.read.parquet(path).withColumn(
        "cell", F.col("cell").cast("long")
    )
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == _QVEC_ID).head()["embedding"]
    ]
    exact = _exact_topk_flags(emb, q, _TOPK)
    # r17 (guide §2.4): the four per-point probes fused into ONE
    # read-back scan (`cell isin` over the max-nprobe probe set stays
    # a PartitionFilter) + one window; the exact ground-truth subtree
    # appears once instead of once per point. Row-identical by the
    # probe-prefix property (ivfpq_recall_curve).
    return ivfpq_recall_curve(
        back, cents, books, q, _RECALL_NPROBES, _TOPK, exact
    )


# the standing/batch split at document grain — bigrams never cross
# documents, so corpus + batch bigram multisets partition the full
# corpus's exactly
_KN_BATCH_WHERE = "doc_id % 10 = 7"


def kn_bigram_merge(s12, b12):
    """Merge a batch's bigram counts onto the standing KN tables and
    return (m12, c1m, contm, typesm) — the post-merge statistics,
    exactly equal to a full rebuild's (pinned by the driver hash and
    ``test_kn_bigram_merge_equals_rebuild``).

    ``s12`` (w1, w2, c_s) is the standing bigram-count table; ``b12``
    (w1, w2, c_b) the batch's. Occurrence counts merge additively;
    the TYPE-grain statistics (n1p = N1+(w1·), cont = N1+(·w2),
    n_types = N1+(··)) are counts of DISTINCT bigram types, so a
    batch pair already present in the standing table must not bump
    them — each merges as standing + per-group count of the batch
    pairs ABSENT from standing (one bigram-grain left_anti join).
    Cost is O(|batch types|) given the standing table: the 100 TB
    corpus contributes only its persisted count tables, never a
    rescan."""
    m12 = (
        s12.join(b12, ["w1", "w2"], "full_outer")
        .select(
            "w1",
            "w2",
            (
                F.coalesce("c_s", F.lit(0)) + F.coalesce("c_b", F.lit(0))
            ).alias("c12"),
        )
    )
    # batch types absent from standing — the only rows that move the
    # type-grain statistics
    newp = b12.join(s12, ["w1", "w2"], "left_anti")
    s1 = s12.groupBy("w1").agg(
        F.sum("c_s").alias("c1_s"), F.count(F.lit(1)).alias("n1p_s")
    )
    b1 = b12.groupBy("w1").agg(F.sum("c_b").alias("c1_b"))
    n1 = newp.groupBy("w1").agg(F.count(F.lit(1)).alias("n1p_new"))
    c1m = (
        s1.join(b1, "w1", "full_outer")
        .join(n1, "w1", "full_outer")
        .select(
            "w1",
            (
                F.coalesce("c1_s", F.lit(0)) + F.coalesce("c1_b", F.lit(0))
            ).alias("c1"),
            (
                F.coalesce("n1p_s", F.lit(0))
                + F.coalesce("n1p_new", F.lit(0))
            ).alias("n1p"),
        )
    )
    scont = s12.groupBy("w2").agg(F.count(F.lit(1)).alias("cont_s"))
    ncont = newp.groupBy("w2").agg(F.count(F.lit(1)).alias("cont_new"))
    contm = (
        scont.join(ncont, "w2", "full_outer")
        .select(
            "w2",
            (
                F.coalesce("cont_s", F.lit(0))
                + F.coalesce("cont_new", F.lit(0))
            ).alias("cont"),
        )
    )
    typesm = (
        s12.select(F.count(F.lit(1)).alias("types_s"))
        .crossJoin(newp.select(F.count(F.lit(1)).alias("types_new")))
        .select((F.col("types_s") + F.col("types_new")).alias("n_types"))
    )
    return m12, c1m, contm, typesm


@query(
    "text_kn_bigram_incremental",
    # the UNCHANGED full-corpus text_kn_bigram_prob oracle: the Spark
    # side computes the statistics via the standing-table merge, so
    # hash equality against a single-pass rebuild IS the
    # append-equals-rebuild proof
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    bg AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
        WHERE toks[i] != '' AND toks[i + 1] != ''
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                  count(*) AS n1p FROM c12 GROUP BY w1),
    cont AS (SELECT w2, count(*) AS cont FROM c12 GROUP BY w2),
    ty AS (SELECT count(*) AS n_types FROM c12)
    SELECT w1, w2, c12.c12 AS c_bigram, c1.c1 AS c_left,
           ((CAST(c12.c12 AS DOUBLE) - 0.75) / CAST(c1.c1 AS DOUBLE))
           + (((0.75 * CAST(c1.n1p AS DOUBLE)) / CAST(c1.c1 AS DOUBLE))
              * (CAST(cont.cont AS DOUBLE) / CAST(ty.n_types AS DOUBLE)))
               AS kn_prob
    FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN ty
    ORDER BY kn_prob DESC, w1, w2
    LIMIT 30
    """,
)
def _text_kn_bigram_incremental(spark, t):
    # Incremental KN maintenance (VERDICT r10 #6): the standing corpus
    # contributes only its persisted bigram-count table; a new batch
    # merges its counts on (kn_bigram_merge) and every derived
    # statistic — c1, and the type-grain n1p/cont/n_types that need
    # the distinct-left-context anti-join — comes out exactly equal to
    # a full rebuild's, proven by hashing against the full-corpus
    # oracle. The final smoothing is the UNCHANGED text_kn_bigram_prob
    # shared float expression over the merged exact-integer counts.
    # Shuffles: two bigram-grain counts (corpus once in production,
    # batch per ingest), the anti-join + merge at bigram grain, then
    # the usual tiny w1/w2-grain join-backs — per-ingest cost is
    # O(batch grams + batch types), never a corpus rescan.
    docs = t["documents"]
    corpus = docs.filter(~F.expr(_KN_BATCH_WHERE))
    batch = docs.filter(F.expr(_KN_BATCH_WHERE))
    # persisted: in production s12 IS a standing parquet table and b12
    # a materialized batch aggregate; here each feeds 3-4 downstream
    # branches (merge, anti-join, per-w1/w2 aggregates) that would
    # otherwise replay the explode+count per consumer (the recompute-
    # amplification class PERF_NOTES r10 documents)
    s12 = (
        _doc_bigrams(corpus)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_s"))
        .persist()
    )
    b12 = (
        _doc_bigrams(batch)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_b"))
        .persist()
    )
    m12, c1m, contm, typesm = kn_bigram_merge(s12, b12)
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
    return (
        m12.join(c1m, "w1")
        .join(contm, "w2")
        .crossJoin(F.broadcast(typesm))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("c_bigram"),
            F.col("c1").alias("c_left"),
            kn.alias("kn_prob"),
        )
        .orderBy(F.desc("kn_prob"), "w1", "w2")
        .limit(30)
    )
