"""Training-corpus assembly queries, round 2: sequence packing,
benchmark-contamination detection, and mixture sampling.

These are the steps BETWEEN a deduplicated corpus (plans/corpus.py)
and a tokenizer: pack documents into fixed-capacity training
sequences, prove the training set doesn't contain the eval set, and
resample sources to a target mixture. All three are pure native
expressions over integer/hash math, so every one is DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import H60, H60_SQL, SHINGLES_EXPR, TOKENS
from .registry import query

# DuckDB twins of the token/shingle expressions (see queries_dedup.py)
_TOKS_SQL = r"string_split_regex(lower(trim(text)), '\s+')"
_SHINGLES_SQL = (
    "list_distinct(list_transform("
    " generate_series(1, greatest(len(toks) - 2, 1)),"
    " i -> array_to_string(toks[i:i+2], ' ')))"
)

_PACK_CAPACITY = 512  # tokens per training sequence


@query(
    "docs_pack_sequences",
    f"""
    WITH counted AS (
        SELECT doc_id, source,
               len({_TOKS_SQL}) AS n_tokens
        FROM documents
    ),
    offs AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - n_tokens AS start_offset
        FROM counted
    )
    SELECT doc_id, source, n_tokens, start_offset,
           start_offset // {_PACK_CAPACITY} AS first_pack,
           (start_offset + n_tokens - 1) // {_PACK_CAPACITY} AS last_pack,
           (start_offset + n_tokens - 1) // {_PACK_CAPACITY}
               - start_offset // {_PACK_CAPACITY} + 1 AS n_packs
    FROM offs
    ORDER BY source, doc_id
    """,
)
def _docs_pack_sequences(spark, t):
    # concat-and-chunk sequence packing — the standard LLM-pretraining
    # layout: concatenate documents in a deterministic order, split at
    # fixed token boundaries, and record which packed sequence(s) each
    # document lands in. Everything is integer window math (cumulative
    # token offsets, truncating division == floor on non-negatives), so
    # the layout is bit-reproducible and oracled. The running sum is
    # per-SOURCE (each source is an independent stream); at 100 TB the
    # same plan shards further — per-file offsets plus a broadcast
    # prefix-sum of file totals, the standard two-pass distributed scan
    # — without changing any downstream pack ids.
    n_tokens = F.size(F.expr(TOKENS)).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cap = _PACK_CAPACITY
    offs = (
        t["documents"]
        .select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn(
            "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
    )
    first = F.expr(f"start_offset DIV {cap}")
    last = F.expr(f"(start_offset + n_tokens - 1) DIV {cap}")
    return offs.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        first.alias("first_pack"),
        last.alias("last_pack"),
        (last - first + 1).alias("n_packs"),
    ).orderBy("source", "doc_id")


@query(
    "docs_contamination_check",
    f"""
    WITH sh AS (
        SELECT doc_id, unnest(shingles) AS shingle
        FROM (SELECT doc_id, {_SHINGLES_SQL} AS shingles
              FROM (SELECT doc_id, {_TOKS_SQL} AS toks, text FROM documents))
    ),
    eval_set AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    ),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    per_doc AS (
        SELECT t.doc_id,
               count(*) AS n_shingles,
               CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_overlap
        FROM train t LEFT JOIN eval_set e ON t.shingle = e.shingle
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_shingles, n_overlap,
           CAST(n_overlap AS DOUBLE) / n_shingles AS contamination
    FROM per_doc WHERE n_overlap > 0
    ORDER BY doc_id
    """,
)
def _docs_contamination_check(spark, t):
    # benchmark decontamination — the step that keeps eval answers out
    # of the training set. The "benchmark" here is a deterministic
    # held-out slice (doc_id % 97 = 0); real use swaps in the actual
    # eval suite. Mechanism: 3-word shingles (shared expression with
    # the dedup pipelines) of the eval set, broadcast against the
    # training side's shingle stream; per-doc overlap count and ratio
    # (one exact integer division). At scale the eval shingle set is
    # small by construction (benchmarks are MBs, corpora are TBs) — a
    # broadcast, never a shuffle of the corpus side.
    sh = (
        t["documents"]
        .withColumn("shingles", F.expr(SHINGLES_EXPR.format(t=TOKENS)))
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    eval_set = F.broadcast(
        sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    ).withColumnRenamed("shingle", "eval_shingle")
    train = sh.filter(F.col("doc_id") % 97 != 0)
    per_doc = (
        train.join(
            eval_set, F.col("shingle") == F.col("eval_shingle"), "left_outer"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("eval_shingle").isNotNull(), 1).otherwise(0)
            ).alias("n_overlap"),
        )
    )
    return (
        per_doc.filter(F.col("n_overlap") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_shingles")).alias(
                "contamination"
            ),
        )
        .orderBy("doc_id")
    )


# Target mixture: per-source sampling rates in basis points (out of
# 10000). Sources absent from the map fall back to the default. The
# literals are embedded in BOTH engines' expressions.
_MIX_BP = {"src0": 10000, "src1": 7500, "src2": 5000, "src3": 2500}
_MIX_DEFAULT_BP = 1250


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN source = '{s}' THEN {bp}" for s, bp in sorted(_MIX_BP.items())
    )
    return f"CASE {arms} ELSE {_MIX_DEFAULT_BP} END"


@query(
    "corpus_mixture_sample",
    f"""
    WITH tagged AS (
        SELECT source,
               {H60_SQL.format(x="'mix|' || CAST(doc_id AS VARCHAR)")} % 10000
                   AS bucket,
               {_mix_case_sql()} AS rate_bp
        FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < rate_bp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
    FROM tagged
    GROUP BY source
    ORDER BY source
    """,
)
def _corpus_mixture_sample(spark, t):
    # source-mixture resampling — hit a target data mix (e.g. upweight
    # curated sources, downweight crawl) with a DETERMINISTIC keep
    # decision: the engine-portable 60-bit md5 hash of the doc id
    # against a per-source basis-point threshold. Reproducible across
    # runs/engines (same H60 scheme as the dedup pipelines), no RNG
    # state, no shuffle for the decision itself — the filter runs at
    # the scan. The query reports per-source kept/total so the realized
    # mix is auditable; the row-level variant is the same predicate as
    # a filter.
    bucket = F.expr(H60.format(x="concat('mix|', CAST(doc_id AS STRING))")) % 10000
    rate = F.lit(_MIX_DEFAULT_BP)
    for s, bp in sorted(_MIX_BP.items(), reverse=True):
        rate = F.when(F.col("source") == s, F.lit(bp)).otherwise(rate)
    return (
        t["documents"]
        .select("source", bucket.alias("bucket"), rate.alias("rate_bp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("bucket") < F.col("rate_bp"), 1).otherwise(0)
            ).alias("n_kept"),
        )
        .orderBy("source")
    )
