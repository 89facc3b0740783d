"""Structured Streaming twins for the text/LM maintenance surface.

``stream_kn_bigram_counts`` is the ingest loop behind
``text_kn_bigram_incremental`` (plans/queries_round11.py): arriving
documents land their bigram counts as APPEND-ONLY PARTIALS onto the
standing count table. Appending partials instead of read-modify-write
is the 100 TB-shaped choice: count tables are additively mergeable
(the sketch/rollup discipline — operators/sketches.py,
``rollup_incremental_merge``), so each micro-batch writes O(batch
types) rows with no read of the standing table at all, no overwrite
hazard, and compaction (``kn_counts_compact``) is one sum-groupBy a
nightly job runs when the partial count grows. The derived KN
statistics (c1/n1p/cont/n_types, the distinct-left-context merge)
come from ``kn_bigram_merge`` against the compacted table — proven
equal to a full rebuild by the round-11 driver gate and fuzz.

Reference parity: the reference pipeline has no streaming surface
(/root/reference/etl.py is a batch star-schema ETL); this extends the
LM family SURVEY.md §2 adds beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _batch_bigram_counts(docs: DataFrame) -> DataFrame:
    """(w1, w2, c): one micro-batch's bigram counts — the same
    tokenize/explode shape as plans.queries_round8._doc_bigrams
    (imported lazily there to keep streaming/ import-light); kept
    local so the stream has no plans-module dependency."""
    return (
        docs.select(
            F.expr(r"split(lower(trim(text)), '\\s+')").alias("toks")
        )
        .filter(F.expr("size(toks) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), i -> "
                    "struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def stream_kn_bigram_counts(
    doc_stream: DataFrame, table_path: str, checkpoint: str
):
    """Start the ingest stream: each micro-batch's bigram counts are
    appended to ``table_path`` as partial-count rows (w1, w2, c).
    Returns the StreamingQuery. Exactly-once per micro-batch comes
    from the checkpoint's offset log (the foreachBatch upsert-sink
    discipline, streaming/events.py)."""

    def _land(batch_df: DataFrame, _batch_id: int) -> None:
        _batch_bigram_counts(batch_df).write.mode("append").parquet(
            table_path
        )

    return (
        doc_stream.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def kn_counts_compact(spark: SparkSession, table_path: str) -> DataFrame:
    """(w1, w2, c12): the standing bigram-count table — partials
    summed. Readers that want the derived KN statistics feed this to
    ``plans.queries_round11.kn_bigram_merge`` (as the standing side);
    a maintenance job can also write the compacted frame back and
    truncate the partials."""
    return (
        spark.read.parquet(table_path)
        .groupBy("w1", "w2")
        .agg(F.sum("c").alias("c12"))
    )


# Compaction POLICY (VERDICT r11 #6): ``kn_counts_compact`` is the
# mechanism, this is the deterministic trigger that decides WHEN —
# the ``cell_budget.derive_k`` discipline applied to the partial
# table. Serving reads every partial row; the ideal table has one row
# per distinct bigram type, so partial_rows / distinct_types is the
# read amplification appends accumulate. Compacting at 2× bounds
# serving reads at twice optimal while keeping compaction frequency
# logarithmic in append count (each compaction resets the ratio to 1,
# so under steady appends the trigger fires when the table has
# re-doubled — never per-batch, never starved).
DEFAULT_MAX_AMPLIFICATION = 2.0


def kn_compaction_stats(spark: SparkSession, table_path: str) -> DataFrame:
    """One row (partial_rows, distinct_types): the two counts the
    trigger consumes, measured in a single aggregate over the partial
    table (no full compaction performed to decide)."""
    return spark.read.parquet(table_path).agg(
        F.count(F.lit(1)).alias("partial_rows"),
        F.count_distinct("w1", "w2").alias("distinct_types"),
    )


def kn_compact_due(
    partial_rows: int,
    distinct_types: int,
    max_amplification: float = DEFAULT_MAX_AMPLIFICATION,
) -> bool:
    """Deterministic in the two counts — re-deriving on the same
    snapshot always rules the same way (the ``derive_k`` contract)."""
    if distinct_types <= 0:
        return False
    return partial_rows > max_amplification * distinct_types


def kn_compact_if_due(
    spark: SparkSession,
    table_path: str,
    max_amplification: float = DEFAULT_MAX_AMPLIFICATION,
) -> tuple[bool, int, int]:
    """The nightly maintenance entry: measure, and when the trigger
    fires rewrite the partial table as one row per type (schema
    unchanged — (w1, w2, c) — so ingest appends and
    ``kn_counts_compact`` serving continue over the swapped table).
    Returns (compacted, partial_rows, distinct_types) as measured
    BEFORE any rewrite. The local swap is a directory rename; on an
    object store the same step is a manifest/version flip (the
    tokenshard sink's atomic-manifest pattern)."""
    row = kn_compaction_stats(spark, table_path).head()
    due = kn_compact_due(
        row["partial_rows"], row["distinct_types"], max_amplification
    )
    if due:
        _compact_swap(
            table_path,
            kn_counts_compact(spark, table_path).select(
                "w1", "w2", F.col("c12").alias("c")
            ),
        )
    return due, row["partial_rows"], row["distinct_types"]


def _compact_swap(table_path: str, compacted: DataFrame) -> None:
    """Write the compacted frame to a sibling temp dir, then swap it
    live with two renames (the local-FS variant of an object-store
    manifest flip — the tokenshard sink's atomic-manifest pattern)."""
    import shutil

    tmp = table_path.rstrip("/") + "__compacting"
    compacted.write.mode("overwrite").parquet(tmp)
    old = table_path.rstrip("/") + "__old"
    shutil.move(table_path, old)
    shutil.move(tmp, table_path)
    shutil.rmtree(old)


# --- trigram siblings (round 12) -------------------------------------
# The landing/compaction discipline one level down KN's recursion:
# trigram partials feed plans.queries_round12.kn_trigram_merge (the
# r13 text_kn_trigram_incremental draft) the same way bigram partials
# feed kn_bigram_merge. Same append-only O(batch types) writes, same
# 2× read-amplification trigger (kn_compact_due is grain-agnostic —
# it consumes two counts), same swap.


def _batch_trigram_counts(docs: DataFrame) -> DataFrame:
    """(w1, w2, w3, c): one micro-batch's trigram counts — the same
    tokenize/explode shape as the registered ``text_kn_trigram_prob``
    extraction (plans/queries_round10.py:124-148); kept local so the
    stream has no plans-module dependency.
    ``test_batch_trigram_counts_matches_doc_trigrams`` pins the two
    together (the ADVICE r11 #4 discipline)."""
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
            ).alias("tg")
        )
        .select("tg.w1", "tg.w2", "tg.w3")
        .filter(
            (F.col("w1") != "") & (F.col("w2") != "") & (F.col("w3") != "")
        )
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def stream_kn_trigram_counts(
    doc_stream: DataFrame, table_path: str, checkpoint: str
):
    """Start the trigram ingest stream: each micro-batch's counts are
    appended to ``table_path`` as partial-count rows (w1, w2, w3, c).
    Exactly-once per micro-batch comes from the checkpoint's offset
    log, as in ``stream_kn_bigram_counts``."""

    def _land(batch_df: DataFrame, _batch_id: int) -> None:
        _batch_trigram_counts(batch_df).write.mode("append").parquet(
            table_path
        )

    return (
        doc_stream.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def kn3_counts_compact(spark: SparkSession, table_path: str) -> DataFrame:
    """(w1, w2, w3, c123): the standing trigram-count table — partials
    summed; feeds ``kn_trigram_merge`` as the standing side."""
    return (
        spark.read.parquet(table_path)
        .groupBy("w1", "w2", "w3")
        .agg(F.sum("c").alias("c123"))
    )


def kn3_compaction_stats(spark: SparkSession, table_path: str) -> DataFrame:
    """One row (partial_rows, distinct_types) at trigram grain — the
    two counts ``kn_compact_due`` consumes."""
    return spark.read.parquet(table_path).agg(
        F.count(F.lit(1)).alias("partial_rows"),
        F.count_distinct("w1", "w2", "w3").alias("distinct_types"),
    )


def kn3_compact_if_due(
    spark: SparkSession,
    table_path: str,
    max_amplification: float = DEFAULT_MAX_AMPLIFICATION,
) -> tuple[bool, int, int]:
    """Trigram twin of ``kn_compact_if_due`` — same trigger, same
    swap, schema preserved as (w1, w2, w3, c)."""
    row = kn3_compaction_stats(spark, table_path).head()
    due = kn_compact_due(
        row["partial_rows"], row["distinct_types"], max_amplification
    )
    if due:
        _compact_swap(
            table_path,
            kn3_counts_compact(spark, table_path).select(
                "w1", "w2", "w3", F.col("c123").alias("c")
            ),
        )
    return due, row["partial_rows"], row["distinct_types"]
