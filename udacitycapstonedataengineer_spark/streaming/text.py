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
