"""Round-15 staging area (two rounds ahead): the r17
``text_bm25_indexed_incremental``, ``text_bm25_indexed_served``, and
``events_sessionize_stream_served`` drafts.

NOT imported by ``plans.queries`` — nothing here registers. The
staging discipline runs ahead: oracles drafted + sf0.001 parity
pinned now, so a future registration is decoration-only. All three
reuse COMMITTED oracle texts unchanged — hash equality IS the proof:

- ``text_bm25_indexed_incremental``: BM25 index maintenance under the
  driver gate. The standing postings/stats tables are built from the
  CORPUS docs only, the new batch's postings are appended (postings
  are (term, doc) grain — disjoint doc sets union cleanly; dl is
  per-doc so no rewrite) and the corpus stats merge additively
  (``operators/retrieval.py::merge_bm25_stats`` — until now pinned
  only by pytest). Serving from the MERGED index under the UNCHANGED
  ``text_bm25_linear_topk`` oracle proves append ≡ rebuild ≡ scan ≡
  DuckDB — the KN-incremental / IVF-PQ-append discipline applied to
  the retrieval family. Production shape: a daily corpus append costs
  O(batch postings), the standing index is never rebuilt.
- ``text_bm25_indexed_served``: the postings index WRITTEN to parquet
  (range-partitioned + sorted by term so the per-query ``isin``
  lands on row-group statistics) and served from the read-back —
  the ann_topk_ivfpq_served discipline applied to retrieval: the
  driver gate proves the written index, not just the in-memory
  build. Same oracle as the scan twin.
- ``events_sessionize_stream_served``: the Spark-4 stateful streaming
  surface under the driver gate (the r14 ``text_kn_trigram_stream_
  served`` pattern applied to events): the events table rides a REAL
  ``transformWithStateInPandas`` gap-sessionization stream (MapState
  + event-time timers, ``streaming/events.py::streaming_session_
  timeout_tws``), far-future sentinel chunks push the final watermark
  so every real session closes deterministically, and the landed
  sessions are reshaped to the registered ``events_sessionize``
  output (session_seq by start order; per-session sum_value recovered
  by a carried-forward window assignment — no interval join). Hash
  equality against the UNCHANGED ``events_sessionize`` oracle proves
  the timer-driven stateful path ≡ batch gaps-and-islands ≡ DuckDB.

Reference parity: the reference pipeline has no retrieval/streaming
surface (/root/reference/etl.py is a star-schema ETL); these extend
the families SURVEY.md §2 adds.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.retrieval import (
    build_bm25_index,
    bm25_search_topk,
    merge_bm25_stats,
)

# the standing/batch split at document grain — the convention every
# incremental row uses
_BM25_BATCH_WHERE = "doc_id % 10 = 7"
_BM25_TERMS = ["join", "vector", "stream"]
_BM25_K = 15


def _text_bm25_indexed_incremental_draft(spark, t):
    """The r17 query body: corpus-only standing index + batch postings
    append + additive stats merge, served under the scan twin's
    oracle. Shuffles: the two tokenize/(doc,term) aggregates (corpus
    paid once at build time in production, batch O(batch)) and the
    doc-grain score aggregate over matched postings."""
    docs = t["documents"]
    corpus = docs.filter(~F.expr(_BM25_BATCH_WHERE))
    batch = docs.filter(F.expr(_BM25_BATCH_WHERE))
    postings_c, stats_c = build_bm25_index(corpus)
    postings_b, stats_b = build_bm25_index(batch)
    postings = postings_c.unionByName(postings_b)
    stats = merge_bm25_stats(stats_c, stats_b)
    return bm25_search_topk(postings, stats, _BM25_TERMS, k=_BM25_K)


def _text_bm25_indexed_served_draft(spark, t):
    """The r17 query body: the postings table written term-sorted
    (repartitionByRange + sortWithinPartitions so every parquet file
    covers a narrow term range — the ``isin`` probe skips whole files
    on row-group min/max), stats written alongside, both read back,
    serving touches only the read-back. At 100 TB the write is the
    one-off index job; every query after is pruned scan + broadcast
    df/stats + one doc-grain aggregate."""
    postings, stats = build_bm25_index(t["documents"])
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bm25_served_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    postings.repartitionByRange(8, "term").sortWithinPartitions(
        "term"
    ).write.mode("overwrite").parquet(os.path.join(root, "postings"))
    stats.write.mode("overwrite").parquet(os.path.join(root, "stats"))
    back_p = spark.read.parquet(os.path.join(root, "postings"))
    back_s = spark.read.parquet(os.path.join(root, "stats"))
    return bm25_search_topk(back_p, back_s, _BM25_TERMS, k=_BM25_K)


# ---------------------------------------------------------------------------
# events_sessionize_stream_served (third r17 draft)
# ---------------------------------------------------------------------------
# chunk fan: time-ordered micro-batches so the event-time watermark
# ADVANCES between batches (the condition under which TWS timers fire
# at all); two far-future sentinel chunks push the final watermark
# past every real session's expiry so the stream emits EVERY session
# deterministically (the test_tws_session_timeout_timers_match_batch
# staging recipe, made a query body).
_SESS_CHUNKS = 6
_SESS_GAP_MIN = 30


_SESS_SINK_SEQ = iter(range(10**9))


def _events_sessionize_stream_served_draft(spark, t):
    from datetime import timedelta

    from ..compat import ensure_protobuf_runtime, pbshim_dir
    from ..streaming.events import streaming_session_timeout_tws

    # Self-sufficient on a PLAIN SparkSession (the grading driver's):
    # (a) the TWS worker<->JVM state protocol is protobuf — bootstrap
    # the vendored runtime driver-side and ship the shim dir to the
    # python workers via sc.environment (per-function envVars, honored
    # even on an already-running JVM; get_spark sessions did this at
    # build time and the export is a no-op there);
    # (b) the staged chunks must be MICROS timestamps — a plain
    # session writes INT96 by default, which the stream source's
    # footer-derived schema cannot read back.
    if ensure_protobuf_runtime():
        env = spark.sparkContext.environment
        cur = env.get("PYTHONPATH", "")
        if pbshim_dir() not in cur.split(os.pathsep):
            env["PYTHONPATH"] = (
                pbshim_dir() + (os.pathsep + cur if cur else "")
            )
    ev = t["events"].select("event_id", "user_id", "event_type", "value", "ts")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_sess_stream_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    chunk_dir = os.path.join(root, "chunks")
    os.makedirs(chunk_dir)
    # calendar-range chunking: split the event span into _SESS_CHUNKS
    # contiguous date ranges (strictly increasing across chunks, so
    # the 0-second watermark never drops a row) and write each range
    # as ONE file in listing order. No global window — the two span
    # scalars are the only driver values. The per-chunk single-file
    # coalesce is staging cost, not serving cost: production replaces
    # this with the landing stream's natural time-partitioned cadence.
    t_min, t_max = ev.agg(F.min("ts"), F.max("ts")).head()
    span_days = max((t_max.date() - t_min.date()).days + 1, _SESS_CHUNKS)
    per_days = -(-span_days // _SESS_CHUNKS)
    chunk_col = F.least(
        (F.datediff(F.col("ts"), F.lit(t_min)) / per_days).cast("int"),
        F.lit(_SESS_CHUNKS - 1),
    )
    staged = ev.withColumn("chunk", chunk_col)

    def _stage_one(df, scratch: str, name: str) -> None:
        # (b) continued — MICROS timestamps, scoped to THIS write
        # (ADVICE r15 #3: a session-level set would bleed into every
        # later query in the same driver/bench session): capture the
        # prior value, set, write, restore in a finally.
        ts_conf = "spark.sql.parquet.outputTimestampType"
        prior = spark.conf.get(ts_conf, None)
        spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
        try:
            part_dir = os.path.join(root, scratch)
            df.coalesce(1).write.mode("overwrite").parquet(part_dir)
        finally:
            if prior is None:
                spark.conf.unset(ts_conf)
            else:
                spark.conf.set(ts_conf, prior)
        src = next(
            f for f in sorted(os.listdir(part_dir)) if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(part_dir, src), os.path.join(chunk_dir, name)
        )

    for i in range(_SESS_CHUNKS):
        _stage_one(
            staged.filter(F.col("chunk") == i).drop("chunk"),
            f"part{i}",
            f"chunk-{i:03d}.parquet",
        )
    # two far-future sentinel chunks advance the final watermark past
    # every real session's expiry — the user_id=-1 rows are dropped
    # from the result
    for j, days in enumerate((10, 20)):
        sentinel = spark.createDataFrame(
            [
                (
                    10**9 + j,
                    -1,
                    "sentinel",
                    0.0,
                    t_max + timedelta(days=days),
                )
            ],
            "event_id bigint, user_id bigint, event_type string,"
            " value double, ts timestamp",
        )
        _stage_one(
            sentinel, f"sent{j}", f"chunk-{_SESS_CHUNKS + j:03d}.parquet"
        )

    sessions = streaming_session_timeout_tws(
        spark,
        chunk_dir,
        gap_minutes=_SESS_GAP_MIN,
        # unique per invocation: the memory sink registers a temp view
        # under this name, and an in-process re-run (bench median-of-3)
        # must not collide with the previous run's view
        query_name=f"sess_stream_served_{os.getpid()}_{next(_SESS_SINK_SEQ)}",
    ).filter(F.col("user_id") != -1)
    # session-grain table (small): truncate the memory-sink lineage so
    # the marks union and the final session join don't self-join the
    # same MemoryPlan attributes (Spark raises "Conflicting
    # attributes" otherwise)
    sessions = sessions.localCheckpoint(eager=True)

    # reshape to the registered events_sessionize output: session_seq
    # by start order; sum_value recovered by assigning each event the
    # latest stream-landed session start at-or-before it (one union +
    # one carried-forward window — no interval join, doctor-clean)
    seq_w = Window.partitionBy("user_id").orderBy("session_start_us")
    sess = sessions.select(
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        F.row_number().over(seq_w).cast("long").alias("session_seq"),
    )
    starts = sess.select(
        "user_id",
        F.col("session_start_us").alias("ts_us"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("session_start_us").alias("mark"),
    )
    evs = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
        F.lit(None).cast("long").alias("mark"),
    )
    # session-start marks sort BEFORE events at the same timestamp
    # (null event_id first), so a session's first event sees its mark
    carry_w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", F.col("event_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        starts.unionByName(evs)
        .withColumn("session_start_us", F.last("mark", True).over(carry_w))
        .filter(F.col("event_id").isNotNull())
    )
    # money_sum: bit-identical to the registered sessionize's
    # sum_value (functions/exact.py — the oracle's
    # SUM(CAST(ROUND(value*100) AS BIGINT))/100.0)
    from ..functions.exact import money_sum

    values = assigned.groupBy("user_id", "session_start_us").agg(
        money_sum("value").alias("sum_value")
    )
    return (
        sess.join(values, ["user_id", "session_start_us"])
        .select(
            "user_id",
            "session_seq",
            "session_start_us",
            "session_end_us",
            "n_events",
            "sum_value",
            (
                F.col("session_end_us") - F.col("session_start_us")
            ).alias("duration_us"),
        )
        .orderBy("user_id", "session_seq")
    )
