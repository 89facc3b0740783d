"""Event-stream processing over the ``events`` table.

The reference is batch-only (SURVEY.md §2.7), so this module is an
extension surface: the same logical operations (tumbling-window
aggregation, sessionization) expressed both as batch DataFrame plans
(oracle-checkable) and as Structured Streaming queries (readStream →
watermark → window → memory sink; exercised in tests).

Timestamps cross the oracle boundary as epoch MICROseconds: the
testdata stores nanos, Spark truncates to micros on load
(sources/readers.py) and DuckDB ``epoch_us`` truncates identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import money_sum


def tumbling_window_agg(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Per-(window, event_type) counts and exact value sums. Batch twin
    of the streaming groupBy(window(...)) below — identical results on
    the same finite input."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Classic lag + cumulative
    sum over a per-user window — one shuffle on user_id.

    All arithmetic on integer epoch-micros for engine parity."""
    gap_us = gap_minutes * 60 * 1_000_000
    per_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = (
        events.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
        )
        .withColumn("prev_us", F.lag("ts_us").over(per_user))
        .withColumn(
            "new_session",
            (F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > gap_us))
            .cast("int"),
        )
        .withColumn("session_seq", F.sum("new_session").over(per_user))
    )
    return (
        marked.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
        .withColumn(
            "duration_us", F.col("session_end_us") - F.col("session_start_us")
        )
    )


def _events_stream(spark: SparkSession, sf_dir: str):
    """File-source stream over the events table (schema from the
    parquet footer, nanos→micros fix applied post-scan)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from ..sources.readers import _arrow_field_to_spark

    path = os.path.join(sf_dir, "events.parquet")
    footer = pq.read_schema(path)
    fields, ns_cols = [], []
    for f in footer:
        dt, fix = _arrow_field_to_spark(f.type)
        fields.append(T.StructField(f.name, dt, True))
        if fix:
            ns_cols.append(f.name)
    # the file stream source wants a directory; testdata tables are
    # single files, so stream the parent dir with a glob filter (on a
    # cluster this would be the landing directory new files arrive in)
    stream = (
        spark.readStream.schema(T.StructType(fields))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for c in ns_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return stream


def streaming_user_stats_stateful(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "user_stats_stateful",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running event count and max event value, state carried
    across micro-batches. This is the arbitrary-state path for logic
    window/sessionize built-ins can't express (entity-level lifetime
    aggregates, CDC-style upserts, fraud counters).

    State is one row per user_id — at 100 TB the state store shards by
    the groupBy key across executors; nothing here is driver-side.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("mx", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # update-mode memory sink appends one row per (user, trigger); the
    # finite single-file source yields one trigger, so rows are final
    return spark.sql(
        f"SELECT user_id, max(n_events) AS n_events, max(max_value) AS max_value "
        f"FROM {query_name} GROUP BY user_id"
    )


def stream_static_enrich(
    spark: SparkSession,
    sf_dir: str,
    dim: DataFrame,
    query_name: str = "stream_enriched",
) -> DataFrame:
    """Stream–static join: enrich the event stream with a static
    dimension on event_type. The static side is broadcast to every
    task per micro-batch — the streaming twin of the engine's
    broadcast dim joins, and the standard shape for joining a Kafka
    stream against reference data. No stream-side shuffle; state-free.
    """
    enriched = (
        _events_stream(spark, sf_dir)
        .join(F.broadcast(dim), "event_type", "left")
        .groupBy("event_type", "type_weight")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def foreach_batch_upsert(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    landing_dir: str | None = None,
) -> int:
    """foreachBatch sink: per micro-batch, dedup the batch and write
    it to ``out_dir/batch_id=<id>`` partitioned by event_type.
    foreachBatch is the escape hatch for sinks Structured Streaming
    lacks natively (JDBC upserts, MERGE INTO, multi-table writes); the
    batch handle is a plain DataFrame so every batch operator is
    available.

    Exactly-once EFFECT = checkpoint replay × idempotent write: after
    a crash between the sink write and the commit-log record, the
    engine re-runs the same epoch with the SAME batch_id — and because
    each batch overwrites its own ``batch_id=<id>`` directory (never
    blind-appends to the table root), the replay lands byte-identical
    instead of double-applying. Pinned by
    tests/test_streaming.py::test_foreach_batch_crash_replay_does_not_double_apply,
    which deletes the commit marker to force a real replay.

    ``landing_dir``, if given, streams a parquet landing directory
    (new files = new batches) instead of the sf events table, so tests
    can deliver batches across restarts. Returns the number of batches
    the sink applied during THIS run (0 on a pure-recovery restart
    with nothing new and nothing to replay).
    """
    applied: list[int] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.dropDuplicates(["event_id"])
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )
        applied.append(batch_id)

    if landing_dir is not None:
        import glob as _glob

        import pyarrow.parquet as _pq
        from pyspark.sql import types as _T

        from ..sources.readers import _arrow_field_to_spark as _a2s

        sample = sorted(_glob.glob(f"{landing_dir}/*.parquet"))[0]
        fields, ns_cols = [], []
        for fld in _pq.read_schema(sample):
            dt, fix = _a2s(fld.type)
            fields.append(_T.StructField(fld.name, dt, True))
            if fix:
                ns_cols.append(fld.name)
        src = spark.readStream.schema(_T.StructType(fields)).parquet(
            landing_dir
        )
        for c in ns_cols:
            src = src.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    else:
        src = _events_stream(spark, sf_dir)

    q = (
        src.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )
    q.awaitTermination()
    return len(applied)


def windowed_append_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Append-mode watermarked tumbling-window aggregation over a file
    landing directory, one file per trigger. Append mode emits a window
    only once its end falls behind the watermark — finalized, immutable
    output — and rows arriving later than the watermark are DROPPED,
    never retro-applied. That drop contract is what bounds state at
    100 TB: without it the store must keep every window forever.
    Verified in tests/test_streaming.py::test_watermark_drops_late_data.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_window_counts(
    spark: SparkSession,
    sf_dir: str,
    minutes: int = 5,
    watermark: str = "10 minutes",
    query_name: str = "event_window_counts",
) -> DataFrame:
    """True Structured Streaming path: file source → watermark →
    tumbling window → complete-mode memory sink, driven to completion
    synchronously. On a cluster the source/sink swap for Kafka/Delta;
    the transformation is identical."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def streaming_dedup_within_watermark(
    spark: SparkSession,
    source_dir: str,
    schema,
    dedup_cols: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup — the incremental-ingest twin of
    ``operators.dedup.exact_dedup_keep_canonical``: each arriving
    document is admitted once per content fingerprint.

    Uses ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``:
    plain streaming dropDuplicates keeps every key it has ever seen in
    the state store, which grows without bound on a 100 TB firehose.
    The watermarked variant evicts fingerprint state once the event
    clock passes first-seen + watermark — bounded state, with the
    documented contract that a duplicate arriving later than the
    watermark horizon can re-emit (downstream batch dedup
    ``dedup_incremental_anti`` is the backstop; this stage exists to
    kill the near-time duplicate storm cheaply at the edge).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        stream.withColumn("fingerprint", fp)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(dedup_cols or ["fingerprint"])
    )


def stream_stream_click_purchase(
    spark: SparkSession,
    sf_dir: str,
    minutes: int = 10,
    query_name: str = "stream_click_purchase",
) -> DataFrame:
    """Stream–stream interval join: attribute every purchase to the
    click(s) by the same user within the preceding ``minutes``.

    Both sides carry watermarks, so the join STATE IS BOUNDED: a
    buffered click can be dropped once the purchase-side watermark
    passes click_ts + interval (Spark derives the state-eviction bound
    from the time-range condition — without the range predicate the
    buffers would grow forever). Inner join + both-side watermarks is
    the append-mode-safe configuration. At scale the join shuffles both
    streams on user_id once; state lives in the state store, sized by
    the interval, not the stream length.
    """
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", f"{2 * minutes} minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", f"{2 * minutes} minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {minutes} MINUTES")),
        "inner",
    ).select("c_user", "click_id", "purchase_id")
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def batch_click_purchase(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Batch twin of stream_stream_click_purchase (same semantics, one
    equi-join on user plus the time-range residual)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {minutes} MINUTES")),
        "inner",
    ).select("c_user", "click_id", "purchase_id")


def streaming_user_totals_tws(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_user_totals_tws",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-user running purchase totals via the Spark-4
    ``transformWithStateInPandas`` StatefulProcessor API — the
    successor to applyInPandasWithState: typed named state (ValueState
    here; ListState/MapState/timers available), Arrow-batched, and
    REQUIRING the RocksDB state store, which keeps per-key state on
    local disk instead of executor heap — the difference between
    bounded and OOM at 100 TB key cardinality. Money accumulates in
    exact integer cents (the same order-independence discipline as the
    batch engine's functions/exact.py).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_purchases", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = 0, 0
            if self._totals.exists():
                prev = self._totals.get()
                n, cents = int(prev[0]), int(prev[1])
            for pdf in rows:
                n += len(pdf)
                # HALF-UP cents, matching the engine's F.round
                # discipline — pandas .round() is banker's half-even
                # and diverges from the batch twin on exact .5 cents
                # (ADVICE r2). floor(x+0.5) is half-up for positives.
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100.0 + 0.5)
                    .astype("int64")
                    .sum()
                )
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_purchases": [n], "cents": [cents]}
            )

        def close(self) -> None:
            pass

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        purchases = _events_stream(spark, sf_dir).filter(
            F.col("event_type") == "purchase"
        )
        out = purchases.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        writer = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .trigger(availableNow=True)
        )
        if checkpoint_dir is not None:
            # a DURABLE checkpoint makes the RocksDB state itself
            # queryable afterwards via read_tws_value_state
            writer = writer.option("checkpointLocation", checkpoint_dir)
        q = writer.start()
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return spark.table(query_name)


def read_tws_value_state(
    spark: SparkSession,
    checkpoint_dir: str,
    state_var: str = "totals",
) -> DataFrame:
    """Query a transformWithState store OFFLINE with the Spark-4
    ``statestore`` batch reader: per-key state (here the ValueState of
    streaming_user_totals_tws) as a plain DataFrame, no stream
    restart, no state dump job. The ops story at scale: inspect /
    audit / backfill from live streaming state directly — state is
    data, not a black box. Returns (key struct, value struct,
    partition_id)."""
    return (
        spark.read.format("statestore")
        .option("stateVarName", state_var)
        .load(checkpoint_dir)
    )


def streaming_user_recent_k_tws(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    query_name: str = "stream_user_recent_k_tws",
) -> DataFrame:
    """Per-user bounded recent-history via ``transformWithStateInPandas``
    ListState: keep only the LAST ``k`` purchases per user (by event
    time), the feature-store pattern that serves "user context" to
    inference without unbounded state. Complements
    streaming_user_totals_tws (ValueState) by exercising the second
    TWS state type end-to-end: ListState.get/put, RocksDB-backed, the
    state per key bounded at k rows BY CONSTRUCTION — at 100 TB key
    cardinality that bound, not the watermark, is what caps state size.

    Deterministic contract (batch twin = per-user top-k by
    (ts, event_id) desc): incoming rows merge with stored state and
    re-rank by (ts_us, event_id), so arrival order never matters.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("recency_rank", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
        ]
    )

    class RecentK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._recent = handle.getListState("recent", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            items: list[tuple[int, int]] = [
                (int(r[0]), int(r[1])) for r in self._recent.get()
            ]
            for pdf in rows:
                items.extend(
                    zip(
                        pdf["event_id"].astype("int64"),
                        pdf["ts_us"].astype("int64"),
                    )
                )
            # newest first; (ts, event_id) is a total order so the
            # result is arrival-order-independent
            items.sort(key=lambda it: (it[1], it[0]), reverse=True)
            items = items[:k]
            self._recent.put([(eid, ts) for eid, ts in items])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(items),
                    "event_id": [eid for eid, _ in items],
                    "ts_us": [ts for _, ts in items],
                    "recency_rank": list(range(1, len(items) + 1)),
                }
            )

        def close(self) -> None:
            pass

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        purchases = (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        )
        out = purchases.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RecentK(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        q = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return spark.table(query_name)


def batch_user_recent_k(events: DataFrame, k: int = 3) -> DataFrame:
    """Batch twin of streaming_user_recent_k_tws: per-user top-k
    purchases by (ts, event_id) desc with a recency rank."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        .withColumn("recency_rank", F.row_number().over(w))
        .filter(F.col("recency_rank") <= k)
    )


def streaming_daily_distinct_hll(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_daily_hll",
) -> DataFrame:
    """Streaming per-day distinct-user ESTIMATES via mergeable HLL
    sketches — the streaming twin of operators/sketches.py::
    hll_daily_distinct. The point is the algebra: HLL register-max
    merge is commutative and associative, so the streaming partial
    aggregation (arbitrary arrival/merge order across micro-batches)
    must land on the IDENTICAL sketch — and estimate — as the batch
    one-pass build. That equality is what makes sketch state safe in
    long-running streams: no drift, no order sensitivity, bounded
    bytes per window."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est_distinct")
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "est_distinct",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_session_timeout_tws(
    spark: SparkSession,
    chunk_dir: str,
    gap_minutes: int = 30,
    query_name: str = "stream_session_timeout_tws",
) -> DataFrame:
    """Timer-driven gap sessionization via ``transformWithStateInPandas``
    — the last two TWS primitives this engine hadn't exercised:
    **MapState** (per-session event-type counts, a keyed sub-map per
    grouping key) and **event-time timers** (``registerTimer`` /
    ``handleExpiredTimer``), on top of ValueState for the open
    session. Completes the Spark-4 stateful surface next to
    streaming_user_totals_tws (ValueState) and
    streaming_user_recent_k_tws (ListState).

    Semantics (the batch twin ``batch_session_timeout`` computes the
    same thing from ``sessionize``): a user's session closes when

    - a LATER event of the same user arrives past the gap
      (``closed_by='event'`` — detected inline in handleInputRows), or
    - the event-time watermark passes ``last_event + gap``
      (``closed_by='timer'`` — the registered timer fires in
      handleExpiredTimer). A stale timer (one superseded by newer
      events that extended the session) re-checks expiry against
      current state and is ignored.

    ``chunk_dir`` holds time-ordered parquet chunks; the stream
    processes them one file per micro-batch (``maxFilesPerTrigger=1``)
    so the watermark actually ADVANCES between batches — the condition
    under which timers fire at all. At scale the same operator runs
    unchanged on a kafka/file landing stream; state is RocksDB-backed
    so open-session cardinality is a disk, not heap, bound.
    """
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    from pyspark.sql import types as T
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from ..sources.readers import _arrow_field_to_spark

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("n_types", T.LongType()),
            T.StructField("closed_by", T.StringType()),
        ]
    )
    sess_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    type_key_schema = T.StructType([T.StructField("event_type", T.StringType())])
    type_val_schema = T.StructType([T.StructField("cnt", T.LongType())])

    class SessionTimeout(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState("sess", sess_schema)
            self._by_type = handle.getMapState(
                "by_type", type_key_schema, type_val_schema
            )

        def _emit(self, key, closed_by: str):
            start_us, last_us, n = self._sess.get()
            n_types = sum(1 for _ in self._by_type.keys())
            self._sess.clear()
            self._by_type.clear()
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [int(start_us)],
                    "session_end_us": [int(last_us)],
                    "n_events": [int(n)],
                    "n_types": [int(n_types)],
                    "closed_by": [closed_by],
                }
            )

        def _bump_type(self, event_type: str, by: int) -> None:
            prev = 0
            if self._by_type.containsKey((event_type,)):
                prev = int(self._by_type.getValue((event_type,))[0])
            self._by_type.updateValue((event_type,), (prev + by,))

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows)).sort_values(["ts_us", "event_id"])
            if self._sess.exists():
                start_us, last_us, n = (int(x) for x in self._sess.get())
            else:
                start_us = last_us = -1
                n = 0
            for ts_us, etype in zip(pdf["ts_us"], pdf["event_type"]):
                ts_us = int(ts_us)
                if n > 0 and ts_us - last_us > gap_us:
                    # same-user event past the gap closes the session
                    # inline — no timer round-trip needed
                    self._sess.update((start_us, last_us, n))
                    yield self._emit(key, "event")
                    n = 0
                if n == 0:
                    start_us = ts_us
                last_us = ts_us
                n += 1
                self._bump_type(str(etype), 1)
            self._sess.update((start_us, last_us, n))
            # one live timer per key: re-arm at the new expiry
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_us // 1000 + gap_ms)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._sess.exists():
                return
            _, last_us, _ = (int(x) for x in self._sess.get())
            # stale-timer guard: only close if this timer is the
            # session's CURRENT expiry (newer events re-armed later)
            if expiredTimerInfo.getExpiryTimeInMs() >= last_us // 1000 + gap_ms:
                yield self._emit(key, "timer")

        def close(self) -> None:
            pass

    first_chunk = sorted(
        f for f in os.listdir(chunk_dir) if f.endswith(".parquet")
    )[0]
    footer = pq.read_schema(os.path.join(chunk_dir, first_chunk))
    fields, ns_cols = [], []
    for f in footer:
        dt, fix = _arrow_field_to_spark(f.type)
        fields.append(T.StructField(f.name, dt, True))
        if fix:
            ns_cols.append(f.name)

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = (
            spark.readStream.schema(T.StructType(fields))
            .option("maxFilesPerTrigger", "1")
            .parquet(chunk_dir)
        )
        for c in ns_cols:
            ev = ev.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
        ev = (
            ev.withWatermark("ts", "0 seconds")
            .select(
                "user_id",
                "event_id",
                "event_type",
                F.unix_micros("ts").alias("ts_us"),
                "ts",
            )
        )
        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=SessionTimeout(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
        q = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return spark.table(query_name)


def batch_session_timeout(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin of streaming_session_timeout_tws: gap sessions with
    distinct-type counts and the deterministic close reason — a
    session followed by a later session of the same user closed on
    that event's arrival ('event'); each user's final session closed
    on watermark expiry ('timer')."""
    gap_us = gap_minutes * 60 * 1_000_000
    per_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
        .withColumn("prev_us", F.lag("ts_us").over(per_user))
        .withColumn(
            "new_session",
            (
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > gap_us)
            ).cast("int"),
        )
        .withColumn("session_seq", F.sum("new_session").over(per_user))
    )
    sessions = marked.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
    )
    last_seq = Window.partitionBy("user_id")
    return sessions.withColumn(
        "closed_by",
        F.when(
            F.col("session_seq") == F.max("session_seq").over(last_seq),
            F.lit("timer"),
        ).otherwise(F.lit("event")),
    ).drop("session_seq")


def streaming_heavy_hitter_candidates_tws(
    spark: SparkSession,
    sf_dir: str,
    shards: int = 8,
    capacity: int = 128,
    query_name: str = "stream_mg_candidates_tws",
    landing_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming Misra-Gries candidate maintenance — the streaming twin
    of ``operators/heavyhitters.mg_partition_candidates``.

    Items shard by a hash of the item (each item lives in exactly ONE
    shard), and each shard keeps a ``capacity``-bounded MG summary in
    TWS ListState. The guarantee composes exactly as in batch: an item
    with global share ≥ θ has share ≥ θ in at least one shard, so with
    capacity+1 > 1/θ the union of shard summaries is a SUPERSET of the
    θ-heavy items at every point in the stream. Downstream, the same
    two-pass recipe applies — exact-count the candidates, never the
    full key space. State is bounded at shards·capacity rows total BY
    CONSTRUCTION, independent of key cardinality — the property that
    makes this viable where a streaming ``groupBy(item).count()``
    would hold every key ever seen.

    Returns (shard, item, cnt_lb) rows ACCUMULATED ACROSS BATCHES: the
    memory sink in update mode appends every batch's emissions, and
    each batch re-emits a shard's full current summary, so a
    multi-batch run holds one row per (shard, item) PER EMITTING BATCH
    — earlier rows carry stale cnt_lb values. Callers must treat the
    result as a candidate SET (distinct items), never sum or aggregate
    cnt_lb across rows; for the latest bound per item take the LAST
    emission (rows have no batch column — re-run single-batch, or use
    the batch twin, if per-item bounds matter). cnt_lb is the MG
    residual count, a LOWER bound on the item's true shard count
    (undercount ≤ N_shard/(capacity+1)); exactness comes from the
    verify pass, not from this number.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("item", T.StringType()),
            T.StructField("cnt_lb", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    class MGShard(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._summ = handle.getListState("summ", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            summary: dict[str, int] = {
                str(r[0]): int(r[1]) for r in self._summ.get()
            }
            for pdf in rows:
                for item, cnt in pdf["item"].value_counts().items():
                    summary[item] = summary.get(item, 0) + int(cnt)
                if len(summary) > capacity:
                    dec = sorted(summary.values(), reverse=True)[capacity]
                    summary = {
                        i: c - dec for i, c in summary.items() if c > dec
                    }
            self._summ.put(list(summary.items()))
            items = sorted(summary.items())
            yield pd.DataFrame(
                {
                    "shard": [key[0]] * len(items),
                    "item": [i for i, _ in items],
                    "cnt_lb": [c for _, c in items],
                }
            )

        def close(self) -> None:
            pass

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        if landing_dir is not None:
            # multi-batch delivery: a parquet landing dir, optionally
            # throttled to N files per micro-batch so tests exercise
            # summary MERGING across batches, not just one pass
            import glob as _glob

            import pyarrow.parquet as _pq
            from pyspark.sql import types as _T

            from ..sources.readers import _arrow_field_to_spark as _a2s

            sample = sorted(_glob.glob(f"{landing_dir}/*.parquet"))[0]
            fields, ns_cols = [], []
            for fld in _pq.read_schema(sample):
                dt, fix = _a2s(fld.type)
                fields.append(_T.StructField(fld.name, dt, True))
                if fix:
                    ns_cols.append(fld.name)
            reader = spark.readStream.schema(_T.StructType(fields))
            if max_files_per_trigger:
                reader = reader.option(
                    "maxFilesPerTrigger", max_files_per_trigger
                )
            src = reader.parquet(landing_dir)
            for c in ns_cols:
                src = src.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                )
        else:
            src = _events_stream(spark, sf_dir)
        items = src.select(
            F.get_json_object("props", "$.k")
            .cast("long")
            .cast("string")
            .alias("item")
        ).withColumn("shard", F.pmod(F.xxhash64("item"), F.lit(shards)))
        out = items.groupBy("shard").transformWithStateInPandas(
            statefulProcessor=MGShard(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        q = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return spark.table(query_name)


def streaming_seen_users_ttl_tws(
    spark: SparkSession,
    landing_dir: str,
    ttl_ms: int,
    query_name: str,
    checkpoint_dir: str,
    out_dir: str,
) -> DataFrame:
    """Per-user "seen before?" state with a TTL — the last TWS state
    primitive (state TTL) after ValueState/ListState/MapState/timers.

    The pattern is the bounded-memory membership window behind
    streaming dedup and attribution: remember a key for ``ttl_ms`` of
    processing time, then the store forgets it on its own — state size
    tracks the ACTIVE key set, not every key ever seen, which is the
    difference between bounded and unbounded state at 100 TB key
    cardinality (the TTL does at the store level what watermarks do at
    the operator level). Emits one row per user per batch:
    ``is_new`` = no live state when the batch arrived.

    Reads a parquet landing directory as a file stream (new files =
    new batches) so tests can deliver multiple batches across restarts
    of the same checkpoint; sinks via foreachBatch parquet-append
    (the memory sink cannot recover a checkpoint, foreachBatch can)
    and returns the rows written to ``out_dir`` by THIS run — which is
    why ``out_dir`` must be empty or absent on entry (asserted below):
    the sink appends, so a reused directory would fold prior runs'
    rows into the return value. Restart tests reuse the CHECKPOINT
    across runs and give each run a fresh ``out_dir``.
    """
    import glob as _glob
    import os as _os

    if _os.path.isdir(out_dir) and any(
        not e.startswith((".", "_")) for e in _os.listdir(out_dir)
    ):
        raise ValueError(
            f"out_dir {out_dir} is not empty: the return contract is "
            "'rows written by THIS run' — pass a fresh directory"
        )

    import pandas as pd
    import pyarrow.parquet as pq
    from pyspark.sql import types as T
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from ..sources.readers import _arrow_field_to_spark

    sample = sorted(_glob.glob(f"{landing_dir}/*.parquet"))[0]
    footer = pq.read_schema(sample)
    fields, ns_cols = [], []
    for f in footer:
        dt, fix = _arrow_field_to_spark(f.type)
        fields.append(T.StructField(f.name, dt, True))
        if fix:
            ns_cols.append(f.name)
    stream = (
        spark.readStream.schema(T.StructType(fields)).parquet(landing_dir)
    )
    for c in ns_cols:
        stream = stream.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
        )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("is_new", T.BooleanType()),
            T.StructField("n_in_batch", T.LongType()),
        ]
    )

    class SeenWithTTL(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # the TTL rides on the state itself: the store drops the
            # value ttl_ms after its last update, no operator code
            self._seen = handle.getValueState(
                "seen", "n long", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            for pdf in rows:
                n += len(pdf)
            is_new = not self._seen.exists()
            prev = 0 if is_new else int(self._seen.get()[0])
            self._seen.update((prev + n,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "is_new": [is_new],
                    "n_in_batch": [n],
                }
            )

        def close(self) -> None:
            pass

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = stream.select("user_id").groupBy(
            "user_id"
        ).transformWithStateInPandas(
            statefulProcessor=SeenWithTTL(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="ProcessingTime",  # TTL requires a clock
        )
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(out_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .queryName(query_name)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        # availableNow + ProcessingTime timeMode does NOT self-
        # terminate: after the data batches the engine keeps running
        # empty "no new data but cleaning up state" maintenance
        # batches while any un-expired TTL state remains (hours, for
        # long TTLs). Drain the DATA explicitly — wait until the
        # source reports nothing available and ≥1 batch ran — then
        # stop; TTL eviction is the store's job, not this query's.
        import time as _time

        deadline = _time.monotonic() + 120
        while _time.monotonic() < deadline:
            # require a batch that actually CONSUMED rows, not just
            # any progress: under a loaded machine the first progress
            # entry can be an empty maintenance batch reported while
            # the file source is still listing — breaking on it
            # stopped the query before the data batch committed and
            # the final out_dir read crashed (full-suite flake,
            # round 12)
            consumed = any(
                getattr(p, "numInputRows", 0) > 0
                for p in (q.recentProgress or [])
            )
            if consumed and not q.status["isDataAvailable"]:
                break
            _time.sleep(0.5)
        q.stop()
        try:
            q.awaitTermination()
        except Exception as exc:  # noqa: BLE001
            # stopping mid-maintenance can interrupt an empty cleanup
            # batch's state commit (CANNOT_COMMIT) — benign by
            # construction here: the DATA batches committed before the
            # drain loop released (isDataAvailable went false), and a
            # lost cleanup batch only defers TTL eviction. Anything
            # else is a real failure.
            if "CANNOT_COMMIT" not in str(exc):
                raise
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return spark.read.parquet(out_dir)


def stream_stream_click_purchase_leftouter(
    spark: SparkSession,
    landing_dir: str,
    minutes: int = 10,
    query_name: str = "stream_click_purchase_lo",
) -> DataFrame:
    """LEFT-OUTER stream–stream interval join — the subtle half of the
    stream-join surface: matched rows emit like the inner join, but an
    UNMATCHED click can only emit (with null purchase columns) once
    the watermark proves no matching purchase can still arrive — i.e.
    after event time passes click_ts + interval + delay. Until then
    the click sits in join state; clicks near the head of the stream
    flush, clicks near the tail stay buffered until a later batch
    advances the clock. Tests deliver a far-future sentinel batch to
    flush everything, then compare against the batch left join.

    Reads a parquet landing dir (events schema) so batches can be
    delivered incrementally.
    """
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from ..sources.readers import _arrow_field_to_spark

    sample = sorted(_glob.glob(f"{landing_dir}/*.parquet"))[0]
    fields, ns_cols = [], []
    for f in pq.read_schema(sample):
        dt, fix = _arrow_field_to_spark(f.type)
        fields.append(T.StructField(f.name, dt, True))
        if fix:
            ns_cols.append(f.name)
    src = spark.readStream.schema(T.StructType(fields)).parquet(landing_dir)
    for c in ns_cols:
        src = src.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))

    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", f"{2 * minutes} minutes")
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", f"{2 * minutes} minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {minutes} MINUTES")
        ),
        "leftOuter",
    ).select("c_user", "click_id", "purchase_id")
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
