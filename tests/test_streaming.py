"""Structured Streaming twin: the readStream → watermark → window →
memory-sink path must agree with the batch tumbling-window plan on the
same finite input (SURVEY.md §2.7 extension surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.sources.readers import load_table
from udacitycapstonedataengineer_spark.streaming.events import (
    streaming_user_stats_stateful,
    streaming_window_counts,
    tumbling_window_agg,
)


def test_streaming_matches_batch(spark, sf_dir):
    batch = (
        tumbling_window_agg(load_table(spark, sf_dir, "events"), minutes=5)
        .select("window_start", "event_type", "n_events")
        .collect()
    )
    stream = streaming_window_counts(
        spark, sf_dir, minutes=5, query_name="t_stream_counts"
    ).collect()
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))
    assert {key(r): r.n_events for r in stream} == {
        key(r): r.n_events for r in batch
    }


def test_stateful_operator_matches_batch(spark, sf_dir):
    """applyInPandasWithState running per-user aggregates must equal
    the batch groupBy on the same finite input."""
    got = {
        r.user_id: (r.n_events, r.max_value)
        for r in streaming_user_stats_stateful(
            spark, sf_dir, query_name="t_user_stats"
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.max_value)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want
