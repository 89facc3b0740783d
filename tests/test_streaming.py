"""Structured Streaming twin: the readStream → watermark → window →
memory-sink path must agree with the batch tumbling-window plan on the
same finite input (SURVEY.md §2.7 extension surface)."""

from __future__ import annotations

from udacitycapstonedataengineer_spark.sources.readers import load_table
from udacitycapstonedataengineer_spark.streaming.events import (
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
