"""Structured Streaming variants of the event pipeline (SURVEY.md §2.7)."""

from projectdatalake_spark.streaming.events import (  # noqa: F401
    dedup_keys_stream,
    dedup_within_watermark_stream,
    read_events_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    stream_stream_interval_join,
    stream_stream_interval_join_left,
    tumbling_window_agg,
)
