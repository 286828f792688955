"""Structured Streaming operator surface (SURVEY.md §7.1 phase 4): watermarked
tumbling/sliding/session windows, streaming dedup, stateful per-key counts.
Batch twins with DuckDB oracles live in db_core_spark.queries.streaming_batch;
this package compiles the same logic against readStream and is pytest-checked
(streaming state is not SQL-expressible)."""

from db_core_spark.streaming.ops import (  # noqa: F401
    dedup_stream,
    session_counts,
    session_overlap_join,
    sliding_counts,
    stateful_user_counts,
    stream_attribution_last_touch,
    stream_ewma_user_value,
    stream_incremental_dedup,
    stream_ohlc_bars,
    stream_into_database,
    stream_into_versioned_table,
    stream_static_enrich,
    stream_stream_join,
    tumbling_counts,
    tws_user_value_stats,
)
from db_core_spark.streaming.sources import (  # noqa: F401
    documents_stream,
    events_stream,
    stage_documents_files,
    stage_events_files,
)
from db_core_spark.streaming.runner import run_to_memory  # noqa: F401
