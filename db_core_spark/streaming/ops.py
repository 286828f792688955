"""Streaming operators: the same event-time semantics as the batch twins in
queries/streaming_batch.py, compiled against an unbounded source.

The reference has no streaming (SURVEY.md §2C — its only 'stream' is the
WAL); this surface is goal-derived. The streaming checkpointLocation plays
the role of the reference's checkpointer (src/system/checkpointer.rs:1-10):
bounded-state recovery of an unbounded computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type. Append-mode
    emits a window only once the watermark passes its end — the streaming
    finalization contract."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-based), finalized by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on (user_id, event_type) with watermark-bounded
    state (dropDuplicates keeps the first arrival; state expires past the
    watermark — unbounded-input-safe)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["user_id", "event_type"])


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running per-user
    event count + last-seen timestamp, emitted per micro-batch (update mode).
    The arbitrary-state API is the escape hatch for operators window
    aggregation can't express (reference parity: none needed, goal-derived)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: PLC0415

    output_schema = "user_id long, n_events long, last_seen timestamp"
    state_schema = "n long, last_seen timestamp"

    def update(key, pdfs, state: GroupState):
        n, last = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            mx = pd.to_datetime(pdf["ts"]).max()
            last = mx if last is None or mx > pd.Timestamp(last) else last
        state.update((n, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "last_seen": [last]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
