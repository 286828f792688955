"""Batch-mode equivalents of the streaming operator surface (tumbling/
sliding/session windows, watermark late-drop, dedup) over the `events`
fixture, each with a DuckDB oracle. The same logic compiled against
readStream lives in db_core_spark.streaming (rows-only / pytest checked —
streaming state is not SQL-expressible; SURVEY.md §7.1 phase 4).

Window starts are output as epoch seconds (BIGINT) so value hashing is
immune to timestamp precision/timezone differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


def _epoch_secs(col):
    """Epoch seconds from a timestamp_ntz column (UTC session, JVM-side)."""
    return F.unix_timestamp(col.cast("timestamp")).cast("long")


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate (F.window in batch mode — identical
    semantics to the streaming query in db_core_spark.streaming)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            _epoch_secs(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - (k * INTERVAL '30 minutes') AS w_start, value
      FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
    )
    SELECT CAST(epoch(w_start) AS BIGINT) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM slid GROUP BY 1
    """,
    category="streaming",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in exactly 2
    windows. Spark's F.window(slideDuration) does the fan-out natively; the
    oracle materializes the same fan-out with an UNNEST cross join."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            _epoch_secs(F.col("window.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, event_id,
             SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM marked)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    category="streaming",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap via lag + cumulative
    session counter — the batch twin of F.session_window. Scales as one
    shuffle on user_id (window partition) + the final agg reusing it."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_secs = F.col("ts").cast("timestamp").cast("long")
    gap = ts_secs - F.lag(ts_secs).over(w)
    marked = e.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_no",
        F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", F.col("session_no").cast("long").alias("session_no")).agg(
        _epoch_secs(F.min("ts")).alias("session_start"),
        _epoch_secs(F.max("ts")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "stream_dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
    category="streaming",
)
def stream_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates semantics made deterministic: keep the
    earliest event per (user, type). In true streaming this is
    dropDuplicates with a watermark (state TTL); batch twin is a window."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            _epoch_secs(F.col("ts")).alias("first_ts"),
        )
    )


@query(
    "stream_watermark_latedrop",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
    kept AS (
      SELECT e.* FROM events e, mx
      WHERE e.ts >= mx.max_ts - INTERVAL '6 hours')
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM kept GROUP BY 1
    """,
    category="streaming",
)
def stream_watermark_latedrop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics in batch: drop events older than max(event time)
    minus the 6h watermark delay, then window-aggregate the survivors —
    what withWatermark('ts','6 hours') converges to over this bounded input."""
    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("max_ts"))
    kept = e.crossJoin(F.broadcast(mx)).filter(
        F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 6 HOURS")
    )
    return (
        kept.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(_epoch_secs(F.col("window.start")).alias("window_start"), "n_events")
    )


@query(
    "stream_static_enrich_batch",
    oracle="""
    SELECT e.event_type, c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_static_enrich_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stream_static_enrich (stream-static dim
    join), rolled up per (event_type, segment). The dim side broadcasts —
    in streaming it re-broadcasts per micro-batch, so the stream side is
    never shuffled."""
    from db_core_spark.streaming.ops import stream_static_enrich

    e = table(spark, sf_dir, "events")
    dim = table(spark, sf_dir, "customer")
    return (
        stream_static_enrich(e, dim)
        .groupBy("event_type", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "stream_stream_join_batch",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           ROUND(p.value, 4) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
    category="streaming",
)
def stream_stream_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stream_stream_join: click->purchase pairs
    within 1 hour per user. In streaming both sides are watermarked and the
    interval bound lets Spark expire join state — O(window) state, the only
    viable shape for unbounded sides."""
    from db_core_spark.streaming.ops import stream_stream_join

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    return stream_stream_join(clicks, purchases).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.round("purchase_value", 4).alias("purchase_value"),
    )


@query(
    "stream_left_outer_join_batch",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           ROUND(p.value, 4) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
    category="streaming",
)
def stream_left_outer_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stream_stream_left_outer: every click with
    its in-window purchase or nulls. Batch computes the full outer result
    directly; in streaming the null-padded rows emit with watermark+gap
    delay (finalization, pinned in tests/test_streaming.py)."""
    from db_core_spark.streaming.ops import stream_stream_left_outer

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    return stream_stream_left_outer(clicks, purchases).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.round("purchase_value", 4).alias("purchase_value"),
    )
