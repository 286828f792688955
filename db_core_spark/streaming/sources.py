"""Streaming sources over the `events` fixture.

The production analog is Kafka/Kinesis; for a self-contained local engine the
file source is the right Spark-native stand-in: `stage_events_files` splits
the events table into N time-ordered parquet files so `maxFilesPerTrigger=1`
yields a multi-micro-batch stream whose event-time watermark actually
advances between batches (needed to exercise append-mode window finalization
and late-data drop).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stage_events_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4, late_fraction: float = 0.0
) -> str:
    """Write events as n_files time-ordered parquet files under out_dir.

    With late_fraction > 0, that share of rows from each time slice is held
    back and appended to the LAST file instead — true late arrivals: their
    event time lags the watermark by the time the final micro-batch runs.
    """
    from db_core_spark.tables import table

    e = table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    bounds = e.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo, hi = bounds.lo, bounds.hi
    span = (hi - lo).total_seconds() or 1.0
    e = e.withColumn(
        "_slice",
        F.least(
            F.lit(n_files - 1),
            ((F.col("ts").cast("double") - F.lit(lo.timestamp())) / F.lit(span / n_files)).cast(
                "int"
            ),
        ),
    )
    if late_fraction > 0:
        # deterministically route a slice of earlier-time rows to the last file
        is_late = (F.abs(F.xxhash64("event_id")) % 1000 < int(late_fraction * 1000)) & (
            F.col("_slice") < n_files - 1
        )
        e = e.withColumn("_slice", F.when(is_late, F.lit(n_files - 1)).otherwise(F.col("_slice")))
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_files):
        (
            e.filter(F.col("_slice") == i)
            .drop("_slice")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"slice={i:02d}"))
        )
    # flatten: the file source needs a flat dir of files in arrival order
    flat = os.path.join(out_dir, "stream")
    os.makedirs(flat, exist_ok=True)
    for i in range(n_files):
        src = os.path.join(out_dir, f"slice={i:02d}")
        for name in sorted(os.listdir(src)):
            if name.endswith(".parquet"):
                os.replace(
                    os.path.join(src, name), os.path.join(flat, f"{i:02d}-{name}")
                )
    return flat


def events_stream(spark: SparkSession, stream_dir: str) -> DataFrame:
    """readStream over staged event files, one file per micro-batch."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", False)
        .parquet(stream_dir)
    )


def stage_documents_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Write the documents table as n_files id-ordered parquet files — the
    arrival layout for a document-ingest stream (each file is one crawl
    batch). Same flat-dir contract as stage_events_files."""
    from db_core_spark.tables import table

    d = table(spark, sf_dir, "documents")
    n = d.count()
    per = max(1, (n + n_files - 1) // n_files)
    d = d.withColumn(
        "_slice", F.least(F.lit(n_files - 1), (F.col("doc_id") / per).cast("int"))
    )
    os.makedirs(out_dir, exist_ok=True)
    flat = os.path.join(out_dir, "stream")
    os.makedirs(flat, exist_ok=True)
    for i in range(n_files):
        part = os.path.join(out_dir, f"slice={i:02d}")
        d.filter(F.col("_slice") == i).drop("_slice").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        for name in sorted(os.listdir(part)):
            if name.endswith(".parquet"):
                os.replace(os.path.join(part, name), os.path.join(flat, f"{i:02d}-{name}"))
    return flat


def documents_stream(spark: SparkSession, stream_dir: str) -> DataFrame:
    """File-source stream over staged document batches (1 file/trigger)."""
    from db_core_spark.tables import table as _table  # noqa: F401

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
