"""Drive a streaming query over a bounded staged source to completion and
return the collected sink — the local test harness for the streaming surface
(memory sink + processAllAvailable, per Spark's own testing idiom)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def run_to_memory(df: DataFrame, output_mode: str, checkpoint_dir: str) -> DataFrame:
    name = "sink_" + uuid.uuid4().hex[:8]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")
