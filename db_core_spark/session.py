"""SparkSession factory.

Local testing runs on local[$SPARK_GRAFT_CPUS] (default 32) in a single JVM;
the configuration below is chosen so the same code is correct on a large
multi-executor cluster: AQE handles runtime re-planning (partition coalescing,
skew joins, dynamic broadcast), shuffle partitions default to 2x cores locally
but should be sized to cluster cores x 2-3 in production, and the session
timezone is pinned to UTC so results are stable across environments (and match
the DuckDB oracle, which is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "db_core_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Settings rationale (all apply equally on a real cluster):
    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic sort-merge->broadcast conversion; essential at 100 TB where
      static stats are unreliable.
    - shuffle.partitions = 2x cores for local; a cluster deployment should
      override via spark-defaults (AQE coalescing makes over-provisioning cheap).
    - Arrow enabled: every pandas_udf / toPandas crosses the JVM<->Python
      boundary in columnar Arrow batches instead of pickled rows.
    - UTC session TZ: deterministic timestamp semantics; matches the oracle.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_parts = max(int(cpus) * 2, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/db_core_spark_warehouse"),
        )
        .config("spark.sql.legacy.parquet.nanosAsLong", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
