"""Fixture-table catalog.

Tables are the driver-generated deterministic parquet fixtures documented in
TESTDATA.md / FIXTURES.md. At 100 TB scale these would be partitioned/bucketed
table locations; the loaders below stay declarative (``spark.read.parquet``) so
Catalyst gets predicate pushdown + column pruning on every scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that are safe to broadcast at ANY scale factor:
# region is fixed at 5 rows and nation at 25 rows regardless of SF (TPC-H
# semantics), so a broadcast hint on them is always correct, even at 100 TB.
ALWAYS_BROADCAST = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects. Read it as raw int64 nanos (legacy conf, runtime-settable) and
    convert to timestamp_ntz at microsecond precision — `ts DIV 1000` is exact
    integer division (a double divide would lose precision on ~1.7e18 nanos),
    and truncation matches DuckDB's nanos->micros read of the same file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
