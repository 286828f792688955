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
    """Schema-adaptive events loader. The engine contract is `ts:
    timestamp_ntz` at microsecond precision regardless of the fixture's
    physical encoding, which has changed between driver rounds:

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so the
      ``nanosAsLong`` legacy conf (runtime-settable, a no-op for non-nanos
      files) surfaces it as int64 nanos; ``ts DIV 1000`` is exact integer
      division (a double divide would lose precision on ~1.7e18 nanos) and
      truncation matches DuckDB's nanos->micros read of the same file.
    - parquet TIMESTAMP(MICROS) (current fixtures): reads natively as
      timestamp / timestamp_ntz; just normalize to timestamp_ntz.

    Branching on the *observed* read dtype instead of hard-coding the layout
    mirrors the reference validating block magic/CRC on load rather than
    trusting it (/root/reference/src/storage/datastore.rs:194-203)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":  # nanos-as-long path (legacy TIMESTAMP(NANOS))
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    if ts_type != "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return raw


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
