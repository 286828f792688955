"""Format connectors: parquet (the default — columnar, predicate pushdown,
page checksums ≈ the reference's block CRC32, datastore.rs:194-203), ORC,
CSV, JSON — always with explicit schemas (schema inference is an extra full
scan at 100 TB and nondeterministic under dirty data), plus an atomic
write-and-publish sink mirroring the reference's flush-on-commit contract
(instance.rs:102-111): data is never readable until completely written.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV requires an explicit schema — never inferSchema in production
    (extra scan + type drift)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "errorifexists", partition_by=None):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "errorifexists"):
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "errorifexists"):
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "errorifexists"):
    df.write.mode(mode).json(path)


def write_atomic(df: DataFrame, path: str, fmt: str = "parquet") -> str:
    """All-or-nothing publish: write to a hidden staging dir, then rename to
    the final path. Readers either see the complete dataset or none of it —
    single-writer commit semantics (for multi-writer tables use
    plans.VersionedTable, which layers the commit log on top).
    On object stores the rename becomes a manifest/conditional-put."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(parent, f"._staging-{uuid.uuid4().hex}")
    getattr(df.write.mode("errorifexists"), fmt)(staging)
    try:
        os.rename(staging, path)  # atomic on POSIX; fails if path exists
    except OSError:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise
    return path
