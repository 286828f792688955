"""Source/sink round-trips per format + atomic-publish semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_core_spark.sources import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_atomic,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)
from db_core_spark.tables import table
from tests.conftest import SF_SMALL


@pytest.fixture
def sample(spark):
    return (
        table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )


def normalized(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "t.parquet")
    write_parquet(sample, p)
    assert normalized(read_parquet(spark, p)) == normalized(sample)


def test_orc_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "t.orc")
    write_orc(sample, p)
    assert normalized(read_orc(spark, p)) == normalized(sample)


def test_csv_roundtrip_with_schema(spark, sample, tmp_path):
    p = str(tmp_path / "t.csv")
    write_csv(sample, p)
    assert normalized(read_csv(spark, p, sample.schema)) == normalized(sample)


def test_json_roundtrip_with_schema(spark, sample, tmp_path):
    p = str(tmp_path / "t.json")
    write_json(sample, p)
    assert normalized(read_json(spark, p, sample.schema)) == normalized(sample)


def test_partitioned_parquet_prunes(spark, sample, tmp_path):
    p = str(tmp_path / "part.parquet")
    write_parquet(sample, p, partition_by=["o_orderstatus"])
    df = read_parquet(spark, p).filter(F.col("o_orderstatus") == "O")
    # partition pruning: only the o_orderstatus=O directory is scanned
    import io, contextlib  # noqa: E401

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    # partition-pruned read matches the filtered original (partition column
    # moves to the end on read-back, so compare on an explicit column order)
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    assert normalized(df.select(*cols)) == normalized(
        sample.filter(F.col("o_orderstatus") == "O").select(*cols)
    )


def test_write_atomic_publishes_all_or_nothing(spark, sample, tmp_path):
    p = str(tmp_path / "atomic_out")
    write_atomic(sample, p)
    assert normalized(read_parquet(spark, p)) == normalized(sample)
    # second publish to the same path must fail, leaving the original intact
    with pytest.raises(OSError):
        write_atomic(sample.limit(1), p)
    assert len(normalized(read_parquet(spark, p))) == 500
    # no staging debris
    assert not [d for d in os.listdir(tmp_path) if d.startswith("._staging")]
