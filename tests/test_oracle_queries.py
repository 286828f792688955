"""Per-operator correctness: every registered query vs its DuckDB oracle at
sf0.001 (fast local gate; tools/check_oracle.py runs the same comparison at
the driver's sf0.01)."""

from __future__ import annotations

import pytest

from db_core_spark.registry import all_queries
from tests.conftest import SF_SMALL
from tools.check_oracle import compare_one

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    rq = QUERIES[name]
    if rq.oracle is None:
        # rows-only contract: must run and produce a stable schema
        df = rq.fn(spark, SF_SMALL)
        assert df.columns, f"{name} returned no columns"
        assert df.count() >= 0
        return
    ok, msg = compare_one(spark, duck, name, rq, SF_SMALL)
    assert ok, f"{name}: {msg}"


def test_no_hostile_oracle_output_types(duck):
    """Registry-wide audit: no oracle may emit HUGEINT or DECIMAL(p>15) —
    those survive fetchall() (exact Python ints) but round to float64 in the
    driver's pandas/arrow fetch, producing a hash mismatch the local gate
    can't see (the r6 simhash_buckets failure). DESCRIBE only plans, so this
    sweeps all oracles in seconds."""
    from tools.check_oracle import hostile_output_types

    offenders = {}
    for name, rq in QUERIES.items():
        if rq.oracle is None:
            continue
        bad = hostile_output_types(duck, rq.oracle)
        if bad:
            offenders[name] = bad
    assert not offenders, f"precision-lossy oracle output types: {offenders}"


def test_hostile_type_detector_catches_prefix_simhash(duck):
    """Regression: the pre-r7 simhash oracle shape (un-cast SUM of shifted
    BIGINTs -> HUGEINT) must be flagged; the CAST'd form must pass."""
    from tools.check_oracle import hostile_output_types

    pre_fix = "SELECT SUM(CAST(1 AS BIGINT) << 40) AS simhash FROM range(5)"
    bad = hostile_output_types(duck, pre_fix)
    assert bad and "HUGEINT" in bad[0][1].upper()

    fixed = "SELECT CAST(SUM(CAST(1 AS BIGINT) << 40) AS BIGINT) AS simhash FROM range(5)"
    assert hostile_output_types(duck, fixed) == []

    wide_dec = "SELECT CAST(1 AS DECIMAL(20,2)) AS x"
    assert hostile_output_types(duck, wide_dec)
    narrow_dec = "SELECT CAST(1 AS DECIMAL(12,2)) AS x"
    assert hostile_output_types(duck, narrow_dec) == []


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_events_interarrival_single_event_type_edge(spark, tmp_path):
    """A type with only ONE event has zero gaps — the n_gaps=0 branch of
    events_interarrival_stats that no sf fixture exercises (every fixture
    type has thousands of events). COUNT=0 must surface as NULL mean/max
    through the base aggregate AND as NULL p50/p95 through the quantile
    left join (the histogram pass emits no rows for an all-NULL-gap group),
    while a multi-event type in the same frame keeps exact interpolated
    quantiles. Cross-checked bit-for-bit against the registered DuckDB
    oracle on the same temp fixture."""
    import duckdb

    from db_core_spark.registry import all_queries
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", 10, "solo", 1.0, "{}"),
        (2, "2024-01-01 00:00:00", 11, "pair", 1.0, "{}"),
        (3, "2024-01-01 00:00:01.5", 12, "pair", 1.0, "{}"),
        (4, "2024-01-01 00:00:03.6", 13, "pair", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
              "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.coalesce(1).write.parquet(f"{tmp_path}/events.parquet")

    rq = all_queries()["events_interarrival_stats"]
    got = {
        r["event_type"]: (
            r["n_gaps"], r["mean_gap_s"], r["p50_gap_s"], r["p95_gap_s"],
            r["max_gap_s"],
        )
        for r in rq.fn(spark, str(tmp_path)).collect()
    }
    assert got["solo"] == (0, None, None, None, None)
    # gaps 1.5 s and 2.1 s: mean 1.8, p50 interpolates to 1.8,
    # p95 = 1.5 + 0.95*0.6 = 2.07 (exact integer-microsecond arithmetic)
    assert got["pair"] == (2, 1.8, 1.8, 2.07, 2.1)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = {
        r[0]: tuple(r[1:]) for r in con.execute(rq.oracle).fetchall()
    }
    assert got == want
