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
