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


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
