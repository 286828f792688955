"""Rotation ordering of the query registry (driver-evidence window).

The driver's correctness run grades the FIRST 50 entries of ``queries()``,
so emission order IS the evidence pipeline. Pins the r5-verdict staleness
rule: a historical ``err == "no_oracle"`` driver row counts as "checked"
only while the registration still lacks an oracle; once the query is
converted to a full oracle, the stale rows-only row must re-front the
window (behind errored-never-green names, ahead of never-checked breadth).
"""

from __future__ import annotations

import db_core_spark.registry as registry
from db_core_spark.registry import all_queries


def _order_with_history(monkeypatch, green, rows_only, errored):
    monkeypatch.setattr(
        registry,
        "_driver_history",
        lambda: (frozenset(green), frozenset(rows_only), frozenset(errored)),
    )
    return list(all_queries())


def test_stale_no_oracle_row_refronts_converted_query(monkeypatch):
    qs = all_queries()
    converted = next(n for n, rq in qs.items() if rq.oracle is not None)
    still_rows_only = next(n for n, rq in qs.items() if rq.oracle is None)
    green = set(qs) - {converted, still_rows_only}

    order = _order_with_history(
        monkeypatch, green, {converted, still_rows_only}, set()
    )
    # Converted query (rows-only history + oracle now registered) fronts.
    assert order[0] == converted
    # A query still registered rows-only keeps its checked status: it must
    # NOT outrank the fully-checked band's category ordering (i.e. it stays
    # out of the front-of-window evidence bands).
    assert order.index(still_rows_only) > 0


def test_errored_still_outranks_stale_conversion(monkeypatch):
    qs = all_queries()
    oracled = [n for n, rq in qs.items() if rq.oracle is not None]
    converted, errored_name = oracled[0], oracled[1]
    green = set(qs) - {converted, errored_name}

    order = _order_with_history(
        monkeypatch, green, {converted}, {errored_name}
    )
    assert order[0] == errored_name
    assert order[1] == converted


def test_live_history_fronts_r5_conversions():
    """On the real committed CORRECTNESS history, the five queries converted
    rows-only -> full-oracle in round 5 must lead the window until the driver
    hash-verifies them (this test self-neutralizes once that happens)."""
    green, rows_only, _ = registry._driver_history()
    qs = all_queries()
    expected_front = [
        n
        for n in (
            "minhash_lsh_pairs",
            "simhash_buckets",
            "agg_cms_heavy_hitters",
            "ann_lsh_topk",
            "ann_ivf_topk",
        )
        if n in rows_only and qs[n].oracle is not None
    ]
    order = list(qs)
    for i, name in enumerate(expected_front):
        assert order[i] == name, f"expected {name} at window position {i}"
