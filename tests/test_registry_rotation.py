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


def test_reverify_band_outranks_breadth_but_not_errored(monkeypatch):
    """A green query whose implementation changed (REVERIFY) re-enters the
    window immediately after errored-never-green names and ahead of stale
    conversions and never-checked breadth — changed plans must not carry
    stale driver evidence (ADVICE r6)."""
    qs = all_queries()
    oracled = [n for n, rq in qs.items() if rq.oracle is not None]
    errored_name = next(n for n in oracled if n not in registry.REVERIFY)
    converted = next(
        n for n in oracled if n not in registry.REVERIFY and n != errored_name
    )
    green = set(qs) - {errored_name, converted}

    # no green row since the change round -> every re-verify is live
    monkeypatch.setattr(registry, "_green_rounds", lambda: ({}, {}))
    order = _order_with_history(monkeypatch, green, {converted}, {errored_name})
    assert order[0] == errored_name
    band = set(registry.REVERIFY)
    k = len(band)
    assert set(order[1 : 1 + k]) == band  # the whole re-verify band next
    assert order[1 + k] == converted  # stale conversions follow


def test_reverify_self_neutralizes_on_later_green(monkeypatch):
    """A REVERIFY entry stops fronting once the driver re-greens the query
    in a round >= the change round — a forgotten entry cannot waste window
    slots forever."""
    qs = all_queries()
    reverify_name, since_round = next(iter(registry.REVERIFY.items()))
    green = set(qs)

    # every re-verify satisfied (green at exactly its change round) ->
    # pure category-priority order; no REVERIFY name at the window front
    monkeypatch.setattr(
        registry, "_green_rounds", lambda: (dict(registry.REVERIFY), {})
    )
    order = _order_with_history(monkeypatch, green, set(), set())
    first_cat = qs[order[0]].category
    assert registry.CATEGORY_PRIORITY.index(first_cat) == 0
    assert order[0] not in registry.REVERIFY
    # but a green round OLDER than the change round keeps this one live
    stale = dict(registry.REVERIFY)
    stale[reverify_name] = since_round - 1
    monkeypatch.setattr(registry, "_green_rounds", lambda: (stale, {}))
    order = _order_with_history(monkeypatch, green, set(), set())
    assert order[0] == reverify_name


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
    # errored-never-green and changed-implementation (REVERIFY) names sort
    # ahead of the stale-conversion band; skip past them before asserting
    _, _, errored = registry._driver_history()
    order = list(qs)
    off = sum(1 for n in order if n in errored or n in registry.REVERIFY)
    for i, name in enumerate(expected_front):
        assert order[off + i] == name, f"expected {name} at window position {off + i}"
