"""Physical-plan smell detection shared by tools/plan_report.py and the
plan-audit tests.

The headline detector is :func:`global_window_smells`: an ``Exchange
SinglePartition`` feeding a ``Window`` (directly or through Sort/Project)
means EVERY row of the window's input funnels through one task — the
classic last-stage scale-killer that a grep for CartesianProduct /
BatchEvalPython cannot see (the repo learned this the hard way: six
oracle-green queries shipped with exactly this shape before round 5's
two-pass prefix-rank sweep, `operators/prefixrank.py`).

A single-partition window is NOT a smell when its input is provably
bounded — a preceding limit / top-k (TakeOrderedAndProject) below the
exchange, or an aggregation whose GROUPING KEYS are themselves bounded:
no keys at all (global aggregate, one row) or a calendar/tile spine
(months, ventiles, bins — cardinality fixed by construction, not by data
volume). Those windows see O(spine) rows regardless of data scale.

An aggregate over a data-proportional key (per-user, per-order, per-doc)
does NOT exempt: its output grows with the data and the window still
funnels it through one task (r5-verdict tightening — the old any-aggregate
exemption would have passed a per-customer running total). Spine keys
whose column name doesn't reveal boundedness are whitelisted explicitly in
``SPINE_WHITELIST`` with a justification, so every exemption is auditable.
"""

from __future__ import annotations

import re

_TREE_NODE = re.compile(r"^([ :+|-]*)\*?\s*([A-Za-z][\w .]*?)\s+\((\d+)\)\s*$")
_SINGLE_PART = re.compile(
    r"^\((\d+)\) Exchange\s*\nInput[^\n]*\nArguments: SinglePartition", re.M
)
_DETAIL_BLOCK = re.compile(r"^\((\d+)\) ([A-Za-z][\w .]*?)(?: \[codegen[^\]]*\])?\s*$")
_KEYS_LINE = re.compile(r"^Keys(?: \[\d+\])?: \[(.*)\]\s*$")
_ATTR_REF = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")

# hard bounds below the exchange: output size fixed regardless of input
_LIMIT_BOUNDING = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "WindowGroupLimit",
)
_AGGREGATE_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
# nodes a Window's requirement passes through untouched
_PASSTHRU = {"Sort", "Project", "Filter", "WindowGroupLimit"}

# A grouping key counts as a bounded spine when its base column name (or the
# defining expression behind a Catalyst alias) names a calendar unit or a
# fixed-width tile/bin: those domains have cardinality set by the query
# (12 months, 20 ventiles, 64 bins), not by the data. Matching is by WHOLE
# WORD over underscore/digit-split tokens — a substring match would wrongly
# exempt 'candidate' (date), 'binary' (bin), 'combine' (bin) — plus a short
# list of compound function names that appear un-split in plan expressions.
# Calendar units and fixed-arity tiles ONLY — domains whose cardinality is
# bounded by CONSTRUCTION, independent of data volume. Generic enum-ish
# tokens (status, flag, level, class, variant, grade, stage) were removed
# (ADVICE r6): a free-form 'status' or per-entity 'risk_level' column is
# data-proportional, and name-matching them re-opened the any-aggregate
# hole. Enum-like grouping keys go through the auditable SPINE_WHITELIST
# with a written justification instead.
_BOUNDED_WORDS = frozenset(
    "year quarter month week day date dow hour minute period "
    "ventile decile quintile ntile tile bin".split()
)
_BOUNDED_COMPOUND = re.compile(
    r"(date_trunc|dayofweek|dayofmonth|dayofyear|weekofyear|to_date|"
    r"trunc\(|extract\()",
    re.I,
)
_WORD_SPLIT = re.compile(r"[^A-Za-z]+")


def _names_bounded_domain(text: str) -> bool:
    if _BOUNDED_COMPOUND.search(text):
        return True
    return any(w in _BOUNDED_WORDS for w in _WORD_SPLIT.split(text.lower()))


def _parse_tree(plan: str):
    """Parse the formatted-explain tree lines into id -> (name, parent_id).

    Tree lines read ``   +- Name (id)``; node-detail headers read
    ``(id) Name`` and do not match. Subquery trees parse the same way.
    """
    nodes: dict[int, tuple[str, int | None]] = {}
    stack: list[tuple[int, int]] = []  # (depth, id)
    for line in plan.splitlines():
        m = _TREE_NODE.match(line)
        if not m:
            if not line.strip():
                stack = []
            continue
        prefix, name, nid = m.group(1), m.group(2).strip(), int(m.group(3))
        depth = len(prefix) // 3
        while stack and stack[-1][0] >= depth:
            stack.pop()
        parent = stack[-1][1] if stack else None
        nodes[nid] = (name, parent)
        stack.append((depth, nid))
    return nodes


# Queries whose single-partition window runs over a spine that IS bounded by
# construction but whose key names don't reveal it to the _BOUNDED_KEY
# heuristic. Every entry carries its justification — the auditable escape
# hatch the r5 verdict asked for instead of the blanket aggregate exemption.
# Consumed by tools/plan_report.py and tests/test_plan_audits.py.
SPINE_WHITELIST: dict[str, str] = {
    "stats_chi2_type_by_segment": (
        "margin windows run over the contingency-cell frame keyed "
        "(event_type x c_mktsegment) — both enum domains (5x5 cells), so the "
        "cell count is fixed by the schema, not the event volume; the name "
        "'segment' stays out of _BOUNDED_KEY because C4-style text segments "
        "are data-proportional"
    ),
}


# Exact-percentile buffer audit (r8, the r7-verdict watch item that followed
# the events_interarrival_stats fix): ``F.percentile`` materializes a
# per-group DISTINCT-value buffer inside the aggregate — O(group rows)
# executor memory when the measure is continuous (microsecond latencies,
# interpolated doubles), the one state shape that cannot survive a 100 TB
# group. Every ``F.percentile`` call site under ``db_core_spark/queries/``
# must either be listed here with a written justification that its input
# domain is QUANTIZED (integer counts/days, 2-dp money — distinct values
# bounded by the domain, not the row count) or grouped finely enough that
# groups stay task-sized — or it must go through
# ``operators/quantile.bucketed_exact_quantiles`` instead.
# tests/test_plan_audits.py enumerates call sites by AST and fails on any
# site missing from (or stale in) this dict, pinning the class shut the way
# SPINE_WHITELIST does for single-partition windows. Keyed "file:function".
PERCENTILE_BUFFER_WHITELIST: dict[str, str] = {
    "aggregates.py:agg_median_iqr": (
        "l_quantity is a small-integer domain (1..50) and l_extendedprice "
        "is 2-dp money: per-returnflag distinct-value buffers are bounded "
        "by the quantized domain, not the row count"
    ),
    "aggregates.py:agg_winsorized_mean": (
        "o_totalprice is 2-dp money over a fixed price range: the global "
        "buffer holds <= 100 x range distinct values regardless of order "
        "count"
    ),
    "aggregates.py:agg_percentile_approx_error": (
        "the exact side of the exact-vs-sketch audit IS the query's "
        "purpose (run once at representative scale before switching to "
        "the sketch); l_extendedprice is 2-dp quantized anyway"
    ),
    "analytics.py:priority_sla_aging": (
        "days_to_ship is an integer day count bounded by the calendar "
        "span of the order book, not by line-item volume"
    ),
    "corpus.py:corpus_length_percentile_cutoffs": (
        "n_chars is an integer document length: distinct values bounded "
        "by the max document size, not the corpus size"
    ),
    "timeseries.py:quantile_bucket_features": (
        "l_extendedprice deciles over 2-dp money — quantized domain"
    ),
    "timeseries.py:anomaly_mad_robust": (
        "events.value is 2-dp quantized; the second pass's |value - med| "
        "shifts the same quantized domain by a per-group constant, so "
        "distinct deviations stay <= 2x the domain size"
    ),
}


_ATTR_REF_FULL = re.compile(r"([A-Za-z_][A-Za-z0-9_]*#\d+)")
_ALIAS_AS = re.compile(r" AS ([A-Za-z_][A-Za-z0-9_]*#\d+)")


def _aggregate_keys(plan: str) -> dict[int, list[str] | None]:
    """node id -> full ``name#id`` tokens of the aggregate's grouping keys.

    Parsed from the node-detail section (``(id) HashAggregate`` followed by
    ``Keys [n]: [...]``). ``[]`` means a keyless global aggregate (one output
    row); ``None`` means the Keys line was absent/unparsable (treated as
    unbounded — fail closed).
    """
    keys: dict[int, list[str] | None] = {}
    cur_id: int | None = None
    for line in plan.splitlines():
        m = _DETAIL_BLOCK.match(line)
        if m:
            name = m.group(2).strip()
            cur_id = int(m.group(1)) if any(a in name for a in _AGGREGATE_NODES) else None
            if cur_id is not None:
                keys.setdefault(cur_id, None)
            continue
        if cur_id is None:
            continue
        km = _KEYS_LINE.match(line)
        if km:
            keys[cur_id] = _ATTR_REF_FULL.findall(km.group(1))
            cur_id = None
    return keys


def _alias_defs(plan: str) -> dict[str, str]:
    """``name#id`` -> defining expression text, from every ``<expr> AS
    name#id`` in the plan details. Resolves Catalyst's opaque grouping-key
    aliases (``_groupingexpression#N`` for ``date_trunc('month', ts)`` etc.)
    so the bounded-spine test sees the real expression. The expression is
    recovered by scanning backward with paren balancing (it may contain
    commas, e.g. ``date_trunc(month, cast(...), Some(UTC))``), stopping at
    a list-element comma or bracket at depth 0."""
    defs: dict[str, str] = {}
    for m in _ALIAS_AS.finditer(plan):
        end = m.start()
        depth = 0
        i = end - 1
        start = max(0, end - 400)
        while i >= start:
            ch = plan[i]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:
                    break
                depth -= 1
            elif ch in ",[\n" and depth == 0:
                break
            i -= 1
        defs.setdefault(m.group(1), plan[i + 1 : end].strip())
    return defs


def _bounded_key(token: str, defs: dict[str, str]) -> bool:
    base = token.split("#", 1)[0]
    if _names_bounded_domain(base):
        return True
    # opaque alias: test its defining expression (one level is enough —
    # Catalyst materializes computed grouping keys in a single Project)
    defn = defs.get(token)
    return bool(defn and _names_bounded_domain(defn))


def _bounded_aggregate(
    nid: int, agg_keys: dict[int, list[str] | None], defs: dict[str, str]
) -> bool:
    ks = agg_keys.get(nid)
    if ks is None:
        return False  # no Keys detail — fail closed
    # keyless global aggregate -> exactly one row; otherwise EVERY key must
    # name a bounded spine (calendar unit / tile / enum-like domain)
    return all(_bounded_key(k, defs) for k in ks)


def global_window_smells(plan: str) -> list[str]:
    """Return a description per unbounded single-partition Window found."""
    nodes = _parse_tree(plan)
    agg_keys = _aggregate_keys(plan)
    defs = _alias_defs(plan)
    children: dict[int, list[int]] = {}
    for nid, (_name, parent) in nodes.items():
        if parent is not None:
            children.setdefault(parent, []).append(nid)
    smells = []
    for m in _SINGLE_PART.finditer(plan):
        ex_id = int(m.group(1))
        if ex_id not in nodes:
            continue
        # walk UP: does this exchange feed a Window (through pass-through ops)?
        cur = nodes[ex_id][1]
        feeds_window = False
        while cur is not None:
            name = nodes[cur][0]
            if name == "Window":
                feeds_window = True
                break
            if name not in _PASSTHRU:
                break
            cur = nodes[cur][1]
        if not feeds_window:
            continue
        # walk DOWN: is the exchange's input provably bounded? A limit/top-k
        # bounds unconditionally; an aggregate bounds only when its grouping
        # keys are a bounded spine (r5-verdict tightening — a per-entity
        # aggregate is data-proportional and must flag).
        frontier = list(children.get(ex_id, []))
        bounded = False
        unbounded_aggs: list[str] = []
        while frontier and not bounded:
            nid = frontier.pop()
            node_name = nodes[nid][0]
            if any(b in node_name for b in _LIMIT_BOUNDING):
                bounded = True
                break
            if any(a in node_name for a in _AGGREGATE_NODES):
                if _bounded_aggregate(nid, agg_keys, defs):
                    bounded = True
                    break
                ks = agg_keys.get(nid)
                unbounded_aggs.append(
                    f"{node_name}({','.join(k.split('#')[0] for k in ks) if ks else '?'})"
                )
            frontier.extend(children.get(nid, []))
        if not bounded:
            detail = (
                f"; data-proportional aggregate below: {unbounded_aggs[0]}"
                if unbounded_aggs
                else ""
            )
            smells.append(f"GlobalWindow(unbounded, exchange {ex_id}{detail})")
    return smells
