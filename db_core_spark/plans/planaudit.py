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
bounded — a preceding limit / top-k (TakeOrderedAndProject) or an
aggregation to a spine (calendar days, ventiles, top-50 lists) below the
exchange. Those windows see O(spine) rows regardless of data scale.
"""

from __future__ import annotations

import re

_TREE_NODE = re.compile(r"^([ :+|-]*)\*?\s*([A-Za-z][\w .]*?)\s+\((\d+)\)\s*$")
_SINGLE_PART = re.compile(
    r"^\((\d+)\) Exchange\s*\nInput[^\n]*\nArguments: SinglePartition", re.M
)

# nodes below the exchange that bound its input size
_BOUNDING = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "WindowGroupLimit",
)
# nodes a Window's requirement passes through untouched
_PASSTHRU = {"Sort", "Project", "Filter", "WindowGroupLimit"}


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


def global_window_smells(plan: str) -> list[str]:
    """Return a description per unbounded single-partition Window found."""
    nodes = _parse_tree(plan)
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
        # walk DOWN: is the exchange's input provably bounded?
        frontier = list(children.get(ex_id, []))
        bounded = False
        while frontier and not bounded:
            nid = frontier.pop()
            if any(b in nodes[nid][0] for b in _BOUNDING):
                bounded = True
            frontier.extend(children.get(nid, []))
        if not bounded:
            smells.append(f"GlobalWindow(unbounded, exchange {ex_id})")
    return smells
