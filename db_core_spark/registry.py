"""Query registry: operator name -> (spark callable, DuckDB oracle SQL).

Every operator implemented from SURVEY.md §2B registers here via the
``@query`` decorator; ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
views over this registry. Operators whose semantics are not SQL-expressible
(streaming state, probabilistic sketches) register with ``oracle=None`` and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, category: str = "relational"):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is ANSI SQL DuckDB runs over the same parquet fixture views.
    Column names/types of the Spark result and the oracle result must align —
    the driver sorts columns by name and hashes values.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    # Import for side effect: each module registers its operators.
    from db_core_spark import queries as _q  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_queries() -> dict[str, str]:
    return {name: rq.oracle for name, rq in all_queries().items() if rq.oracle is not None}
