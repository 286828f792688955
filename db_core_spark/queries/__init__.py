"""Operator surface (SURVEY.md §2B). Importing this package registers every
query in db_core_spark.registry via the @query decorator."""

from db_core_spark.queries import (  # noqa: F401
    relational,
    joins,
    aggregates,
    windows,
    setops,
    scalars,
    mvcc,
    streaming_batch,
    llm,
    vectors,
    objects,
    asof,
    extras,
    udfs,
    tpch,
    sampling,
    udtf_ops,
    analytics,
    corpus,
    timeseries,
    graph,
    layout,
    geo,
    privacy,
)
