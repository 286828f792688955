"""Driver-literal DataFrames without the Python-worker tax.

Every fence / boundary / offset / stats pattern in this repo collects a
tiny frame to the driver and re-injects it into the next plan as literal
rows. The obvious ``spark.createDataFrame(rows, schema)`` builds a PICKLED
PYTHON RDD split over ``defaultParallelism`` partitions: every downstream
action then schedules one task per core and round-trips a Python worker
per task just to deserialize a handful of rows. Measured in a live query
session (32 cores, 1-row frame, interleaved best-of-10): 0.40 s per
action via the list path vs 0.08 s via an Arrow table — the literal frame
was costing more than the full-table aggregate it replaced.

``literal_frame`` builds the same rows as ONE pyarrow table instead: the
conversion happens once on the driver, the scan is a single-partition
JVM-side Arrow scan (no Python workers at execution), and Spark's own
arrow<->Catalyst converters preserve value fidelity exactly — including
the NaN-vs-NULL distinction that the pandas path destroys (pandas stores
None as NaN in float columns). Falls back to the classic list path when
pyarrow can't represent the schema (or on Spark Connect quirks), so
callers never need a guard.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T


def literal_frame(
    spark: SparkSession,
    rows: Iterable[tuple | Row],
    schema: T.StructType | str,
) -> DataFrame:
    """Tiny driver-resident frame -> single-partition Arrow-backed
    DataFrame. ``rows`` are tuples or Rows matching ``schema`` exactly
    (no inference). Intended for fence/boundary/offset/stats frames —
    O(groups)-sized by contract, always driver-built, so one partition is
    the right layout at any data scale."""
    rows = list(rows)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    try:
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        names = schema.fieldNames()
        # Row fields map by NAME (collect order == schema order for the
        # fence frames here, but name-matching is free insurance); plain
        # tuples map positionally. Timestamp columns rely on the repo's
        # pinned UTC session timezone (session.py) for an exact
        # naive-datetime round trip through Arrow.
        pylist = [
            r.asDict(recursive=False)
            if isinstance(r, Row)
            else dict(zip(names, r))
            for r in rows
        ]
        tbl = pa.Table.from_pylist(pylist, schema=to_arrow_schema(schema))
        return spark.createDataFrame(tbl)
    except Exception:
        # pyarrow missing / unrepresentable type / Connect quirk: the
        # classic path is slower (Python-RDD scan) but always correct.
        return spark.createDataFrame(
            [tuple(r) if isinstance(r, Row) else r for r in rows], schema
        )
