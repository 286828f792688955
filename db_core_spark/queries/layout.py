"""Data-layout operators: Z-order (Morton curve) multi-dimensional
clustering keys.

Goal-derived. The reference's layout machinery (extent/block allocation,
`/root/reference/src/storage/datastore.rs`, free bitmaps) maps to Parquet +
partition directories in Spark (SURVEY.md §4.2); what Spark does NOT give
you for free is a MULTI-dimensional clustering key — the thing Delta/Iceberg
call Z-ORDER BY. Sorting 100 TB by `(a, b)` lexicographically gives perfect
pruning on `a` and none on `b`; sorting by the interleaved-bit Morton code
gives both dimensions ~sqrt pruning, which is why warehouse compaction jobs
z-order their files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table

Z_BITS = 8  # bits per dimension -> 16-bit Morton code


def _interleave_sql(x: str, y: str, intdiv: str) -> str:
    """Morton interleave as pure integer arithmetic (bit i of x lands at
    position 2i, bit i of y at 2i+1). Same formula on both engines; only the
    integer-division operator differs (`div` in Spark SQL, `//` in DuckDB)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({x} {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@query(
    "zorder_cluster_stats",
    oracle=f"""
    WITH pts AS (
      SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
    z AS (
      SELECT x, y, ({_interleave_sql('x', 'y', '//')}) // 1024 AS zbucket FROM pts)
    SELECT zbucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max,
           MAX(x) - MIN(x) AS x_span,
           MAX(y) - MIN(y) AS y_span
    FROM z GROUP BY zbucket
    """,
    category="relational",
)
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering of lineitem on (l_partkey, l_suppkey)
    and the per-file min/max statistics that layout would produce. Each
    zbucket is what one compacted file would hold if the table were written
    `ORDER BY morton(x, y)`; the emitted x/y spans ARE the file-skipping
    story: every bucket covers a 32x32 tile (span <= 31 per dimension, vs
    255 global), so a point predicate on EITHER dimension prunes ~97% of
    files — the reason Z-ORDER BY exists in Delta/Iceberg compaction.

    The interleave is pure integer arithmetic (div/mod/multiply — one
    codegen'd expression, no UDF, no shuffle beyond the stats aggregate),
    and the same formula runs on both engines, so the oracle is exact. At 100 TB the same expression feeds `repartitionByRange(zval)`
    followed by per-file writes — the stats here are the proof the layout
    prunes."""
    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    z = pts.withColumn(
        "zbucket", F.expr(f"({_interleave_sql('x', 'y', 'div')}) div 1024")
    )
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
        (F.max("x") - F.min("x")).alias("x_span"),
        (F.max("y") - F.min("y")).alias("y_span"),
    )
