"""Scans, projections, filters, distinct — the base of the operator surface.

The reference's only scan is a physical byte-stream object scan
(/root/reference/src/storage/block_driver.rs:489-527); here scans are
declarative parquet reads so Catalyst pushes predicates and prunes columns
(verify with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter -> groupBy -> 8 aggregates -> sort.

    Scale notes: the filter pushes to the parquet scan; aggregation is
    partial (map-side combine) before the single shuffle on the 6-value
    group key; no further shuffle for the sort (tiny result)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "scan_projection_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount > 0.05
    """,
)
def scan_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan with a computed projection.

    Per-row rounding uses floor(x*100+0.5)/100 in BOTH engines: engine
    ROUND() implementations disagree on values that land exactly on a .xx5
    boundary, while this arithmetic form is bit-identical IEEE754."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5) / 100).alias(
                "net_price"
            ),
        )
    )


@query(
    "filter_in_like_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus LIKE 'F%'
      AND o_totalprice IS NOT NULL
    """,
)
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, LIKE and NULL-check predicates (all pushdown-eligible)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").like("F%")
        & F.col("o_totalprice").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "distinct_values",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns (map-side partial first)."""
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N by sort+limit. Spark plans this as TakeOrderedAndProject —
    a per-partition top-N + single merge, no global sort shuffle; exactly
    what you want at 100 TB."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "unpivot_melt_measures",
    oracle="""
    SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(val), 2) AS total, ROUND(AVG(val), 6) AS mean
    FROM (
      UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax
               FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE val)
    GROUP BY measure
    """,
    category="relational",
)
def unpivot_melt_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) of the four lineitem measures, then a
    per-measure profile. Unpivot is a row-local Expand (4x fan-out inside
    the scan stage, no shuffle); only the 4-group aggregate exchanges."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 6).alias("mean"),
    )
