"""Set operations: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT.
Goal-derived (reference has none, SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


def _urgent_cust(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )


def _big_cust(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 8000).select(F.col("c_custkey").alias("custkey"))


@query(
    "setop_union_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
    """,
    category="setop",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: pure concatenation, no shuffle at all."""
    return _urgent_cust(spark, sf_dir).unionAll(_big_cust(spark, sf_dir))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
    """,
    category="setop",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: concat + hash-distinct (one shuffle)."""
    return _urgent_cust(spark, sf_dir).union(_big_cust(spark, sf_dir)).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
    """,
    category="setop",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent_cust(spark, sf_dir).intersect(_big_cust(spark, sf_dir))


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    category="setop",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_cust(spark, sf_dir).exceptAll(_urgent_cust(spark, sf_dir)).distinct()


@query(
    "setop_symmetric_diff",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
    y97 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_custkey, CAST('1996_only' AS VARCHAR) AS side
    FROM y96 WHERE o_custkey NOT IN (SELECT o_custkey FROM y97)
    UNION ALL
    SELECT o_custkey, CAST('1997_only' AS VARCHAR) AS side
    FROM y97 WHERE o_custkey NOT IN (SELECT o_custkey FROM y96)
    """,
    category="setop",
)
def setop_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with side attribution: customers active in
    exactly one of two years, tagged with which — the churned/acquired
    split a single EXCEPT cannot answer (it loses direction). Two
    anti-joins over the distinct key sets; both sets are post-distinct
    small and the anti-joins broadcast."""
    o = table(spark, sf_dir, "orders")

    def year(lo: str, hi: str):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96 = year("1996-01-01 00:00:00", "1997-01-01 00:00:00")
    y97 = year("1997-01-01 00:00:00", "1998-01-01 00:00:00")
    return (
        y96.join(y97, "o_custkey", "left_anti")
        .select("o_custkey", F.lit("1996_only").alias("side"))
        .unionAll(
            y97.join(y96, "o_custkey", "left_anti").select(
                "o_custkey", F.lit("1997_only").alias("side")
            )
        )
    )
