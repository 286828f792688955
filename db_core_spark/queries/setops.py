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
    split a single EXCEPT cannot answer (it loses direction).

    One scan, one shuffle: tag each order with membership flags and reduce
    per customer with MAX (partial-aggregable, so the exchange carries one
    flag pair per customer per map task), then keep the XOR rows. The r6
    two-anti-join form scanned orders twice and shuffled three times
    (2 distincts + join); the r7 sf1 sweep flagged it at 6x per 10x data."""
    o = table(spark, sf_dir, "orders")

    def in_year(lo: str, hi: str):
        return (
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
        ).cast("int")

    in96 = in_year("1996-01-01 00:00:00", "1997-01-01 00:00:00")
    in97 = in_year("1997-01-01 00:00:00", "1998-01-01 00:00:00")
    flags = (
        o.select("o_custkey", in96.alias("_a"), in97.alias("_b"))
        .filter((F.col("_a") + F.col("_b")) > 0)
        .groupBy("o_custkey")
        .agg(F.max("_a").alias("_a"), F.max("_b").alias("_b"))
    )
    return flags.filter(F.col("_a") != F.col("_b")).select(
        "o_custkey",
        F.when(F.col("_a") == 1, F.lit("1996_only"))
        .otherwise(F.lit("1997_only"))
        .alias("side"),
    )
