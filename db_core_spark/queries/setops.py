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
