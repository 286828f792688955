"""As-of / point-in-time join queries (oracle-checked). Spark lacks a native
ASOF JOIN; db_core_spark.operators.asof implements it as union + running
last_value — one shuffle, no per-key Python. The oracle expresses the same
semantics as join + QUALIFY row_number."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.operators.asof import asof_join
from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "asof_join_event_order",
    oracle="""
    WITH matched AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      WHERE e.event_id <= 2000)
    SELECT e.event_id, e.user_id,
           m.o_orderkey AS last_orderkey, m.o_totalprice AS last_totalprice
    FROM (SELECT event_id, user_id FROM events WHERE event_id <= 2000) e
    LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m USING (event_id)
    """,
    category="asof",
)
def asof_join_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the customer's most recent order as of the event time
    (ties on order date broken toward the larger orderkey)."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") <= 2000)
        .select("event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        e,
        o.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


@query(
    "asof_join_forward_order",
    oracle="""
    WITH matched AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM (SELECT event_id, user_id, ts - INTERVAL 29 YEAR AS ts
            FROM events) e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
      WHERE e.event_id <= 2000)
    SELECT e.event_id, e.user_id,
           m.o_orderkey AS next_orderkey, m.o_totalprice AS next_totalprice
    FROM (SELECT event_id, user_id FROM events WHERE event_id <= 2000) e
    LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m USING (event_id)
    """,
    category="asof",
)
def asof_join_forward_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each event, the customer's NEXT order at or after
    the event time (ties toward the smaller orderkey) — the
    label-what-happens-next join of churn/attribution pipelines."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") <= 2000)
        # align the events fixture's 2024 epoch onto the orders calendar so
        # forward matches exist (identical shift in the oracle)
        .select(
            "event_id",
            "user_id",
            F.expr("ts - INTERVAL 29 YEAR").cast("timestamp_ntz").alias("ts"),
        )
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        e,
        o.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )
