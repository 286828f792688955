"""Second-wave operator coverage: subqueries, advanced window analytics,
array/string aggregation, null-safe comparison, funnel/sequence analysis,
TPC-H Q3-style top-N, monthly rollups, embedding centroids. Goal-derived
(reference has none of these, SURVEY.md §2C)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "scalar_subquery_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT 2 * AVG(o_totalprice) FROM orders)
    """,
    category="subquery",
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (uncorrelated) subquery: orders above 2x the global mean.
    Plans as a broadcast of the 1-row aggregate — no driver round-trip."""
    o = table(spark, sf_dir, "orders")
    threshold = o.agg((F.avg("o_totalprice") * 2).alias("thr"))
    return (
        o.crossJoin(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "correlated_in_subquery",
    oracle="""
    SELECT l_orderkey, l_partkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
      AND l_quantity > 45
    """,
    category="subquery",
)
def correlated_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery == left semi join on the subquery result."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    p = table(spark, sf_dir, "part").filter(F.col("p_size") > 45).select("p_partkey")
    return li.join(p, li.l_partkey == p.p_partkey, "left_semi").select(
        "l_orderkey", "l_partkey"
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS price_quartile,
           FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000 + 0.5) / 1000000 AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    category="window",
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first_value / last_value with a
    total order; floor-rounding for cross-engine float stability."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        (F.floor(F.percent_rank().over(w) * 1000000 + 0.5) / 1000000).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * 1000000 + 0.5) / 1000000).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).alias("priciest_key"),
    )


def array_string_agg_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-set -> sorted array + CSV string aggregation. Array-native
    shape (``statuses array<string>``), pytest-checked; the registered driver
    twin serializes the array to JSON text because the driver's pandas
    canonicalizer can only hash scalar columns (same playbook as
    ``embedding_quantize_int8``)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_sort(F.collect_set("o_orderstatus")).alias("statuses"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("status_csv"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "array_string_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(to_json(list_sort(list(DISTINCT o_orderstatus))) AS VARCHAR)
             AS statuses_json,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS status_csv,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    category="aggregate",
)
def array_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing twin of :func:`array_string_agg_arrays` — the sorted
    distinct-status array is emitted as JSON text (both Spark's and DuckDB's
    ``to_json`` produce the compact ``["A","B"]`` form) so every output
    column is driver-hashable."""
    a = array_string_agg_arrays(spark, sf_dir)
    return a.select(
        "o_orderpriority",
        F.to_json(F.col("statuses")).alias("statuses_json"),
        "status_csv",
        "n",
    )


@query(
    "null_safe_semantics",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'F') IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_f,
           CAST(COUNT(NULLIF(o_orderstatus, 'F')) AS BIGINT) AS n_not_f
    FROM orders GROUP BY o_orderstatus
    """,
    category="scalar",
)
def null_safe_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality (<=> / IS NOT DISTINCT FROM) + COUNT's
    null-skipping — the SQL three-valued-logic corner cases."""
    o = table(spark, sf_dir, "orders")
    nf = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(nf.eqNullSafe(F.lit(None).cast("string")), 1).otherwise(0)).alias(
            "n_nullsafe_f"
        ),
        F.count(nf).alias("n_not_f"),
    )


@query(
    "funnel_signup_to_purchase",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= s.signup_ts AND e.ts <= s.signup_ts + INTERVAL '24 hours'
      GROUP BY e.user_id)
    SELECT s.user_id,
           CAST(floor(epoch(s.signup_ts)) AS BIGINT) AS signup_epoch,
           CAST(floor(epoch(p.first_purchase_ts)) AS BIGINT) AS purchase_epoch
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
    category="streaming",
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: first signup, then first purchase within 24h —
    the sequence-detection pattern (joins on the equi user key; the time
    predicate filters within co-located partitions)."""
    e = table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(
            (F.col("ts") >= F.col("signup_ts"))
            & (F.col("ts") <= F.col("signup_ts") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    ep = lambda c: F.unix_timestamp(F.col(c).cast("timestamp")).cast("long")  # noqa: E731
    return (
        s.join(p, "user_id", "left")
        .select(
            "user_id",
            ep("signup_ts").alias("signup_epoch"),
            ep("first_purchase_ts").alias("purchase_epoch"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    category="join",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: revenue of unshipped BUILDING-segment orders, top 10.
    Ordering uses the rounded revenue + orderkey tie-break so the LIMIT
    boundary is engine-stable."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            (F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100 + 0.5) / 100)
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "monthly_revenue_rollup",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
    category="aggregate",
)
def monthly_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing — the partition-pruning-friendly layout key for
    a date-partitioned 100 TB table."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, dim,
           FLOOR(AVG(CAST(embedding[dim] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS centroid_val
    FROM embeddings
    CROSS JOIN (SELECT UNNEST(range(1, 65)) AS dim)
    GROUP BY label, dim
    """,
    category="vector",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors via posexplode + aggregate — the k-means
    update step / class-prototype computation, fully codegen'd (no UDF)."""
    e = table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select("label", (F.col("pos") + 1).cast("int").alias("dim"), F.col("val").cast("double").alias("val"))
    return exploded.groupBy("label", "dim").agg(
        (F.floor(F.avg("val") * 1000000 + 0.5) / 1000000).alias("centroid_val")
    )


_SQL_Q3 = """
    SELECT o.o_orderkey,
           FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
             AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
"""


@query("sql_api_shipping_priority", oracle=_SQL_Q3, category="relational")
def sql_api_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-entry parity: the EXACT oracle text executes through spark.sql
    over registered views — one parser/planner path for users who speak SQL
    rather than DataFrame. Catalyst compiles it to the same broadcast-join +
    TakeOrderedAndProject physical plan as the DataFrame twin
    (q3_shipping_priority); timestamps parse as timestamp_ntz under the UTC
    session so literals agree with DuckDB."""
    for t in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_Q3)


@query(
    "correlated_exists_above_own_avg",
    oracle="""
    SELECT o1.o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_above_avg,
           ROUND(MAX(o1.o_totalprice), 2) AS max_price
    FROM orders o1
    WHERE o1.o_totalprice > (SELECT AVG(o2.o_totalprice)
                             FROM orders o2
                             WHERE o2.o_custkey = o1.o_custkey)
    GROUP BY o1.o_custkey
    """,
    category="subquery",
)
def correlated_exists_above_own_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated self-comparison: each customer's orders priced above that
    CUSTOMER'S OWN average (the 'which purchases were big for THEM'
    question). The oracle states it as the textbook correlated scalar
    subquery; the Spark plan is the decorrelated form every optimizer
    rewrites it to — one window AVG over the customer key, then a
    row-local comparison — turning N correlated rescans into ONE
    exchange. The gate proves rewrite == textbook semantics."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_above_avg"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "scalar_subquery_share_of_customer",
    oracle="""
    SELECT o1.o_orderkey, o1.o_custkey,
           ROUND(o1.o_totalprice * 100.0
                 / (SELECT SUM(o2.o_totalprice) FROM orders o2
                    WHERE o2.o_custkey = o1.o_custkey), 4) AS pct_of_customer
    FROM orders o1
    WHERE o1.o_orderkey < 1000
    """,
    category="subquery",
)
def scalar_subquery_share_of_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row correlated scalar subquery in the SELECT list: each order's
    share of its customer's lifetime spend. Decorrelated to a window SUM
    on the customer key (the denominator must aggregate over ALL the
    customer's orders, so the window runs BEFORE the orderkey filter
    prunes rows — ordering the rewrite wrong silently changes the
    denominator, which the oracle would catch)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return (
        o.withColumn("cust_total", F.sum("o_totalprice").over(w))
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100.0 / F.col("cust_total"), 4).alias(
                "pct_of_customer"
            ),
        )
    )
